"""`train` command — CLI surface identical to the reference
(``src/train.py:25-49``), running the jitted/pjit-sharded training loop.
"""

from __future__ import annotations

import math
from pathlib import Path

import click

from semi_supervised_vos_tpu.utils.logging import logger

MINER_CHOICES = [
    "default", "kernel_7x7", "temporal", "one_back_one_ahead",
    "euclidean", "manhattan", "chebyshev", "skeleton",
    "skeleton_nearest_negative", "skeleton_temporal",
]


@click.command(name="train")
@click.option("--frame_num", "-n", type=int, default=10, help="Number of frames to train.")
@click.option("--train", "-t", "training", type=click.Path(file_okay=False, dir_okay=True), required=True,
              help="Path to training dataset.")
@click.option("--val", "-v", "validation", type=click.Path(file_okay=False, dir_okay=True), required=True,
              help="Path to validation dataset.")
@click.option("--resume", "-r", type=click.Path(dir_okay=True, file_okay=True), help="Path to the trained checkpoint.")
@click.option("--save_model", "-m", type=click.Path(dir_okay=True, file_okay=False), default="./checkpoints",
              help="Directory to save checkpoints.")
@click.option("--epochs", type=int, default=240, help="Number of epochs.")
@click.option("--bs", type=int, default=16, help="Batch size.")
@click.option("--lr", type=float, default=0.02, help="Initial learning rate.")
@click.option("--loss", type=click.Choice(["cross_entropy", "focal", "contrastive", "triplet"]),
              default="cross_entropy", help="Loss function to use.")
@click.option("--freeze/--no-freeze", default=False, help="Whether or not freeze the feature extractor backbone.")
@click.option("--miner", type=click.Choice(MINER_CHOICES), default="default", help="Triplet loss miner.")
@click.option("--margin", type=click.FloatRange(min=0.0, max=1.0), default=0.1, help="Triplet loss margin.")
@click.option("--loss_weight", type=click.FloatRange(min=0.0), default=1.0, help="Weight of triplet loss.")
@click.option("--max_triplets", type=click.IntRange(min=0), default=0,
              help="Maximum number of triplets to mine (0 means take all triplets).")
@click.option("--early-stop/--no-early-stop", default=False, help="Whether or not use the early stopping for training.")
@click.option("--model", "model_name",
              type=click.Choice(["resnet18", "resnet50", "resnet101", "facebook"]),
              default="resnet50",
              help="Backbone (the reference hard-codes resnet50, train.py:55; "
                   "facebook = swsl-shaped resnet50, zoo-bootstrapped).")
@click.option("--pretrained", type=click.Path(file_okay=True, dir_okay=False), default=None,
              help="Optional local torchvision ImageNet checkpoint for backbone init "
                   "(replaces the reference's model-zoo download; layer4/fc dropped).")
@click.option("--device", type=click.Choice(["cpu", "cuda", "tpu"]), default="tpu",
              help="Device to run computing on.")
@click.option("--bf16/--no-bf16", default=False,
              help="bfloat16 compute for the backbone (f32 params/grads) — "
                   "TPU mixed-precision training, not in the reference.")
@click.option("--tp", type=click.IntRange(min=1), default=1,
              help="Tensor-parallel degree: channel-shard the backbone over the "
                   "mesh's model axis (composes with data parallelism over the "
                   "remaining devices). TPU-native addition, not in the reference.")
@click.option("--decode-cache/--no-decode-cache", default=None,
              help="Cache DECODED frames in host RAM (~15 GB for DAVIS-2017 "
                   "trainval): epochs after the first skip image decode "
                   "entirely. Default: the SVOS_DECODE_CACHE env var.")
def train_command(frame_num, training, validation, resume, save_model, epochs, bs, lr, loss, freeze, miner,
                  margin, loss_weight, max_triplets, early_stop, model_name, pretrained, device, bf16, tp,
                  decode_cache):
    train_command_impl(frame_num, training, validation, resume, save_model, epochs, bs, lr, loss, freeze,
                       miner, margin, loss_weight, max_triplets, early_stop, model_name, pretrained, device,
                       bf16=bf16, tp=tp, decode_cache=decode_cache)


def train_command_impl(frame_num, training, validation, resume, save_model, epochs, bs, lr, loss, freeze,
                       miner, margin, loss_weight, max_triplets, early_stop, model_name="resnet50",
                       pretrained=None, device="tpu", disable=False, crop=256, bf16=False, tp=1,
                       decode_cache=None):
    """Reference ``src/train.py:49-152``."""
    from semi_supervised_vos_tpu.utils.runtime import setup_backend

    setup_backend(device)
    import jax

    import jax.numpy as jnp
    import numpy as np

    from semi_supervised_vos_tpu.data.davis import TrainDataset
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.ops.onehot import davis_centroids
    from semi_supervised_vos_tpu.train.early_stopping import EarlyStopping
    from semi_supervised_vos_tpu.train.loop import (
        LossSpec,
        iterate_batches,
        make_eval_step,
        make_geometry_fn,
        make_train_step,
        run_epoch,
    )
    from semi_supervised_vos_tpu.train.miners import get_miner
    from semi_supervised_vos_tpu.train.train_state import (
        checkpoint_name,
        cosine_lr,
        init_train_state,
        load_weights,
        make_optimizer,
        save_checkpoint,
        set_learning_rate,
    )

    logger.info("Training started.")
    temperature = 1.0

    miner_obj = None
    if loss == "triplet":
        miner_obj = get_miner(miner)
        if miner_obj is None:
            raise RuntimeError("Invalid miner type.")
        miner_obj.max_triplets = max_triplets
    spec = LossSpec(
        name=loss,
        temperature=temperature,
        margin=margin,
        loss_weight=loss_weight,
        miner=miner_obj,
    )

    net = VOSNet(model=model_name, dtype=jnp.bfloat16 if bf16 else jnp.float32)
    tx = make_optimizer(base_lr=lr)
    rng = jax.random.PRNGKey(42)
    state = init_train_state(net, rng, (1, crop, crop, 3), tx)

    if pretrained is None and resume is None:
        # reference out-of-box behaviour: self-initialise from the
        # torchvision zoo (resnet.py:159-171), falling back to random init
        # offline (models/zoo.py). Pointless when resuming — load_weights
        # below would overwrite every fetched tensor anyway.
        from semi_supervised_vos_tpu.models.zoo import auto_pretrained_path

        pretrained = auto_pretrained_path(model_name)
    if pretrained is not None:
        import torch

        from semi_supervised_vos_tpu.models.convert import convert_torchvision_backbone

        sd = torch.load(pretrained, map_location="cpu", weights_only=True)
        merged = convert_torchvision_backbone(
            {k: v.numpy() for k, v in sd.items()},
            {"params": state.params, "batch_stats": state.batch_stats},
            model_name,
        )
        state = state._replace(
            params=merged["params"], batch_stats=merged["batch_stats"]
        )
    if resume is not None:
        state = load_weights(resume, state, model_name)

    frozen_mask = None
    if freeze:
        mask = net.frozen_backbone_mask(state.params)
        frozen_mask = jax.tree_util.tree_map(lambda m: float(m), mask)

    train_dataset = TrainDataset(
        Path(training) / "JPEGImages/480p",
        Path(training) / "Annotations/480p",
        cropping=crop,
        frame_num=frame_num,
        decode_cache=decode_cache,
    )
    validation_dataset = TrainDataset(
        Path(validation) / "JPEGImages/480p",
        Path(validation) / "Annotations/480p",
        cropping=crop,
        frame_num=frame_num,
        decode_cache=decode_cache,
    )
    validation_bs = max(bs // 2, 1)
    train_batches = math.ceil(len(train_dataset) / bs)

    save_model = Path(save_model)
    save_model.mkdir(parents=True, exist_ok=True)

    from semi_supervised_vos_tpu.config import default_num_workers

    num_workers = default_num_workers()
    centroids = jnp.asarray(davis_centroids(), jnp.float32)

    # data-parallel mesh when the batch divides the device count (the
    # TPU-native replacement for torch.nn.DataParallel, train.py:113);
    # --tp N additionally channel-shards the backbone over a model axis
    shard_fn = None
    n_dev = jax.device_count()
    if tp < 1 or tp > n_dev:
        raise click.ClickException(
            f"--tp {tp} must be between 1 and the {n_dev} available device(s)."
        )
    if n_dev % tp != 0:
        raise click.ClickException(
            f"--tp {tp} must divide the device count ({n_dev}); "
            f"{n_dev % tp} device(s) would sit idle."
        )
    n_data = n_dev // tp
    if bs % n_data != 0:
        if tp > 1:
            raise click.ClickException(
                f"--tp {tp} needs batch size divisible by the data-parallel "
                f"degree {n_data} (got --bs {bs})."
            )
        if n_dev > 1:
            logger.warning(
                f"batch size {bs} does not divide over {n_data} devices; "
                "running single-device (pick a divisible --bs to engage the mesh)"
            )
    if n_dev > 1 and bs % n_data == 0:
        from semi_supervised_vos_tpu.parallel.mesh import (
            make_mesh,
            replicate,
            shard_batch,
        )

        mesh = make_mesh(n_data=n_data, n_model=tp)
        if tp > 1:
            from semi_supervised_vos_tpu.parallel.tp import shard_tp

            state = shard_tp(mesh, state)
            if frozen_mask is not None:
                frozen_mask = shard_tp(mesh, frozen_mask)
        else:
            state = replicate(mesh, state)
            if frozen_mask is not None:
                frozen_mask = replicate(mesh, frozen_mask)
        centroids = replicate(mesh, centroids)
        shard_fn = lambda *arrays: shard_batch(mesh, *arrays)
        logger.info(f"mesh: data={n_data} x model={tp} over {n_dev} devices")

    train_step = make_train_step(net, spec, tx, frozen_mask)
    eval_step = make_eval_step(net, spec)
    # pipelined morphology mining: host geometry per batch on the staging
    # thread (None unless the spec needs it — see loop.mining_mode)
    geometry_fn = make_geometry_fn(spec, davis_centroids())

    early_stopper = EarlyStopping(
        save_model, log=logger.info, save_fn=save_checkpoint
    )
    start_epoch = int(state.epoch)

    progress = None
    bar = None
    if not disable:
        try:
            from tqdm import tqdm

            bar = tqdm(total=(epochs - start_epoch) * train_batches, desc="Training.")
            progress = bar.update
        except ImportError:
            pass

    for epoch in range(start_epoch, start_epoch + epochs):
        # reference reseeds augmentation every epoch (train.py:132)
        train_dataset.seed(42)
        validation_dataset.seed(42)
        state = state._replace(
            opt_state=set_learning_rate(
                state.opt_state, cosine_lr(epoch, base_lr=lr, epochs=epochs)
            )
        )
        rng, e_rng = jax.random.split(rng)
        state, train_loss = run_epoch(
            train_step,
            state,
            iterate_batches(train_dataset, bs, num_workers=num_workers),
            centroids,
            e_rng,
            train=True,
            progress=progress,
            shard_fn=shard_fn,
            geometry_fn=geometry_fn,
        )
        validation_loss = float("nan")
        if epoch % 10 == 0:
            rng, v_rng = jax.random.split(rng)
            _, validation_loss = run_epoch(
                eval_step,
                state,
                iterate_batches(validation_dataset, validation_bs, num_workers=num_workers),
                centroids,
                v_rng,
                train=False,
                shard_fn=shard_fn if validation_bs % jax.device_count() == 0 else None,
                geometry_fn=geometry_fn,
            )
        state = state._replace(epoch=jnp.int32(epoch + 1))

        if early_stop and early_stopper(validation_loss, epoch, state):
            logger.info("Early stopping stopped the training.")
            break

        save_checkpoint(
            state, save_model / checkpoint_name(epoch, train_loss, validation_loss)
        )
        logger.info(
            f"epoch {epoch}: train_loss={train_loss:.5f} val_loss={validation_loss:.5f}"
        )
    if bar:
        bar.close()
    logger.info("Training finished.")
    return state
