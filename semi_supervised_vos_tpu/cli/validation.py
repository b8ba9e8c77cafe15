"""`validation` command (reference ``src/validation.py:29-98``): compute the
validation loss of every checkpoint in a directory, dump a JSON report."""

from __future__ import annotations

import json
from pathlib import Path

import click

from semi_supervised_vos_tpu.utils.logging import logger

from semi_supervised_vos_tpu.cli.train import MINER_CHOICES


@click.command(name="validation")
@click.option("--data", "-d", type=click.Path(file_okay=False, dir_okay=True), required=True, help="Path to dataset.")
@click.option("--checkpoints", "-c", type=click.Path(dir_okay=True, file_okay=False), help="Path to checkpoints.")
@click.option("--bs", type=int, default=16, help="Batch size.")
@click.option("--loss", type=click.Choice(["cross_entropy", "focal", "contrastive", "triplet"]),
              default="cross_entropy", help="Loss function to use.")
@click.option("--miner", type=click.Choice(MINER_CHOICES), default="default", help="Triplet loss miner.")
@click.option("--margin", type=click.FloatRange(min=0.0, max=1.0), default=0.1, help="Triplet loss margin.")
@click.option("--loss_weight", type=click.FloatRange(min=0.0), default=6.0, help="Weight of triplet loss.")
@click.option("--output", "-o", type=click.Path(dir_okay=False, file_okay=True), help="Path to output JSON.")
@click.option("--model", "model_name", type=click.Choice(["resnet18", "resnet50", "resnet101"]), default="resnet50",
              help="Backbone (the reference hard-codes resnet50, validation.py:80).")
@click.option("--device", type=click.Choice(["cpu", "cuda", "tpu"]), default="tpu")
def validation_command(data, checkpoints, bs, loss, miner, margin, loss_weight, output, model_name, device):
    validation_command_impl(data, checkpoints, bs, loss, miner, margin, loss_weight, output, model_name, device)


def validation_command_impl(data, checkpoints, bs, loss, miner, margin, loss_weight, output,
                            model_name="resnet50", device="tpu", disable=False, frame_num=10, crop=256):
    from semi_supervised_vos_tpu.utils.runtime import setup_backend

    setup_backend(device)
    import jax

    import jax.numpy as jnp

    from semi_supervised_vos_tpu.data.davis import TrainDataset
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.ops.onehot import davis_centroids
    from semi_supervised_vos_tpu.train.loop import (
        LossSpec,
        iterate_batches,
        make_eval_step,
        make_geometry_fn,
        run_epoch,
    )
    from semi_supervised_vos_tpu.train.miners import get_miner
    from semi_supervised_vos_tpu.train.train_state import (
        init_train_state,
        load_weights,
        make_optimizer,
    )

    logger.info("Validation started.")
    temperature = 1.0

    miner_obj = None
    if loss == "triplet":
        miner_obj = get_miner(miner)
        if miner_obj is None:
            raise RuntimeError("Invalid miner type.")
    spec = LossSpec(
        name=loss, temperature=temperature, margin=margin,
        loss_weight=loss_weight, miner=miner_obj,
    )

    validation_dataset = TrainDataset(
        Path(data) / "JPEGImages/480p",
        Path(data) / "Annotations/480p",
        cropping=crop,
        frame_num=frame_num,
    )

    net = VOSNet(model=model_name)
    tx = make_optimizer()
    rng = jax.random.PRNGKey(42)
    base_state = init_train_state(net, rng, (1, crop, crop, 3), tx)
    eval_step = make_eval_step(net, spec)
    centroids = jnp.asarray(davis_centroids(), jnp.float32)
    geometry_fn = make_geometry_fn(spec, davis_centroids())

    # data-parallel mesh when the batch divides the device count — the same
    # rule as the train CLI (state replicated, batch axis sharded; XLA
    # derives the loss reduction over ICI)
    mesh = None
    shard_fn = None
    n_dev = jax.device_count()
    if n_dev > 1 and bs % n_dev == 0:
        from semi_supervised_vos_tpu.parallel.mesh import (
            make_mesh,
            replicate,
            shard_batch,
        )

        mesh = make_mesh(n_data=n_dev, n_model=1)
        centroids = replicate(mesh, centroids)
        shard_fn = lambda *arrays: shard_batch(mesh, *arrays)
        logger.info(f"mesh: data={n_dev} over {n_dev} devices")
    elif n_dev > 1:
        logger.warning(
            f"batch size {bs} does not divide over {n_dev} devices; "
            "running single-device (pick a divisible --bs to engage the mesh)"
        )

    # both our .ckpt dirs and reference .pth.tar files validate
    ckpts = sorted(
        [p for p in Path(checkpoints).iterdir() if p.suffix in (".ckpt",) or p.name.endswith(".pth.tar")]
    )

    losses_out = {}
    for ckpt in ckpts:
        state = load_weights(ckpt, base_state, model_name)
        if mesh is not None:
            state = replicate(mesh, state)
        validation_dataset.seed(42)
        rng, sub = jax.random.split(rng)
        _, val_loss = run_epoch(
            eval_step, state, iterate_batches(validation_dataset, bs),
            centroids, sub, train=False, shard_fn=shard_fn,
            geometry_fn=geometry_fn,
        )
        losses_out[ckpt.name] = val_loss
        logger.info(f"{ckpt.name}: {val_loss:.5f}")

    if output is not None:
        with Path(output).open(mode="w") as writer:
            json.dump(losses_out, writer)

    logger.info("Validation finished.")
    return losses_out
