"""`inference` command — CLI surface identical to the reference
(``src/inference.py:18-48``), running on the TPU-native engine.

The ``--device`` option keeps the reference's name but takes ``tpu``/``cpu``
(``cuda`` is accepted as an alias for the default accelerator so reference
invocations keep working).
"""

from __future__ import annotations

from pathlib import Path

import click

from semi_supervised_vos_tpu.utils.logging import logger


@click.command(name="inference")
@click.option("--ref_num", "-n", type=int, default=9, help="Number of reference frames for inference.")
@click.option("--data", "-d", type=click.Path(file_okay=False, dir_okay=True), required=True,
              help="Path to inference dataset folder.")
@click.option("--resume", "-r", type=click.Path(file_okay=True, dir_okay=True), required=True,
              help="Path to the trained checkpoint (.pth.tar file or Orbax dir).")
@click.option("--model", "-m", type=click.Choice(["resnet18", "resnet50", "resnet101", "facebook"]),
              default="resnet50", help="Network architecture.")
@click.option("--temperature", "-t", type=float, default=1.0, help="Temperature parameter.")
@click.option("--frame_range", type=int, default=40, help="Range of frames for inference.")
@click.option("--sigma_1", type=float, default=8.0,
              help="Smaller sigma in the motion model for dense spatial weight.")
@click.option("--sigma_2", type=float, default=21.0,
              help="Larger sigma in the motion model for dense spatial weight.")
@click.option("--save", "-s", type=click.Path(file_okay=False, dir_okay=True), required=True,
              help="Path to save predictions.")
@click.option("--device", type=click.Choice(["cpu", "cuda", "tpu"]), default="tpu",
              help="Device to run computing on (cuda = default accelerator).")
@click.option("--inference-strategy",
              type=click.Choice(["single", "hor-flip", "vert-flip", "2-scale", "multimodel", "hor-2-scale", "3-scale"]),
              default="single", help="Inference strategy.")
@click.option("--additional-model", type=click.Path(file_okay=True, dir_okay=True), required=False,
              help="Path to the additional checkpoint.")
@click.option("--additional-model-type", type=click.STRING, required=False, default="resnet50",
              help="Type of additional model type.")
@click.option("--probability/--no-probability", default=False, required=False,
              help="Should probability or labels be propagated.")
@click.option("--scale", default=1.15, required=False, type=click.FLOAT,
              help="Scale for 2nd image in 2-scale strategy.")
@click.option("--fusion", default="mean", type=click.Choice(["maximum", "minimum", "mean"]),
              help="Fusion operation for probability propagation.")
@click.option("--video-batch", type=int, default=1,
              help="Propagate this many videos in lockstep (works with every "
                   "strategy; TPU throughput extension, not in the "
                   "reference).")
@click.option("--bank-shards", type=int, default=1,
              help="Shard the memory bank's reference-pixel axis over this "
                   "many devices (works with every strategy; fused-kernel "
                   "distributed online softmax over ICI — multi-chip "
                   "extension, not in the reference). Mutually exclusive "
                   "with --video-batch.")
@click.option("--dp-shards", type=int, default=1,
              help="Shard --video-batch lanes over this many devices (data-"
                   "parallel lockstep inference: each chip runs an "
                   "independent lane block — linear multi-chip throughput; "
                   "not in the reference). Requires --video-batch > 1.")
def inference_command(ref_num, data, resume, model, temperature, frame_range, sigma_1, sigma_2, save, device,
                      inference_strategy, additional_model, additional_model_type, probability, scale, fusion,
                      video_batch, bank_shards, dp_shards):
    inference_command_impl(ref_num, data, resume, model, temperature, frame_range, sigma_1, sigma_2, save, device,
                           inference_strategy, additional_model, additional_model_type, probability, scale, fusion,
                           video_batch=video_batch, bank_shards=bank_shards, dp_shards=dp_shards)


def inference_command_impl(ref_num, data, resume, model, temperature, frame_range, sigma_1, sigma_2, save, device,
                           inference_strategy, additional_resume, additional_model_type, probability_propagation,
                           scale, reduction, disable=False, video_batch=1, bank_shards=1, dp_shards=1):
    """Reference ``src/inference.py:54-113``."""
    from semi_supervised_vos_tpu.utils.runtime import setup_backend

    setup_backend(device)
    import jax

    from semi_supervised_vos_tpu.data.davis import InferenceDataset
    from semi_supervised_vos_tpu.infer import strategies
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.models.convert import load_checkpoint_variables
    from semi_supervised_vos_tpu.models.vos_net import VOSNet

    model_name = model
    net = VOSNet(model=model_name)
    variables = load_checkpoint_variables(resume, model_name)

    additional_net = additional_variables = None
    if inference_strategy == "multimodel":
        additional_net = VOSNet(model=additional_model_type)
        additional_variables = load_checkpoint_variables(additional_resume, additional_model_type)

    data_dir = str(Path(data) / "JPEGImages/480p")
    dataset = InferenceDataset(
        data_dir, inference_strategy=inference_strategy, scale=scale
    )
    annotation_dir = Path(data) / "Annotations/480p"

    # The reference's fp16 autocast is CUDA-only (``inference_utils.py:35`` —
    # a no-op under --device cpu, where the reference computes f32). Mirror
    # that: bf16 features on TPU (the fp16-intent), f32 elsewhere — which
    # also makes CPU runs bit-faithful to the reference's CPU math.
    # SVOS_INFER_DTYPE overrides.
    import os

    import jax.numpy as jnp

    dtype = jnp.dtype(
        os.environ.get(
            "SVOS_INFER_DTYPE",
            "bfloat16" if jax.default_backend() == "tpu" else "float32",
        )
    )
    cfg = EngineConfig(
        ref_num=ref_num,
        frame_range=frame_range,
        temperature=temperature,
        sigma_1=sigma_1,
        sigma_2=sigma_2,
        probability_propagation=probability_propagation,
        compute_dtype=dtype,
    )

    progress = None
    if not disable:
        try:
            from tqdm import tqdm

            bar = tqdm(total=len(dataset))
            progress = bar.update
        except ImportError:
            pass

    from semi_supervised_vos_tpu.infer.batched import BATCHABLE_STRATEGIES

    # Two orthogonal multi-chip axes, composable under --video-batch:
    #   --dp-shards    lockstep video lanes over the mesh 'data' axis
    #   --bank-shards  each stream's bank pixel rows over the 'model' axis
    # With --video-batch > 1 they form the 2-D inference mesh
    # (parallel/batched_dp.py); without it, --bank-shards alone runs the
    # single-stream sharded engine (parallel/engine_sharded.py).
    mesh = None     # single-stream bank sharding (video_batch == 1)
    mesh_dp = None  # lockstep mesh: data=dp_shards × model=bank_shards
    if dp_shards < 1 or bank_shards < 1:
        raise click.ClickException(
            "--dp-shards and --bank-shards must be >= 1."
        )
    if dp_shards > 1 and video_batch <= 1:
        raise click.ClickException(
            "--dp-shards requires --video-batch > 1 (it shards lockstep "
            "video lanes over chips)."
        )
    if dp_shards * bank_shards > jax.device_count():
        raise click.ClickException(
            f"--dp-shards {dp_shards} x --bank-shards {bank_shards} exceeds "
            f"the {jax.device_count()} available device(s)."
        )
    if video_batch > 1 and (dp_shards > 1 or bank_shards > 1):
        from semi_supervised_vos_tpu.parallel.mesh import make_mesh

        mesh_dp = make_mesh(n_data=dp_shards, n_model=bank_shards)
    elif bank_shards > 1:
        from semi_supervised_vos_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=1, n_model=bank_shards)

    if inference_strategy == "multimodel" and video_batch > 1:
        from semi_supervised_vos_tpu.infer.batched import (
            inference_multimodel_batched,
        )

        inference_multimodel_batched(
            dataset, annotation_dir, save, net, variables,
            additional_net, additional_variables, cfg, video_batch,
            probability=probability_propagation, reduction=reduction,
            progress=progress, mesh=mesh_dp,
        )
    elif inference_strategy == "3-scale" and video_batch > 1:
        from semi_supervised_vos_tpu.infer.batched import inference_3_scale_batched

        inference_3_scale_batched(
            dataset, annotation_dir, save, net, variables, cfg, video_batch,
            scale=scale, progress=progress, mesh=mesh_dp,
        )
    elif inference_strategy in ("2-scale", "hor-2-scale") and video_batch > 1:
        from semi_supervised_vos_tpu.infer.batched import inference_2_scale_batched

        inference_2_scale_batched(
            dataset, annotation_dir, save, net, variables, cfg, video_batch,
            scale=scale, flip_pred=inference_strategy == "hor-2-scale",
            probability=probability_propagation, reduction=reduction,
            progress=progress, mesh=mesh_dp,
        )
    elif inference_strategy in BATCHABLE_STRATEGIES and video_batch > 1:
        from semi_supervised_vos_tpu.infer.batched import inference_batched

        inference_batched(
            dataset, annotation_dir, save, net, variables, cfg, video_batch,
            strategy=inference_strategy,
            probability=probability_propagation, reduction=reduction,
            progress=progress, mesh=mesh_dp,
        )
    elif inference_strategy == "single":
        strategies.inference_single(dataset, annotation_dir, save, net, variables, cfg, reduction, progress, mesh=mesh)
    elif inference_strategy == "hor-flip":
        strategies.inference_hor_flip(dataset, annotation_dir, save, net, variables, cfg, reduction, progress, mesh=mesh)
    elif inference_strategy == "vert-flip":
        strategies.inference_ver_flip(dataset, annotation_dir, save, net, variables, cfg, reduction, progress, mesh=mesh)
    elif inference_strategy == "2-scale":
        strategies.inference_2_scale(dataset, annotation_dir, save, net, variables, cfg, scale, reduction, False, progress, mesh=mesh)
    elif inference_strategy == "hor-2-scale":
        strategies.inference_2_scale(dataset, annotation_dir, save, net, variables, cfg, scale, reduction, True, progress, mesh=mesh)
    elif inference_strategy == "multimodel":
        strategies.inference_multimodel(dataset, annotation_dir, save, net, variables,
                                        additional_net, additional_variables, cfg, reduction, progress, mesh=mesh)
    elif inference_strategy == "3-scale":
        strategies.inference_3_scale(dataset, annotation_dir, save, net, variables, cfg, scale, progress, mesh=mesh)

    logger.info("Inference done.")
