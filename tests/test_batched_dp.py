"""Data-parallel lockstep inference (lanes sharded over the mesh) equals the
single-chip batched engine, lane for lane — including the padded-batch path
(videos not divisible by the shard count) and the fused kernel per shard."""

import numpy as np
import pytest
from PIL import Image

from tests.helpers import make_davis_dataset, make_reference_checkpoint


def _net_and_vars():
    import jax
    import numpy as np

    from semi_supervised_vos_tpu.models.vos_net import VOSNet

    net = VOSNet(model="resnet18")
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    return net, variables


def _labels(b, h, w):
    label = np.zeros((b, h, w), np.int32)
    for i in range(b):
        label[i, 10 + 2 * i : 40 + 2 * i, 12 : 50 + 3 * i] = 1 + (i % 2)
    return label


@pytest.mark.parametrize("prob", [False, True])
def test_dp_engine_matches_single(rng, prob):
    """fusion=None lanes over a 4-way data mesh (3 videos -> padded to 4)
    == the single-chip batched engine, in both propagation modes."""
    import jax

    from semi_supervised_vos_tpu.infer.batched import BatchedPropagationEngine
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.parallel.batched_dp import (
        DataParallelBatchedEngine,
    )
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh

    h, w, b, n_frames = 64, 80, 3, 8
    net, variables = _net_and_vars()
    cfg = EngineConfig(
        use_pallas=False, compute_dtype=jax.numpy.float32,
        probability_propagation=prob,
    )
    frames = rng.integers(0, 255, (n_frames, b, h, w, 3), dtype=np.uint8)
    labels = _labels(b, h, w)

    single = BatchedPropagationEngine(net, variables, (h, w), b, cfg)
    st = single.start_videos(frames[0], labels)
    ref_masks, st = single.step_chunk_small(frames[1:], st, 1)
    ref_masks = np.asarray(ref_masks)

    mesh = make_mesh(n_data=4, n_model=1)
    dp = DataParallelBatchedEngine(net, variables, (h, w), b, cfg, mesh=mesh)
    assert dp.b_pad == 4 and dp.inner.b == 1  # padded + one lane per shard
    dst = dp.start_videos(frames[0], labels)
    got_masks, dst = dp.step_chunk_small(frames[1:], dst, 1)
    got_masks = np.asarray(got_masks)

    assert got_masks.shape == ref_masks.shape
    np.testing.assert_array_equal(got_masks, ref_masks)


@pytest.mark.parametrize("prob", [False, True])
def test_dp_engine_fused_lanes(rng, prob):
    """hor-flip fusion (lanes=2): lane groups stay shard-local and the fused
    per-video masks match the single-chip engine exactly."""
    import jax

    from semi_supervised_vos_tpu.infer.batched import (
        BatchedPropagationEngine,
        LaneFusion,
    )
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.parallel.batched_dp import (
        DataParallelBatchedEngine,
    )
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh

    h, w, videos, n_frames = 64, 80, 2, 6
    lanes = 2
    b = videos * lanes
    net, variables = _net_and_vars()
    cfg = EngineConfig(
        use_pallas=False, compute_dtype=jax.numpy.float32,
        probability_propagation=prob,
    )
    fusion = LaneFusion(
        pred_flips=(None, "h"), probability=prob, reduction="mean"
    )

    vids = rng.integers(0, 255, (n_frames, videos, h, w, 3), dtype=np.uint8)
    # lane layout is video-major: (v0, v0-flipped, v1, v1-flipped)
    frames = np.stack(
        [
            np.stack([x for v in range(videos) for x in (f[v], f[v, :, ::-1])])
            for f in vids
        ]
    )
    vlabels = _labels(videos, h, w)
    labels = np.stack(
        [x for v in range(videos) for x in (vlabels[v], vlabels[v][:, ::-1])]
    )

    single = BatchedPropagationEngine(
        net, variables, (h, w), b, cfg, fusion=fusion
    )
    st = single.start_videos(frames[0], labels)
    ref_masks, st = single.step_chunk(frames[1:], st, 1)
    ref_masks = np.asarray(ref_masks)
    assert ref_masks.shape == (n_frames - 1, videos, h, w)

    mesh = make_mesh(n_data=2, n_model=1)
    dp = DataParallelBatchedEngine(
        net, variables, (h, w), b, cfg, fusion=fusion, mesh=mesh
    )
    assert dp.inner.b == 2  # one whole video (2 lanes) per shard
    dst = dp.start_videos(frames[0], labels)
    got_masks, dst = dp.step_chunk(frames[1:], dst, 1)
    got_masks = np.asarray(got_masks)

    np.testing.assert_array_equal(got_masks, ref_masks)


def test_dp_engine_kernel_path(rng):
    """The production TPU path — the fused bank-direct kernel running
    UNCHANGED per shard under shard_map (interpret mode here) — agrees with
    the single-chip jnp engine."""
    import jax

    from semi_supervised_vos_tpu.infer.batched import BatchedPropagationEngine
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.parallel.batched_dp import (
        DataParallelBatchedEngine,
    )
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh

    h, w, b, n_frames = 64, 80, 2, 5
    net, variables = _net_and_vars()
    jcfg = EngineConfig(use_pallas=False, compute_dtype=jax.numpy.float32)
    frames = rng.integers(0, 255, (n_frames, b, h, w, 3), dtype=np.uint8)
    labels = _labels(b, h, w)

    single = BatchedPropagationEngine(net, variables, (h, w), b, jcfg)
    st = single.start_videos(frames[0], labels)
    ref_masks, st = single.step_chunk_small(frames[1:], st, 1)
    ref_masks = np.asarray(ref_masks)

    mesh = make_mesh(n_data=2, n_model=1)
    kcfg = EngineConfig(use_pallas=True, compute_dtype=jax.numpy.float32)
    dp = DataParallelBatchedEngine(
        net, variables, (h, w), b, kcfg, mesh=mesh, interpret=True
    )
    assert dp.inner._use_pallas
    dst = dp.start_videos(frames[0], labels)
    got_masks, dst = dp.step_chunk_small(frames[1:], dst, 1)
    got_masks = np.asarray(got_masks)

    # bf16 kernel labels vs f32 jnp: argmax near-ties may flip a few pixels
    agreement = (got_masks == ref_masks).mean()
    assert agreement > 0.995, agreement


@pytest.mark.parametrize("prob,n_bank", [(False, 4), (True, 4), (False, 3)])
def test_2d_mesh_engine_matches_single(rng, prob, n_bank):
    """The composed 2-D mesh — lanes over data=2 × bank pixel rows over
    model=n_bank (incl. a non-power-of-2 split with an uneven last shard) —
    equals the single-chip batched engine (jnp distributed-softmax fallback;
    near-tie argmax pixels aside)."""
    import jax

    from semi_supervised_vos_tpu.infer.batched import BatchedPropagationEngine
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.parallel.batched_dp import (
        DataParallelBatchedEngine,
    )
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh

    h, w, b, n_frames = 64, 80, 2, 6
    net, variables = _net_and_vars()
    cfg = EngineConfig(
        use_pallas=False, compute_dtype=jax.numpy.float32,
        probability_propagation=prob,
    )
    frames = rng.integers(0, 255, (n_frames, b, h, w, 3), dtype=np.uint8)
    labels = _labels(b, h, w)

    single = BatchedPropagationEngine(net, variables, (h, w), b, cfg)
    st = single.start_videos(frames[0], labels)
    ref_masks, st = single.step_chunk_small(frames[1:], st, 1)
    ref_masks = np.asarray(ref_masks)

    mesh = make_mesh(n_data=2, n_model=n_bank)
    dp = DataParallelBatchedEngine(net, variables, (h, w), b, cfg, mesh=mesh)
    assert dp.inner._bank_axis == "model" and dp.inner.b == 1
    # bank state rows shard over model: local p_loc x n shards >= P
    assert dp.inner.p_loc * n_bank >= dp.inner.p
    dst = dp.start_videos(frames[0], labels)
    got_masks, dst = dp.step_chunk_small(frames[1:], dst, 1)
    got_masks = np.asarray(got_masks)

    assert got_masks.shape == ref_masks.shape
    agreement = (got_masks == ref_masks).mean()
    assert agreement > 0.999, agreement


def test_2d_mesh_engine_kernel_path(rng):
    """The production TPU path of the 2-D mesh: the fused bank-direct kernel
    in STATS mode per (data, model) shard + pmax/psum combine over model
    (interpret mode here) agrees with the single-chip jnp engine."""
    import jax

    from semi_supervised_vos_tpu.infer.batched import BatchedPropagationEngine
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.parallel.batched_dp import (
        DataParallelBatchedEngine,
    )
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh

    h, w, b, n_frames = 64, 80, 2, 5
    net, variables = _net_and_vars()
    jcfg = EngineConfig(use_pallas=False, compute_dtype=jax.numpy.float32)
    frames = rng.integers(0, 255, (n_frames, b, h, w, 3), dtype=np.uint8)
    labels = _labels(b, h, w)

    single = BatchedPropagationEngine(net, variables, (h, w), b, jcfg)
    st = single.start_videos(frames[0], labels)
    ref_masks, st = single.step_chunk_small(frames[1:], st, 1)
    ref_masks = np.asarray(ref_masks)

    mesh = make_mesh(n_data=2, n_model=2)
    kcfg = EngineConfig(use_pallas=True, compute_dtype=jax.numpy.float32)
    dp = DataParallelBatchedEngine(
        net, variables, (h, w), b, kcfg, mesh=mesh, interpret=True
    )
    assert dp.inner._use_pallas and dp.inner._bank_axis == "model"
    dst = dp.start_videos(frames[0], labels)
    got_masks, dst = dp.step_chunk_small(frames[1:], dst, 1)
    got_masks = np.asarray(got_masks)

    # bf16 kernel labels vs f32 jnp: argmax near-ties may flip a few pixels
    agreement = (got_masks == ref_masks).mean()
    assert agreement > 0.995, agreement


def test_2d_mesh_fused_lanes(rng):
    """hor-flip fusion on the 2-D mesh: per-video fused masks match the
    single-chip fused engine."""
    import jax

    from semi_supervised_vos_tpu.infer.batched import (
        BatchedPropagationEngine,
        LaneFusion,
    )
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.parallel.batched_dp import (
        DataParallelBatchedEngine,
    )
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh

    h, w, videos, n_frames = 64, 80, 2, 5
    b = videos * 2
    net, variables = _net_and_vars()
    cfg = EngineConfig(use_pallas=False, compute_dtype=jax.numpy.float32)
    fusion = LaneFusion(pred_flips=(None, "h"))

    vids = rng.integers(0, 255, (n_frames, videos, h, w, 3), dtype=np.uint8)
    frames = np.stack(
        [
            np.stack([x for v in range(videos) for x in (f[v], f[v, :, ::-1])])
            for f in vids
        ]
    )
    vlabels = _labels(videos, h, w)
    labels = np.stack(
        [x for v in range(videos) for x in (vlabels[v], vlabels[v][:, ::-1])]
    )

    single = BatchedPropagationEngine(
        net, variables, (h, w), b, cfg, fusion=fusion
    )
    st = single.start_videos(frames[0], labels)
    ref_masks, st = single.step_chunk(frames[1:], st, 1)
    ref_masks = np.asarray(ref_masks)

    mesh = make_mesh(n_data=2, n_model=2)
    dp = DataParallelBatchedEngine(
        net, variables, (h, w), b, cfg, fusion=fusion, mesh=mesh
    )
    dst = dp.start_videos(frames[0], labels)
    got_masks, dst = dp.step_chunk(frames[1:], dst, 1)
    got_masks = np.asarray(got_masks)

    agreement = (got_masks == ref_masks).mean()
    assert agreement > 0.999, agreement


def test_dp_runner_matches_single_chip(tmp_path, rng):
    """The generic batched runner with a data mesh writes bit-identical
    predictions to its single-chip run (incl. mixed video lengths and a
    video count that does not divide the shard count)."""
    import jax

    from semi_supervised_vos_tpu.data.davis import InferenceDataset
    from semi_supervised_vos_tpu.infer.batched import inference_batched
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.models.convert import load_torch_checkpoint
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a",), frames=5, size=(64, 80))
    make_davis_dataset(root, videos=("b", "c"), frames=4, size=(64, 80))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")

    net = VOSNet(model="resnet18")
    variables = load_torch_checkpoint(str(ckpt), "resnet18")
    cfg = EngineConfig(compute_dtype=jax.numpy.float32)

    outs = {}
    for name, mesh in (
        ("single", None),
        ("dp", make_mesh(n_data=2, n_model=1)),
    ):
        out = tmp_path / name
        dataset = InferenceDataset(str(root / "JPEGImages/480p"))
        inference_batched(
            dataset, root / "Annotations/480p", out, net, variables, cfg,
            video_batch=3, strategy="single", mesh=mesh,
        )
        outs[name] = out

    for video in ("a", "b", "c"):
        s_files = sorted((outs["single"] / video).glob("*.png"))
        d_files = sorted((outs["dp"] / video).glob("*.png"))
        assert [p.name for p in s_files] == [p.name for p in d_files]
        for sf, df in zip(s_files, d_files):
            np.testing.assert_array_equal(
                np.asarray(Image.open(sf)), np.asarray(Image.open(df)),
                err_msg=f"{video}/{sf.name}",
            )


def test_dp_shards_cli(tmp_path, rng):
    """--video-batch × --dp-shards through the CLI impl end to end."""
    import click
    import pytest as _pytest

    from semi_supervised_vos_tpu.cli.inference import inference_command_impl

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a", "b"), frames=4, size=(64, 80))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")

    out = tmp_path / "out"
    inference_command_impl(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        save=str(out), device="cpu", inference_strategy="hor-flip",
        additional_resume=None, additional_model_type="resnet18",
        probability_propagation=False, scale=1.15, reduction="mean",
        disable=True, video_batch=2, dp_shards=2,
    )
    for video in ("a", "b"):
        files = sorted((out / video).glob("*.png"))
        assert len(files) == 4, files

    # guard rails: --dp-shards without --video-batch; dp x bank > devices
    with _pytest.raises(click.ClickException):
        inference_command_impl(
            ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
            temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
            save=str(tmp_path / "x"), device="cpu",
            inference_strategy="single", additional_resume=None,
            additional_model_type="resnet18", probability_propagation=False,
            scale=1.15, reduction="mean", disable=True, dp_shards=2,
        )
    with _pytest.raises(click.ClickException):
        inference_command_impl(
            ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
            temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
            save=str(tmp_path / "y"), device="cpu",
            inference_strategy="single", additional_resume=None,
            additional_model_type="resnet18", probability_propagation=False,
            scale=1.15, reduction="mean", disable=True, video_batch=2,
            dp_shards=4, bank_shards=4,
        )


def test_2d_mesh_cli(tmp_path, rng):
    """--video-batch × --dp-shards × --bank-shards (the 2-D inference mesh)
    through the CLI impl end to end: predictions match the single-chip run."""
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a", "b"), frames=4, size=(64, 80))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")

    outs = {}
    for name, extra in (
        ("single", {}),
        ("mesh2d", dict(dp_shards=2, bank_shards=2)),
    ):
        out = tmp_path / name
        inference_command_impl(
            ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
            temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
            save=str(out), device="cpu", inference_strategy="single",
            additional_resume=None, additional_model_type="resnet18",
            probability_propagation=False, scale=1.15, reduction="mean",
            disable=True, video_batch=2, **extra,
        )
        outs[name] = out

    for video in ("a", "b"):
        s_files = sorted((outs["single"] / video).glob("*.png"))
        m_files = sorted((outs["mesh2d"] / video).glob("*.png"))
        assert len(s_files) == 4 and [p.name for p in s_files] == [
            p.name for p in m_files
        ]
        for sf, mf in zip(s_files, m_files):
            a, b2 = np.asarray(Image.open(sf)), np.asarray(Image.open(mf))
            assert (a == b2).mean() > 0.999, (video, sf.name)


def test_2d_mesh_cli_2scale(tmp_path, rng):
    """The 2-D mesh composes with the two-engine 2-scale runner (each
    resolution's engine bank-shards independently)."""
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a", "b"), frames=3, size=(64, 80))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")

    outs = {}
    for name, extra in (
        ("single", {}),
        ("mesh2d", dict(dp_shards=2, bank_shards=2)),
    ):
        out = tmp_path / name
        inference_command_impl(
            ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
            temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
            save=str(out), device="cpu", inference_strategy="2-scale",
            additional_resume=None, additional_model_type="resnet18",
            probability_propagation=False, scale=1.15, reduction="mean",
            disable=True, video_batch=2, **extra,
        )
        outs[name] = out

    for video in ("a", "b"):
        s_files = sorted((outs["single"] / video).glob("*.png"))
        m_files = sorted((outs["mesh2d"] / video).glob("*.png"))
        assert len(s_files) == 3 and [p.name for p in s_files] == [
            p.name for p in m_files
        ]
        for sf, mf in zip(s_files, m_files):
            a, b2 = np.asarray(Image.open(sf)), np.asarray(Image.open(mf))
            assert (a == b2).mean() > 0.999, (video, sf.name)
