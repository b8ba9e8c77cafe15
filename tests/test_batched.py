"""Batched multi-video inference equals per-video single-engine inference."""

import numpy as np
import pytest
from PIL import Image

from tests.helpers import make_davis_dataset, make_reference_checkpoint


def test_batched_matches_single(tmp_path, rng):
    import jax

    from semi_supervised_vos_tpu.cli.inference import inference_command_impl
    from semi_supervised_vos_tpu.data.davis import InferenceDataset
    from semi_supervised_vos_tpu.infer.batched import inference_single_batched
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.models.convert import load_torch_checkpoint
    from semi_supervised_vos_tpu.models.vos_net import VOSNet

    root = tmp_path / "davis"
    # different lengths exercise the padded-tail path
    make_davis_dataset(root, videos=("a",), frames=6, size=(96, 112))
    make_davis_dataset(root, videos=("b", "c"), frames=4, size=(96, 112))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")

    # single-engine reference run (via the CLI impl)
    single_out = tmp_path / "single"
    inference_command_impl(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        save=str(single_out), device="cpu", inference_strategy="single",
        additional_resume=None, additional_model_type="resnet18",
        probability_propagation=False, scale=1.15, reduction="mean", disable=True,
    )

    # batched run
    net = VOSNet(model="resnet18")
    variables = load_torch_checkpoint(str(ckpt), "resnet18")
    dataset = InferenceDataset(str(root / "JPEGImages/480p"))
    batched_out = tmp_path / "batched"
    inference_single_batched(
        dataset, root / "Annotations/480p", batched_out, net, variables,
        # same config the CLI builds on CPU (f32 — the fp16-autocast
        # mirror is TPU-only since round 3)
        EngineConfig(compute_dtype=jax.numpy.float32), video_batch=3,
    )

    for video in ("a", "b", "c"):
        s_files = sorted((single_out / video).glob("*.png"))
        b_files = sorted((batched_out / video).glob("*.png"))
        assert [p.name for p in s_files] == [p.name for p in b_files]
        for sf, bf in zip(s_files, b_files):
            np.testing.assert_array_equal(
                np.asarray(Image.open(sf)), np.asarray(Image.open(bf)),
                err_msg=f"{video}/{sf.name}",
            )


def test_batched_mixed_resolutions(tmp_path, rng):
    """--video-batch with videos of different resolutions: groups run
    separately and each matches single-engine output shape-wise."""
    from semi_supervised_vos_tpu.data.davis import InferenceDataset
    from semi_supervised_vos_tpu.infer.batched import inference_single_batched
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.models.convert import load_torch_checkpoint
    from semi_supervised_vos_tpu.models.vos_net import VOSNet

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("small1", "small2"), frames=3, size=(64, 80))
    make_davis_dataset(root, videos=("big",), frames=4, size=(96, 112))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")

    net = VOSNet(model="resnet18")
    variables = load_torch_checkpoint(str(ckpt), "resnet18")
    dataset = InferenceDataset(str(root / "JPEGImages/480p"))
    out = tmp_path / "out"
    inference_single_batched(
        dataset, root / "Annotations/480p", out, net, variables,
        EngineConfig(), video_batch=4,
    )
    for video, n, hw in (("small1", 3, (64, 80)), ("small2", 3, (64, 80)), ("big", 4, (96, 112))):
        files = sorted((out / video).glob("*.png"))
        assert len(files) == n
        im = np.asarray(Image.open(files[-1]))
        assert im.shape == hw


@pytest.mark.parametrize(
    "strategy,probability",
    [("hor-flip", False), ("hor-flip", True), ("vert-flip", False)],
)
def test_batched_flip_strategies_match_single(tmp_path, strategy, probability):
    """--video-batch for the flip strategies: lockstep lanes equal the
    single-engine strategy output pixel-for-pixel (CPU jnp path)."""
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl
    from tests.helpers import make_davis_dataset, make_reference_checkpoint

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a",), frames=5, size=(96, 112))
    make_davis_dataset(root, videos=("b",), frames=3, size=(96, 112))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")

    kw = dict(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        device="cpu", inference_strategy=strategy,
        additional_resume=None, additional_model_type="resnet18",
        probability_propagation=probability, scale=1.15, reduction="mean",
        disable=True,
    )
    single_out = tmp_path / "single"
    inference_command_impl(save=str(single_out), video_batch=1, **kw)
    batched_out = tmp_path / "batched"
    inference_command_impl(save=str(batched_out), video_batch=2, **kw)

    for video in ("a", "b"):
        s_files = sorted((single_out / video).glob("*.png"))
        b_files = sorted((batched_out / video).glob("*.png"))
        assert [p.name for p in s_files] == [p.name for p in b_files]
        for sf, bf in zip(s_files, b_files):
            np.testing.assert_array_equal(
                np.asarray(Image.open(sf)), np.asarray(Image.open(bf)),
                err_msg=f"{strategy}/{video}/{sf.name}",
            )


@pytest.mark.parametrize("probability", [False, True])
def test_batched_multimodel_matches_single(tmp_path, probability):
    """--video-batch for multimodel: two per-model banks, feature-res device
    fusion — equals the single-engine strategy output."""
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl
    from tests.helpers import make_davis_dataset, make_reference_checkpoint

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a", "b"), frames=4, size=(96, 112))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")
    ckpt2 = tmp_path / "ckpt2.pth.tar"
    make_reference_checkpoint(ckpt2, "resnet18", seed=9)

    kw = dict(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        device="cpu", inference_strategy="multimodel",
        additional_resume=str(ckpt2), additional_model_type="resnet18",
        probability_propagation=probability, scale=1.15, reduction="mean",
        disable=True,
    )
    single_out = tmp_path / "single"
    inference_command_impl(save=str(single_out), video_batch=1, **kw)
    batched_out = tmp_path / "batched"
    inference_command_impl(save=str(batched_out), video_batch=2, **kw)

    for video in ("a", "b"):
        s_files = sorted((single_out / video).glob("*.png"))
        b_files = sorted((batched_out / video).glob("*.png"))
        assert [p.name for p in s_files] == [p.name for p in b_files]
        for sf, bf in zip(s_files, b_files):
            np.testing.assert_array_equal(
                np.asarray(Image.open(sf)), np.asarray(Image.open(bf)),
                err_msg=f"{video}/{sf.name}",
            )


@pytest.mark.parametrize(
    "strategy,probability",
    [("2-scale", False), ("2-scale", True), ("hor-2-scale", False), ("hor-2-scale", True)],
)
def test_batched_2_scale_matches_single(tmp_path, strategy, probability):
    """--video-batch for the two-resolution strategies equals the
    single-engine output."""
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl
    from tests.helpers import make_davis_dataset, make_reference_checkpoint

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a", "b"), frames=4, size=(96, 112))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")

    kw = dict(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        device="cpu", inference_strategy=strategy,
        additional_resume=None, additional_model_type="resnet18",
        probability_propagation=probability, scale=1.15, reduction="mean",
        disable=True,
    )
    single_out = tmp_path / "single"
    inference_command_impl(save=str(single_out), video_batch=1, **kw)
    batched_out = tmp_path / "batched"
    inference_command_impl(save=str(batched_out), video_batch=2, **kw)

    for video in ("a", "b"):
        s_files = sorted((single_out / video).glob("*.png"))
        b_files = sorted((batched_out / video).glob("*.png"))
        assert [p.name for p in s_files] == [p.name for p in b_files]
        for sf, bf in zip(s_files, b_files):
            np.testing.assert_array_equal(
                np.asarray(Image.open(sf)), np.asarray(Image.open(bf)),
                err_msg=f"{strategy}/{video}/{sf.name}",
            )


def test_batched_3_scale_matches_single(tmp_path):
    """--video-batch for 3-scale equals the single-engine output (incl. the
    hard-coded (480, 910) fuse resolution)."""
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl
    from tests.helpers import make_davis_dataset, make_reference_checkpoint

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a", "b"), frames=4, size=(96, 112))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")

    kw = dict(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        device="cpu", inference_strategy="3-scale",
        additional_resume=None, additional_model_type="resnet18",
        probability_propagation=False, scale=1.15, reduction="mean",
        disable=True,
    )
    single_out = tmp_path / "single"
    inference_command_impl(save=str(single_out), video_batch=1, **kw)
    batched_out = tmp_path / "batched"
    inference_command_impl(save=str(batched_out), video_batch=2, **kw)

    for video in ("a", "b"):
        s_files = sorted((single_out / video).glob("*.png"))
        b_files = sorted((batched_out / video).glob("*.png"))
        assert [p.name for p in s_files] == [p.name for p in b_files]
        for sf, bf in zip(s_files, b_files):
            np.testing.assert_array_equal(
                np.asarray(Image.open(sf)), np.asarray(Image.open(bf)),
                err_msg=f"3-scale/{video}/{sf.name}",
            )


def test_hbm_lanes_cap_clamps_1080p():
    """Lockstep lanes clamp to the per-chip HBM envelope, which scales with
    the feature-pixel count (2 lanes at 1080p — B=4 RESOURCE_EXHAUSTs at
    runtime; 1 lane at 4K; 10 at 480p) and with the data-mesh size."""
    from semi_supervised_vos_tpu.infer.batched import (
        _clamp_video_batch,
        _hbm_lanes_cap,
    )

    assert _hbm_lanes_cap((1080, 1920)) == 2
    assert _hbm_lanes_cap((2160, 3840)) == 1  # 4K: bigger than the envelope
    assert _hbm_lanes_cap((480, 854)) == 16  # the measured B=16 anchor
    # between the anchors the budget interpolates in LOG space (power law
    # through both measurements) — mid-band resolutions must not inherit
    # the full 480p budget (a hard step would allow 720p ~1.6x the
    # measured-safe 1080p lane-pixel total)
    lanes_720 = _hbm_lanes_cap((720, 1280))
    import math as _math

    from semi_supervised_vos_tpu.infer.batched import (
        _HBM_ANCHOR_P_LARGE,
        _HBM_ANCHOR_P_SMALL,
        _HBM_LANE_PX_LARGE,
        _HBM_LANE_PX_SMALL,
    )
    from semi_supervised_vos_tpu.models.resnet import out_spatial

    hd, wd = out_spatial(720, 1280)
    p720 = hd * wd
    frac = _math.log(p720 / _HBM_ANCHOR_P_SMALL) / _math.log(
        _HBM_ANCHOR_P_LARGE / _HBM_ANCHOR_P_SMALL
    )
    budget = _HBM_LANE_PX_SMALL * (
        _HBM_LANE_PX_LARGE / _HBM_LANE_PX_SMALL
    ) ** frac
    assert lanes_720 == int(budget) // p720
    assert lanes_720 * p720 < _HBM_LANE_PX_SMALL  # stricter than the step was
    # single-lane 1080p: groups of 2 videos
    assert _clamp_video_batch(4, 1, (1080, 1920)) == 2
    # hor-flip (2 lanes/video) at 1080p: one video per group
    assert _clamp_video_batch(4, 2, (1080, 1920)) == 1
    # the envelope applies PER CHIP before scaling by the data mesh: 4
    # shards carry 4x the lanes...
    assert _clamp_video_batch(8, 1, (1080, 1920), n_chips=4) == 8
    # ...but a per-chip overflow cannot be bought back with more chips
    # (padding distributes videos per chip): 2-lane 1080p caps at n_chips
    assert _clamp_video_batch(8, 2, (1080, 1920), n_chips=2) == 2
    # 480p runs the measured protocols unclamped (B=8 single and 2-lane)
    assert _clamp_video_batch(8, 1, (480, 854)) == 8
    assert _clamp_video_batch(8, 2, (480, 854)) == 8
    # 2-scale pair: the larger grid governs
    assert _clamp_video_batch(4, 2, (480, 854), (1080, 1920)) == 1
