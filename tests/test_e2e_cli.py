"""End-to-end CLI tests: inference → palette PNGs → evaluation on a
synthetic DAVIS-layout dataset (the CPU-runnable config from BASELINE.json)."""

import numpy as np
import pytest
from PIL import Image

from tests.helpers import make_davis_dataset, make_reference_checkpoint


@pytest.fixture(scope="module")
def davis_and_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("davis")
    data = make_davis_dataset(
        root, videos=("blackswan", "camel"), frames=5, size=(128, 160)
    )
    ckpt = root / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")
    return root, data, ckpt


def run_inference(root, ckpt, save, strategy, probability=False):
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl

    inference_command_impl(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        save=str(save), device="cpu", inference_strategy=strategy,
        additional_resume=str(ckpt), additional_model_type="resnet18",
        probability_propagation=probability, scale=1.15, reduction="mean",
        disable=True,
    )


def test_single_strategy_end_to_end(davis_and_ckpt, tmp_path):
    root, data, ckpt = davis_and_ckpt
    save = tmp_path / "out"
    run_inference(root, ckpt, save, "single")

    for video, frames in data.items():
        out = sorted((save / video).glob("*.png"))
        assert [p.name for p in out] == [f"{i:05d}.png" for i in range(len(frames))]
        # 00000.png is the copied annotation
        ann = np.asarray(Image.open(out[0]))
        np.testing.assert_array_equal(ann, data[video][0][1])
        # predictions are P-mode with the palette and only valid classes
        pred = Image.open(out[1])
        assert pred.mode == "P"
        assert np.asarray(pred).max() <= 1

    from semi_supervised_vos_tpu.eval.evaluation import evaluation_command_impl

    j, f, jf = evaluation_command_impl(
        root / "Annotations" / "480p", save, disable=True, processes=1
    )
    assert 0.0 <= j <= 1.0 and 0.0 <= f <= 1.0
    # the object is a distinctly-coloured square: even a *random* backbone
    # separates it somewhat (trained-backbone quality is exercised by the
    # training e2e test), so propagation must beat chance
    assert j > 0.4, f"J too low: {j}"


@pytest.mark.parametrize(
    "strategy,probability",
    [
        ("hor-flip", False),
        ("vert-flip", False),
        ("2-scale", False),
        ("hor-2-scale", False),
        ("multimodel", False),
        ("3-scale", False),
        ("hor-flip", True),
    ],
)
def test_all_strategies_produce_outputs(davis_and_ckpt, tmp_path, strategy, probability):
    root, data, ckpt = davis_and_ckpt
    save = tmp_path / f"out-{strategy}-{probability}"
    run_inference(root, ckpt, save, strategy, probability)
    for video, frames in data.items():
        out = sorted((save / video).glob("*.png"))
        assert len(out) == len(frames), (video, [p.name for p in out])
        arr = np.asarray(Image.open(out[-1]))
        if strategy == "3-scale":
            assert arr.shape == (480, 910)  # reference's hard-coded fuse size
        else:
            assert arr.shape == frames[0][1].shape


@pytest.mark.parametrize(
    "strategy", ["hor-flip", "vert-flip", "2-scale", "multimodel", "3-scale"]
)
def test_bank_shards_strategy_matrix(davis_and_ckpt, tmp_path, strategy):
    """--bank-shards composes with every strategy (the round-2 fence is
    lifted): each stream's bank shards identically over the mesh's model
    axis and the fusion tail is unchanged. Sharded output == unsharded
    output through the real CLI path on the virtual mesh."""
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl

    root, data, ckpt = davis_and_ckpt
    plain = tmp_path / f"plain-{strategy}"
    sharded = tmp_path / f"sharded-{strategy}"
    run_inference(root, ckpt, plain, strategy)
    inference_command_impl(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        save=str(sharded), device="cpu", inference_strategy=strategy,
        additional_resume=str(ckpt), additional_model_type="resnet18",
        probability_propagation=False, scale=1.15, reduction="mean",
        disable=True, bank_shards=2,
    )
    for video in data:
        for p in sorted((plain / video).glob("*.png")):
            a = np.asarray(Image.open(p))
            b = np.asarray(Image.open(sharded / video / p.name))
            assert (a == b).mean() > 0.999, p


def test_bank_shards_with_video_batch(davis_and_ckpt, tmp_path):
    """--bank-shards composed with --video-batch (lockstep lanes whose banks
    pixel-shard over the mesh 'model' axis) runs through the CLI and writes
    every prediction; exact equality vs single-chip is pinned in
    tests/test_batched_dp.py."""
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl

    root, data, ckpt = davis_and_ckpt
    out = tmp_path / "x"
    inference_command_impl(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        save=str(out), device="cpu",
        inference_strategy="single", additional_resume=str(ckpt),
        additional_model_type="resnet18", probability_propagation=False,
        scale=1.15, reduction="mean", disable=True,
        bank_shards=2, video_batch=2,
    )
    for video, frames in data.items():
        files = sorted((out / video).glob("*.png"))
        assert len(files) == len(frames), (video, files)


def test_bank_sharded_single_matches_unsharded(davis_and_ckpt, tmp_path):
    """--bank-shards 4 (memory bank over the virtual mesh's model axis,
    distributed online softmax) produces the same predictions as the
    single-chip engine through the real CLI path."""
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl

    root, data, ckpt = davis_and_ckpt
    plain, sharded = tmp_path / "plain", tmp_path / "sharded"
    run_inference(root, ckpt, plain, "single")
    inference_command_impl(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        save=str(sharded), device="cpu", inference_strategy="single",
        additional_resume=str(ckpt), additional_model_type="resnet18",
        probability_propagation=False, scale=1.15, reduction="mean",
        disable=True, bank_shards=4,
    )
    for video in data:
        for p in sorted((plain / video).glob("*.png")):
            a = np.asarray(Image.open(p))
            b = np.asarray(Image.open(sharded / video / p.name))
            # identical math up to f32 reduction order in the distributed
            # softmax; argmax ties are the only divergence channel
            assert (a == b).mean() > 0.999, p
