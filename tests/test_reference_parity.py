"""Ultimate offline parity check: run the ACTUAL reference implementation
(with environment shims) and our framework on the same synthetic dataset
with the same converted checkpoint, and compare predictions pixel-wise."""

import numpy as np
import pytest
import torch
from PIL import Image

from tests.helpers import make_davis_dataset, make_reference_checkpoint
from tests import reference_shims


N_FRAMES = 20  # > 15: exercises the dense/sparse spatial-weight switch and
               # the sparse linspace sampling (predict.py:61-66, 74-89)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("refparity")
    davis = root / "davis"
    make_davis_dataset(davis, videos=("a", "b"), frames=N_FRAMES, size=(96, 112))
    ckpt = root / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")
    return root, davis, ckpt


def run_reference(davis, ckpt, save, probability=False, strategy="single", reduction="mean"):
    reference_shims.install()
    from src.inference import inference_command_impl as ref_infer

    # the reference inference builds VOSNet(model) with a pretrained
    # download — patch resnet18 to pretrained=False for offline runs
    import src.model.vos_net as ref_vosnet
    import src.model.backbone.resnet as ref_resnet

    orig = ref_resnet.resnet18
    ref_resnet.resnet18 = lambda pretrained=False, **kw: orig(False, **kw)
    ref_vosnet.resnet18 = ref_resnet.resnet18
    try:
        ref_infer(
            ref_num=9, data=str(davis), resume=str(ckpt), model="resnet18",
            temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
            save=str(save), device="cpu", inference_strategy=strategy,
            additional_resume=str(ckpt), additional_model_type="resnet18",
            probability_propagation=probability, scale=1.15, reduction=reduction,
            disable=True,
        )
    finally:
        ref_resnet.resnet18 = orig
        ref_vosnet.resnet18 = orig


def run_ours(davis, ckpt, save, probability=False, strategy="single", reduction="mean"):
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl

    inference_command_impl(
        ref_num=9, data=str(davis), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        save=str(save), device="cpu", inference_strategy=strategy,
        additional_resume=str(ckpt), additional_model_type="resnet18",
        probability_propagation=probability, scale=1.15, reduction=reduction,
        disable=True,
    )


def _compare(ref_out, our_out, threshold=1.0):
    """Default demand is BIT-EXACT equality with the live reference: with
    --device cpu both sides compute f32 (the reference's fp16 autocast is
    CUDA-only and our engine mirrors that gate), and every strategy measured
    1.0 agreement over 40 frames. The former 0.995 floors existed only
    because our engine forced bf16 features on CPU — a deviation, now
    removed, not float noise."""
    total = agree = 0
    for video in ("a", "b"):
        ref_files = sorted((ref_out / video).glob("*.png"))
        our_files = sorted((our_out / video).glob("*.png"))
        assert [p.name for p in ref_files] == [p.name for p in our_files]
        assert len(ref_files) == N_FRAMES
        for rf, of in zip(ref_files, our_files):
            r = np.asarray(Image.open(rf))
            o = np.asarray(Image.open(of))
            assert r.shape == o.shape
            agree += (r == o).sum()
            total += r.size
    agreement = agree / total
    assert agreement >= threshold, f"pixel agreement {agreement:.4f}"
    return agreement


@pytest.mark.parametrize("probability", [False, True])
def test_single_strategy_matches_reference_implementation(fixture, probability):
    root, davis, ckpt = fixture
    ref_out = root / f"ref_out_{probability}"
    our_out = root / f"our_out_{probability}"
    run_reference(davis, ckpt, ref_out, probability)
    run_ours(davis, ckpt, our_out, probability)
    _compare(ref_out, our_out)  # bit-exact


@pytest.mark.parametrize("strategy", ["hor-flip", "2-scale", "multimodel", "3-scale"])
def test_multi_stream_strategies_match_reference(fixture, strategy):
    """Strategies without upstream bugs match the reference end-to-end
    (vert-flip / hor-2-scale / probability+flip deviate intentionally —
    see infer/strategies.py docstring)."""
    root, davis, ckpt = fixture
    ref_out = root / f"ref_{strategy}"
    our_out = root / f"our_{strategy}"
    run_reference(davis, ckpt, ref_out, strategy=strategy)
    run_ours(davis, ckpt, our_out, strategy=strategy)
    _compare(ref_out, our_out)  # bit-exact


def test_nondefault_hyperparameters_match_reference(fixture):
    """Parity holds off the default config too: smaller ref_num/frame_range
    (different sampling schedule), scaled temperature, swapped sigmas."""
    root, davis, ckpt = fixture
    reference_shims.install()
    from src.inference import inference_command_impl as ref_infer
    import src.model.vos_net as ref_vosnet
    import src.model.backbone.resnet as ref_resnet
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl

    kw = dict(
        ref_num=5, frame_range=12, temperature=2.5, sigma_1=5.0, sigma_2=30.0,
        data=str(davis), resume=str(ckpt), model="resnet18",
        device="cpu", inference_strategy="single",
        additional_model_type="resnet18",
        scale=1.15, disable=True,
    )
    ref_out = root / "ref_hp"
    our_out = root / "our_hp"

    orig = ref_resnet.resnet18
    ref_resnet.resnet18 = lambda pretrained=False, **k: orig(False, **k)
    ref_vosnet.resnet18 = ref_resnet.resnet18
    try:
        ref_infer(save=str(ref_out), additional_resume=str(ckpt),
                  probability_propagation=False, reduction="mean", **kw)
    finally:
        ref_resnet.resnet18 = orig
        ref_vosnet.resnet18 = orig
    inference_command_impl(save=str(our_out), additional_resume=str(ckpt),
                           probability_propagation=False, reduction="mean", **kw)
    _compare(ref_out, our_out)


# ---------------------------------------------------------------------------
# The remaining strategies carry documented intent-over-bug deviations
# (infer/strategies.py:17-27). To compare them live anyway, we run the ACTUAL
# reference with a minimal patch that fixes exactly the transposed-axis bug —
# verifying our output equals "the reference with its bug corrected", which
# pins the deviation to precisely what is documented and nothing more.
# ---------------------------------------------------------------------------


def _patched_fliplr_vertical(orig):
    """inference_ver_flip un-flips its vertically-flipped stream with
    ``torch.fliplr`` (``inference_utils.py:279``): on the (H, W) label-mode
    prediction that's a horizontal flip, and on the (1, d, H, W)
    probability-mode map it flips the *class* axis. The corrected unflip is
    vertical in both."""

    def fixed(x):
        if x.ndim == 2:
            return torch.flip(x, dims=(0,))
        if x.ndim == 4:
            return torch.flip(x, dims=(-2,))
        return orig(x)

    return fixed


def _patched_fliplr_horizontal(orig):
    """Probability-mode hor-flip hits the same bug: ``torch.fliplr`` on the
    (1, d, H, W) map flips the class axis; the corrected unflip is the W
    axis. 2-D calls (first-frame label mirroring) stay untouched."""

    def fixed(x):
        if x.ndim == 4:
            return torch.flip(x, dims=(-1,))
        return orig(x)

    return fixed


@pytest.mark.parametrize(
    "strategy,probability,reduction",
    [
        ("vert-flip", False, "mean"),
        ("vert-flip", True, "mean"),
        ("hor-flip", True, "mean"),
        ("hor-flip", True, "maximum"),
        ("hor-flip", True, "minimum"),
    ],
)
def test_flip_strategies_match_bugfixed_reference(fixture, strategy, probability, reduction):
    root, davis, ckpt = fixture
    tag = f"{strategy}_{probability}_{reduction}"
    ref_out = root / f"ref_{tag}"
    our_out = root / f"our_{tag}"

    patch = (
        _patched_fliplr_vertical if strategy == "vert-flip" else _patched_fliplr_horizontal
    )(torch.fliplr)
    orig_fliplr = torch.fliplr
    torch.fliplr = patch
    try:
        run_reference(davis, ckpt, ref_out, probability=probability,
                      strategy=strategy, reduction=reduction)
    finally:
        torch.fliplr = orig_fliplr
    run_ours(davis, ckpt, our_out, probability=probability,
             strategy=strategy, reduction=reduction)
    _compare(ref_out, our_out)  # bit-exact vs the bug-fixed reference


@pytest.mark.parametrize("reduction", ["mean", "maximum", "minimum"])
def test_2_scale_probability_matches_reference(fixture, reduction):
    """2-scale probability mode has no flips, hence no upstream bug: the
    live reference runs unpatched (covers all three fusion reductions)."""
    root, davis, ckpt = fixture
    ref_out = root / f"ref_2s_prob_{reduction}"
    our_out = root / f"our_2s_prob_{reduction}"
    run_reference(davis, ckpt, ref_out, probability=True,
                  strategy="2-scale", reduction=reduction)
    run_ours(davis, ckpt, our_out, probability=True,
             strategy="2-scale", reduction=reduction)
    _compare(ref_out, our_out)  # bit-exact


@pytest.mark.parametrize("probability", [False, True])
def test_hor_2_scale_matches_label_mirrored_reference(fixture, probability):
    """hor-2-scale mirrors its second input stream but not that stream's
    first-frame labels (``predict.py:136-142``); we mirror the labels to
    match the stream. Live comparison: wrap the reference's
    ``prepare_first_frame`` to mirror ``label_1hot_2``."""
    reference_shims.install()
    import src.model.predict as ref_predict
    import src.utils.inference_utils as ref_iu

    root, davis, ckpt = fixture
    tag = f"h2s_{probability}"
    ref_out = root / f"ref_{tag}"
    our_out = root / f"our_{tag}"

    orig_prepare = ref_predict.prepare_first_frame

    def mirrored(curr_video, save_prediction, annotation, sigma1=8, sigma2=21,
                 inference_strategy="single", probability_propagation=False,
                 scale=None):
        out = orig_prepare(curr_video, save_prediction, annotation, sigma1,
                           sigma2, inference_strategy, probability_propagation,
                           scale)
        if inference_strategy == "2-scale":
            # mirror the FULL-RES label, then downsample — matching how the
            # mirrored input stream itself is built (mirror before resize,
            # ``datasets.py:156-160``); flipping after the nearest downsample
            # picks different source pixels on non-divisible grids
            (l1, _), d, palette, wd, ws = out
            lab = np.asarray(Image.open(annotation))
            h, w = lab.shape
            h2 = int(np.ceil(h * 0.125 * scale))
            w2 = int(np.ceil(w * 0.125 * scale))
            label_t = torch.Tensor(lab.copy()).long()
            l2 = ref_predict.get_labels(torch.fliplr(label_t), d, h, w, h2, w2)
            out = (l1, l2), d, palette, wd, ws
        return out

    ref_iu.prepare_first_frame = mirrored
    try:
        run_reference(davis, ckpt, ref_out, probability=probability,
                      strategy="hor-2-scale")
    finally:
        ref_iu.prepare_first_frame = orig_prepare
    run_ours(davis, ckpt, our_out, probability=probability,
             strategy="hor-2-scale")
    # with f32 on both sides even the argmax-tie cascades that forced an
    # early-frames-only check in earlier rounds are gone: bit-exact
    _compare(ref_out, our_out)
