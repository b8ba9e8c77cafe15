"""Visualization CLI + renderers (reference ``visualization.py`` and
``src/visualization/{overlay,side_by_side,prediction_only}.py``).

The reference shells out to the ffmpeg binary; this environment has none, so
``viz/render.py`` drives OpenCV's VideoWriter with the same pipelines. These
tests exercise all three render modes through the Click CLI on a tiny
synthetic prediction/source pair and decode the written videos back to check
geometry and the documented compositing semantics (background transparent,
foreground alpha 128; nearest pred upsizing; pred|src horizontal stack).
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

# load the repo's CLI by explicit path: the reference-parity shims put
# /root/reference on sys.path, where a same-named ``visualization.py``
# (importing the absent ffmpeg binding) would win a bare import
_spec = importlib.util.spec_from_file_location(
    "svos_visualization_cli", Path(__file__).resolve().parents[1] / "visualization.py"
)
viz_cli = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(viz_cli)


@pytest.fixture()
def frames(tmp_path):
    """4 source JPEGs (32x48) + 4 palette prediction PNGs (16x24 — half
    resolution, like feature-grid masks saved small)."""
    src_dir = tmp_path / "src"
    pred_dir = tmp_path / "pred"
    src_dir.mkdir()
    pred_dir.mkdir()
    rng = np.random.default_rng(7)
    palette = [0, 0, 0, 255, 0, 0] + [0] * (254 * 3)
    for t in range(4):
        src = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
        Image.fromarray(src).save(src_dir / f"{t:05d}.jpg", quality=95)
        mask = np.zeros((16, 24), np.uint8)
        mask[4 : 8 + t, 6:18] = 1  # moving foreground blob
        p = Image.fromarray(mask, mode="P")
        p.putpalette(palette)
        p.save(pred_dir / f"{t:05d}.png")
    return src_dir, pred_dir


def _read_video(path):
    import cv2

    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    return frames


@pytest.mark.parametrize("bw", [False, True])
def test_overlay(frames, tmp_path, bw):
    src_dir, pred_dir = frames
    out = tmp_path / "overlay.mp4"
    args = ["overlay", "-p", str(pred_dir), "-s", str(src_dir), "-o", str(out)]
    args += ["--bw"] if bw else ["--color"]
    res = CliRunner().invoke(viz_cli.cli, args, catch_exceptions=False)
    assert res.exit_code == 0 and out.exists()
    decoded = _read_video(out)
    assert len(decoded) == 4
    assert decoded[0].shape == (32, 48, 3)  # source resolution
    # foreground region is red-shifted (alpha 128 of pure red in BGR),
    # background untouched by the compositing (codec-lossy, so compare means)
    fg = decoded[0][8:16, 12:36]
    bg = decoded[0][24:, :]
    assert fg[:, :, 2].mean() > fg[:, :, 0].mean() + 30  # R >> B inside mask
    if bw:
        assert abs(bg[:, :, 0].mean() - bg[:, :, 2].mean()) < 6  # grey bg


def test_side_by_side(frames, tmp_path):
    src_dir, pred_dir = frames
    out = tmp_path / "sbs.mp4"
    res = CliRunner().invoke(
        viz_cli.cli,
        ["side-by-side", "-p", str(pred_dir), "-s", str(src_dir), "-o", str(out)],
        catch_exceptions=False,
    )
    assert res.exit_code == 0
    decoded = _read_video(out)
    assert len(decoded) == 4
    assert decoded[0].shape == (32, 96, 3)  # pred | src, double width
    left = decoded[0][:, :48]
    # left half is the mask: red blob on black
    assert left[8:16, 12:36, 2].mean() > 120
    assert left[24:, :, :].mean() < 40


def test_prediction_only(frames, tmp_path):
    _, pred_dir = frames
    out = tmp_path / "pred.mp4"
    res = CliRunner().invoke(
        viz_cli.cli,
        ["prediction-only", "-p", str(pred_dir), "-o", str(out)],
        catch_exceptions=False,
    )
    assert res.exit_code == 0
    decoded = _read_video(out)
    assert len(decoded) == 4
    assert decoded[0].shape == (16, 24, 3)  # native mask resolution
    assert decoded[0][4:8, 6:18, 2].mean() > 120  # red blob survives encode
