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


@pytest.fixture()
def stub_ffmpeg(tmp_path, monkeypatch):
    """A fake ffmpeg binary that records its argv and touches the output
    (the last argument), selected via SVOS_FFMPEG — lets the ffmpeg command
    construction be tested on a host without ffmpeg."""
    rec = tmp_path / "ffmpeg_args.txt"
    stub = tmp_path / "ffmpeg"
    stub.write_text(
        "#!/bin/sh\n"
        f'printf \'%s\\n\' "$@" > "{rec}"\n'
        'for last; do :; done\n'
        'touch "$last"\n'
    )
    stub.chmod(0o755)
    monkeypatch.setenv("SVOS_FFMPEG", str(stub))
    return rec


def test_ffmpeg_overlay_command(frames, tmp_path, stub_ffmpeg):
    """With a binary present the overlay drives ffmpeg exactly like the
    reference graph (``overlay.py:45-56``): .noback.png predictions as
    input 0, source jpgs as input 1, source as the overlay main stream —
    and the temporary .noback files are cleaned up (``overlay.py:29-32``)."""
    from semi_supervised_vos_tpu.viz.render import render_overlay

    src_dir, pred_dir = frames
    out = tmp_path / "overlay_ffmpeg.mp4"
    render_overlay(pred_dir, src_dir, out, fps=10, bw=True)
    assert out.exists()
    args = stub_ffmpeg.read_text().splitlines()
    assert f"{pred_dir}/*.noback.png" in args
    assert f"{src_dir}/*.jpg" in args
    graph = args[args.index("-filter_complex") + 1]
    assert graph == "[1:v]format=gray[s];[s][0:v]overlay[out]"
    assert args[args.index("-framerate") + 1] == "10"
    assert str(out) == args[-1]
    # .noback.png intermediates removed after the run
    assert not list(pred_dir.glob("*.noback.png"))


def test_ffmpeg_side_by_side_and_prediction_only(frames, tmp_path, stub_ffmpeg):
    from semi_supervised_vos_tpu.viz.render import (
        render_prediction_only,
        render_side_by_side,
    )

    src_dir, pred_dir = frames
    out = tmp_path / "sbs_ffmpeg.mp4"
    render_side_by_side(pred_dir, src_dir, out, fps=15)
    args = stub_ffmpeg.read_text().splitlines()
    assert f"{pred_dir}/*.png" in args and f"{src_dir}/*.jpg" in args
    assert args[args.index("-filter_complex") + 1] == "[0:v][1:v]hstack[out]"
    assert out.exists()

    out2 = tmp_path / "pred_ffmpeg.mp4"
    render_prediction_only(pred_dir, out2, fps=15)
    args = stub_ffmpeg.read_text().splitlines()
    assert f"{pred_dir}/*.png" in args and "-filter_complex" not in args
    assert out2.exists()


def test_ffmpeg_disabled_forces_opencv(frames, tmp_path, monkeypatch):
    """SVOS_FFMPEG=0 keeps the OpenCV fallback even if a binary exists."""
    monkeypatch.setenv("SVOS_FFMPEG", "0")
    from semi_supervised_vos_tpu.viz.render import ffmpeg_binary, render_prediction_only

    assert ffmpeg_binary() is None
    _, pred_dir = frames
    out = tmp_path / "pred_cv.mp4"
    render_prediction_only(pred_dir, out)
    assert len(_read_video(out)) == 4


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
