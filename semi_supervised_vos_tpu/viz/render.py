"""Video rendering: overlay, side-by-side, prediction-only.

Reference ``src/visualization/{overlay,side_by_side,prediction_only}.py``
drive the ffmpeg binary through ffmpeg-python. When an ffmpeg binary is
present on PATH (or named via ``SVOS_FFMPEG``) the same pipelines run
through it — identical inputs, filters and codec selection to the
reference's ffmpeg-python graphs — so out-of-box behaviour on a normal host
matches upstream. Without the binary (this environment has none) the
pipelines fall back to OpenCV's VideoWriter; ``SVOS_FFMPEG=0`` forces the
fallback:

* overlay: prediction PNGs alpha-keyed over the source frames — background
  (colour 0) transparent, foreground at alpha 128 (``overlay.py:13-26``),
  optional greyscale source (``overlay.py:50-51``);
* side-by-side: horizontal stack of prediction and source
  (``side_by_side.py:18-23``);
* prediction-only: the mask frames as a plain video
  (``prediction_only.py:16-19``).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image

from semi_supervised_vos_tpu.utils.logging import logger


def _frames(directory, pattern) -> List[Path]:
    # exclude overlay intermediates: a killed overlay run can leave stale
    # ``*.png.noback.png`` files behind, which would otherwise inject
    # duplicate frames into later side-by-side/prediction-only renders
    return sorted(
        f
        for f in Path(directory).glob(pattern)
        if not f.name.endswith(".noback.png")
    )


def _clean_noback(directory) -> None:
    """Delete stale ``*.noback.png`` intermediates (from a killed overlay
    run) so the ffmpeg ``*.png`` globs see mask frames only."""
    for f in Path(directory).glob("*.noback.png"):
        f.unlink(missing_ok=True)


# ---- ffmpeg backend ----------------------------------------------------------


def ffmpeg_binary() -> Optional[str]:
    """The ffmpeg binary to drive, or None for the OpenCV fallback.

    ``SVOS_FFMPEG=<path>`` overrides discovery; ``SVOS_FFMPEG=0`` disables
    the backend even when a binary is on PATH."""
    env = os.environ.get("SVOS_FFMPEG")
    if env == "0":
        return None
    return env or shutil.which("ffmpeg")


def _remove_background(path) -> List[Path]:
    """Reference ``overlay.py:13-26``: write RGBA ``.noback.png`` copies with
    colour-0 pixels fully transparent and everything else at alpha 128."""
    made = []
    for file in sorted(Path(path).glob("*.png")):
        if file.name.endswith(".noback.png"):
            continue
        data = np.array(Image.open(file).convert("RGBA"))
        mask = np.all(data[:, :, :3] == 0, axis=-1)
        data[mask] = [0, 0, 0, 0]
        data[np.logical_not(mask), 3] = 128
        out = Path(str(file) + ".noback.png")
        Image.fromarray(data).save(out)
        made.append(out)
    return made


def _run_ffmpeg(binary: str, args: List[str]) -> None:
    cmd = [binary, "-y", *args]
    logger.info("ffmpeg: " + " ".join(cmd))
    subprocess.run(cmd, check=True)


def _ffmpeg_overlay(binary, prediction_dir, source_dir, output, fps, bw) -> None:
    """``overlay.py:45-56``: transparent predictions overlaid on the source
    (optionally greyscaled) — input 0 = predictions, input 1 = source, the
    overlay's main stream is the source."""
    _clean_noback(prediction_dir)  # stale intermediates from a killed run
    made = _remove_background(prediction_dir)
    graph = (
        "[1:v]format=gray[s];[s][0:v]overlay[out]" if bw else "[1:v][0:v]overlay[out]"
    )
    try:
        _run_ffmpeg(
            binary,
            [
                "-framerate", str(fps), "-pattern_type", "glob",
                "-vcodec", "png", "-i", f"{prediction_dir}/*.noback.png",
                "-framerate", str(fps), "-pattern_type", "glob",
                "-i", f"{source_dir}/*.jpg",
                "-filter_complex", graph, "-map", "[out]",
                str(output),
            ],
        )
    finally:
        for f in made:  # reference cleanup(), overlay.py:29-32
            f.unlink(missing_ok=True)


def _ffmpeg_side_by_side(binary, prediction_dir, source_dir, output, fps) -> None:
    """``side_by_side.py:18-23``: hstack(prediction, source)."""
    _clean_noback(prediction_dir)
    _run_ffmpeg(
        binary,
        [
            "-framerate", str(fps), "-pattern_type", "glob",
            "-vcodec", "png", "-i", f"{prediction_dir}/*.png",
            "-framerate", str(fps), "-pattern_type", "glob",
            "-i", f"{source_dir}/*.jpg",
            "-filter_complex", "[0:v][1:v]hstack[out]", "-map", "[out]",
            str(output),
        ],
    )


def _ffmpeg_prediction_only(binary, prediction_dir, output, fps) -> None:
    """``prediction_only.py:16-19``: the mask frames as a plain video."""
    _clean_noback(prediction_dir)
    _run_ffmpeg(
        binary,
        [
            "-framerate", str(fps), "-pattern_type", "glob",
            "-i", f"{prediction_dir}/*.png",
            str(output),
        ],
    )


# ---- OpenCV fallback ---------------------------------------------------------


def _writer(output, fps, size_wh):
    import cv2

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    return cv2.VideoWriter(str(output), fourcc, fps, size_wh)


def _to_bgr(img: Image.Image) -> np.ndarray:
    return np.asarray(img.convert("RGB"))[:, :, ::-1].copy()


def render_overlay(prediction_dir, source_dir, output, fps: int = 15, bw: bool = False) -> None:
    """Alpha-composite masks over source frames (reference ``overlay.py``)."""
    binary = ffmpeg_binary()
    if binary:
        _ffmpeg_overlay(binary, prediction_dir, source_dir, output, fps, bw)
        return
    preds = _frames(prediction_dir, "*.png")
    srcs = _frames(source_dir, "*.jpg")
    assert preds and srcs, "no frames found"
    n = min(len(preds), len(srcs))

    first = _to_bgr(Image.open(srcs[0]))
    h, w = first.shape[:2]
    out = _writer(output, fps, (w, h))
    for pred_path, src_path in zip(preds[:n], srcs[:n]):
        src = _to_bgr(Image.open(src_path))
        if bw:
            grey = (0.114 * src[:, :, 0] + 0.587 * src[:, :, 1] + 0.299 * src[:, :, 2]).astype(np.uint8)
            src = np.stack([grey] * 3, axis=-1)
        pred_rgb = _to_bgr(Image.open(pred_path).convert("RGB"))
        if pred_rgb.shape[:2] != (h, w):
            pred_rgb = np.asarray(
                Image.fromarray(pred_rgb[:, :, ::-1]).resize((w, h), Image.NEAREST)
            )[:, :, ::-1]
        # background (colour 0 == black) transparent, foreground alpha 128
        fg = np.any(pred_rgb != 0, axis=-1, keepdims=True)
        alpha = fg.astype(np.float32) * (128.0 / 255.0)
        frame = (src * (1 - alpha) + pred_rgb * alpha).astype(np.uint8)
        out.write(frame)
    out.release()
    logger.info(f"overlay video written to {output}")


def render_side_by_side(prediction_dir, source_dir, output, fps: int = 15) -> None:
    """Horizontal stack (reference ``side_by_side.py``)."""
    binary = ffmpeg_binary()
    if binary:
        _ffmpeg_side_by_side(binary, prediction_dir, source_dir, output, fps)
        return
    preds = _frames(prediction_dir, "*.png")
    srcs = _frames(source_dir, "*.jpg")
    assert preds and srcs, "no frames found"
    n = min(len(preds), len(srcs))

    first_src = _to_bgr(Image.open(srcs[0]))
    h, w = first_src.shape[:2]
    out = _writer(output, fps, (2 * w, h))
    for pred_path, src_path in zip(preds[:n], srcs[:n]):
        src = _to_bgr(Image.open(src_path))
        pred = _to_bgr(Image.open(pred_path).convert("RGB"))
        if pred.shape[:2] != (h, w):
            pred = np.asarray(
                Image.fromarray(pred[:, :, ::-1]).resize((w, h), Image.NEAREST)
            )[:, :, ::-1]
        out.write(np.concatenate([pred, src], axis=1))
    out.release()
    logger.info(f"side-by-side video written to {output}")


def render_prediction_only(prediction_dir, output, fps: int = 15) -> None:
    """Masks as a plain video (reference ``prediction_only.py``)."""
    binary = ffmpeg_binary()
    if binary:
        _ffmpeg_prediction_only(binary, prediction_dir, output, fps)
        return
    preds = _frames(prediction_dir, "*.png")
    assert preds, "no frames found"
    first = _to_bgr(Image.open(preds[0]).convert("RGB"))
    h, w = first.shape[:2]
    out = _writer(output, fps, (w, h))
    for pred_path in preds:
        out.write(_to_bgr(Image.open(pred_path).convert("RGB")))
    out.release()
    logger.info(f"prediction video written to {output}")
