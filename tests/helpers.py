"""Shared test fixtures: synthetic DAVIS-layout datasets and checkpoints."""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

from semi_supervised_vos_tpu.ops.onehot import davis_palette


def make_davis_dataset(
    root: Path,
    videos=("blackswan", "camel"),
    frames: int = 6,
    size=(64, 80),
    all_annotations: bool = True,
    seed: int = 0,
    objects: int = 1,
):
    """Synthetic DAVIS tree: ``objects`` coloured squares moving over a
    textured background, per-frame GT annotations (multi-object ids 1..N —
    the DAVIS-2017 shape of the task).

    Returns dict video -> list of (image (H,W,3) u8, label (H,W) int)."""
    rng = np.random.default_rng(seed)
    h, w = size
    palette = davis_palette().reshape(-1).tolist()
    data = {}
    for v_i, video in enumerate(videos):
        img_dir = root / "JPEGImages" / "480p" / video
        ann_dir = root / "Annotations" / "480p" / video
        img_dir.mkdir(parents=True, exist_ok=True)
        ann_dir.mkdir(parents=True, exist_ok=True)
        bg = rng.integers(0, 80, size=(h, w, 3), dtype=np.uint8)
        frames_out = []
        for t in range(frames):
            img = bg.copy()
            label = np.zeros((h, w), np.uint8)
            y = h // 4 + v_i * 2
            x = w // 4 + t * 2
            img[y : y + h // 3, x : x + w // 4] = [200, 40 + 10 * v_i, 40]
            label[y : y + h // 3, x : x + w // 4] = 1
            if objects >= 2:
                # second object: distinct colour, opposite motion, lower band
                y2 = 2 * h // 3
                x2 = max(0, w // 2 - t * 2)
                img[y2 : y2 + h // 6, x2 : x2 + w // 6] = [40, 80 + 10 * v_i, 220]
                label[y2 : y2 + h // 6, x2 : x2 + w // 6] = 2
            Image.fromarray(img).save(img_dir / f"{t:05d}.jpg", quality=95)
            if t == 0 or all_annotations:
                ann = Image.fromarray(label, mode="P")
                ann.putpalette(palette)
                ann.save(ann_dir / f"{t:05d}.png")
            frames_out.append((img, label))
        data[video] = frames_out
    return data


def make_reference_checkpoint(path: Path, model: str = "resnet18", seed: int = 0) -> None:
    """Save a reference-format .pth.tar with random weights (via the
    read-only reference torch modules)."""
    import sys

    sys.path.insert(0, "/root/reference")
    import torch

    from tests.test_models import build_reference_vosnet

    torch.manual_seed(seed)
    net = build_reference_vosnet(model)
    torch.save({"epoch": 0, "state_dict": net.state_dict()}, path)
