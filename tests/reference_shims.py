"""Shims that make the reference implementation importable in this
environment (no torchvision/loguru, numpy 2.x, Pillow 10) so tests can run
it directly as the parity golden. Test-only code — the framework itself
never imports the reference."""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np
import torch
from PIL import Image


def install() -> None:
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    # numpy 2.x removed np.int (the reference uses it, predict.py:85)
    if not hasattr(np, "int"):
        np.int = int  # type: ignore[attr-defined]
    # Pillow 10 removed ANTIALIAS (datasets.py:146)
    if not hasattr(Image, "ANTIALIAS"):
        Image.ANTIALIAS = Image.LANCZOS  # type: ignore[attr-defined]

    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _Logger:
            def info(self, *a, **k):
                pass

            warning = error = debug = info

        loguru.logger = _Logger()
        sys.modules["loguru"] = loguru

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        datasets_mod = types.ModuleType("torchvision.datasets")
        folder_mod = types.ModuleType("torchvision.datasets.folder")
        transforms_pkg = types.ModuleType("torchvision.transforms")
        transforms_mod = types.ModuleType("torchvision.transforms.transforms")

        IMG_EXT = (".jpg", ".jpeg", ".png", ".bmp")

        def make_dataset(directory, class_to_idx, extensions=IMG_EXT):
            samples = []
            directory = Path(directory)
            for cls in sorted(class_to_idx):
                for p in sorted((directory / cls).rglob("*")):
                    if p.suffix.lower().lstrip(".") in tuple(
                        e.lstrip(".") for e in extensions
                    ):
                        samples.append((str(p), class_to_idx[cls]))
            return samples

        class ImageFolder:
            def __init__(self, root, transform=None, target_transform=None):
                root = Path(root)
                self.classes = sorted(d.name for d in root.iterdir() if d.is_dir())
                self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
                self.imgs = make_dataset(root, self.class_to_idx)
                self.samples = self.imgs
                self.transform = transform
                self.target_transform = target_transform

            def __len__(self):
                return len(self.imgs)

        class Compose:
            def __init__(self, fns):
                self.fns = fns

            def __call__(self, x):
                for f in self.fns:
                    x = f(x)
                return x

        class ToTensor:
            def __call__(self, pic):
                arr = np.asarray(pic, np.uint8)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                t = torch.from_numpy(arr.copy()).permute(2, 0, 1).float() / 255.0
                return t

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, t):
                return (t - self.mean) / self.std

        class ColorJitter:
            def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
                self.brightness = brightness
                self.contrast = contrast
                self.saturation = saturation
                self.hue = hue

            @staticmethod
            def get_params(brightness, contrast, saturation, hue):
                return lambda img: img

            def __call__(self, img):
                return img

        transforms_mod.Compose = Compose
        transforms_mod.ToTensor = ToTensor
        transforms_mod.Normalize = Normalize
        transforms_mod.ColorJitter = ColorJitter
        transforms_pkg.transforms = transforms_mod
        transforms_pkg.Compose = Compose
        transforms_pkg.ToTensor = ToTensor
        transforms_pkg.Normalize = Normalize
        transforms_pkg.ColorJitter = ColorJitter
        folder_mod.make_dataset = make_dataset
        datasets_mod.ImageFolder = ImageFolder
        datasets_mod.folder = folder_mod
        tv.datasets = datasets_mod
        tv.transforms = transforms_pkg
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.datasets"] = datasets_mod
        sys.modules["torchvision.datasets.folder"] = folder_mod
        sys.modules["torchvision.transforms"] = transforms_pkg
        sys.modules["torchvision.transforms.transforms"] = transforms_mod
