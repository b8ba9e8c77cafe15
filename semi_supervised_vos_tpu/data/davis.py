"""DAVIS-layout datasets (host side).

Mirrors the reference's data layer (``src/utils/datasets.py``) without
torchvision: directory scanning reproduces ``ImageFolder`` semantics (sorted
class dirs, recursively sorted files), all encoded bytes are preloaded into
RAM up front (``datasets.py:41-54``), and decoding happens on demand with PIL.

TPU-native split of responsibilities: the host only decodes/crops/flips and
ships uint8 arrays; normalisation, one-hot encoding and resizing run on
device (``infer.engine`` / ``train.loop``). Frames are HWC uint8 — a third
the PCIe/tunnel bytes of the reference's float CHW tensors.
"""

from __future__ import annotations

import dataclasses
import os
from io import BytesIO
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageOps

from semi_supervised_vos_tpu.data.transforms import (
    FixedColorJitter,
    get_crop_params,
    pil_crop,
)
from semi_supervised_vos_tpu.utils.logging import logger

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp")

# PIL >= 10 removed the ANTIALIAS alias (the reference pins Pillow 8 —
# ``datasets.py:146``); LANCZOS is the same filter.
ANTIALIAS = getattr(Image, "ANTIALIAS", Image.LANCZOS)


def list_image_folder(root) -> Tuple[List[Tuple[str, int]], Dict[str, int]]:
    """ImageFolder-style listing: (path, class_idx) sorted by class then path.

    Matches torchvision's ``make_dataset`` ordering used throughout the
    reference (``datasets.py:28-32``).
    """
    root = Path(root)
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    class_to_idx = {c: i for i, c in enumerate(classes)}
    samples = []
    for c in classes:
        for p in sorted((root / c).rglob("*")):
            if p.suffix.lower() in IMG_EXTENSIONS:
                samples.append((str(p), class_to_idx[c]))
    return samples, class_to_idx


def _decode_rgb(blob: bytes) -> np.ndarray:
    """Decode an encoded image to (H, W, 3) uint8. JPEG blobs go through the
    native threaded decoder when enabled (bit-identical to PIL — enforced by
    its self-check); everything else through PIL."""
    if blob[:2] == b"\xff\xd8":
        from semi_supervised_vos_tpu.data import native_decode

        if native_decode.available():
            return native_decode.decode_jpeg(blob)
    return np.asarray(Image.open(BytesIO(blob)).convert("RGB"), np.uint8)


def _decode_ann_rgb(blob: bytes) -> np.ndarray:
    """Annotation decode to (H, W, 3) uint8 RGB. Palette PNGs map through
    their embedded palette LUT — bit-identical to ``convert("RGB")`` for
    P-mode images and ~2x faster (skips PIL's per-pixel convert); anything
    else falls back to the generic path."""
    img = Image.open(BytesIO(blob))
    if img.mode == "P":
        idx = np.asarray(img, np.uint8)
        pal = np.zeros((256, 3), np.uint8)
        raw = img.getpalette()
        pal[: len(raw) // 3] = np.asarray(raw, np.uint8).reshape(-1, 3)
        return pal[idx]
    return np.asarray(img.convert("RGB"), np.uint8)


def _preload(samples: Sequence[Tuple[str, int]], what: str) -> List[bytes]:
    logger.info(f"Loading {len(samples)} {what}.")
    blobs = [Path(p).read_bytes() for p, _ in samples]
    logger.info(f"{what} loaded: {len(blobs)}.")
    return blobs


@dataclasses.dataclass
class TrainDataset:
    """Clip dataset for training (reference ``datasets.py:19-108``).

    ``__getitem__`` returns ``frame_num`` consecutive same-video frames with
    one shared random crop / horizontal+vertical flip / (optional) colour
    jitter, as:
      * images: (T, crop, crop, 3) uint8 (normalisation happens on device)
      * annotations: (T, crop, crop, 3) uint8 RGB (centroid quantisation
        happens on device)

    ``decode_cache`` additionally keeps DECODED full frames in RAM (the
    reference preloads only the encoded bytes, ``datasets.py:41-54``): the
    first epoch decodes each frame once, every later epoch is pure
    crop/flip/jitter on cached arrays — bit-identical output (the cache
    stores exactly what ``_decode_rgb``/``_decode_ann_rgb`` return), but the
    decode cost (the training input-pipeline bottleneck on a 1-core host)
    disappears after warm-up. Costs ~2.5 MB RAM per 480p frame pair
    (~15 GB for DAVIS-2017 trainval). Default: the ``SVOS_DECODE_CACHE``
    env var (off unless "1"). Lazy population is thread-safe under the
    prefetch pool: a lost race decodes twice and stores identical arrays.
    """

    img_root: str
    annotation_root: str
    cropping: int = 256
    frame_num: int = 10
    color_jitter: bool = False
    decode_cache: Optional[bool] = None

    def __post_init__(self):
        self.imgs, self.class_to_idx = list_image_folder(self.img_root)
        self.annotations, ann_classes = list_image_folder(self.annotation_root)
        self.img_bytes = _preload(self.imgs, "train images")
        self.annotation_bytes = _preload(self.annotations, "train annotations")
        self.rng = np.random.default_rng(42)
        if self.decode_cache is None:
            self.decode_cache = os.environ.get("SVOS_DECODE_CACHE", "0") == "1"
        self._img_cache: Optional[List[Optional[np.ndarray]]] = (
            [None] * len(self.imgs) if self.decode_cache else None
        )
        self._ann_cache: Optional[List[Optional[np.ndarray]]] = (
            [None] * len(self.annotations) if self.decode_cache else None
        )

    def _image(self, idx: int) -> np.ndarray:
        """Decoded full frame (H, W, 3) uint8, through the cache when on."""
        if self._img_cache is not None:
            img = self._img_cache[idx]
            if img is None:
                img = _decode_rgb(self.img_bytes[idx])
                self._img_cache[idx] = img
            return img
        return _decode_rgb(self.img_bytes[idx])

    def _annotation(self, idx: int) -> np.ndarray:
        """Decoded annotation (H, W, 3) uint8 RGB, through the cache when on."""
        if self._ann_cache is not None:
            ann = self._ann_cache[idx]
            if ann is None:
                ann = _decode_ann_rgb(self.annotation_bytes[idx])
                self._ann_cache[idx] = ann
            return ann
        return _decode_ann_rgb(self.annotation_bytes[idx])

    def __len__(self) -> int:
        return len(self.imgs)

    def seed(self, seed: int) -> None:
        """Reseed augmentation (the reference reseeds torch every epoch —
        ``train.py:132``)."""
        self.rng = np.random.default_rng(seed)

    def _is_same_video(self, index: int) -> bool:
        return self.imgs[index][1] == self.imgs[index + self.frame_num - 1][1]

    def __getitem__(self, index: int):
        if index + self.frame_num > len(self.imgs):
            index = len(self.imgs) - self.frame_num
        while not self._is_same_video(index):
            index -= 1

        # RNG draw order matches the reference (jitter params before flips,
        # ``datasets.py:66-73``) so seeded augmentation streams are stable
        color_transform = (
            FixedColorJitter(0.4, 0.4, 0.4, 0.4, rng=self.rng)
            if self.color_jitter
            else None
        )
        h_flip = bool(self.rng.random() < 0.5)
        v_flip = bool(self.rng.random() < 0.5)
        if color_transform is not None:
            return self._getitem_pil(index, color_transform, h_flip, v_flip)

        # Fast path (no colour jitter — the CLI default): decode straight to
        # numpy, flip as zero-copy views, copy only the cropped 256² window.
        # Exactly equal to the reference's flip-whole-image-then-crop
        # (``datasets.py:72-92``): flipping does not change the image size
        # get_crop_params draws from, and crop(flip(x)) == flip-view(x)[crop].
        # With the native decoder enabled, JPEG frames decode only the
        # row band the crop touches (decode_jpeg_rows — libjpeg-turbo skips
        # the IDCT outside the band; bit-identical, self-checked), and
        # palette-PNG annotations map through their palette LUT.
        from semi_supervised_vos_tpu.data import native_decode

        imgs, anns = [], []
        crop_i = crop_j = th = tw = raw_y0 = 0
        use_rows = False
        for i in range(self.frame_num):
            blob = self.img_bytes[index + i]
            if i == 0:
                if self._img_cache is not None:
                    h0, w0 = self._image(index).shape[:2]
                else:
                    with Image.open(BytesIO(blob)) as im0:
                        w0, h0 = im0.size  # header-only, no pixel decode
                crop_i, crop_j, th, tw = get_crop_params(
                    (w0, h0), self.cropping, self.rng
                )
                # flipped-space rows [crop_i, crop_i+th) = raw rows
                # [H-crop_i-th, H-crop_i) reversed under a vertical flip
                raw_y0 = h0 - (crop_i + th) if v_flip else crop_i
                # a populated cache beats even row-band decode: zero decode
                use_rows = (
                    self._img_cache is None
                    and th < h0
                    and blob[:2] == b"\xff\xd8"
                    and native_decode.available()
                )
            if use_rows and blob[:2] == b"\xff\xd8":
                band = native_decode.decode_jpeg_rows(blob, raw_y0, th)
                if v_flip:
                    band = band[::-1]
                if h_flip:
                    band = band[:, ::-1]
                img_crop = band[:, crop_j : crop_j + tw]
            else:
                img = self._image(index + i)
                if h_flip:
                    img = img[:, ::-1]
                if v_flip:
                    img = img[::-1]
                img_crop = img[crop_i : crop_i + th, crop_j : crop_j + tw]
            ann = self._annotation(index + i)
            if h_flip:
                ann = ann[:, ::-1]
            if v_flip:
                ann = ann[::-1]
            imgs.append(np.ascontiguousarray(img_crop))
            anns.append(
                np.ascontiguousarray(ann[crop_i : crop_i + th, crop_j : crop_j + tw])
            )

        video_index = self.imgs[index + self.frame_num - 1][1]
        return np.stack(imgs), np.stack(anns), video_index

    def _getitem_pil(self, index: int, color_transform, h_flip: bool, v_flip: bool):
        """PIL path: colour jitter operates on PIL images (reference
        ``datasets.py:66-71``); all RNG draws happen in the caller."""
        imgs, anns = [], []
        crop_i = crop_j = th = tw = 0
        for i in range(self.frame_num):
            # fromarray(decoded) is content-identical to the PIL convert("RGB")
            # (the decode helpers are bit-parity-checked) and hits the cache
            img = Image.fromarray(self._image(index + i))
            ann = Image.fromarray(self._annotation(index + i))
            if h_flip:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
                ann = ann.transpose(Image.FLIP_LEFT_RIGHT)
            if v_flip:
                img = img.transpose(Image.FLIP_TOP_BOTTOM)
                ann = ann.transpose(Image.FLIP_TOP_BOTTOM)
            if i == 0:
                crop_i, crop_j, th, tw = get_crop_params(img.size, self.cropping, self.rng)
            img = color_transform(pil_crop(img, crop_i, crop_j, th, tw))
            ann = pil_crop(ann, crop_i, crop_j, th, tw)
            imgs.append(np.asarray(img, np.uint8))
            anns.append(np.asarray(ann, np.uint8))

        video_index = self.imgs[index + self.frame_num - 1][1]
        return np.stack(imgs), np.stack(anns), video_index


@dataclasses.dataclass
class InferenceDataset:
    """One frame at a time (reference ``datasets.py:111-167``).

    Items are uint8 HWC frames plus the video name; flip/scale variants for
    the multi-stream strategies follow ``datasets.py:148-162`` (the
    second-scale stream is produced with PIL LANCZOS, matching the
    reference's ANTIALIAS resize).
    """

    root: str
    inference_strategy: str = "single"
    scale: Optional[float] = None

    def __post_init__(self):
        self.imgs, self.class_to_idx = list_image_folder(self.root)
        self.idx_to_class = {v: k for k, v in self.class_to_idx.items()}
        self.img_bytes = _preload(self.imgs, "inference images")

    def __len__(self) -> int:
        return len(self.imgs)

    def __getitem__(self, index: int):
        _, video_index = self.imgs[index]
        name = self.idx_to_class[video_index]
        strat = self.inference_strategy
        if strat not in ("hor-flip", "vert-flip", "2-scale", "hor-2-scale"):
            # frame-only strategies: decode without a PIL Image round trip
            # (native threaded decoder when SVOS_NATIVE_DECODE=1)
            return _decode_rgb(self.img_bytes[index]), name
        img = Image.open(BytesIO(self.img_bytes[index])).convert("RGB")
        frame = np.asarray(img, np.uint8)
        if strat == "hor-flip":
            return (frame, np.asarray(ImageOps.mirror(img), np.uint8)), name
        if strat == "vert-flip":
            return (frame, np.asarray(ImageOps.flip(img), np.uint8)), name
        if strat in ("2-scale", "hor-2-scale"):
            size2 = tuple(
                np.ceil(np.array(img.size) * self.scale).astype(np.int64)
            )
            if strat == "hor-2-scale":
                img = ImageOps.mirror(img)
            img2 = img.resize(size2, ANTIALIAS)
            return (frame, np.asarray(img2, np.uint8)), name
        raise AssertionError(strat)  # unreachable: frame-only handled above

    def __iter__(self) -> Iterator:
        for i in range(len(self)):
            yield self[i]


@dataclasses.dataclass
class TripletLossTrainDataset:
    """Whole-video sequence dataset grouped by video (reference
    ``datasets.py:170-219``; dead code there, kept for surface parity).

    Items are lists of (uint8 image, uint8 RGB annotation) pairs.
    """

    img_root: str
    annotation_root: str

    def __post_init__(self):
        imgs, class_to_idx = list_image_folder(self.img_root)
        anns, _ = list_image_folder(self.annotation_root)
        assert len(imgs) == len(anns)
        self.data: Dict[int, list] = {}
        logger.info(f"Loading {len(imgs)} train image, annotation pairs.")
        for (ip, ic), (ap, ac) in zip(imgs, anns):
            assert ic == ac
            self.data.setdefault(ic, []).append(
                (Path(ip).read_bytes(), Path(ap).read_bytes())
            )
        logger.info(f"Pairs loaded: {len(self.data)}.")

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int):
        out = []
        for img, ann in self.data[index]:
            out.append(
                (
                    np.asarray(Image.open(BytesIO(img)).convert("RGB"), np.uint8),
                    np.asarray(Image.open(BytesIO(ann)).convert("RGB"), np.uint8),
                )
            )
        return out
