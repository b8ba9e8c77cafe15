"""Native threaded JPEG decoder: bit-parity with PIL + loader integration."""

import io
import os

import numpy as np
import pytest
from PIL import Image


def _jpegs(rng, n, hw=(48, 64)):
    blobs = []
    for _ in range(n):
        img = Image.fromarray(
            rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        )
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=93)
        blobs.append(buf.getvalue())
    return blobs


@pytest.fixture
def native(monkeypatch):
    monkeypatch.setenv("SVOS_NATIVE_DECODE", "1")
    from semi_supervised_vos_tpu.data import native_decode

    # force re-evaluation under the patched env
    native_decode._state = None
    if not native_decode.available():
        pytest.skip("native decoder unavailable (no g++/libjpeg)")
    yield native_decode
    native_decode._state = None


def test_native_decode_bit_identical_to_pil(native, rng):
    blobs = _jpegs(rng, 6)
    pil = np.stack(
        [np.asarray(Image.open(io.BytesIO(b)).convert("RGB")) for b in blobs]
    )
    for threads in (1, 4):
        got = native.decode_jpeg_batch(blobs, threads=threads)
        np.testing.assert_array_equal(got, pil)


def test_native_decode_shape_probe_and_errors(native, rng):
    blob = _jpegs(rng, 1, hw=(30, 42))[0]
    assert native.jpeg_shape(blob) == (30, 42)
    with pytest.raises(ValueError):
        native.jpeg_shape(b"not a jpeg at all")


def test_dataset_uses_native_path(native, rng, tmp_path):
    from semi_supervised_vos_tpu.data.davis import InferenceDataset
    from tests.helpers import make_davis_dataset

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("v",), frames=3, size=(48, 64))
    ds = InferenceDataset(str(root / "JPEGImages/480p"))
    frame, name = ds[0]
    assert frame.shape == (48, 64, 3) and frame.dtype == np.uint8
    # equal to the PIL decode of the same bytes
    pil = np.asarray(Image.open(io.BytesIO(ds.img_bytes[0])).convert("RGB"))
    np.testing.assert_array_equal(frame, pil)


def test_native_row_band_decode_bit_identical(native, rng):
    """decode_jpeg_rows == the same rows of a full decode, at iMCU-unaligned
    offsets (the training-crop fast path's contract)."""
    blob = _jpegs(rng, 1, hw=(80, 64))[0]
    full = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    for y0, nrows in ((0, 80), (0, 13), (7, 21), (33, 47), (79, 1), (40, 40)):
        band = native.decode_jpeg_rows(blob, y0, nrows)
        np.testing.assert_array_equal(band, full[y0 : y0 + nrows])


def test_train_dataset_row_band_path_matches_plain(tmp_path, monkeypatch):
    """TrainDataset with the native row-band decoder produces bit-identical
    clips to the plain full-decode path for the same RNG stream."""
    from tests.helpers import make_davis_dataset

    from semi_supervised_vos_tpu.data import native_decode
    from semi_supervised_vos_tpu.data.davis import TrainDataset

    make_davis_dataset(tmp_path, videos=("a",), frames=8, size=(72, 96))
    ds = TrainDataset(
        tmp_path / "JPEGImages/480p", tmp_path / "Annotations/480p",
        cropping=48, frame_num=3,
    )

    monkeypatch.setenv("SVOS_NATIVE_DECODE", "0")
    native_decode._state = None
    plain = []
    for idx in range(4):
        ds.seed(55 + idx)
        plain.append(ds[idx])

    monkeypatch.setenv("SVOS_NATIVE_DECODE", "1")
    native_decode._state = None
    if not native_decode.available():
        pytest.skip("native decoder unavailable")
    try:
        for idx in range(4):
            ds.seed(55 + idx)
            fast = ds[idx]
            np.testing.assert_array_equal(fast[0], plain[idx][0])
            np.testing.assert_array_equal(fast[1], plain[idx][1])
    finally:
        native_decode._state = None


def test_palette_ann_decode_matches_convert(tmp_path, rng):
    from semi_supervised_vos_tpu.data.davis import _decode_ann_rgb
    from semi_supervised_vos_tpu.ops.onehot import davis_palette

    label = rng.integers(0, 4, (40, 56)).astype(np.uint8)
    img = Image.fromarray(label, mode="P")
    img.putpalette(davis_palette().reshape(-1).tolist())
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    blob = buf.getvalue()
    want = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"), np.uint8)
    np.testing.assert_array_equal(_decode_ann_rgb(blob), want)
