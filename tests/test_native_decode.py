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
