"""ctypes bridge to the native threaded JPEG decoder (``native/decode.cpp``).

Compiled on demand with g++ (no pybind11 in this toolchain; plain C ABI),
linked against Pillow's bundled libjpeg-turbo when present so the decoded
bytes are identical to PIL's. Safety: at first use the module decodes a
probe image with both paths and compares byte-for-byte — libjpeg IDCT output
depends on the library build, and decoded pixels feed the numerics contract,
so any mismatch disables the native path for the process (with a log line)
rather than silently shifting features.

**Opt-in** via ``SVOS_NATIVE_DECODE=1``: the thread pool only pays off on
multi-core hosts. Measured on this single-core benchmark host the native
path is bit-identical but ~2x slower than PIL's optimized loop, so it stays
off by default here; production hosts with N cores get ~N-fold decode
scaling for the lockstep-batched inference frame streams.
"""

from __future__ import annotations

import ctypes
import io
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "decode.cpp"
_LIB = _REPO_ROOT / "native" / "libsvosdecode.so"

_lib = None  # ctypes handle once loaded
_state: Optional[str] = None  # None = undecided, "on", "off"


def _turbo_link_args() -> List[str]:
    """Prefer Pillow's bundled libjpeg-turbo (bit-identical to PIL, SIMD)."""
    try:
        import PIL

        libs = Path(PIL.__file__).parent.parent / "pillow.libs"
        for so in sorted(libs.glob("libjpeg-*.so*")):
            return [f"-L{libs}", f"-l:{so.name}", f"-Wl,-rpath,{libs}"]
    except Exception:
        pass
    return ["-ljpeg"]


def _build() -> bool:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)]
            + _turbo_link_args()
            + ["-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(_LIB))
    lib.svos_jpeg_shape.restype = ctypes.c_int
    lib.svos_jpeg_shape.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.svos_jpeg_decode_batch.restype = ctypes.c_int
    lib.svos_jpeg_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.svos_jpeg_decode_rows.restype = ctypes.c_int
    lib.svos_jpeg_decode_rows.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def _decode_batch_raw(blobs: Sequence[bytes], h: int, w: int, threads: int) -> np.ndarray:
    lib = _load()
    n = len(blobs)
    out = np.empty((n, h, w, 3), np.uint8)
    bufs = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    failures = lib.svos_jpeg_decode_batch(
        bufs, lens, n, out.ctypes.data_as(ctypes.c_void_p), h, w, threads
    )
    if failures:
        raise RuntimeError(f"native decode: {failures}/{n} images failed")
    return out


def _self_check() -> bool:
    """Native output must equal PIL byte-for-byte on a probe image — both
    the full decode and a row-band decode (the training-crop fast path)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=92)
    blob = buf.getvalue()
    pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    native = _decode_batch_raw([blob], 48, 64, 1)[0]
    if not (pil == native).all():
        return False
    band = _decode_rows_raw(blob, 48, 64, 13, 21)
    return bool((pil[13:34] == band).all())


def available() -> bool:
    """Build + verify once per process."""
    global _state
    if _state is None:
        if os.environ.get("SVOS_NATIVE_DECODE", "0") != "1":
            _state = "off"
        else:
            try:
                ok = _build() and _self_check()
            except Exception:
                ok = False
            if not ok:
                from semi_supervised_vos_tpu.utils.logging import logger

                logger.info(
                    "native JPEG decoder unavailable or not bit-identical to "
                    "PIL; using PIL"
                )
            _state = "on" if ok else "off"
    return _state == "on"


def jpeg_shape(blob: bytes):
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = _load().svos_jpeg_shape(blob, len(blob), ctypes.byref(h), ctypes.byref(w))
    if rc:
        raise ValueError(f"not a decodable JPEG (rc={rc})")
    return h.value, w.value


def decode_jpeg_batch(blobs: Sequence[bytes], threads: int = 0) -> np.ndarray:
    """Decode same-sized RGB JPEGs to (N, H, W, 3) uint8 with a thread pool
    (0 = one thread per core, capped at 16)."""
    assert available()
    h, w = jpeg_shape(blobs[0])
    if threads <= 0:
        threads = min(os.cpu_count() or 1, 16)
    return _decode_batch_raw(blobs, h, w, threads)


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Single-image convenience (still PIL-bit-identical)."""
    assert available()
    h, w = jpeg_shape(blob)
    return _decode_batch_raw([blob], h, w, 1)[0]


def _decode_rows_raw(blob: bytes, h: int, w: int, y0: int, nrows: int) -> np.ndarray:
    out = np.empty((nrows, w, 3), np.uint8)
    rc = _load().svos_jpeg_decode_rows(
        blob, len(blob), out.ctypes.data_as(ctypes.c_void_p), h, w, y0, nrows
    )
    if rc:
        raise ValueError(f"native row decode failed (rc={rc})")
    return out


def decode_jpeg_rows(blob: bytes, y0: int, nrows: int) -> np.ndarray:
    """Decode only rows [y0, y0+nrows) — bit-identical to the same rows of a
    full decode (self-checked). libjpeg-turbo skips the IDCT for the leading
    band and never touches the tail: the training-crop fast path."""
    assert available()
    h, w = jpeg_shape(blob)
    return _decode_rows_raw(blob, h, w, y0, nrows)
