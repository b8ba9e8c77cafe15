"""ctypes bridge to the native nearest-upsampler (``native/upsample.cpp``).

Same build-on-demand / verify-at-first-use pattern as
``data/native_decode.py``: compiled with g++ (plain C ABI — no pybind11 in
this toolchain), and at first use a probe array is upsampled by both paths
and compared byte-for-byte; any mismatch disables the native path for the
process (the numpy twin in ``ops/resize.py`` is the reference mapping).

Unlike the JPEG decoder this is on by default: the gather loop beats
numpy's two ``np.take`` passes even single-threaded (no giant intermediate,
row reuse at integer-ish scale factors), and it sits on the mask-drain
worker's critical path (``prof/ab_drain.py`` measured the drain costing the
lockstep engines ~2 ms/lane-frame on a slow-D2H window). ``SVOS_NATIVE_UPSAMPLE=0``
forces numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "upsample.cpp"
_LIB = _REPO_ROOT / "native" / "libsvosupsample.so"

_lib = None
_state: Optional[str] = None  # None = undecided, "on", "off"


def _build() -> bool:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC),
             "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _numpy_twin(x: np.ndarray, out_hw) -> np.ndarray:
    rows = np.minimum(np.arange(out_hw[0]) * x.shape[-2] // out_hw[0],
                      x.shape[-2] - 1)
    cols = np.minimum(np.arange(out_hw[1]) * x.shape[-1] // out_hw[1],
                      x.shape[-1] - 1)
    return np.take(np.take(x, rows, axis=-2), cols, axis=-1)


def _decide() -> Optional[str]:
    global _lib, _state
    if _state is not None:
        return _state
    if os.environ.get("SVOS_NATIVE_UPSAMPLE", "1") != "1" or not _SRC.exists():
        _state = "off"
        return _state
    try:
        if not _build():
            _state = "off"
            return _state
        lib = ctypes.CDLL(str(_LIB))
        lib.svos_nearest_u8.restype = ctypes.c_int
        lib.svos_nearest_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        # byte-identity probe vs the numpy mapping (non-divisible scale)
        rng = np.random.default_rng(0)
        probe = rng.integers(0, 22, size=(3, 60, 107), dtype=np.uint8)
        want = _numpy_twin(probe, (480, 854))
        got = np.empty((3, 480, 854), np.uint8)
        rc = lib.svos_nearest_u8(
            probe.ctypes.data, 3, 60, 107, got.ctypes.data, 480, 854, 2
        )
        if rc != 0 or not np.array_equal(got, want):
            _state = "off"
            return _state
        _lib = lib
        _state = "on"
    except Exception:
        _state = "off"
    return _state


def nearest_u8(x: np.ndarray, out_hw) -> Optional[np.ndarray]:
    """(..., hd, wd) uint8 → (..., H, W), or None if the native path is
    unavailable (caller falls back to the numpy twin)."""
    if _decide() != "on":
        return None
    if x.dtype != np.uint8 or x.ndim < 2:
        return None
    x = np.ascontiguousarray(x)
    lead = x.shape[:-2]
    n = int(np.prod(lead, dtype=np.int64)) if lead else 1
    hd, wd = x.shape[-2], x.shape[-1]
    out = np.empty(lead + tuple(out_hw), np.uint8)
    rc = _lib.svos_nearest_u8(
        x.ctypes.data, n, hd, wd, out.ctypes.data,
        int(out_hw[0]), int(out_hw[1]), os.cpu_count() or 1,
    )
    if rc != 0:
        return None
    return out
