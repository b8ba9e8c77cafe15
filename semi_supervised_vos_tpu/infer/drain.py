"""Pipelined device-to-host mask drain.

jax dispatch is asynchronous: while chunk t+1's device program runs, chunk
t's masks can cross the device link and be post-processed (upsample, unflip,
host fusion) on the CPU. Serializing those fetches — per frame, after the
loop — exposed ~0.7 ms/frame of pure transfer time at 480p in the bench's
two-length slope attribution, and costs one host-device round trip *per
frame* when masks are fetched as per-frame slices of a chunk array.

``MaskDrain`` runs the conversion closures on ONE worker thread in
submission order: fetches stay ordered (a single transfer channel anyway)
and overlap the device compute that the main thread keeps dispatching.
The reference has no analog — its per-frame loop synchronizes on every
``.cpu()`` (``src/utils/inference_utils.py:74-87``).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, List


class MaskDrain:
    """Ordered single-worker pipeline for device→host mask conversion."""

    def __init__(self) -> None:
        self._ex = ThreadPoolExecutor(max_workers=1)
        self._futs: List[Any] = []

    def submit(self, fn: Callable[[], Any]) -> None:
        """Queue ``fn`` (a conversion closure holding device handles)."""
        self._futs.append(self._ex.submit(fn))

    def drain(self) -> List[Any]:
        """Block for all queued conversions; returns results in order."""
        out = [f.result() for f in self._futs]
        self._futs = []
        return out

    def close(self) -> None:
        self._ex.shutdown(wait=True)

    def __enter__(self) -> "MaskDrain":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
