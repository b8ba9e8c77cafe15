"""Tracing and per-phase timing.

The reference has no profiling at all (SURVEY.md §5 — only tqdm progress
bars). This module adds the TPU-native observability surface:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (set ``SVOS_TRACE_DIR`` or pass a path);
* :class:`PhaseTimer` — lightweight wall-clock phase accounting with a
  device-sync option (on this runtime only a device→host transfer reliably
  fences the stream, so ``sync=True`` pulls one scalar);
* :func:`annotate` — named ``TraceAnnotation`` regions visible in traces.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Optional

from semi_supervised_vos_tpu.utils.logging import logger


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace around the enclosed block."""
    log_dir = log_dir or os.environ.get("SVOS_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {log_dir}")


@contextlib.contextmanager
def annotate(name: str):
    """Named region for profiler traces (no-op overhead when not tracing)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class PhaseTimer:
    """Accumulates wall-clock per phase; ``report()`` logs a summary.

    Example::

        timer = PhaseTimer()
        with timer.phase("backbone"):
            feats = encode(frame)
        with timer.phase("propagate", sync=pred):
            pred = propagate(feats)
        timer.report()
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import numpy as np

                np.asarray(sync).ravel()[:1]  # device fence
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, float]:
        parts = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            parts.append(f"{name}: {total:.3f}s ({n}x, {total / n * 1e3:.1f} ms avg)")
        if parts:
            logger.info("phase timing | " + " | ".join(parts))
        return dict(self.totals)
