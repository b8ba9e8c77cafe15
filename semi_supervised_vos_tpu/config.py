"""Global configuration.

Mirrors the reference's two-tier config (static constants + per-command CLI
flags, reference ``src/config.py:10-14``) but as an explicit dataclass so the
constants are overridable per run instead of process-global mutable state.
"""

from __future__ import annotations

import dataclasses
import multiprocessing
import os


@dataclasses.dataclass(frozen=True)
class Config:
    """Framework-wide constants.

    Attributes:
      scale: feature stride as a fraction (1/8 — reference ``src/config.py:12``).
      continuous_frame: size of the dense tail of the memory-bank sampling
        schedule (reference ``src/config.py:13``).
      dense_switch_frame: frame index after which the dense/sparse spatial
        weight split activates (reference ``src/model/predict.py:61``).
      num_classes: padded class budget — the 22-entry DAVIS palette centroid
        table (reference ``annotation_centroids.npy``). Fixed so every video
        compiles to the same shapes.
      cpu_count: host-parallelism width for evaluation / data decode.
    """

    scale: float = 0.125
    continuous_frame: int = 4
    dense_switch_frame: int = 15
    num_classes: int = 22
    cpu_count: int = max(multiprocessing.cpu_count(), 1)


DEFAULT = Config()


def default_num_workers() -> int:
    """Worker-thread count for the host data pipeline."""
    env = os.environ.get("SVOS_NUM_WORKERS")
    if env:
        return max(int(env), 1)
    return min(DEFAULT.cpu_count, 8)
