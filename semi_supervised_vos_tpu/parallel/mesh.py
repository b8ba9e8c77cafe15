"""Device meshes and sharding rules.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(replicate + scatter/gather per step, ``src/train.py:113``). The TPU-native
replacement: a named ``jax.sharding.Mesh`` whose ``data`` axis shards the
batch and whose ``model`` axis (when >1) shards the memory-bank/reference-
pixel dimension of the affinity (the sequence-parallel analog — SURVEY.md §2
parallelism inventory). Parameters are replicated; XLA derives the gradient
all-reduce over ICI from the shardings — no hand-written collectives in the
train step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for (B, ...) arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays with the batch axis sharded over ``data``."""
    s = data_sharding(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
