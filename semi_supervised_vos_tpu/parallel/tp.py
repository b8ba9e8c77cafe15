"""Tensor parallelism: channel-sharded backbone over the ``model`` mesh axis.

The reference has no tensor parallelism at all (its only parallelism is
``torch.nn.DataParallel``, ``src/train.py:113``); this is a TPU-native
addition for scaling the *training* step beyond data parallelism — e.g. when
the per-chip batch shard is already 1, or when activation memory (B·T frames
per step, ``src/train.py:155-216``) is the binding constraint.

Design (idiomatic JAX SPMD, not hand-written collectives): every convolution
kernel is sharded over its output-channel dimension and every per-channel
vector (BatchNorm scale/bias and running stats, and the optimizer's momentum
mirror of each) over the same axis. The XLA SPMD partitioner propagates these
shardings through the jitted train step and inserts the activation
all-gathers / contraction psums itself — the "annotate shardings, let XLA
insert collectives" recipe. BatchNorm is naturally tensor-parallel here:
statistics are per-channel, so a channel shard computes its own means and
variances with zero communication.

This composes with data parallelism on a 2-D ``('data', 'model')`` mesh:
the batch axis is sharded over ``data`` (gradient all-reduce over ICI) while
channels shard over ``model``. A uniform shape-based rule suffices for the
whole train state because in this model family every 1-D leaf is a
per-output-channel vector and every 4-D leaf is an HWIO conv kernel with
O ≥ 64 (verified by ``tests/test_tp.py``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(shape, n_model: int) -> P:
    """Sharding rule for one train-state leaf.

    4-D HWIO conv kernels shard the output-channel dim; 1-D per-channel
    vectors (BN scale/bias/mean/var and their optimizer mirrors) shard their
    only dim; everything else (scalars, hyperparams, epoch) replicates.
    """
    if len(shape) == 4 and shape[-1] % n_model == 0:
        return P(None, None, None, "model")
    if len(shape) == 1 and shape[0] % n_model == 0 and shape[0] >= n_model:
        return P("model")
    return P()


def tp_shardings(mesh: Mesh, tree):
    """NamedSharding pytree for ``tree`` under channel tensor-parallelism."""
    n_model = mesh.shape["model"]

    def one(x):
        return NamedSharding(mesh, _leaf_spec(np.shape(x), n_model))

    return jax.tree_util.tree_map(one, tree)


def shard_tp(mesh: Mesh, tree):
    """Place a train state (or any param-shaped pytree) channel-sharded over
    ``model`` and replicated over ``data``. Committed shardings propagate
    into the existing jitted train step unchanged — no step rewrite."""
    shardings = tp_shardings(mesh, tree)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
