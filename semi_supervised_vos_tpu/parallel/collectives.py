"""First-class collectives surface.

The reference hides all inter-device traffic inside
``torch.nn.DataParallel`` (NCCL broadcast/gather — SURVEY.md §2); this
module makes the communication layer explicit: thin, named wrappers over
XLA's collectives plus a ring all-gather built from ``ppermute`` (the
pattern inter-chip RDMA kernels follow). Everything here runs inside
``shard_map`` bodies over a named mesh; ICI carries in-slice traffic, DCN
would carry cross-slice (non-goal for v1, as in SURVEY §5).

This is the production comm surface, not just a test facade: the sharded
inference paths (``parallel/sharded_affinity.py`` distributed softmax,
``parallel/engine_sharded.py`` bank-sharded engine, ``infer/batched.py``
bank-sharded lockstep lanes) issue their pmax/psum through these wrappers.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def psum(x, axis: str = "data"):
    """All-reduce sum over a mesh axis (gradient reduction)."""
    return jax.lax.psum(x, axis)


def pmean(x, axis: str = "data"):
    return jax.lax.pmean(x, axis)


def pmax(x, axis: str = "model"):
    """All-reduce max (the online-softmax global max)."""
    return jax.lax.pmax(x, axis)


def all_gather(x, axis: str = "model", *, tiled: bool = True):
    """Gather shards along the leading dim from every device on the axis."""
    return jax.lax.all_gather(x, axis, tiled=tiled)


def ppermute_shift(x, axis: str = "model", shift: int = 1):
    """Rotate shards around the ring (the ring-attention step)."""
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis, perm)


def reduce_scatter(x, axis: str = "data"):
    """Sum-reduce then keep this device's shard of the leading dim."""
    return jax.lax.psum_scatter(x, axis, tiled=True)


def ring_all_gather(x, axis: str = "model"):
    """All-gather implemented as n-1 ring rotations (``ppermute``) — the
    explicit form of the collective an RDMA Pallas kernel would issue
    (pallas_guide 'Ring Collectives'); bitwise-equal to ``all_gather``."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    def body(i, carry):
        out, cur = carry
        cur = ppermute_shift(cur, axis, 1)
        src = (idx - i - 1) % n
        out = jax.lax.dynamic_update_slice_in_dim(
            out, cur, src * x.shape[0], axis=0
        )
        return out, cur

    out = jnp.zeros((n * x.shape[0],) + x.shape[1:], x.dtype)
    out = jax.lax.dynamic_update_slice_in_dim(out, x, idx * x.shape[0], axis=0)
    out, _ = jax.lax.fori_loop(0, n - 1, body, (out, x))
    return out


def shard_mapped(mesh: Mesh, in_specs: Sequence, out_specs, fn, check_vma: bool = True):
    """Convenience: build a shard_map-ed function over the mesh.

    ``check_vma=False`` disables the replication checker for outputs the
    checker cannot prove replicated (e.g. all-gather results)."""
    return functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=check_vma,
    )(fn)
