"""Collectives layer on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_supervised_vos_tpu.parallel import collectives as col
from semi_supervised_vos_tpu.parallel.mesh import make_mesh


def _mesh():
    return make_mesh(n_data=1, n_model=8)


def test_psum_and_pmean(rng):
    mesh = _mesh()
    x = rng.standard_normal((8, 4)).astype(np.float32)

    f = col.shard_mapped(
        mesh, [P("model")], P("model"),
        lambda s: s * 0 + col.psum(jnp.sum(s), "model"),
    )
    out = np.asarray(f(x))
    np.testing.assert_allclose(out, x.sum(), rtol=1e-5)


def test_all_gather_matches_ring(rng):
    mesh = _mesh()
    x = rng.standard_normal((8, 2, 4)).astype(np.float32)

    g1 = col.shard_mapped(
        mesh, [P("model")], P(),
        lambda s: col.all_gather(s, "model"),
        check_vma=False,
    )
    g2 = col.shard_mapped(
        mesh, [P("model")], P(),
        lambda s: col.ring_all_gather(s, "model"),
        check_vma=False,
    )
    a, b = np.asarray(g1(x)), np.asarray(g2(x))
    np.testing.assert_array_equal(a, x.reshape(a.shape))
    np.testing.assert_array_equal(a, b)


def test_ppermute_shift(rng):
    mesh = _mesh()
    x = np.arange(8, dtype=np.float32).reshape(8, 1)
    f = col.shard_mapped(
        mesh, [P("model")], P("model"),
        lambda s: col.ppermute_shift(s, "model", 1),
    )
    out = np.asarray(f(x)).reshape(-1)
    np.testing.assert_array_equal(out, np.roll(np.arange(8), 1))


def test_reduce_scatter(rng):
    mesh = _mesh()
    # per-device chunk (8, 4); scatter keeps 1 row per device after the sum
    x = rng.standard_normal((64, 4)).astype(np.float32)
    f = col.shard_mapped(
        mesh, [P("model")], P("model"),
        lambda s: col.reduce_scatter(s, "model"),
    )
    out = np.asarray(f(x))  # (8, 4): row i = sum over devices of their row i
    expect = x.reshape(8, 8, 4).sum(axis=0)
    np.testing.assert_allclose(out, expect, rtol=1e-5)
