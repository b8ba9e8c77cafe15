"""Memory-bank-sharded affinity: the sequence-parallel analog.

The reference's memory bank is the cross-attention context: K·H·W reference
pixels attend to every target pixel (``src/model/predict.py:47-55``). For
long videos / high resolutions a single chip's HBM cannot hold the bank, so
this module shards the reference-**frame** axis across the ``model`` mesh
axis and combines partial softmax statistics with collectives — the standard
distributed-softmax (flash/ring-attention style) decomposition:

  local:  m_i = max(sim_i);  e_i = exp(sim_i - m);  acc_i = labels_i @ (w·e_i)
  global: m = pmax(m_i);     denom = psum(sum(e_i)); out = psum(acc_i)/denom

The post-softmax spatial weighting folds into the numerator only — the
denominator stays unweighted, exactly matching the single-chip semantics
(``predict.py:55-66``). Exercised on a virtual 8-device CPU mesh in
``tests/test_parallel.py`` and by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from semi_supervised_vos_tpu.core.propagation import NEG_INF
from semi_supervised_vos_tpu.parallel import collectives


def distributed_softmax_combine(m, l, acc, axis: str):
    """Combine per-shard ONLINE-softmax statistics over mesh axis ``axis``:

      out = psum(acc·exp(m - pmax(m))) / psum(l·exp(m - pmax(m)))

    The single place the (m, l, acc) contract lives — both sharded engines
    (``parallel/engine_sharded.py`` single-stream, ``infer/batched.py``
    bank-sharded lockstep) feed it the raw statistics the fused kernel emits
    in stats mode. Shapes: m, l (..., P); acc (..., D, P); leading batch
    axes broadcast. All-padding shards carry m == -1e30, so their scale is
    exp(-1e30 - m_g) == 0 — exact no-ops, no NaNs."""
    m_g = collectives.pmax(m, axis)
    scale = jnp.exp(m - m_g)
    denom = collectives.psum(l * scale, axis)
    num = collectives.psum(acc * scale[..., None, :], axis)
    return num / jnp.maximum(denom, 1e-30)[..., None, :]


def _local_stats(ref_feats, target_feat, ref_labels, valid, w, temperature, precision):
    """Per-shard partial softmax statistics."""
    sim = jnp.einsum(
        "kpc,qc->kpq", ref_feats, target_feat,
        preferred_element_type=jnp.float32, precision=precision,
    ) * jnp.float32(temperature)
    sim = jnp.where(valid[:, None, None], sim, NEG_INF)

    m_local = jnp.max(sim, axis=(0, 1))  # (P_t,)
    m = collectives.pmax(m_local, "model")
    e = jnp.exp(sim - m[None, None, :])
    e = jnp.where(valid[:, None, None], e, 0.0)
    denom = collectives.psum(jnp.sum(e, axis=(0, 1)), "model")  # (P_t,)
    if w is not None:
        e = e * w
    acc = jnp.einsum(
        "kpd,kpq->dq", ref_labels, e,
        preferred_element_type=jnp.float32, precision=precision,
    )
    acc = collectives.psum(acc, "model")
    return acc / jnp.maximum(denom, 1e-30)[None, :]


def sharded_affinity_propagate(
    mesh: Mesh,
    ref_feats: jnp.ndarray,
    target_feat: jnp.ndarray,
    ref_labels: jnp.ndarray,
    *,
    temperature: float,
    valid: Optional[jnp.ndarray] = None,
    dense: Optional[jnp.ndarray] = None,
    weight_dense: Optional[jnp.ndarray] = None,
    weight_sparse: Optional[jnp.ndarray] = None,
    precision="default",
) -> jnp.ndarray:
    """Drop-in sharded equivalent of ``core.affinity_propagate``.

    The K (reference-frame) axis of ``ref_feats``/``ref_labels`` and the
    masks shard over the mesh's ``model`` axis; target features and spatial
    weights replicate. K must divide by the model-axis size (pad extra slots
    with ``valid=False`` — masking makes padding exact, not approximate).
    """
    k = ref_feats.shape[0]
    n_model = mesh.shape["model"]
    if valid is None:
        valid = jnp.ones((k,), bool)
    if dense is None:
        dense = jnp.ones((k,), bool)
    if k % n_model != 0:
        # pad the frame axis with masked slots — exact, not approximate,
        # because masking removes them from both softmax terms
        pad = n_model - k % n_model
        ref_feats = jnp.pad(ref_feats, ((0, pad), (0, 0), (0, 0)))
        ref_labels = jnp.pad(ref_labels, ((0, pad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
        dense = jnp.pad(dense, (0, pad))
        k += pad

    def body(ref_f, tgt, ref_l, val, dns, wd, ws):
        if wd is not None:
            w = jnp.where(dns[:, None, None], wd[None], ws[None] if ws is not None else 0.0)
        else:
            w = None
        return _local_stats(ref_f, tgt, ref_l, val, w, temperature, precision)

    shard = functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P("model"), P(), P("model"), P("model"), P("model"),
            P() if weight_dense is not None else None,
            P() if weight_sparse is not None else None,
        ),
        out_specs=P(),
    )
    return shard(body)(
        ref_feats, target_feat, ref_labels, valid, dense, weight_dense, weight_sparse
    )
