"""Label-propagation affinity math (pure jnp reference path).

Semantics contract (reference ``src/model/predict.py:19-71``):

1. similarity = ref_features (K*P, C) @ target_features (C, P)
2. multiply by ``temperature`` (the reference multiplies, it does not divide)
3. softmax over *all* reference pixels (the K*P axis)
4. **post-softmax** multiplication by the Gaussian spatial weight — dense
   (sigma1) for the last ``continuous_frame`` sampled slots, sparse (sigma2)
   for the earlier slots once ``frame_idx > 15``; dense everywhere before
   that. The softmax denominator stays unweighted. Skipped entirely for
   probability propagation (``predict.py:59``).
5. prediction = ref_labels (D, K*P) @ weighted similarity (K*P, P)

TPU-native twist: the number of participating reference frames varies early
in a video; instead of dynamic shapes we always run ``num_refs`` slots and
mask invalid slots to -inf before the softmax, which is numerically identical
to excluding them. Everything here is statically shaped and jit/pjit friendly.

The training-side batched variants mirror ``src/model/loss.py:13-36``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

NEG_INF = -1e30


def affinity_logits(
    ref_feats: jnp.ndarray,
    target_feat: jnp.ndarray,
    temperature: float,
    valid: Optional[jnp.ndarray] = None,
    precision="highest",
) -> jnp.ndarray:
    """Scaled similarity logits.

    Args:
      ref_feats: (K, P, C) reference features (memory-bank gather).
      target_feat: (P_t, C) target-frame features.
      temperature: multiplicative temperature (reference ``predict.py:52``).
      valid: optional (K,) bool slot mask.
      precision: matmul precision. This jnp path is the numerics-parity
        reference, so it defaults to full f32; the perf path is the fused
        Pallas kernel (``ops.affinity_pallas``).

    Returns:
      (K, P, P_t) float32 logits, invalid slots at NEG_INF.
    """
    sim = jnp.einsum(
        "kpc,qc->kpq",
        ref_feats,
        target_feat,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    sim = sim * jnp.float32(temperature)
    if valid is not None:
        sim = jnp.where(valid[:, None, None], sim, NEG_INF)
    return sim


def affinity_propagate(
    ref_feats: jnp.ndarray,
    target_feat: jnp.ndarray,
    ref_labels: jnp.ndarray,
    *,
    temperature: float,
    valid: Optional[jnp.ndarray] = None,
    dense: Optional[jnp.ndarray] = None,
    weight_dense: Optional[jnp.ndarray] = None,
    weight_sparse: Optional[jnp.ndarray] = None,
    precision="highest",
) -> jnp.ndarray:
    """Propagate labels from the memory bank to the target frame.

    Args:
      ref_feats: (K, P, C) sampled reference features.
      target_feat: (P_t, C) target features.
      ref_labels: (K, P, D) per-pixel label distribution (one-hot for label
        propagation, soft probabilities for ``--probability`` propagation).
      temperature: softmax temperature multiplier.
      valid: (K,) bool — slot participates (None = all).
      dense: (K,) bool — slot uses ``weight_dense``; None with weights given
        means all-dense. Matches ``predict.py:58-66``.
      weight_dense / weight_sparse: (P, P_t) Gaussian spatial weights; both
        None disables spatial weighting (probability propagation,
        ``predict.py:59``).

    Returns:
      (D, P_t) float32 propagated label scores (columns need not sum to 1 —
      the post-softmax weighting is deliberately unnormalised).
    """
    k, p, _ = ref_feats.shape
    sim = affinity_logits(ref_feats, target_feat, temperature, valid, precision)

    # Softmax over the flattened (K*P) reference-pixel axis.
    m = jnp.max(sim, axis=(0, 1), keepdims=True)
    e = jnp.exp(sim - m)
    if valid is not None:
        e = jnp.where(valid[:, None, None], e, 0.0)
    # With >=1 valid slot the max element contributes exp(0)=1, so denom >= 1
    # and the clamp is inert; it only guards the (never reached in practice)
    # all-invalid case against 0/0 NaN.
    denom = jnp.sum(e, axis=(0, 1), keepdims=True)
    soft = e / jnp.maximum(denom, 1e-30)

    if weight_dense is not None:
        if dense is None:
            dense = jnp.ones((k,), bool)
        w = jnp.where(
            dense[:, None, None],
            weight_dense[None, :, :],
            weight_sparse[None, :, :] if weight_sparse is not None else 0.0,
        )
        soft = soft * w

    return jnp.einsum(
        "kpd,kpq->dq",
        ref_labels,
        soft,
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def batch_similarity(ref: jnp.ndarray, target: jnp.ndarray, precision="highest") -> jnp.ndarray:
    """Training-side batched similarity (reference ``loss.py:13-24``).

    Args:
      ref: (B, num_ref, H, W, C) reference features (NHWC).
      target: (B, H, W, C) target features.

    Returns:
      (B, num_ref*H*W, H*W) float32 similarity.
    """
    b, n, h, w, c = ref.shape
    ref = ref.reshape(b, n * h * w, c)
    target = target.reshape(b, h * w, c)
    return jnp.einsum(
        "brc,bqc->brq",
        ref,
        target,
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def batch_predict(
    global_similarity: jnp.ndarray, ref_label: jnp.ndarray, precision="highest"
) -> jnp.ndarray:
    """Training-side batched label aggregation (reference ``loss.py:27-36``).

    Args:
      global_similarity: (B, num_ref*H*W, H*W).
      ref_label: (B, num_ref, H, W, D) one-hot.

    Returns:
      (B, H, W, D) propagated scores.
    """
    b, n, h, w, d = ref_label.shape
    lab = ref_label.reshape(b, n * h * w, d)
    out = jnp.einsum(
        "brd,brq->bqd",
        lab,
        global_similarity,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.reshape(b, h, w, d)
