"""Fused memory-bank affinity kernel (Pallas / Mosaic, TPU).

The propagation hot path (reference ``src/model/predict.py:47-70``) is
cross-attention: similarity (K·P, C)·(C, P) → ×temperature → softmax over
the K·P reference pixels → post-softmax Gaussian spatial weighting → label
aggregation (D, K·P)·(K·P, P). The jnp path materialises the (K, P, P)
similarity in HBM (1.5 GB at 480p) and streams it three times; this kernel
fuses everything into one pass with flash-attention-style online softmax:

  per (ref-tile i, target-tile j):
    s    = ref_i · tgtᵀ_j + row_bias           (MXU; bias = -1e30 masks
                                                invalid/padded bank rows)
    m'   = max(m, max_rows(s));  e = exp(s - m')
    l    = l·exp(m-m') + Σ_rows e              (softmax denominator —
                                                **unweighted**, predict.py:55)
    w    = exp(-((yᵣ-yₜ)² + (xᵣ-xₜ)²)/σᵣ²)     (spatial prior computed from
                                                coordinates on the fly — the
                                                (P, P) matrix never exists)
    acc  = acc·exp(m-m') + labelsᵢᵀ · (e ⊙ w)  (MXU, D-wide)
  out_j = acc / l

The per-row σ encodes the dense/sparse slot split (``predict.py:58-66``);
rows with σ⁻² = 0 give w = 1, which is exactly probability-propagation mode
(``predict.py:59``) — one kernel serves every variant. The fractional-row
coordinate quirk (``core.spatial``) is preserved because the coordinates are
precomputed host-side by the same function.

Accumulation is f32; inputs bf16 (matching the reference's fp16 autocast
inference). On CPU the kernel runs in interpreter mode for tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(ref_ref, tgt_ref, lab_ref, rmeta_ref, tmeta_ref, out_ref,
            m_ref, l_ref, acc_ref, *, n_i: int, acc_dtype):
    # Layout note: row metadata lives as (R, 128) so that per-row columns
    # slice to natural (TM, 1) sublane vectors; target metadata as (8, P)
    # slices to natural (1, TN) lane vectors. Both broadcast for free on the
    # VPU — storing row metadata as (8, R) instead costs a lane→sublane
    # relayout per tile and was measured ~100x slower end-to-end.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # similarity tile (TM, TN) with the row bias (validity mask / padding)
    s = jnp.dot(ref_ref[...], tgt_ref[...], preferred_element_type=jnp.float32)
    s = s + rmeta_ref[:, 3:4]

    m_old = m_ref[0, :]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=0))
    scale = jnp.exp(m_old - m_new)
    e = jnp.exp(s - m_new[None, :])

    l_ref[0, :] = l_ref[0, :] * scale + jnp.sum(e, axis=0)

    # Gaussian spatial prior from coordinates (row sigma selects dense/sparse)
    dy = rmeta_ref[:, 0:1] - tmeta_ref[0:1, :]
    dx = rmeta_ref[:, 1:2] - tmeta_ref[1:2, :]
    w = jnp.exp(-(dy * dy + dx * dx) * rmeta_ref[:, 2:3])

    ew = (e * w).astype(acc_dtype)
    contrib = jax.lax.dot_general(
        lab_ref[...].astype(acc_dtype), ew,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, TN)
    acc_ref[...] = acc_ref[...] * scale[None, :] + contrib
    m_ref[0, :] = m_new

    @pl.when(i == n_i - 1)
    def _final():
        out_ref[...] = acc_ref[...] / jnp.maximum(l_ref[0:1, :], 1e-30)


@functools.partial(
    jax.jit,
    static_argnames=("block_r", "block_t", "interpret", "label_dtype"),
)
def fused_affinity(
    ref_feats: jnp.ndarray,
    target_feat: jnp.ndarray,
    ref_labels: jnp.ndarray,
    row_coords: jnp.ndarray,
    row_inv_sigma2: jnp.ndarray,
    row_bias: jnp.ndarray,
    tgt_coords: jnp.ndarray,
    *,
    block_r: int = 512,
    block_t: int = 256,
    interpret: bool = False,
    label_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Run the fused kernel.

    Args:
      ref_feats: (R, C) flattened bank rows (temperature pre-folded: pass
        ``ref * temperature`` — sim·T ≡ (T·ref)·tgt).
      target_feat: (P, C) target pixels.
      ref_labels: (R, D) label distribution per bank row.
      row_coords: (R, 2) reference-pixel (y, x) coordinates
        (``core.spatial.spatial_coords`` convention).
      row_inv_sigma2: (R,) 1/σ² per row (0 disables spatial weighting).
      row_bias: (R,) additive logit bias (0 valid, NEG_INF masked).
      tgt_coords: (P, 2) target-pixel coordinates.

    Returns:
      (D, P) float32 propagated scores.
    """
    r, c = ref_feats.shape
    p = target_feat.shape[0]
    d = ref_labels.shape[1]

    r_pad = _round_up(r, block_r)
    p_pad = _round_up(p, block_t)
    d_pad = _round_up(d, 8)

    # Layout-performance note: every construction below stays in >=2-D
    # row-major shapes built with pad/concatenate/broadcast — 1-D
    # stack/tile/repeat on (R,)-length vectors triggered pathological
    # relayouts on TPU (~100x the kernel's own runtime).
    ref = jnp.pad(ref_feats.astype(jnp.bfloat16), ((0, r_pad - r), (0, 0)))
    tgt = jnp.pad(target_feat.astype(jnp.bfloat16).T, ((0, 0), (0, p_pad - p)))
    lab = jnp.pad(
        ref_labels.astype(label_dtype), ((0, r_pad - r), (0, d_pad - d))
    )
    # rmeta columns: 0=y 1=x 2=inv_sigma2 3=bias ; padded rows get NEG_INF
    # bias but inv_sigma2 = 0 (so w = 1, never inf·0). Row-major (R, 128)
    # layout — see the kernel's layout note.
    rmeta4 = jnp.concatenate(
        [
            row_coords.reshape(r, 2),
            row_inv_sigma2.reshape(r, 1),
            row_bias.reshape(r, 1),
        ],
        axis=1,
    )
    pad_rows = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, NEG_INF], jnp.float32), (r_pad - r, 4)
    )
    rmeta = jnp.pad(
        jnp.concatenate([rmeta4, pad_rows], axis=0), ((0, 0), (0, 124))
    )
    tmeta = jnp.pad(tgt_coords.T, ((0, 6), (0, p_pad - p)))

    n_i = r_pad // block_r
    n_j = p_pad // block_t

    out = pl.pallas_call(
        functools.partial(_kernel, n_i=n_i, acc_dtype=label_dtype),
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec((block_r, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_t), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, d_pad), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 128), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_t), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (d_pad, block_t), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d_pad, p_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, block_t), jnp.float32),  # running max
            pltpu.VMEM((1, block_t), jnp.float32),  # running denom
            pltpu.VMEM((d_pad, block_t), jnp.float32),  # numerator accumulator
        ],
        interpret=interpret,
    )(ref, tgt, lab, rmeta, tmeta)

    return out[:d, :p]


def affinity_propagate_pallas(
    ref_feats: jnp.ndarray,
    target_feat: jnp.ndarray,
    ref_labels: jnp.ndarray,
    *,
    feature_hw: Tuple[int, int],
    temperature: float,
    valid: Optional[jnp.ndarray] = None,
    dense: Optional[jnp.ndarray] = None,
    sigma_1: float = 8.0,
    sigma_2: float = 21.0,
    spatial: bool = True,
    interpret: bool = False,
    block_r: int = 512,
    block_t: int = 256,
) -> jnp.ndarray:
    """Drop-in fused equivalent of ``core.affinity_propagate`` for sampled
    banks: (K, P, C)/(K, P, D) inputs, (D, P) output.

    ``spatial=False`` reproduces probability propagation (no weighting).
    """
    from semi_supervised_vos_tpu.core.spatial import spatial_coords

    k, p, c = ref_feats.shape
    d = ref_labels.shape[-1]
    hd, wd = feature_hw
    assert hd * wd == p, (feature_hw, p)

    coords = spatial_coords(hd, wd)  # (P, 2)
    # broadcast in 2/3-D then reshape — see the layout-performance note in
    # fused_affinity on why 1-D tile/repeat must be avoided here
    row_coords = jnp.broadcast_to(coords[None], (k, p, 2)).reshape(k * p, 2)

    if valid is None:
        valid = jnp.ones((k,), bool)
    if dense is None:
        dense = jnp.ones((k,), bool)
    if spatial:
        inv_sigma2_slot = jnp.where(
            dense, 1.0 / (sigma_1**2), 1.0 / (sigma_2**2)
        ).astype(jnp.float32)
    else:
        inv_sigma2_slot = jnp.zeros((k,), jnp.float32)
    row_inv_sigma2 = jnp.broadcast_to(
        inv_sigma2_slot[:, None], (k, p)
    ).reshape(k * p)
    row_bias = jnp.broadcast_to(
        jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None], (k, p)
    ).reshape(k * p)

    return fused_affinity(
        ref_feats.reshape(k * p, c) * jnp.float32(temperature),
        target_feat,
        ref_labels.reshape(k * p, d),
        row_coords,
        row_inv_sigma2,
        row_bias,
        coords,
        block_r=block_r,
        block_t=block_t,
        interpret=interpret,
    )
