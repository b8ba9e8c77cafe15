"""Gaussian spatial (motion-prior) weights.

The reference builds a dense ``(H*W, H*W)`` matrix
``exp(-||delta(coord_i, coord_j)||^2 / sigma^2)`` (``src/model/predict.py:158-175``).

Coordinate quirk reproduced exactly: the reference derives coordinates as
``(idx / W, idx % W)`` with *true* division (torch 1.8 ``Tensor.div``), so the
"row" coordinate is fractional — ``r + c / W`` — not the integer row. Parity
with published checkpoints' J&F depends on keeping this exact semantics.

TPU-native design: the matrix is only materialised for moderate resolutions
(480p feature grids: 6420^2 floats ≈ 165 MB) or tests; the fused Pallas kernel
(:mod:`semi_supervised_vos_tpu.ops.affinity_pallas`) recomputes the weight
on the fly from pixel indices, so 1080p never materialises the
multi-GB matrix (SURVEY.md §5 long-context note).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def spatial_coords(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Per-pixel coordinates ``(idx / w, idx % w)`` — shape (h*w, 2).

    Uses the reference's fractional-row convention (``predict.py:167-168``).
    """
    idx = jnp.arange(h * w, dtype=dtype)
    return jnp.stack([idx / float(w), idx % float(w)], axis=-1)


def spatial_weight(
    shape: Tuple[int, int],
    sigma: float,
    t_loc: Optional[float] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Dense ``(H*W, H*W)`` Gaussian weight; ``w[i, j]`` links ref pixel *i*
    to target pixel *j* (reference ``predict.py:158-175``).

    ``t_loc`` reproduces the optional coordinate-delta clamp
    (``predict.py:170-171``): per-component deltas below ``t_loc`` zero out
    *before* squaring.
    """
    h, w = shape
    coords = spatial_coords(h, w, dtype)  # (P, 2)
    # delta[i, j] = coords[j] - coords[i]  (reference: index_matrix - index_matrix.unsqueeze(1))
    delta = coords[None, :, :] - coords[:, None, :]
    if t_loc is not None:
        delta = jnp.where(delta < t_loc, 0.0, delta)
    dist2 = jnp.sum(delta * delta, axis=-1)
    return jnp.exp(-dist2 / (sigma**2))


def descriptor_weight(array: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    """Signed-power descriptor weighting (reference ``predict.py:178-180``,
    unused by any command but part of the public surface)."""
    powed = jnp.power(array, p)
    return jnp.sign(powed) * jnp.abs(powed)


def temporal_weight(
    frame_1: jnp.ndarray,
    frame_2: jnp.ndarray,
    sigma: float,
    t_temp: Optional[float] = None,
) -> jnp.ndarray:
    """Gaussian weight over per-pixel descriptor differences (reference
    ``predict.py:183-190``, unused by any command but part of the surface)."""
    d = frame_1 - frame_2.T
    if t_temp is not None:
        d = jnp.where(d < t_temp, 0.0, d)
    d = jnp.sum(jnp.power(d, 2), axis=-1)
    return jnp.exp(-d / (sigma**2))
