"""Label encoding ops: one-hot scatter and RGB→class quantisation.

Replaces the reference's scatter-based helpers (``src/utils/utils.py:45-68``)
with gather/compare formulations that XLA fuses cleanly on TPU (scatters are
slow on the VPU; a one-hot is just an equality against an iota).

Also regenerates the 22-colour DAVIS-palette centroid table the reference
ships as ``annotation_centroids.npy`` (loaded at ``src/train.py:120``). The
values are the first 22 entries of the standard DAVIS/PASCAL palette,
reproduced programmatically from the palette generator rather than copied.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def index_to_onehot(idx: jnp.ndarray, d: int, dtype=jnp.float32) -> jnp.ndarray:
    """One-hot encode class indices.

    Reference ``src/utils/utils.py:59-68`` returns (d, N) for a flat (N,)
    input; this version one-hot-encodes along a trailing axis for any shape
    (TPU-friendly layout: class axis last, minor-most dimension).

    Args:
      idx: integer array (...,).
      d: number of classes.

    Returns:
      (..., d) one-hot array.
    """
    classes = jnp.arange(d, dtype=jnp.int32)
    return (idx[..., None] == classes).astype(dtype)


def color_to_class(img: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Nearest-centroid RGB quantisation (reference ``src/utils/utils.py:45-56``).

    Args:
      img: (..., 3) float RGB values (any leading shape; the reference takes
        (B, 3, H, W) — callers here use channels-last).
      centroids: (D, 3) float centroid table.

    Returns:
      (...) int32 class indices (argmin of Euclidean distance; ties resolve
      to the lowest index, matching torch argmin).
    """
    # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 is constant in the
    # argmin, so a single matmul + bias suffices (MXU-friendly, no (N, D, 3)
    # intermediate).
    x2 = jnp.sum(img * img, axis=-1, keepdims=True)
    xc = jnp.einsum("...c,dc->...d", img, centroids, preferred_element_type=jnp.float32)
    c2 = jnp.sum(centroids * centroids, axis=-1)
    dist2 = x2 - 2.0 * xc + c2
    return jnp.argmin(dist2, axis=-1).astype(jnp.int32)


def davis_palette(n: int = 256) -> np.ndarray:
    """Standard DAVIS/PASCAL-VOC colour palette, (n, 3) uint8.

    Bit-reversal generator; entries 0..21 coincide with the reference's
    ``annotation_centroids.npy`` modulo the two 191-vs-192 entries noted in
    :func:`davis_centroids`.
    """
    palette = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        c = i
        r = g = b = 0
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        palette[i] = (r, g, b)
    return palette


def davis_centroids() -> np.ndarray:
    """The 22-colour class-centroid table, (22, 3) int32.

    Matches the reference's ``annotation_centroids.npy`` byte-for-byte: it is
    the standard palette's first 22 colours with the 192-valued channels
    stored as 191 (the file predates the palette generator; 191 vs 192 never
    changes a nearest-centroid assignment of palette-rendered annotations).
    """
    table = davis_palette()[:22].astype(np.int32)
    table[table == 192] = 191
    return table
