"""Fused bottleneck block (Pallas / Mosaic, TPU).

One BN-folded ResNet bottleneck —
``relu(x + conv1x1(relu(conv3x3(relu(conv1x1(x)))))`` — as a single kernel.
The reference runs each conv/BN/ReLU as a separate CUDA op
(``src/model/backbone/resnet.py:60-96``); on TPU the block is HBM-bound when
executed op-by-op (the 1024-channel activation crosses HBM ~6x per block).
Here the narrow 256-channel intermediate ``y1`` lives entirely in VMEM
(H·W·256·2B ≈ 3.3 MB at 480p), and the input streams through once in a
lag-1 software pipeline:

  grid step s:  (a) encode strip s:  y1[s] = relu(x_s @ W1 + b1)
                (b) decode strip s-1 (needs y1 rows up to s·R, available):
                    y2 = relu(Σ_{dy,dx} y1[shifted] @ W2[dy,dx] + b2)
                    out = relu(x_{s-1} + y2 @ W3 + b3)

HBM traffic per block: x once in, out once out, weights once (~28 MB at
480p) — vs ~6 activation crossings plus any XLA slice materialisation.
Only stride-1 blocks without a downsample branch qualify (layer3_1..5 and
layer4_0..2 of the VOS ResNet-50 — 8 of its 9 heavy blocks; layer4_0 has no
downsample because inplanes == planes·4, ``resnet.py:124-131``).

Weights must be BN-folded (:mod:`semi_supervised_vos_tpu.models.fold`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_strip(h: int, w: int, c: int, c4: int) -> int:
    """Largest divisor of h keeping the strip working set inside the ~16 MB
    scoped-VMEM budget. Calibrated on-chip: strips of R·W ≤ 856 pixels fit
    (R=8 @ W=107 layer3/4 and R=4 @ W=214 layer1 both compile; R=10 @ W=214
    overflows by 2.5 MB). The strip-pixel count drives every R-proportional
    buffer (saved inputs, double-buffered IO, f32 dot outputs)."""
    target = max(1, min(16, 856 // w))
    for r in range(min(target, h), 0, -1):
        if h % r == 0:
            return r
    return 1


def _block_kernel(
    x_ref,    # (1, R, W, C)
    w1_ref,   # (C, C4)
    b1_ref,   # (1, C4)
    w2_ref,   # (9, C4, C4)
    b2_ref,   # (1, C4)
    w3_ref,   # (C4, C)
    b3_ref,   # (1, C)
    out_ref,  # (1, R, W, C)
    y1_ref,   # (3, R, W+2, C4) rolling ring of encoded strips, zero side cols
    xs_ref,   # (2, R, W, C) saved input strips (residual)
    *,
    n_strips: int,
    r: int,
    w: int,
    acc_dtype,
):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _zero():
        # side columns must read zero; interiors are overwritten every strip
        y1_ref[...] = jnp.zeros_like(y1_ref)

    c = x_ref.shape[-1]
    c4 = w1_ref.shape[-1]

    @pl.when(s < n_strips)
    def _encode():
        x_strip = x_ref[0]  # (R, W, C)
        xs_ref[s % 2] = x_strip
        y1 = jnp.dot(
            x_strip.reshape(r * w, c), w1_ref[...],
            preferred_element_type=jnp.float32,
        )
        y1 = jnp.maximum(y1 + b1_ref[0], 0.0).astype(y1_ref.dtype)
        y1_ref[s % 3, :, 1 : 1 + w, :] = y1.reshape(r, w, c4)

    @pl.when(s >= 1)
    def _decode():
        t = s - 1
        # rows (t·R - 1 .. t·R + R) of y1 span three ring strips: the last
        # row of strip t-1, strip t, and the first row of strip t+1; the
        # image borders (t == 0 top, t == n-1 bottom) read zero.
        cur = y1_ref[t % 3]  # (R, W+2, C4)
        prev_last = jnp.where(t > 0, y1_ref[(t - 1) % 3, r - 1 : r], 0.0)
        next_first = jnp.where(t < n_strips - 1, y1_ref[(t + 1) % 3, 0:1], 0.0)
        if r > 1:
            rows = {
                0: jnp.concatenate([prev_last, cur[: r - 1]], axis=0),
                1: cur,
                2: jnp.concatenate([cur[1:], next_first], axis=0),
            }
        else:  # R == 1: zero-length slices are not lowerable vectors
            rows = {0: prev_last, 1: cur, 2: next_first}
        acc = jnp.zeros((r * w, c4), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = rows[dy][:, dx : dx + w, :]
                acc += jnp.dot(
                    tap.reshape(r * w, c4),
                    w2_ref[dy * 3 + dx],
                    preferred_element_type=jnp.float32,
                )
        y2 = jnp.maximum(acc + b2_ref[0], 0.0).astype(acc_dtype)
        y3 = jnp.dot(y2, w3_ref[...], preferred_element_type=jnp.float32)
        y3 = y3 + b3_ref[0] + xs_ref[t % 2].reshape(r * w, c).astype(jnp.float32)
        out_ref[0] = jnp.maximum(y3, 0.0).astype(out_ref.dtype).reshape(r, w, c)


def bottleneck_block(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    w3: jnp.ndarray,
    b3: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused stride-1 bottleneck block without downsample branch.

    Args:
      x: (B, H, W, C) activations (bf16 recommended).
      w1: (1, 1, C, C4) or (C, C4) folded 1x1 kernel; b1: (C4,).
      w2: (3, 3, C4, C4) folded 3x3 kernel; b2: (C4,).
      w3: (1, 1, C4, C) or (C4, C) folded 1x1 kernel; b3: (C,).

    Returns (B, H, W, C), same dtype as x.
    """
    bsz, h, w, c = x.shape
    w1 = w1.reshape(w1.shape[-2], w1.shape[-1])
    w3 = w3.reshape(w3.shape[-2], w3.shape[-1])
    c4 = w1.shape[-1]
    assert w2.shape == (3, 3, c4, c4), w2.shape
    w2 = w2.reshape(9, c4, c4)

    r = _pick_strip(h, w, c, c4)
    n_strips = h // r

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, s: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _block_kernel, n_strips=n_strips, r=r, w=w, acc_dtype=x.dtype
        ),
        grid=(bsz, n_strips + 1),
        in_specs=[
            pl.BlockSpec(
                (1, r, w, c),
                lambda b, s: (b, jnp.minimum(s, n_strips - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            const((c, c4)),
            const((1, c4)),
            const((9, c4, c4)),
            const((1, c4)),
            const((c4, c)),
            const((1, c)),
        ],
        out_specs=pl.BlockSpec(
            (1, r, w, c),
            lambda b, s: (b, jnp.maximum(s - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, r, w + 2, c4), x.dtype),
            pltpu.VMEM((2, r, w, c), x.dtype),
        ],
        interpret=interpret,
    )(
        x,
        w1.astype(x.dtype),
        b1.reshape(1, c4).astype(jnp.float32),
        w2.astype(x.dtype),
        b2.reshape(1, c4).astype(jnp.float32),
        w3.astype(x.dtype),
        b3.reshape(1, c).astype(jnp.float32),
    )
    return out


def bottleneck_stack(x, blocks, *, interpret: bool = False):
    """Run a sequence of fused bottleneck blocks.

    ``blocks`` is a list of (w1, b1, w2, b2, w3, b3) tuples. Each block is
    one pallas_call; the 1024-ch activation round-trips HBM between blocks
    (it cannot stay resident in ~16 MB VMEM), which is the minimum possible
    traffic for this topology.
    """
    for blk in blocks:
        x = bottleneck_block(x, *blk, interpret=interpret)
    return x
