"""Fused memory-bank affinity kernel (Pallas / Mosaic, TPU).

The propagation hot path (reference ``src/model/predict.py:47-70``) is
cross-attention: similarity (K·P, C)·(C, P) → ×temperature → softmax over
the K·P reference pixels → post-softmax Gaussian spatial weighting → label
aggregation (D, K·P)·(K·P, P). The jnp path materialises the (K, P, P)
similarity in HBM (1.5 GB at 480p) and streams it three times — it does not
even compile at 480p on this TPU runtime; this kernel fuses everything into
one pass with flash-attention-style online softmax:

  per (ref-tile i, target-tile j):
    s    = ref_i · tgtᵀ_j + pad_bias + slot_bias    (MXU; -1e30 masks padded
                                                     rows / invalid slots)
    m'   = max(m, max_rows(s));  e = exp(s - m')
    l    = l·exp(m-m') + Σ_rows e                   (softmax denominator —
                                                     **unweighted**, predict.py:55)
    w    = exp(-((yᵣ-yₜ)² + (xᵣ-xₜ)²)·invσ²_slot)   (spatial prior from
                                                     coordinates on the fly —
                                                     the (P, P) matrix never
                                                     exists)
    acc  = acc·exp(m-m') + labelsᵢᵀ · (e ⊙ w)       (MXU, D-wide)
  out_j = acc / l

Layout design (performance-critical on this runtime):
  * The bank keeps its (K, P_pad, C) slot structure with P padded per slot to
    a block multiple, so every ref tile belongs to exactly **one** slot:
    ``slot = i // tiles_per_slot``. Per-slot dynamics (1/σ² selecting the
    dense/sparse prior, validity bias) are a tiny (8, 2) SMEM table indexed
    by that scalar — no (K·P,)-long per-frame metadata vectors. Building
    those vectors with 1-D tile/repeat/stack/concatenate was measured ~100x
    slower than the kernel itself (narrow-array relayouts).
  * Static per-resolution metadata (pixel coordinates with the reference's
    fractional-row convention, within-slot padding bias) is built once in
    host NumPy and traced as a small constant.
  * Row metadata is row-major (P_pad, 128) so per-row columns slice to
    natural (TM, 1) sublane vectors; target metadata is (8, P_pad) slicing
    to natural (1, TN) lane vectors — all VPU broadcasts are free.

invσ² = 0 gives w = 1, which is exactly probability-propagation mode
(``predict.py:59``) — one kernel serves dense/sparse/probability variants.
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

# Far-tile skip threshold for the bank kernel: a (bank-tile, target-chunk)
# pair whose *minimum* squared row distance satisfies dy² · invσ² >= 36 has
# spatial weight w <= exp(-36) ≈ 2.3e-16 for every pixel pair, so its whole
# numerator contribution can be dropped with a PROVEN absolute bound: the
# dropped mass per class is Σ e·w·label <= exp(-36) · Σ e <= exp(-36) · l
# (labels are <= 1 and the dropped rows' Σ e is part of the very denominator
# l that divides the output), hence every output score moves by < 2.3e-16
# ABSOLUTE on the [0, 1] score scale. This can only alter an argmax in the
# degenerate regime where ALL class scores are below ~1e-14 — i.e. no bank
# pixel within 6σ carries any label mass AND every retained logit sits
# >= 36 nats under the global max; such scores carry no signal in any
# precision the pipeline uses. The softmax denominator and running max still
# see every tile (the reference normalises over ALL bank pixels,
# ``predict.py:55`` — that part is irreducible). Tiles span whole rows, so
# only the row coordinate separates tile pairs; the column gap is 0.
# invσ² == 0 (probability propagation) makes every pair "near" — no skip.
_TILESKIP_THRESH = 36.0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def target_tiling(
    p: int, block_t: int = 512, block_tj_cap: int = 8192
) -> Tuple[int, int, int]:
    """(t_pad, block_tj, n_j) for a P-pixel target at the given tile width.

    Splits the target axis into macro-tiles when wider than the VMEM cap;
    once tiling engages, the cap halves — jj-indexed target/out blocks
    double-buffer, and 8192-wide tiles measured 17.9 MB of scoped VMEM at
    1080p (limit 16 MB) where 4096-wide tiles fit. Exposed so callers that
    pre-transpose the target (``target_t``) can pad to the exact width the
    kernel will demand."""
    t_pad = _round_up(p, block_t)
    if t_pad > block_tj_cap:
        block_tj_cap = max(block_t, block_tj_cap // 2)
    n_j = -(-t_pad // block_tj_cap)
    block_tj = _round_up(-(-t_pad // n_j), block_t)
    return block_tj * n_j, block_tj, n_j


def default_blocks(p: int) -> Tuple[int, int]:
    """Measured-optimal (block_r, block_t) per feature-pixel count.

    Same-window on-chip sweeps (best-of-4 slope timings, single video):
    480p (P=6420)   (512, 512) 2.44 ms/frame vs (1024, 512) 2.57 vs
                    (1024, 1024) 2.77 — small grids want small tiles;
    1080p (P=32400) (1024, 1024) 53.9 ms vs (512, 512) 60.7 — big grids
                    amortise tile overhead and want MXU-saturating tiles.
    The crossover is taken at 16K pixels (halfway in log space)."""
    return (512, 512) if p <= 16384 else (1024, 1024)


def _kernel(
    smeta_ref,  # (8, 2) SMEM: per-slot [inv_sigma2, bias]
    ref_ref,    # (1, TM, C)
    tgt_ref,    # (C, TN)
    lab_ref,    # (1, TM, D)
    cmeta_ref,  # (TM, 128): columns 0=y 1=x 2=pad_bias
    tmeta_ref,  # (8, TN): rows 0=y 1=x
    out_ref,    # (D, TN)
    m_ref,
    l_ref,
    acc_ref,
    *,
    n_i: int,
    tiles_per_slot: int,
    acc_dtype,
):
    i = pl.program_id(1)
    slot = i // tiles_per_slot
    inv_sigma2 = smeta_ref[slot, 0]
    slot_bias = smeta_ref[slot, 1]

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # similarity tile (TM, TN); bias masks padded rows and invalid slots
    s = jnp.dot(ref_ref[0], tgt_ref[...], preferred_element_type=jnp.float32)
    s = s + cmeta_ref[:, 2:3] + slot_bias

    m_old = m_ref[0, :]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=0))
    scale = jnp.exp(m_old - m_new)
    e = jnp.exp(s - m_new[None, :])

    l_ref[0, :] = l_ref[0, :] * scale + jnp.sum(e, axis=0)

    # Gaussian spatial prior from coordinates (slot sigma: dense or sparse)
    dy = cmeta_ref[:, 0:1] - tmeta_ref[0:1, :]
    dx = cmeta_ref[:, 1:2] - tmeta_ref[1:2, :]
    w = jnp.exp(-(dy * dy + dx * dx) * inv_sigma2)

    ew = (e * w).astype(acc_dtype)
    contrib = jax.lax.dot_general(
        lab_ref[0].astype(acc_dtype),
        ew,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, TN)
    acc_ref[...] = acc_ref[...] * scale[None, :] + contrib
    m_ref[0, :] = m_new

    @pl.when(i == n_i - 1)
    def _final():
        out_ref[...] = acc_ref[...] / jnp.maximum(l_ref[0:1, :], 1e-30)


@functools.lru_cache(maxsize=32)
def _static_meta(hd: int, wd: int, p_pad: int, t_pad: int):
    """Host-NumPy static metadata for one feature resolution.

    Returns (cmeta (p_pad, 128), tmeta (8, t_pad)) with the reference's
    fractional-row coordinate convention (``core/spatial.py``).
    """
    p = hd * wd
    idx = np.arange(p, dtype=np.float32)
    y = idx / float(wd)
    x = idx % float(wd)
    cmeta = np.zeros((p_pad, 128), np.float32)
    cmeta[:p, 0] = y
    cmeta[:p, 1] = x
    cmeta[p:, 2] = NEG_INF  # within-slot padding rows masked
    tmeta = np.zeros((8, t_pad), np.float32)
    tmeta[0, :p] = y
    tmeta[1, :p] = x
    return cmeta, tmeta


def _bank_kernel(
    slots_ref,  # (K,) scalar-prefetched physical slots
    rowb_ref,   # (1,) scalar-prefetched global row offset of this bank shard
    smeta_ref,  # (K, 2) SMEM: per-slot [inv_sigma2, bias]
    ref_ref,    # (1, 1, TM, C) — one bank tile, DMA'd ONCE per (jj) sweep
    tgt_ref,    # (1, C, TJ) — one target macro-tile, resident in VMEM
    lab_ref,    # (1, 1, TM, D)
    *refs,      # outputs then scratch — see below
    n_i: int,
    tiles_per_slot: int,
    block_j: int,
    wd: int,
    p: int,
    acc_dtype,
    return_stats: bool,
):
    """Online-softmax update, bandwidth-optimal orientation.

    Grid is (B, n_j, n_i): for each (video, target-macro-tile) the bank is
    streamed once, so bank bytes cross HBM n_j times per frame. n_j is 1
    whenever the full-width target fits the VMEM budget (every 480p shape);
    at 1080p (T_pad 32768) the target axis splits into a few macro-tiles of
    ``block_tj`` columns so the resident set (target columns + accumulators)
    stays bounded — that re-streams the ~165 MB sampled bank n_j times
    (~0.8 ms/frame of HBM at n_j=4), a fraction of the 1080p affinity
    compute, and is what lets B >= 4 lockstep videos compile at 1080p.
    Within a macro-tile the target is processed in ``block_j`` column chunks
    so the (TM, block_j) similarity tile stays small. Pixel coordinates (the
    reference's fractional-row convention, ``core/spatial.py``) and
    within-slot padding bias are computed from iota in-kernel — no metadata
    arrays, no metadata traffic.

    ``rowb_ref`` offsets the row (reference-pixel) indices: a bank shard
    holding global pixel rows [row_base, row_base + P_loc) (the multi-chip
    pixel-sharded bank, ``parallel/engine_sharded.py``) computes coordinates
    and padding masks in global terms, so sharded results combine exactly.

    With ``return_stats`` the kernel emits the raw online-softmax statistics
    (m, l, acc) instead of the normalised acc/l — the per-shard partial
    results of the distributed softmax, combined across chips with
    pmax/psum (``parallel/sharded_affinity.py``'s decomposition).

    The orientation with target-tile as the *innermost* grid axis — grid
    (B, n_j, n_i) with i outer — would re-stream the whole sampled bank once
    per 512-column tile: ~231 MB/frame at 480p single-video, ~1.9 GB/frame
    at B=8, which made the batched engine HBM-bound and slower than
    single-stream.
    """
    if return_stats:
        m_out, l_out, acc_out, m_ref, l_ref, acc_ref = refs
    else:
        (out_ref, m_ref, l_ref, acc_ref) = refs
    jj = pl.program_id(1)
    i = pl.program_id(2)
    slot = i // tiles_per_slot
    tile = i % tiles_per_slot
    inv_sigma2 = smeta_ref[slot, 0]
    slot_bias = smeta_ref[slot, 1]

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ref_tile = ref_ref[0, 0]  # (TM, C)
    lab_tile = lab_ref[0, 0]  # (TM, D)
    tm = ref_tile.shape[0]

    # GLOBAL row (reference-pixel) coordinates + padding mask from iota
    ridx = (
        rowb_ref[0]
        + tile * tm
        + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    )
    ry = ridx.astype(jnp.float32) / float(wd)
    rx = (ridx % wd).astype(jnp.float32)
    pad_bias = jnp.where(ridx < p, 0.0, NEG_INF)

    tj = tgt_ref.shape[-1]
    for jc in range(tj // block_j):
        sl = slice(jc * block_j, (jc + 1) * block_j)
        s = jnp.dot(
            ref_tile, tgt_ref[0, :, sl], preferred_element_type=jnp.float32
        )
        s = s + pad_bias + slot_bias

        m_old = m_ref[0, sl]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=0))
        scale = jnp.exp(m_old - m_new)
        e = jnp.exp(s - m_new[None, :])

        l_ref[0, sl] = l_ref[0, sl] * scale + jnp.sum(e, axis=0)

        # Far-tile skip: scalar bounds of the row coordinates spanned by this
        # (bank-tile, target-chunk) pair. When the minimum possible row gap
        # already zeroes the Gaussian (see _TILESKIP_THRESH), the numerator
        # contribution is skipped wholesale — only the rescale-by-exp(m-m')
        # carry runs. The denominator/max updates above are unconditional.
        row0 = (rowb_ref[0] + tile * tm).astype(jnp.float32)
        c0 = jnp.float32(jj * tj + jc * block_j)
        ry_lo, ry_hi = row0 / wd, (row0 + (tm - 1)) / wd
        ty_lo, ty_hi = c0 / wd, (c0 + (block_j - 1)) / wd
        dy_gap = jnp.maximum(jnp.maximum(ty_lo - ry_hi, ry_lo - ty_hi), 0.0)
        near = dy_gap * dy_gap * inv_sigma2 < _TILESKIP_THRESH

        @pl.when(near)
        def _near(sl=sl, e=e, scale=scale):
            # Gaussian spatial prior from GLOBAL coordinates (slot sigma)
            cidx = (
                jj * tj
                + jc * block_j
                + jax.lax.broadcasted_iota(jnp.int32, (1, block_j), 1)
            )
            ty = cidx.astype(jnp.float32) / float(wd)
            tx = (cidx % wd).astype(jnp.float32)
            dy = ry - ty
            dx = rx - tx
            w = jnp.exp(-(dy * dy + dx * dx) * inv_sigma2)

            ew = (e * w).astype(acc_dtype)
            contrib = jax.lax.dot_general(
                lab_tile.astype(acc_dtype),
                ew,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (D, block_j)
            acc_ref[:, sl] = acc_ref[:, sl] * scale[None, :] + contrib

        @pl.when(jnp.logical_not(near))
        def _far(sl=sl, scale=scale):
            acc_ref[:, sl] = acc_ref[:, sl] * scale[None, :]

        m_ref[0, sl] = m_new

    @pl.when(i == n_i - 1)
    def _final():
        if return_stats:
            # m_out/l_out blocks are (1, 1, block_tj) — see the out_specs
            # note on Mosaic's last-two-dims constraint for B > 1
            m_out[0, 0] = m_ref[0, :]
            l_out[0, 0] = l_ref[0, :]
            acc_out[0] = acc_ref[...]
        else:
            out_ref[0] = acc_ref[...] / jnp.maximum(l_ref[0:1, :], 1e-30)


def _slot_meta(k, valid, dense, sigma_1, sigma_2, spatial):
    """(K, 2) [inv_sigma2, additive bias] table shared by all kernel entry
    points; inv_sigma2 == 0 turns the spatial prior off (probability mode)."""
    if valid is None:
        valid = jnp.ones((k,), bool)
    if dense is None:
        dense = jnp.ones((k,), bool)
    if spatial:
        inv_sigma2 = jnp.where(dense, 1.0 / (sigma_1**2), 1.0 / (sigma_2**2))
    else:
        inv_sigma2 = jnp.zeros((k,), jnp.float32)
    slot_bias = jnp.where(valid, 0.0, NEG_INF)
    return jnp.stack(
        [inv_sigma2.astype(jnp.float32), slot_bias.astype(jnp.float32)], axis=1
    )


def affinity_from_bank_batched(
    bank_feats: jnp.ndarray,
    bank_labels: jnp.ndarray,
    target_feats: jnp.ndarray,
    slots: jnp.ndarray,
    *,
    feature_hw: Tuple[int, int],
    temperature: float,
    valid: Optional[jnp.ndarray] = None,
    dense: Optional[jnp.ndarray] = None,
    sigma_1: float = 8.0,
    sigma_2: float = 21.0,
    spatial: bool = True,
    interpret: bool = False,
    block_r: int = 1024,
    block_t: int = 512,
    block_tj_cap: int = 8192,
    label_dtype=jnp.bfloat16,
    row_base: Optional[jnp.ndarray] = None,
    return_stats: bool = False,
    target_t: Optional[jnp.ndarray] = None,
):
    """Gather-free batched variant: B videos propagate in lockstep, each
    streaming reference tiles **directly from its ring memory bank** via
    scalar-prefetched slot indices — the (B, K, P, C) gather (~30 MB/frame/
    video at 480p) never happens; the banks stay in HBM and tiles DMA
    straight into VMEM. The sampling schedule (and hence ``slots``) is shared
    across the batch because lockstep videos share ``frame_idx``.

    Args:
      bank_feats: (capacity, B, P_loc, C) raw bank features, P padded to a
        ``block_r`` multiple (the temperature folds into the *target* here —
        sim·T ≡ ref·(T·tgt) — so bank writes stay untouched). The slot axis
        leads so per-frame bank updates are one contiguous dynamic slice.
      bank_labels: (capacity, B, P_loc, D_pad) with D_pad % 8 == 0.
      target_feats: (B, P, C) current-frame features.
      slots: (K,) int32 physical bank slots of the sampled logical frames.
      valid / dense: (K,) slot masks.
      block_tj_cap: max resident target columns; wider targets split into
        macro-tiles (bank re-streamed once per macro-tile — the 1080p/B>=4
        VMEM bound).
      row_base: global pixel-row index of this bank's first row (traced
        scalar). Defaults to 0; a pixel-sharded bank shard passes its offset
        so coordinates/masks are computed in global terms.
      return_stats: emit raw online-softmax statistics instead of the
        normalised result — for the multi-chip distributed softmax.

    Returns:
      (B, D_pad, P) float32 propagated scores (trailing label padding rows
      are exactly zero) — or, with ``return_stats``, a tuple
      (m (B, P), l (B, P), acc (B, D_pad, P)) such that the full result is
      ``psum(acc·exp(m-pmax(m))) / psum(l·exp(m-pmax(m)))``.
    """
    cap, b, p_loc, c = bank_feats.shape
    d_pad = bank_labels.shape[-1]
    k = slots.shape[0]
    hd, wd = feature_hw
    p = hd * wd
    # p is the GLOBAL pixel count; a shard's local rows p_loc may be less —
    # but ONLY a shard (explicit row_base) may hold fewer rows than P. A
    # non-sharded bank smaller than the grid would silently drop pixels from
    # the softmax (tiles_per_slot covers p_loc rows only).
    assert p_loc % block_r == 0 and d_pad % 8 == 0
    assert row_base is not None or p_loc >= p, (p_loc, p)

    t_pad, block_tj, n_j = target_tiling(p, block_t, block_tj_cap)
    tiles_per_slot = p_loc // block_r
    smeta = _slot_meta(k, valid, dense, sigma_1, sigma_2, spatial)
    if row_base is None:
        row_base = jnp.zeros((1,), jnp.int32)
    else:
        row_base = jnp.asarray(row_base, jnp.int32).reshape(1)

    if target_t is not None:
        # pre-transposed (B, C, t_pad) target, temperature already folded —
        # the scanned engines hoist this transpose OUT of the chunk scan so
        # XLA's layout assignment never prefers a p-minor layout for the
        # loop-carried bank (a {2,3,1,0} carry forces a full-bank transpose
        # copy per iteration against the kernel's {3,2,1,0} operand
        # constraint: 1.23 GB/step at 480p B=8, the whole batched-vs-single
        # step gap attributed by prof/ab_glue2.py + prof/ab_hlo.py)
        assert target_t.shape == (b, c, t_pad), (target_t.shape, (b, c, t_pad))
        tgt = target_t.astype(bank_feats.dtype)
    else:
        # temperature folds into the target (sim·T == ref·(T·tgt))
        tgt = jnp.pad(
            (target_feats * jnp.float32(temperature))
            .astype(bank_feats.dtype)
            .transpose(0, 2, 1),
            ((0, 0), (0, 0), (0, t_pad - p)),
        )  # (B, C, t_pad)

    n_i = k * tiles_per_slot

    if return_stats:
        # m/l are logically (B, t_pad) but carried as (B, 1, t_pad): Mosaic
        # constrains a block's LAST TWO dims (divisible by (8, 128) or equal
        # to the array's) — a (1, block_tj) block over a (B, t_pad) array
        # fails for B > 1 (caught by the first real-chip lowering of the
        # batched stats path, bench.py::batched_sharded_check); the unit
        # middle axis makes the constrained dims (1, block_tj) with dim -2
        # equal to the array's. Squeezed back below.
        out_specs = [
            pl.BlockSpec(
                (1, 1, block_tj), lambda bb, jj, i, s, r: (bb, 0, jj),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_tj), lambda bb, jj, i, s, r: (bb, 0, jj),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, d_pad, block_tj), lambda bb, jj, i, s, r: (bb, 0, jj),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, 1, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, d_pad, t_pad), jnp.float32),
        ]
    else:
        out_specs = pl.BlockSpec(
            (1, d_pad, block_tj),
            lambda bb, jj, i, s, r: (bb, 0, jj),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((b, d_pad, t_pad), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # slots, row_base
        grid=(b, n_j, n_i),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # smeta (K, 2)
            pl.BlockSpec(
                (1, 1, block_r, c),
                lambda bb, jj, i, slots_ref, r: (
                    slots_ref[i // tiles_per_slot],
                    bb,
                    i % tiles_per_slot,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            # one target macro-tile resident per (video, jj) sweep
            pl.BlockSpec(
                (1, c, block_tj),
                lambda bb, jj, i, s, r: (bb, 0, jj),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_r, d_pad),
                lambda bb, jj, i, slots_ref, r: (
                    slots_ref[i // tiles_per_slot],
                    bb,
                    i % tiles_per_slot,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((1, block_tj), jnp.float32),  # running max
            pltpu.VMEM((1, block_tj), jnp.float32),  # running denom
            pltpu.VMEM((d_pad, block_tj), jnp.float32),  # numerator acc
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _bank_kernel,
            n_i=n_i,
            tiles_per_slot=tiles_per_slot,
            block_j=block_t,
            wd=wd,
            p=p,
            acc_dtype=label_dtype,
            return_stats=return_stats,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(slots.astype(jnp.int32), row_base, smeta, bank_feats, tgt, bank_labels)

    if return_stats:
        m, l, acc = out
        return m[:, 0, :p], l[:, 0, :p], acc[:, :, :p]
    return out[:, :, :p]


def affinity_from_bank(
    bank_feats: jnp.ndarray,
    bank_labels: jnp.ndarray,
    target_feat: jnp.ndarray,
    slots: jnp.ndarray,
    **kw,
) -> jnp.ndarray:
    """Single-video bank-direct propagation: the B == 1 case of
    :func:`affinity_from_bank_batched` (free reshapes on contiguous banks).

    Args:
      bank_feats: (capacity, P_pad, C); bank_labels: (capacity, P_pad, D_pad);
      target_feat: (P, C); slots: (K,). Keywords as the batched variant.

    Returns:
      (D_pad, P) float32 propagated scores.
    """
    cap, p_pad, c = bank_feats.shape
    d_pad = bank_labels.shape[-1]
    out = affinity_from_bank_batched(
        bank_feats.reshape(cap, 1, p_pad, c),
        bank_labels.reshape(cap, 1, p_pad, d_pad),
        target_feat[None],
        slots,
        **kw,
    )
    return out[0]


def affinity_from_bank_stats(
    bank_feats: jnp.ndarray,
    bank_labels: jnp.ndarray,
    target_feat: jnp.ndarray,
    slots: jnp.ndarray,
    *,
    row_base,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-shard online-softmax statistics of the bank-direct kernel.

    For a bank shard holding GLOBAL pixel rows [row_base, row_base + P_loc)
    of the pixel-sharded memory bank (``parallel/engine_sharded.py``),
    returns (m (P,), l (P,), acc (D_pad, P)) over the full (replicated)
    target, computed with global coordinates/masks. The exact full result is
    the distributed-softmax combine across shards (the same decomposition as
    ``parallel/sharded_affinity.py``):

      m* = pmax(m);  out = psum(acc·exp(m-m*)) / psum(l·exp(m-m*))

    Args: as :func:`affinity_from_bank`, plus ``row_base`` (traced scalar).
    ``feature_hw`` is the GLOBAL feature grid.
    """
    cap, p_loc, c = bank_feats.shape
    d_pad = bank_labels.shape[-1]
    m, l, acc = affinity_from_bank_batched(
        bank_feats.reshape(cap, 1, p_loc, c),
        bank_labels.reshape(cap, 1, p_loc, d_pad),
        target_feat[None],
        slots,
        row_base=row_base,
        return_stats=True,
        **kw,
    )
    return m[0], l[0], acc[0]


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
    block_r: int = 1024,
    block_t: int = 512,
    label_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Drop-in fused equivalent of ``core.affinity_propagate``.

    Args:
      ref_feats: (K, P, C) sampled bank features.
      target_feat: (P, C) target features.
      ref_labels: (K, P, D) label distribution.
      feature_hw: (hd, wd) with hd*wd == P.
      valid / dense: (K,) slot masks (see ``core.sampling.sample_frames``).
      spatial: False reproduces probability propagation (no weighting).

    Returns:
      (D, P) float32 propagated scores. Call under jit (the engine does).
    """
    k, p, c = ref_feats.shape
    d = ref_labels.shape[-1]
    hd, wd = feature_hw
    assert hd * wd == p, (feature_hw, p)

    p_pad = _round_up(p, block_r)
    t_pad = _round_up(p, block_t)
    d_pad = _round_up(d, 8)
    k_pad = k  # K is static; no slot padding needed
    tiles_per_slot = p_pad // block_r

    smeta = _slot_meta(k, valid, dense, sigma_1, sigma_2, spatial)

    ref = jnp.pad(
        (ref_feats * jnp.float32(temperature)).astype(jnp.bfloat16),
        ((0, 0), (0, p_pad - p), (0, 0)),
    )
    tgt = jnp.pad(target_feat.astype(jnp.bfloat16).T, ((0, 0), (0, t_pad - p)))
    lab = jnp.pad(
        ref_labels.astype(label_dtype),
        ((0, 0), (0, p_pad - p), (0, d_pad - d)),
    )
    cmeta_np, tmeta_np = _static_meta(hd, wd, p_pad, t_pad)
    cmeta = jnp.asarray(cmeta_np)
    tmeta = jnp.asarray(tmeta_np)

    n_i = k_pad * tiles_per_slot
    n_j = t_pad // block_t

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            n_i=n_i,
            tiles_per_slot=tiles_per_slot,
            acc_dtype=label_dtype,
        ),
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # smeta, full (K, 2)
            pl.BlockSpec(
                (1, block_r, c),
                lambda j, i: (i // tiles_per_slot, i % tiles_per_slot, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c, block_t), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, block_r, d_pad),
                lambda j, i: (i // tiles_per_slot, i % tiles_per_slot, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_r, 128),
                lambda j, i: (i % tiles_per_slot, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, block_t), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (d_pad, block_t), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d_pad, t_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, block_t), jnp.float32),  # running max
            pltpu.VMEM((1, block_t), jnp.float32),  # running denom
            pltpu.VMEM((d_pad, block_t), jnp.float32),  # numerator accumulator
        ],
        interpret=interpret,
    )(smeta, ref, tgt, lab, cmeta, tmeta)

    return out[:d, :p]
