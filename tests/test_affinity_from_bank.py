"""Gather-free bank-direct kernel equals the gather-based path."""

import jax.numpy as jnp
import numpy as np

from semi_supervised_vos_tpu.core.propagation import affinity_propagate
from semi_supervised_vos_tpu.core.sampling import sample_frames
from semi_supervised_vos_tpu.core.spatial import spatial_weight
from semi_supervised_vos_tpu.ops.affinity_pallas import affinity_from_bank
from tests.test_pallas_affinity import _assert_argmax_close


def test_bank_direct_matches_golden(rng):
    hd, wd, c, d_pad = 6, 8, 32, 24
    p = hd * wd
    block_r = block_t = 128
    p_pad = 128
    cap, k = 12, 5
    frame_idx = 7

    bank_feats = np.zeros((cap, p_pad, c), np.float32)
    bank_labels = np.zeros((cap, p_pad, d_pad), np.float32)
    feats = (rng.standard_normal((cap, p, c)) * 0.3).astype(np.float32)
    cls = rng.integers(0, 5, size=(cap, p))
    for s in range(cap):
        bank_feats[s, :p] = feats[s]
        bank_labels[s, np.arange(p), cls[s]] = 1.0

    idx, valid, dense = sample_frames(frame_idx, 40, k)
    slots = np.asarray(idx) % cap
    tgt = (rng.standard_normal((p, c)) * 0.3).astype(np.float32)

    # golden: gather + jnp path
    ref = feats[slots]
    labels = np.zeros((k, p, d_pad), np.float32)
    for i, s in enumerate(slots):
        labels[i] = bank_labels[s, :p]
    wd_m = np.asarray(spatial_weight((hd, wd), 8.0))
    ws_m = np.asarray(spatial_weight((hd, wd), 21.0))
    expect = np.asarray(
        affinity_propagate(
            ref, tgt, labels, temperature=1.3, valid=valid, dense=dense,
            weight_dense=wd_m, weight_sparse=ws_m, precision="highest",
        )
    )

    got = np.asarray(
        affinity_from_bank(
            jnp.asarray(bank_feats, jnp.bfloat16),
            jnp.asarray(bank_labels, jnp.bfloat16),
            jnp.asarray(tgt),
            jnp.asarray(slots),
            feature_hw=(hd, wd),
            temperature=1.3,
            valid=valid,
            dense=dense,
            block_r=block_r,
            block_t=block_t,
            interpret=True,
        )
    )
    assert got.shape == (d_pad, p)
    _assert_argmax_close(got, expect)
    np.testing.assert_allclose(got[:5], expect[:5], rtol=0.05, atol=5e-3)
    # padded label channels exactly zero
    assert (got[5:] == 0).all() or np.abs(got[5:]).max() < 1e-6


def _random_bank(rng, cap, p, p_pad, c, d_pad, n_cls=5):
    bank_feats = np.zeros((cap, p_pad, c), np.float32)
    bank_labels = np.zeros((cap, p_pad, d_pad), np.float32)
    for s in range(cap):
        bank_feats[s, :p] = (rng.standard_normal((p, c)) * 0.3).astype(np.float32)
        cls = rng.integers(0, n_cls, size=p)
        bank_labels[s, np.arange(p), cls] = 1.0
    return bank_feats, bank_labels


def test_target_macro_tiling_matches_untiled(rng):
    """block_tj_cap splitting the target axis (the 1080p VMEM bound) is
    numerically identical to the full-width resident target."""
    hd, wd, c, d_pad = 8, 16, 32, 24
    p = hd * wd
    cap, k = 12, 5
    bank_feats, bank_labels = _random_bank(rng, cap, p, 128, c, d_pad)
    idx, valid, dense = sample_frames(11, 40, k)
    slots = np.asarray(idx) % cap
    tgt = (rng.standard_normal((p, c)) * 0.3).astype(np.float32)

    kw = dict(
        feature_hw=(hd, wd), temperature=1.1, valid=valid, dense=dense,
        block_r=128, block_t=64, interpret=True,
    )
    full = np.asarray(
        affinity_from_bank(
            jnp.asarray(bank_feats, jnp.bfloat16),
            jnp.asarray(bank_labels, jnp.bfloat16),
            jnp.asarray(tgt), jnp.asarray(slots), **kw,
        )
    )
    tiled = np.asarray(
        affinity_from_bank(
            jnp.asarray(bank_feats, jnp.bfloat16),
            jnp.asarray(bank_labels, jnp.bfloat16),
            jnp.asarray(tgt), jnp.asarray(slots), block_tj_cap=64, **kw,
        )
    )
    np.testing.assert_allclose(tiled, full, rtol=1e-6, atol=1e-6)


def test_stats_shards_combine_to_full(rng):
    """Pixel-sharded per-shard statistics (row_base offsets) combine with the
    distributed-softmax formula to the exact unsharded kernel result — the
    multi-chip kernel path's numerics contract."""
    from semi_supervised_vos_tpu.ops.affinity_pallas import (
        affinity_from_bank_stats,
    )

    hd, wd, c, d_pad = 6, 8, 32, 24
    p = hd * wd  # 48
    cap, k = 10, 5
    n_shards, p_loc = 4, 16  # 4 shards x 16 rows = 64 >= p
    bank_feats, bank_labels = _random_bank(rng, cap, p, n_shards * p_loc, c, d_pad)
    idx, valid, dense = sample_frames(9, 40, k)
    slots = np.asarray(idx) % cap
    tgt = (rng.standard_normal((p, c)) * 0.3).astype(np.float32)

    kw = dict(
        feature_hw=(hd, wd), temperature=0.9, valid=valid, dense=dense,
        block_r=16, block_t=64, interpret=True,
    )
    full = np.asarray(
        affinity_from_bank(
            jnp.asarray(bank_feats, jnp.bfloat16),
            jnp.asarray(bank_labels, jnp.bfloat16),
            jnp.asarray(tgt), jnp.asarray(slots), **kw,
        )
    )

    ms, ls, accs = [], [], []
    for s in range(n_shards):
        rows = slice(s * p_loc, (s + 1) * p_loc)
        m, l, acc = affinity_from_bank_stats(
            jnp.asarray(bank_feats[:, rows], jnp.bfloat16),
            jnp.asarray(bank_labels[:, rows], jnp.bfloat16),
            jnp.asarray(tgt), jnp.asarray(slots),
            row_base=jnp.int32(s * p_loc), **kw,
        )
        ms.append(np.asarray(m)); ls.append(np.asarray(l)); accs.append(np.asarray(acc))
    m_g = np.max(ms, axis=0)
    scale = [np.exp(m - m_g) for m in ms]
    denom = sum(l * sc for l, sc in zip(ls, scale))
    num = sum(a * sc[None] for a, sc in zip(accs, scale))
    combined = num / np.maximum(denom, 1e-30)[None]
    # per-shard running maxima rescale e before its bf16 label-dot rounding,
    # so shard vs unsharded results differ at bf16 resolution (~4e-3 rel)
    _assert_argmax_close(combined, full)
    np.testing.assert_allclose(combined, full, rtol=1.5e-2, atol=5e-3)


def test_far_tile_skip_is_exact(rng, monkeypatch):
    """A tall grid with small sigmas makes whole (bank-tile, target-chunk)
    pairs spatially unreachable (min row gap ⇒ weight <= exp(-36)); the
    kernel skips their numerator work. Two checks: (a) with the production
    threshold the result still matches the jnp golden; (b) shrinking the
    threshold to 0.5 visibly corrupts the result — proving the @pl.when gate
    actually fires on this geometry rather than being dead code."""
    import semi_supervised_vos_tpu.ops.affinity_pallas as ap

    hd, wd, c, d_pad = 64, 8, 32, 24
    p = hd * wd  # 512: four 128-row bank tiles, 16 feature rows apart
    cap, k = 10, 5
    bank_feats, bank_labels = _random_bank(rng, cap, p, 512, c, d_pad)
    # explicit flags: every slot valid, a real dense/sparse mix — the skip
    # must engage on live sparse slots for check (b) to be discriminating
    slots = np.arange(k, dtype=np.int32)
    valid = np.ones((k,), bool)
    dense = np.asarray([True, True, False, False, False])
    tgt = (rng.standard_normal((p, c)) * 0.3).astype(np.float32)

    kw = dict(
        feature_hw=(hd, wd), temperature=1.0, valid=valid, dense=dense,
        sigma_1=2.0, sigma_2=6.0, block_r=128, block_t=64, interpret=True,
    )
    args = (
        jnp.asarray(bank_feats, jnp.bfloat16),
        jnp.asarray(bank_labels, jnp.bfloat16),
        jnp.asarray(tgt),
        jnp.asarray(slots),
    )
    got = np.asarray(affinity_from_bank(*args, **kw))

    ref = bank_feats[slots, :p]
    labels = bank_labels[slots, :p]
    expect = np.asarray(
        affinity_propagate(
            ref, tgt, labels, temperature=1.0, valid=valid, dense=dense,
            weight_dense=np.asarray(spatial_weight((hd, wd), 2.0)),
            weight_sparse=np.asarray(spatial_weight((hd, wd), 6.0)),
            precision="highest",
        )
    )
    _assert_argmax_close(got, expect)
    np.testing.assert_allclose(got[:5], expect[:5], rtol=0.05, atol=5e-3)

    monkeypatch.setattr(ap, "_TILESKIP_THRESH", 0.5)
    crippled = np.asarray(affinity_from_bank(*args, **kw))
    assert np.abs(crippled - got).max() > 1e-4


def test_batched_bank_matches_per_video(rng):
    """B videos in lockstep equal B independent single-bank calls."""
    from semi_supervised_vos_tpu.ops.affinity_pallas import (
        affinity_from_bank_batched,
    )

    hd, wd, c, d_pad, b = 6, 8, 32, 24, 3
    p = hd * wd
    block_r = block_t = 128
    p_pad = 128
    cap, k = 12, 5
    frame_idx = 9

    bank_feats = np.zeros((cap, b, p_pad, c), np.float32)
    bank_labels = np.zeros((cap, b, p_pad, d_pad), np.float32)
    for s in range(cap):
        for v in range(b):
            bank_feats[s, v, :p] = (rng.standard_normal((p, c)) * 0.3).astype(
                np.float32
            )
            cls = rng.integers(0, 5, size=p)
            bank_labels[s, v, np.arange(p), cls] = 1.0

    idx, valid, dense = sample_frames(frame_idx, 40, k)
    slots = np.asarray(idx) % cap
    tgt = (rng.standard_normal((b, p, c)) * 0.3).astype(np.float32)

    got = np.asarray(
        affinity_from_bank_batched(
            jnp.asarray(bank_feats, jnp.bfloat16),
            jnp.asarray(bank_labels, jnp.bfloat16),
            jnp.asarray(tgt),
            jnp.asarray(slots),
            feature_hw=(hd, wd),
            temperature=0.8,
            valid=valid,
            dense=dense,
            block_r=block_r,
            block_t=block_t,
            interpret=True,
        )
    )
    assert got.shape == (b, d_pad, p)
    for v in range(b):
        single = np.asarray(
            affinity_from_bank(
                jnp.asarray(bank_feats[:, v], jnp.bfloat16),
                jnp.asarray(bank_labels[:, v], jnp.bfloat16),
                jnp.asarray(tgt[v]),
                jnp.asarray(slots),
                feature_hw=(hd, wd),
                temperature=0.8,
                valid=valid,
                dense=dense,
                block_r=block_r,
                block_t=block_t,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got[v], single, rtol=1e-6, atol=1e-6)


def test_pretransposed_target_is_bit_identical(rng):
    """``target_t`` (the chunk scans' hoisted transpose — the r5 bank-layout
    fix) must be bit-identical to the kernel's own in-call transpose: the
    caller replicates the exact value chain f32 target x f32 T -> bank dtype
    (``infer/batched.py::_transpose_targets``)."""
    from semi_supervised_vos_tpu.ops.affinity_pallas import (
        affinity_from_bank_batched,
        target_tiling,
    )

    hd, wd, c, d_pad, b = 6, 8, 32, 24, 2
    p = hd * wd
    block_r = block_t = 128
    p_pad = 128
    cap, k = 12, 5

    bank_feats = np.zeros((cap, b, p_pad, c), np.float32)
    bank_labels = np.zeros((cap, b, p_pad, d_pad), np.float32)
    for s in range(cap):
        for v in range(b):
            bank_feats[s, v, :p] = (rng.standard_normal((p, c)) * 0.3).astype(
                np.float32
            )
            cls = rng.integers(0, 5, size=p)
            bank_labels[s, v, np.arange(p), cls] = 1.0

    idx, valid, dense = sample_frames(11, 40, k)
    slots = np.asarray(idx) % cap
    tgt = (rng.standard_normal((b, p, c)) * 0.3).astype(np.float32)
    temperature = 1.7

    kw = dict(
        feature_hw=(hd, wd), temperature=temperature, valid=valid,
        dense=dense, block_r=block_r, block_t=block_t, interpret=True,
    )
    bf = jnp.asarray(bank_feats, jnp.bfloat16)
    bl = jnp.asarray(bank_labels, jnp.bfloat16)
    base = np.asarray(
        affinity_from_bank_batched(bf, bl, jnp.asarray(tgt), jnp.asarray(slots), **kw)
    )

    t_pad, _, _ = target_tiling(p, block_t)
    tt = (
        (jnp.asarray(tgt) * jnp.float32(temperature))
        .astype(jnp.bfloat16)
        .swapaxes(-1, -2)
    )
    tt = jnp.pad(tt, ((0, 0), (0, 0), (0, t_pad - p)))
    got = np.asarray(
        affinity_from_bank_batched(
            bf, bl, jnp.asarray(tgt), jnp.asarray(slots), target_t=tt, **kw
        )
    )
    np.testing.assert_array_equal(got, base)
