"""Fused Pallas affinity kernel vs the jnp golden path (interpret mode on
the CPU test platform; the same kernel compiles via Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_vos_tpu.core.propagation import affinity_propagate
from semi_supervised_vos_tpu.core.sampling import sample_frames
from semi_supervised_vos_tpu.core.spatial import spatial_weight
from semi_supervised_vos_tpu.ops.affinity_pallas import affinity_propagate_pallas


def _assert_argmax_close(got, expect, tie_tol=0.02):
    """Argmax may differ only where the golden top-2 scores are a near-tie."""
    am_g, am_e = np.argmax(got, 0), np.argmax(expect, 0)
    diff = np.nonzero(am_g != am_e)[0]
    for q in diff:
        gap = expect[am_e[q], q] - expect[am_g[q], q]
        scale = max(abs(expect[am_e[q], q]), 1e-6)
        assert gap / scale < tie_tol, (q, gap, scale)


def _inputs(rng, k=9, hd=6, wd=8, c=32, d=22):
    p = hd * wd
    ref = (rng.standard_normal((k, p, c)) * 0.3).astype(np.float32)
    tgt = (rng.standard_normal((p, c)) * 0.3).astype(np.float32)
    labels = np.zeros((k, p, d), np.float32)
    cls = rng.integers(0, 5, size=(k, p))
    for ki in range(k):
        labels[ki, np.arange(p), cls[ki]] = 1.0
    return ref, tgt, labels


@pytest.mark.parametrize("frame_idx", [3, 9, 20])
@pytest.mark.parametrize("spatial", [True, False])
def test_fused_matches_jnp_golden(rng, frame_idx, spatial):
    hd, wd = 6, 8
    ref, tgt, labels = _inputs(rng, hd=hd, wd=wd)
    idx, valid, dense = sample_frames(frame_idx, 40, 9)

    wd_mat = np.asarray(spatial_weight((hd, wd), 8.0)) if spatial else None
    ws_mat = np.asarray(spatial_weight((hd, wd), 21.0)) if spatial else None
    expect = affinity_propagate(
        ref, tgt, labels, temperature=1.9, valid=valid, dense=dense,
        weight_dense=wd_mat, weight_sparse=ws_mat, precision="highest",
    )

    got = affinity_propagate_pallas(
        ref, tgt, labels, feature_hw=(hd, wd), temperature=1.9,
        valid=valid, dense=dense, spatial=spatial,
        interpret=True, block_r=128, block_t=128,
    )
    # bf16 inputs: argmax must agree except on numerical near-ties, and the
    # scores must be relatively close
    got, expect = np.asarray(got), np.asarray(expect)
    assert got.shape == expect.shape
    _assert_argmax_close(got, expect)
    np.testing.assert_allclose(got, expect, rtol=0.05, atol=5e-3)


def test_fused_f32_labels_high_accuracy(rng):
    """With f32 label accumulation the kernel tracks the golden closely."""
    hd, wd = 4, 8
    ref, tgt, labels = _inputs(rng, k=4, hd=hd, wd=wd, c=16)
    idx, valid, dense = sample_frames(4, 40, 4)
    wd_mat = np.asarray(spatial_weight((hd, wd), 8.0))
    expect = affinity_propagate(
        ref, tgt, labels, temperature=1.0, valid=valid, dense=dense,
        weight_dense=wd_mat, weight_sparse=wd_mat, precision="highest",
    )
    got = affinity_propagate_pallas(
        ref, tgt, labels, feature_hw=(hd, wd), temperature=1.0,
        valid=np.asarray(valid), dense=np.ones(4, bool), sigma_1=8.0, sigma_2=8.0,
        block_r=128, block_t=128, interpret=True, label_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=0.02, atol=1e-3)


def test_padding_rows_do_not_leak(rng):
    """R and P not multiples of the block sizes: padding must not change
    results (bias -inf on padded rows, slicing on padded cols)."""
    hd, wd = 5, 7  # P = 35, far from 128
    ref, tgt, labels = _inputs(rng, k=3, hd=hd, wd=wd, c=16)
    idx, valid, dense = sample_frames(3, 40, 3)
    wd_mat = np.asarray(spatial_weight((hd, wd), 8.0))
    ws_mat = np.asarray(spatial_weight((hd, wd), 21.0))
    expect = affinity_propagate(
        ref, tgt, labels, temperature=1.0, valid=valid, dense=dense,
        weight_dense=wd_mat, weight_sparse=ws_mat, precision="highest",
    )
    got = affinity_propagate_pallas(
        ref, tgt, labels, feature_hw=(hd, wd), temperature=1.0,
        valid=valid, dense=dense, interpret=True, block_r=128, block_t=128,
    )
    _assert_argmax_close(np.asarray(got), np.asarray(expect))
