"""Fused bottleneck-block kernel vs plain jnp math (CPU interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_vos_tpu.ops.bottleneck_pallas import (
    bottleneck_block,
    bottleneck_stack,
)


def _reference_block(x, w1, b1, w2, b2, w3, b3):
    """Plain-jnp BN-folded bottleneck (f32 math)."""
    bsz, h, w, c = x.shape
    c4 = w1.shape[-1]
    y = jnp.maximum(x.astype(jnp.float32).reshape(-1, c) @ w1 + b1, 0.0)
    y = y.reshape(bsz, h, w, c4)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((bsz, h, w, c4), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc += yp[:, dy : dy + h, dx : dx + w, :] @ w2[dy, dx].astype(
                jnp.float32
            )
    y2 = jnp.maximum(acc + b2, 0.0)
    y3 = y2.reshape(-1, c4) @ w3.astype(jnp.float32) + b3
    y3 = y3.reshape(bsz, h, w, c) + x.astype(jnp.float32)
    return jnp.maximum(y3, 0.0)


@pytest.mark.parametrize("bsz,h,w", [(1, 12, 14), (2, 10, 9)])
def test_fused_block_matches_reference(rng, bsz, h, w):
    c, c4 = 64, 16
    x = (rng.standard_normal((bsz, h, w, c)) * 0.5).astype(np.float32)
    w1 = (rng.standard_normal((c, c4)) * 0.2).astype(np.float32)
    b1 = rng.standard_normal(c4).astype(np.float32) * 0.1
    w2 = (rng.standard_normal((3, 3, c4, c4)) * 0.2).astype(np.float32)
    b2 = rng.standard_normal(c4).astype(np.float32) * 0.1
    w3 = (rng.standard_normal((c4, c)) * 0.2).astype(np.float32)
    b3 = rng.standard_normal(c).astype(np.float32) * 0.1

    expect = np.asarray(_reference_block(jnp.asarray(x), w1, b1, w2, b2, w3, b3))
    got = np.asarray(
        bottleneck_block(
            jnp.asarray(x), w1, b1, w2, b2, w3, b3, interpret=True
        )
    )
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_fused_stack_matches_sequential(rng):
    c, c4, bsz, h, w = 32, 8, 1, 8, 11
    x = (rng.standard_normal((bsz, h, w, c)) * 0.5).astype(np.float32)
    blocks = []
    for _ in range(3):
        blocks.append(
            (
                (rng.standard_normal((c, c4)) * 0.3).astype(np.float32),
                rng.standard_normal(c4).astype(np.float32) * 0.1,
                (rng.standard_normal((3, 3, c4, c4)) * 0.3).astype(np.float32),
                rng.standard_normal(c4).astype(np.float32) * 0.1,
                (rng.standard_normal((c4, c)) * 0.3).astype(np.float32),
                rng.standard_normal(c).astype(np.float32) * 0.1,
            )
        )
    expect = jnp.asarray(x)
    for blk in blocks:
        expect = _reference_block(expect, *blk)
    got = np.asarray(bottleneck_stack(jnp.asarray(x), blocks, interpret=True))
    np.testing.assert_allclose(got, np.asarray(expect), rtol=5e-4, atol=5e-4)


def test_transposed_orientation_exact(rng):
    """Running the block on the spatially-transposed input with dy/dx-swapped
    3x3 taps and transposing back is exact — the fallback that keeps 1080p
    layer1 (W too wide for H-strips) on the fused kernel
    (``models/infer_fast.py::run_block``)."""
    c, c4, bsz, h, w = 32, 8, 1, 6, 430  # H-strips impossible: 856//430 = 1
    x = (rng.standard_normal((bsz, h, w, c)) * 0.5).astype(np.float32)
    w1 = (rng.standard_normal((c, c4)) * 0.3).astype(np.float32)
    b1 = rng.standard_normal(c4).astype(np.float32) * 0.1
    w2 = (rng.standard_normal((3, 3, c4, c4)) * 0.3).astype(np.float32)
    b2 = rng.standard_normal(c4).astype(np.float32) * 0.1
    w3 = (rng.standard_normal((c4, c)) * 0.3).astype(np.float32)
    b3 = rng.standard_normal(c).astype(np.float32) * 0.1

    from semi_supervised_vos_tpu.ops.bottleneck_pallas import _pick_strip

    assert _pick_strip(h, w, c, c4) == 1  # straight orientation gated
    assert _pick_strip(w, h, c, c4) >= 2  # transposed orientation fits

    expect = np.asarray(_reference_block(jnp.asarray(x), w1, b1, w2, b2, w3, b3))
    got = np.asarray(
        jnp.transpose(
            bottleneck_block(
                jnp.transpose(jnp.asarray(x), (0, 2, 1, 3)),
                w1, b1, np.swapaxes(w2, 0, 1), b2, w3, b3,
                interpret=True,
            ),
            (0, 2, 1, 3),
        )
    )
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_transposed_kernel_exactness(rng):
    """Kernel-level: the transposed-orientation fused dispatch for wide
    geometries (swap H/W, swap the 3x3 dy/dx taps, transpose back) equals
    the reference bottleneck. Historical: fast_encode's opt-in dispatch for
    this was retired when narrow-C blocks moved to native convs (faster AND
    routes around the composed-program Mosaic fault); the kernel recipe
    stays pinned here."""
    import semi_supervised_vos_tpu.models.infer_fast as inf

    c, c4, h, w = 32, 8, 6, 430
    table = {
        "blk/conv1/kernel": (rng.standard_normal((c, c4)) * 0.3).astype(np.float32),
        "blk/conv1/bias": rng.standard_normal(c4).astype(np.float32) * 0.1,
        "blk/conv2/kernel": (rng.standard_normal((3, 3, c4, c4)) * 0.3).astype(np.float32),
        "blk/conv2/bias": rng.standard_normal(c4).astype(np.float32) * 0.1,
        "blk/conv3/kernel": (rng.standard_normal((c4, c)) * 0.3).astype(np.float32),
        "blk/conv3/bias": rng.standard_normal(c).astype(np.float32) * 0.1,
    }
    x = jnp.asarray((rng.standard_normal((1, h, w, c)) * 0.5).astype(np.float32))
    expect = np.asarray(inf._bottleneck(x, table, "blk", 1, False))

    # replicate run_block's wide-geometry branch directly
    blk = (
        table["blk/conv1/kernel"], table["blk/conv1/bias"],
        table["blk/conv2/kernel"], table["blk/conv2/bias"],
        table["blk/conv3/kernel"], table["blk/conv3/bias"],
    )
    from semi_supervised_vos_tpu.ops.bottleneck_pallas import _pick_strip

    assert _pick_strip(h, w, c, c4) < 2 and _pick_strip(w, h, c, c4) >= 2
    w1, b1, w2, b2, w3, b3 = blk
    got = np.asarray(
        jnp.transpose(
            bottleneck_stack(
                jnp.transpose(x, (0, 2, 1, 3)),
                [(w1, b1, jnp.swapaxes(w2, 0, 1), b2, w3, b3)],
                interpret=True,
            ),
            (0, 2, 1, 3),
        )
    )
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_fused_block_single_row_strips(rng):
    """Wide images force R=1 strips (1080p layer1 is W=482) — the ring taps
    degenerate to single rows."""
    c, c4, bsz, h, w = 32, 8, 1, 3, 430  # _pick_strip: 856//430 = 1
    x = (rng.standard_normal((bsz, h, w, c)) * 0.5).astype(np.float32)
    w1 = (rng.standard_normal((c, c4)) * 0.3).astype(np.float32)
    b1 = rng.standard_normal(c4).astype(np.float32) * 0.1
    w2 = (rng.standard_normal((3, 3, c4, c4)) * 0.3).astype(np.float32)
    b2 = rng.standard_normal(c4).astype(np.float32) * 0.1
    w3 = (rng.standard_normal((c4, c)) * 0.3).astype(np.float32)
    b3 = rng.standard_normal(c).astype(np.float32) * 0.1

    from semi_supervised_vos_tpu.ops.bottleneck_pallas import _pick_strip

    assert _pick_strip(h, w, c, c4) == 1

    expect = np.asarray(_reference_block(jnp.asarray(x), w1, b1, w2, b2, w3, b3))
    got = np.asarray(
        bottleneck_block(jnp.asarray(x), w1, b1, w2, b2, w3, b3, interpret=True)
    )
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_width_split_dispatch_exact(rng):
    """The width-split dispatch (two overlapping halves, 1-column halo,
    native orientation — 1080p layer1's fused path) equals the full-width
    reference block bit-for-bit at the test tolerance."""
    c, c4, bsz, h, w = 32, 8, 1, 10, 852  # full width beyond the 856 cap
    x = (rng.standard_normal((bsz, h, w, c)) * 0.5).astype(np.float32)
    w1 = (rng.standard_normal((c, c4)) * 0.3).astype(np.float32)
    b1 = rng.standard_normal(c4).astype(np.float32) * 0.1
    w2 = (rng.standard_normal((3, 3, c4, c4)) * 0.3).astype(np.float32)
    b2 = rng.standard_normal(c4).astype(np.float32) * 0.1
    w3 = (rng.standard_normal((c4, c)) * 0.3).astype(np.float32)
    b3 = rng.standard_normal(c).astype(np.float32) * 0.1

    from semi_supervised_vos_tpu.ops.bottleneck_pallas import _pick_strip

    half = w // 2
    assert _pick_strip(h, w, c, c4) < 2
    assert _pick_strip(h, half + 2, c, c4) >= 2

    expect = np.asarray(_reference_block(jnp.asarray(x), w1, b1, w2, b2, w3, b3))
    xl = jnp.asarray(x[:, :, : half + 2])
    xr = jnp.asarray(x[:, :, half - 2 :])
    left = bottleneck_block(xl, w1, b1, w2, b2, w3, b3, interpret=True)
    right = bottleneck_block(xr, w1, b1, w2, b2, w3, b3, interpret=True)
    got = np.concatenate(
        [np.asarray(left)[:, :, :half], np.asarray(right)[:, :, 2:]], axis=2
    )
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_width_split_kernel_exactness(rng):
    """Kernel-level: the width-split fused dispatch (two overlapping halves
    with a 2-column halo) equals the reference bottleneck on geometries too
    wide for one strip. Historical: fast_encode's opt-in dispatch for this
    was retired when narrow-C blocks moved to native convs; the halo recipe
    stays pinned here."""
    import semi_supervised_vos_tpu.models.infer_fast as inf

    c, c4, h, w = 32, 8, 6, 430  # wide: full-width strips impossible
    table = {
        "blk/conv1/kernel": (rng.standard_normal((c, c4)) * 0.3).astype(np.float32),
        "blk/conv1/bias": rng.standard_normal(c4).astype(np.float32) * 0.1,
        "blk/conv2/kernel": (rng.standard_normal((3, 3, c4, c4)) * 0.3).astype(np.float32),
        "blk/conv2/bias": rng.standard_normal(c4).astype(np.float32) * 0.1,
        "blk/conv3/kernel": (rng.standard_normal((c4, c)) * 0.3).astype(np.float32),
        "blk/conv3/bias": rng.standard_normal(c).astype(np.float32) * 0.1,
    }
    x = jnp.asarray((rng.standard_normal((1, h, w, c)) * 0.5).astype(np.float32))
    expect = np.asarray(inf._bottleneck(x, table, "blk", 1, False))

    from semi_supervised_vos_tpu.ops.bottleneck_pallas import _pick_strip

    blk = (
        table["blk/conv1/kernel"], table["blk/conv1/bias"],
        table["blk/conv2/kernel"], table["blk/conv2/bias"],
        table["blk/conv3/kernel"], table["blk/conv3/bias"],
    )
    half = w // 2
    assert _pick_strip(h, w, c, c4) < 2 and _pick_strip(h, half + 2, c, c4) >= 2
    left = bottleneck_stack(x[:, :, : half + 2], [blk], interpret=True)
    right = bottleneck_stack(x[:, :, half - 2 :], [blk], interpret=True)
    got = np.concatenate(
        [np.asarray(left)[:, :, :half], np.asarray(right)[:, :, 2:]], axis=2
    )
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)
