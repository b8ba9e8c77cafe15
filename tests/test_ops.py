"""Tests for device ops: nearest resize (torch parity), one-hot, quantise."""

import numpy as np
import torch
import torch.nn.functional as F

from semi_supervised_vos_tpu.ops.onehot import (
    color_to_class,
    davis_centroids,
    index_to_onehot,
)
from semi_supervised_vos_tpu.ops.resize import nearest_resize


def test_nearest_downsample_matches_torch(rng):
    x = rng.standard_normal((2, 3, 256, 256)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=0.125, mode="nearest").numpy()
    got = nearest_resize(x.transpose(0, 2, 3, 1), (32, 32)).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_nearest_updown_odd_sizes_match_torch(rng):
    for in_hw, out_hw in [((60, 107), (480, 854)), ((480, 854), (60, 107)),
                          ((7, 9), (13, 5)), ((69, 123), (54, 96))]:
        x = rng.standard_normal((1, 1, *in_hw)).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
        got = nearest_resize(x.transpose(0, 2, 3, 1), out_hw).transpose(0, 3, 1, 2)
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_index_to_onehot_matches_scatter(rng):
    idx = rng.integers(0, 7, size=(50,))
    got = np.asarray(index_to_onehot(idx, 7))  # (N, d)
    ref = torch.zeros(7, 50).scatter_(0, torch.from_numpy(idx).view(1, -1), 1).numpy()
    np.testing.assert_array_equal(got.T, ref)


def test_color_to_class_matches_torch(rng):
    cents = davis_centroids().astype(np.float32)
    img = rng.uniform(0, 255, size=(2, 3, 8, 8)).astype(np.float32)
    t = torch.from_numpy(img)
    flat = t.permute(0, 2, 3, 1).reshape(-1, 3)
    ref = torch.argmin(
        torch.sqrt(torch.sum((flat.unsqueeze(1) - torch.from_numpy(cents)) ** 2, 2)), 1
    ).reshape(2, 8, 8).numpy()
    got = np.asarray(color_to_class(img.transpose(0, 2, 3, 1), cents))
    np.testing.assert_array_equal(got, ref)


def test_color_to_class_exact_palette_colors():
    cents = davis_centroids().astype(np.float32)
    got = np.asarray(color_to_class(cents, cents))
    np.testing.assert_array_equal(got, np.arange(22))


def test_centroids_match_reference_table():
    ref = np.load("/root/reference/annotation_centroids.npy")
    np.testing.assert_array_equal(davis_centroids(), ref)


def test_native_upsample_bit_identical():
    """native/upsample.cpp equals the numpy twin byte-for-byte (the numpy
    mapping is the reference's torch-nearest semantics — any deviation would
    shift delivered masks). Exercises non-divisible scales, leading dims,
    and the load-time probe's disable path contract (None falls back)."""
    import numpy as np

    from semi_supervised_vos_tpu.ops.native_upsample import (
        _decide,
        _numpy_twin,
        nearest_u8,
    )
    from semi_supervised_vos_tpu.ops.resize import nearest_resize_host

    rng = np.random.default_rng(7)
    if _decide() != "on":
        # no g++ / build failure: the public API must still work via numpy
        x = rng.integers(0, 22, size=(2, 6, 8), dtype=np.uint8)
        out = nearest_resize_host(x, (13, 17), hw_axes=(1, 2))
        assert out.shape == (2, 13, 17)
        return

    for shape, hw in [
        ((8, 8, 60, 107), (480, 854)),
        ((5, 17, 23), (129, 201)),
        ((60, 107), (480, 854)),
        ((3, 135, 240), (1080, 1920)),
    ]:
        x = rng.integers(0, 22, size=shape, dtype=np.uint8)
        got = nearest_u8(x, hw)
        want = _numpy_twin(x, hw)
        assert got is not None and np.array_equal(got, want), shape
        # and through the public entry point (last-two-axes fast path)
        via_host = nearest_resize_host(x, hw, hw_axes=(-2, -1))
        assert np.array_equal(via_host, want)

    # non-uint8 and non-trailing axes fall back to numpy (same mapping)
    xf = rng.standard_normal((4, 6, 8)).astype(np.float32)
    out = nearest_resize_host(xf, (12, 16), hw_axes=(1, 2))
    assert out.shape == (4, 12, 16)
