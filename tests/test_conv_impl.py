"""Matmul-formulated convolution equals XLA's native conv, and both load the
same parameter tree / checkpoints."""

import jax
import numpy as np
import pytest

from semi_supervised_vos_tpu.models import resnet as rn
from semi_supervised_vos_tpu.models.vos_net import VOSNet


@pytest.fixture(autouse=True)
def _restore_impl():
    yield
    rn.set_conv_impl("auto")


@pytest.mark.parametrize(
    "k,s,p,cin,cout,hw",
    [
        (1, 1, 0, 16, 8, (12, 14)),
        (3, 1, 1, 8, 8, (10, 11)),
        (3, 2, 1, 8, 16, (13, 17)),
        (7, 2, 3, 3, 8, (20, 23)),
        (1, 2, 0, 8, 16, (9, 9)),
    ],
)
def test_conv_matmul_matches_lax(rng, k, s, p, cin, cout, hw):
    x = rng.standard_normal((2, *hw, cin)).astype(np.float32)
    kernel = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, kernel, (s, s), [(p, p)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = rn.conv_matmul(x, kernel, s, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_vosnet_same_outputs_and_params_across_impls(rng):
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    net = VOSNet(model="resnet18")

    rn.set_conv_impl("lax")
    v_lax = net.init(jax.random.PRNGKey(0), x)
    out_lax = net.apply(v_lax, x)

    rn.set_conv_impl("matmul")
    v_mm = net.init(jax.random.PRNGKey(0), x)
    # identical parameter trees (same paths, same init)
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            v_lax["params"],
            v_mm["params"],
        )
    )
    assert chex_equal
    out_mm = net.apply(v_lax, x)
    np.testing.assert_allclose(
        np.asarray(out_mm), np.asarray(out_lax), rtol=1e-4, atol=1e-4
    )
