"""BN-folded fast encoder equals the flax VOSNet forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_vos_tpu.models.infer_fast import build_fast_encoder
from semi_supervised_vos_tpu.models.vos_net import VOSNet


@pytest.fixture(scope="module")
def net_and_vars():
    net = VOSNet(model="resnet50")
    # random init; perturb batch_stats so BN folding is non-trivial
    variables = net.init(jax.random.PRNGKey(3), np.zeros((1, 32, 32, 3), np.float32))
    rng = np.random.default_rng(7)
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            np.abs(rng.standard_normal(x.shape)).astype(np.float32) * 0.5 + 0.5
        ),
        variables["batch_stats"],
    )
    return net, {"params": variables["params"], "batch_stats": stats}


def test_fast_encoder_matches_flax_f32(net_and_vars, rng):
    net, variables = net_and_vars
    x = (rng.standard_normal((2, 48, 40, 3)) * 0.7).astype(np.float32)
    expect = np.asarray(net.apply(variables, x, train=False))
    encode = build_fast_encoder(
        variables, dtype=jnp.float32, use_fused_stack=True, interpret=True
    )
    got = np.asarray(encode(jnp.asarray(x)))
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_fast_encoder_matches_flax_unfused_path(net_and_vars, rng):
    net, variables = net_and_vars
    x = (rng.standard_normal((1, 32, 56, 3)) * 0.7).astype(np.float32)
    expect = np.asarray(net.apply(variables, x, train=False))
    encode = build_fast_encoder(variables, dtype=jnp.float32, use_fused_stack=False)
    got = np.asarray(encode(jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_fast_encoder_bf16_close(net_and_vars, rng):
    """bf16 fast path tracks the bf16 flax forward (loose: rounding points
    differ — BN folded into kernels vs BN applied post-conv)."""
    net, variables = net_and_vars
    net16 = VOSNet(model="resnet50", dtype=jnp.bfloat16)
    x = (rng.standard_normal((1, 48, 48, 3)) * 0.7).astype(np.float32)
    expect = np.asarray(net16.apply(variables, x, train=False), np.float32)
    encode = build_fast_encoder(
        variables, dtype=jnp.bfloat16, use_fused_stack=True, interpret=True
    )
    got = np.asarray(encode(jnp.asarray(x)), np.float32)
    # feature-level agreement: cosine similarity per pixel
    a = got.reshape(-1, 256)
    b = expect.reshape(-1, 256)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
    )
    assert cos.min() > 0.995, cos.min()


@pytest.mark.parametrize("arch", ["facebook", "resnet101"])
def test_fast_encoder_matches_flax_other_archs(arch, rng):
    """The generalized fold/fast path covers resnet101 and the
    torchvision-shaped facebook variant (multimodel's usual second model,
    ``vos_net.py:39-48``); facebook's 2048-ch layer4 stays on the matmul
    path (uncalibrated fused geometry) but is still BN-folded."""
    net = VOSNet(model=arch)
    variables = net.init(jax.random.PRNGKey(5), np.zeros((1, 32, 32, 3), np.float32))
    nprng = np.random.default_rng(11)
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            np.abs(nprng.standard_normal(x.shape)).astype(np.float32) * 0.5 + 0.5
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    x = (rng.standard_normal((1, 40, 48, 3)) * 0.7).astype(np.float32)
    expect = np.asarray(net.apply(variables, x, train=False))
    encode = build_fast_encoder(
        variables, dtype=jnp.float32, use_fused_stack=True, interpret=True,
        arch=arch,
    )
    got = np.asarray(encode(jnp.asarray(x)))
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_fast_encoder_matches_flax_resnet18(rng):
    """BasicBlock folding (resnet18 — bare backbone, no head)."""
    net = VOSNet(model="resnet18")
    variables = net.init(jax.random.PRNGKey(9), np.zeros((1, 32, 32, 3), np.float32))
    nprng = np.random.default_rng(13)
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            np.abs(nprng.standard_normal(x.shape)).astype(np.float32) * 0.5 + 0.5
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    x = (rng.standard_normal((2, 40, 48, 3)) * 0.7).astype(np.float32)
    expect = np.asarray(net.apply(variables, x, train=False))
    encode = build_fast_encoder(variables, dtype=jnp.float32, arch="resnet18")
    got = np.asarray(encode(jnp.asarray(x)))
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)
