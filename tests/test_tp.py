"""Tensor parallelism on the virtual 8-device mesh: a channel-sharded train
step equals the single-device step, alone and composed with data parallelism.
The reference has nothing comparable (DataParallel only, ``src/train.py:113``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_vos_tpu.models.vos_net import VOSNet
from semi_supervised_vos_tpu.ops.onehot import davis_centroids
from semi_supervised_vos_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from semi_supervised_vos_tpu.parallel.tp import _leaf_spec, shard_tp, tp_shardings
from semi_supervised_vos_tpu.train.loop import LossSpec, make_train_step
from semi_supervised_vos_tpu.train.train_state import init_train_state, make_optimizer


def _setup():
    net = VOSNet(model="resnet18")
    tx = make_optimizer(base_lr=0.01)
    state = init_train_state(net, jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    step = make_train_step(net, LossSpec(name="cross_entropy"), tx)
    return net, tx, state, step


def _batch(rng, b=4):
    imgs = rng.integers(0, 255, (b, 3, 32, 32, 3)).astype(np.uint8)
    anns = np.zeros((b, 3, 32, 32, 3), np.uint8)
    anns[:, :, 8:20, 8:20] = [128, 0, 0]
    return imgs, anns


import pytest


@pytest.mark.parametrize(
    "model_name", ["resnet18", "resnet50", "resnet101", "facebook"]
)
def test_rule_covers_every_leaf(model_name):
    """Every 1-D leaf is per-channel (>= 64) and every 4-D leaf is an HWIO
    conv kernel with O >= 64 — the assumption the uniform rule rests on.
    Pinned for every backbone the train CLI can shard with --tp (the CLI
    default is resnet50, not the resnet18 the other TP tests use)."""
    net = VOSNet(model=model_name)
    tx = make_optimizer(base_lr=0.01)
    state = init_train_state(net, jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    for leaf in jax.tree_util.tree_leaves(state):
        shape = np.shape(leaf)
        spec = _leaf_spec(shape, 8)
        if len(shape) == 4:
            assert spec == jax.sharding.PartitionSpec(None, None, None, "model")
            assert shape[-1] % 8 == 0
        elif len(shape) == 1:
            assert shape[0] >= 64 and shape[0] % 8 == 0, shape
        else:
            assert spec == jax.sharding.PartitionSpec()


def test_tp_train_step_matches_single_device(rng):
    """Pure TP (model=8): one channel-sharded optimizer step == single-device."""
    net, tx, state, step = _setup()
    imgs, anns = _batch(rng)
    centroids = jnp.asarray(davis_centroids(), jnp.float32)
    key = jax.random.PRNGKey(3)
    k0 = np.asarray(state.params["backbone"]["conv1"]["conv"]["kernel"]).copy()

    s1, loss1 = step(state, imgs, anns, centroids, key)

    mesh = make_mesh(n_data=1, n_model=8)
    state_tp = shard_tp(mesh, init_train_state(net, jax.random.PRNGKey(0), (1, 32, 32, 3), tx))
    stp, loss_tp = step(
        state_tp,
        jax.device_put(imgs), jax.device_put(anns),
        replicate(mesh, centroids), key,
    )

    np.testing.assert_allclose(float(loss_tp), float(loss1), rtol=1e-5)
    k1 = np.asarray(s1.params["backbone"]["conv1"]["conv"]["kernel"])
    ktp = np.asarray(stp.params["backbone"]["conv1"]["conv"]["kernel"])
    # sharded contractions reorder f32 sums; assert close agreement in value
    # and tight agreement in update direction (same protocol as the DP test)
    np.testing.assert_allclose(ktp, k1, rtol=5e-2, atol=2e-3)
    u1, utp = (k1 - k0).ravel(), (ktp - k0).ravel()
    cos = np.dot(u1, utp) / (np.linalg.norm(u1) * np.linalg.norm(utp))
    assert cos > 0.999, cos
    # the step must preserve the channel sharding (donated state, no silent
    # gather-back to one device)
    out_spec = stp.params["backbone"]["conv1"]["conv"]["kernel"].sharding.spec
    assert out_spec == jax.sharding.PartitionSpec(None, None, None, "model")


def test_dp_tp_composed_matches_single_device(rng):
    """2-D mesh (data=2, model=4): batch sharded over data, channels over
    model, in the same unmodified train step."""
    net, tx, state, step = _setup()
    imgs, anns = _batch(rng, b=4)
    centroids = jnp.asarray(davis_centroids(), jnp.float32)
    key = jax.random.PRNGKey(3)

    s1, loss1 = step(state, imgs, anns, centroids, key)

    mesh = make_mesh(n_data=2, n_model=4)
    state_2d = shard_tp(mesh, init_train_state(net, jax.random.PRNGKey(0), (1, 32, 32, 3), tx))
    imgs_s, anns_s = shard_batch(mesh, imgs, anns)
    s2, loss2 = step(state_2d, imgs_s, anns_s, replicate(mesh, centroids), key)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    k1 = np.asarray(s1.params["backbone"]["conv1"]["conv"]["kernel"])
    k2 = np.asarray(s2.params["backbone"]["conv1"]["conv"]["kernel"])
    np.testing.assert_allclose(k2, k1, rtol=5e-2, atol=2e-3)


def test_tp_shardings_shapes():
    """Sharded leaves really are split: a conv kernel's addressable shard on
    each device holds 1/8 of the output channels."""
    net, tx, state, _ = _setup()
    mesh = make_mesh(n_data=1, n_model=8)
    sh = tp_shardings(mesh, state)
    kernel_sh = sh.params["backbone"]["conv1"]["conv"]["kernel"]
    full = np.shape(state.params["backbone"]["conv1"]["conv"]["kernel"])
    shard = kernel_sh.shard_shape(full)
    assert shard == (7, 7, 3, full[-1] // 8)
