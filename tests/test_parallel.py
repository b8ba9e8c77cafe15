"""Multi-chip tests on the virtual 8-device CPU mesh: sharded affinity
equals the single-chip path; data-parallel train step equals single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_vos_tpu.core.propagation import affinity_propagate
from semi_supervised_vos_tpu.core.sampling import sample_frames
from semi_supervised_vos_tpu.core.spatial import spatial_weight
from semi_supervised_vos_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from semi_supervised_vos_tpu.parallel.sharded_affinity import sharded_affinity_propagate


def test_eight_virtual_devices():
    assert jax.device_count() == 8


@pytest.mark.parametrize("prob", [False, True])
def test_sharded_affinity_matches_single_chip(rng, prob):
    mesh = make_mesh(n_data=1, n_model=8)
    k, p, c, d = 16, 30, 8, 5  # K divides the model axis
    h, w = 5, 6
    ref = rng.standard_normal((k, p, c)).astype(np.float32)
    tgt = rng.standard_normal((p, c)).astype(np.float32)
    lab = rng.random((k, p, d)).astype(np.float32)
    valid = np.ones(k, bool)
    valid[11:] = False  # padding slots
    dense = np.zeros(k, bool)
    dense[7:11] = True
    wd = np.asarray(spatial_weight((h, w), 8.0)) if not prob else None
    ws = np.asarray(spatial_weight((h, w), 21.0)) if not prob else None

    expect = affinity_propagate(
        ref, tgt, lab, temperature=1.6, valid=valid, dense=dense,
        weight_dense=wd, weight_sparse=ws, precision="highest",
    )
    got = sharded_affinity_propagate(
        mesh, ref, tgt, lab, temperature=1.6, valid=valid, dense=dense,
        weight_dense=wd, weight_sparse=ws, precision="highest",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-6)


def test_data_parallel_train_step_matches_single_device(rng):
    """One DP-sharded optimizer step == the single-device step."""
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.ops.onehot import davis_centroids
    from semi_supervised_vos_tpu.train.loop import LossSpec, make_train_step
    from semi_supervised_vos_tpu.train.train_state import init_train_state, make_optimizer

    net = VOSNet(model="resnet18")
    tx = make_optimizer(base_lr=0.01)
    state = init_train_state(net, jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    spec = LossSpec(name="cross_entropy")
    step = make_train_step(net, spec, tx)

    imgs = rng.integers(0, 255, (8, 3, 32, 32, 3)).astype(np.uint8)
    anns = np.zeros((8, 3, 32, 32, 3), np.uint8)
    anns[:, :, 8:20, 8:20] = [128, 0, 0]
    centroids = jnp.asarray(davis_centroids(), jnp.float32)
    key = jax.random.PRNGKey(3)
    # snapshot before the step: the step donates (and deletes) its input state
    k0 = np.asarray(state.params["backbone"]["conv1"]["conv"]["kernel"]).copy()

    # single device
    s1, loss1 = step(state, imgs, anns, centroids, key)

    # data parallel over 8 devices: shard batch, replicate state
    mesh = make_mesh(n_data=8, n_model=1)
    state_r = init_train_state(net, jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    state_r = replicate(mesh, state_r)
    imgs_s, anns_s = shard_batch(mesh, imgs, anns)
    s8, loss8 = step(state_r, imgs_s, anns_s, replicate(mesh, centroids), key)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    k1 = np.asarray(s1.params["backbone"]["conv1"]["conv"]["kernel"])
    k8 = np.asarray(s8.params["backbone"]["conv1"]["conv"]["kernel"])
    # sharded reductions reorder f32 sums; through a random-init deep net the
    # gradient drift reaches ~1e-3 abs — assert the updates agree closely in
    # direction and magnitude rather than bitwise
    np.testing.assert_allclose(k8, k1, rtol=5e-2, atol=2e-3)
    u1, u8 = (k1 - k0).ravel(), (k8 - k0).ravel()
    cos = np.dot(u1, u8) / (np.linalg.norm(u1) * np.linalg.norm(u8))
    assert cos > 0.999, cos


@pytest.mark.parametrize("prob", [False, True])
def test_sharded_engine_matches_single(rng, prob):
    """Pixel-sharded multi-chip bank == single-chip engine, frame for frame
    (8 virtual devices, 20 frames: covers the dense/sparse switch), in both
    label and probability propagation modes (the CLI's --bank-shards
    [--probability] surface)."""
    import jax
    import numpy as np

    from semi_supervised_vos_tpu.infer.engine import EngineConfig, PropagationEngine
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.parallel.engine_sharded import (
        ShardedPropagationEngine,
    )
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh

    h, w, n_frames = 96, 112, 20
    net = VOSNet(model="resnet18")
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    cfg = EngineConfig(
        use_pallas=False,
        compute_dtype=jax.numpy.float32,
        probability_propagation=prob,
    )

    frames = rng.integers(0, 255, (n_frames, h, w, 3), dtype=np.uint8)
    label0 = np.zeros((h, w), np.int32)
    label0[20:60, 30:80] = 1

    single = PropagationEngine(net, variables, (h, w), cfg)
    st = single.start_video(frames[0], label0)
    ref_masks, st = single.step_chunk_small(frames[1:], st, 1)
    ref_masks = np.asarray(ref_masks)

    mesh = make_mesh(n_data=1, n_model=8)
    sharded = ShardedPropagationEngine(net, variables, (h, w), cfg, mesh)
    sst = sharded.start_video(frames[0], label0)
    got_masks, sst = sharded.step_chunk_small(frames[1:], sst, 1)
    got_masks = np.asarray(got_masks)

    assert got_masks.shape == ref_masks.shape
    agreement = (got_masks == ref_masks).mean()
    # identical math modulo f32 reduction order across shards; argmax
    # near-ties may flip a few pixels on random-init features
    assert agreement > 0.999, agreement


@pytest.mark.parametrize("prob", [False, True])
def test_sharded_engine_kernel_path_matches_single(rng, prob):
    """The TPU-first multi-chip path — fused bank-direct Pallas kernel per
    shard (stats mode) + pmax/psum combine — matches the single-chip engine
    on the virtual 8-mesh (kernel in interpret mode). This is the path
    production --bank-shards takes on TPU."""
    import jax
    import numpy as np

    from semi_supervised_vos_tpu.infer.engine import EngineConfig, PropagationEngine
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.parallel.engine_sharded import (
        ShardedPropagationEngine,
    )
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh

    h, w, n_frames = 96, 112, 20
    net = VOSNet(model="resnet18")
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    cfg = EngineConfig(
        use_pallas=False,  # single-chip jnp golden path
        compute_dtype=jax.numpy.float32,
        probability_propagation=prob,
    )

    frames = rng.integers(0, 255, (n_frames, h, w, 3), dtype=np.uint8)
    label0 = np.zeros((h, w), np.int32)
    label0[20:60, 30:80] = 1

    single = PropagationEngine(net, variables, (h, w), cfg)
    st = single.start_video(frames[0], label0)
    ref_masks, st = single.step_chunk_small(frames[1:], st, 1)
    ref_masks = np.asarray(ref_masks)

    mesh = make_mesh(n_data=1, n_model=8)
    kcfg = EngineConfig(
        use_pallas=True,
        compute_dtype=jax.numpy.float32,
        probability_propagation=prob,
    )
    sharded = ShardedPropagationEngine(net, variables, (h, w), kcfg, mesh,
                                       interpret=True)
    assert sharded._use_pallas
    sst = sharded.start_video(frames[0], label0)
    got_masks, sst = sharded.step_chunk_small(frames[1:], sst, 1)
    got_masks = np.asarray(got_masks)

    assert got_masks.shape == ref_masks.shape
    agreement = (got_masks == ref_masks).mean()
    # bf16 kernel vs f32 jnp: argmax near-ties may flip a few pixels
    assert agreement > 0.995, agreement


def test_sharded_engine_step_matches_chunk(rng):
    """The per-frame ``step`` surface (multi-stream strategies) agrees with
    the scanned chunk path."""
    import jax
    import numpy as np

    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.parallel.engine_sharded import (
        ShardedPropagationEngine,
    )
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh

    h, w, n_frames = 64, 80, 5
    net = VOSNet(model="resnet18")
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    cfg = EngineConfig(use_pallas=False, compute_dtype=jax.numpy.float32)
    frames = rng.integers(0, 255, (n_frames, h, w, 3), dtype=np.uint8)
    label0 = np.zeros((h, w), np.int32)
    label0[10:40, 20:60] = 1
    mesh = make_mesh(n_data=1, n_model=4)

    e = ShardedPropagationEngine(net, variables, (h, w), cfg, mesh)
    st = e.start_video(frames[0], label0)
    chunk_masks, _ = e.step_chunk_small(frames[1:], st, 1)

    st = e.start_video(frames[0], label0)
    step_masks = []
    for i in range(1, n_frames):
        pred, st = e.step(frames[i], st, i)
        step_masks.append(
            np.argmax(np.asarray(pred), axis=0).reshape(e.hd, e.wd)
        )
    np.testing.assert_array_equal(
        np.asarray(chunk_masks), np.stack(step_masks).astype(np.uint8)
    )


def test_sharded_engine_fast_encoder_path(rng, monkeypatch):
    """The sharded engine's BN-folded fast-encoder integration (TPU-gated in
    production) produces the same masks as its flax-forward path — forced on
    here by bypassing the backend gate."""
    import jax
    import numpy as np

    import semi_supervised_vos_tpu.infer.engine as eng
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.parallel.engine_sharded import (
        ShardedPropagationEngine,
    )
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh

    h, w, n_frames = 64, 80, 6
    net = VOSNet(model="resnet50")
    variables = net.init(jax.random.PRNGKey(1), np.zeros((1, 32, 32, 3), np.float32))
    cfg = EngineConfig(use_pallas=False, compute_dtype=jax.numpy.float32)
    frames = rng.integers(0, 255, (n_frames, h, w, 3), dtype=np.uint8)
    label0 = np.zeros((h, w), np.int32)
    label0[10:40, 20:60] = 1
    mesh = make_mesh(n_data=1, n_model=4)

    plain = ShardedPropagationEngine(net, variables, (h, w), cfg, mesh)
    assert plain._fast is None  # CPU backend: fast path gated off
    st = plain.start_video(frames[0], label0)
    ref_masks, _ = plain.step_chunk_small(frames[1:], st, 1)

    orig = eng._maybe_fold_fast_encoder

    def forced(model, variables, cfg):
        from semi_supervised_vos_tpu.models.fold import fold_vosnet

        return fold_vosnet(variables, model.model, cfg.compute_dtype), model.model

    monkeypatch.setattr(eng, "_maybe_fold_fast_encoder", forced)
    # CPU can't run the Mosaic kernel un-interpreted; force run_block's
    # matmul fallback so the folded-forward integration is what's tested
    import semi_supervised_vos_tpu.models.infer_fast as inf_fast

    monkeypatch.setattr(inf_fast, "_pick_strip", lambda *a: 1)
    fast = ShardedPropagationEngine(net, variables, (h, w), cfg, mesh)
    assert fast._fast is not None
    st = fast.start_video(frames[0], label0)
    got_masks, _ = fast.step_chunk_small(frames[1:], st, 1)

    agreement = (np.asarray(got_masks) == np.asarray(ref_masks)).mean()
    assert agreement > 0.999, agreement
