"""Miner tests: registry parity, in-jit miners vs torch transcriptions of
``/root/reference/src/model/triplet_miners.py``, morphology miners via host
callbacks, and the full triplet loss under jit+grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from semi_supervised_vos_tpu.train.miners import (
    DistanceTransformationMiner,
    KernelMiner,
    SkeletonMiner,
    TemporalMiner,
    get_miner,
)

ALL_MINERS = [
    "default", "kernel_7x7", "temporal", "one_back_one_ahead",
    "euclidean", "manhattan", "chebyshev", "skeleton",
    "skeleton_nearest_negative", "skeleton_temporal",
]


def test_registry_has_all_reference_names():
    for name in ALL_MINERS:
        assert get_miner(name) is not None, name
    assert get_miner("nope") is None


def _blob_labels(rng, b, h, w, n_classes=3):
    """Blobby labels so every class has spatially-coherent regions."""
    labels = np.zeros((b, h, w), np.int64)
    for bi in range(b):
        for cls in range(1, n_classes):
            y, x = rng.integers(0, h - 4), rng.integers(0, w - 4)
            labels[bi, y : y + 4, x : x + 4] = cls
    return labels


def torch_kernel_miner(tensor, tensor_labels, kernel_size, stride):
    """Transcription of KernelMiner.get_triplets (triplet_miners.py:95-125),
    returning flat anchor/pos/neg indices instead of gathered embeddings."""
    cos = torch.nn.CosineSimilarity(dim=-1)
    k = kernel_size
    b, c, h, w = tensor.shape
    patches = tensor.unfold(2, k, stride).unfold(3, k, stride)
    patches = patches.reshape(b, c, -1, k * k).permute((0, 2, 3, 1))
    labels = tensor_labels.unfold(1, k, stride).unfold(2, k, stride)
    labels = labels.reshape(b, -1, k * k)
    anchor_idx = (k * k) // 2
    anchors = patches[:, :, anchor_idx]
    anchors_labels = labels[:, :, anchor_idx]
    similarity = cos(anchors.unsqueeze(2), patches)
    similarity[labels != anchors_labels.unsqueeze(2)] = 10
    similarity[:, :, anchor_idx] = 10
    indices = similarity.argmin(dim=-1)

    flat = tensor.reshape(b, c, -1).permute(0, 2, 1)
    flat_lab = tensor_labels.reshape(b, -1)
    dist = 1 - torch.cdist(F.normalize(anchors, p=2, dim=-1), F.normalize(flat, p=2, dim=-1), p=2)
    invalid = anchors_labels.unsqueeze(-1) == flat_lab.unsqueeze(1)
    dist[invalid] = -1
    neg = torch.argmax(dist, dim=-1)
    return indices, neg, anchors_labels


def test_kernel_miner_matches_torch_selection(rng):
    b, c, h, w = 2, 16, 12, 12
    emb = rng.standard_normal((b, h, w, c)).astype(np.float32)
    labels = _blob_labels(rng, b, h, w)

    pos_t, neg_t, anchor_labels = torch_kernel_miner(
        torch.from_numpy(emb.transpose(0, 3, 1, 2)), torch.from_numpy(labels), 3, 3
    )

    miner = KernelMiner(kernel_size=3, stride=3, max_triplets=0)
    a, p, n, valid = miner.mine(
        jnp.asarray(emb), jnp.asarray(labels), None, jax.random.PRNGKey(0)
    )
    a, p, n, valid = map(np.asarray, (a, p, n, valid))
    n_patches = pos_t.shape[1]
    flat = emb.reshape(b, h * w, c)
    k = 3
    for bi in range(b):
        for pi in range(n_patches):
            if not valid[bi, pi]:
                continue
            # positives: same patch-local pick
            py, px = pi // 4, pi % 4
            ky, kx = int(pos_t[bi, pi]) // k, int(pos_t[bi, pi]) % k
            expect_pos = flat[bi, (py * 3 + ky) * w + (px * 3 + kx)]
            np.testing.assert_allclose(p[bi, pi], expect_pos, rtol=1e-5)
            expect_neg = flat[bi, int(neg_t[bi, pi])]
            np.testing.assert_allclose(n[bi, pi], expect_neg, rtol=1e-5)


def torch_temporal_miner(embeddings, labels):
    """Transcription of TemporalMiner.get_triplets (triplet_miners.py:129-159)."""
    embeddings = embeddings.permute(0, 1, 3, 4, 2)
    (b, _, _, _, c) = embeddings.shape
    last = embeddings[:, -1].reshape(b, -1, c)
    last_lab = labels[:, -1].reshape(b, -1)
    cand = embeddings[:, :-1].reshape(b, -1, c)
    cand_lab = labels[:, :-1].reshape(b, -1)
    sim = 1 - torch.cdist(F.normalize(last, p=2, dim=-1), F.normalize(cand, p=2, dim=-1), p=2)
    ind = torch.cdist(last_lab.unsqueeze(-1).float(), cand_lab.unsqueeze(-1).float(), p=1).long()
    same, diff = ind == 0, ind != 0
    negc = torch.clone(sim)
    negc[same] = -1
    posc = torch.clone(sim)
    posc[diff] = 10
    return torch.argmin(posc, dim=-1), torch.argmax(negc, dim=-1)


def test_temporal_miner_matches_torch_selection(rng):
    b, t, c, h, w = 2, 5, 16, 8, 8
    emb = rng.standard_normal((b, t, h, w, c)).astype(np.float32)
    labels = np.stack([_blob_labels(rng, t, h, w) for _ in range(b)])

    pos_t, neg_t = torch_temporal_miner(
        torch.from_numpy(emb.transpose(0, 1, 4, 2, 3)), torch.from_numpy(labels)
    )
    miner = TemporalMiner(max_triplets=0)
    a, p, n, valid = miner.mine(
        jnp.asarray(emb), jnp.asarray(labels), None, jax.random.PRNGKey(0)
    )
    p, n, valid = np.asarray(p), np.asarray(n), np.asarray(valid)
    cand = emb[:, :-1].reshape(b, -1, c)
    for bi in range(b):
        for ai in range(h * w):
            if not valid[bi, ai]:
                continue
            np.testing.assert_allclose(p[bi, ai], cand[bi, int(pos_t[bi, ai])], rtol=1e-5)
            np.testing.assert_allclose(n[bi, ai], cand[bi, int(neg_t[bi, ai])], rtol=1e-5)


def test_max_triplets_budget(rng):
    emb = rng.standard_normal((1, 12, 12, 8)).astype(np.float32)
    labels = _blob_labels(rng, 1, 12, 12)
    miner = KernelMiner(kernel_size=3, stride=3, max_triplets=5)
    a, p, n, valid = miner.mine(jnp.asarray(emb), jnp.asarray(labels), None, jax.random.PRNGKey(1))
    assert a.shape == (1, 5, 8)
    assert valid.shape == (1, 5)


def test_host_ann_classes_matches_device(rng):
    """The pipelined-mining host label path (nearest ×1/8 downsample +
    centroid quantisation) is bit-equal to the in-step device path."""
    from semi_supervised_vos_tpu.ops.onehot import color_to_class, davis_centroids
    from semi_supervised_vos_tpu.ops.resize import nearest_resize
    from semi_supervised_vos_tpu.train.loop import host_ann_classes

    anns = rng.integers(0, 255, (2, 3, 64, 80, 3)).astype(np.uint8)
    centroids = davis_centroids().astype(np.float32)
    got = host_ann_classes(anns, centroids)

    ann = jnp.asarray(anns.reshape(-1, 64, 80, 3).astype(np.float32))
    small = nearest_resize(ann, (8, 10))
    want = np.asarray(
        color_to_class(small, jnp.asarray(centroids))
    ).reshape(2, 3, 8, 10)
    np.testing.assert_array_equal(got, want)


def test_pipelined_matches_callback_triplet_sets(rng):
    """mine_indices_from_geometry (callback-free, in-jit picks) produces the
    same triplet set as the pure_callback host path for every morphology
    mode, when the pools fit the budget. Anchor sets are geometry-only and
    must match exactly; positive/negative picks are argmin/argmax over f32
    cosines computed by NumPy vs XLA, whose reduction order can flip exact
    ties — demand >= 98% agreement."""
    from semi_supervised_vos_tpu.train.miners import (
        SkeletonWithDistanceTransformMiner,
        _host_morphology_mine,
        host_geometry,
    )

    emb = rng.standard_normal((2, 12, 12, 8)).astype(np.float32)
    labels = _blob_labels(rng, 2, 12, 12)
    for miner in [
        DistanceTransformationMiner(metric="euclidean", max_triplets=512),
        DistanceTransformationMiner(metric="manhattan", max_triplets=512),
        SkeletonMiner(max_triplets=512),
        SkeletonWithDistanceTransformMiner(max_triplets=512),
    ]:
        geom = host_geometry(labels, miner.mode, miner.metric)
        a2, p2, n2, v2 = jax.jit(miner.mine_indices_from_geometry)(
            jnp.asarray(emb),
            jnp.asarray(labels),
            tuple(jnp.asarray(g) for g in geom),
            jax.random.PRNGKey(0),
        )
        a1, p1, n1, v1 = _host_morphology_mine(
            emb, labels, np.array([3, 4]), miner.budget, miner.mode, miner.metric
        )
        for bi in range(2):
            cb = {
                int(a): (int(p), int(n))
                for a, p, n, v in zip(a1[bi], p1[bi], n1[bi], v1[bi])
                if v > 0
            }
            pl = {
                int(a): (int(p), int(n))
                for a, p, n, v in zip(
                    np.asarray(a2[bi]), np.asarray(p2[bi]),
                    np.asarray(n2[bi]), np.asarray(v2[bi]),
                )
                if v > 0
            }
            assert set(cb) == set(pl), (miner.mode, miner.metric)  # anchors: exact
            agree = sum(cb[a] == pl[a] for a in cb)
            assert agree >= 0.98 * len(cb), (miner.mode, agree, len(cb))


def test_pipelined_train_step_matches_callback(rng, monkeypatch):
    """End-to-end: a triplet/skeleton train step in pipelined mode (host
    geometry argument, no callback) produces the same loss as callback mode
    — the triplet sets are equal, so the losses differ only by f32 summation
    order."""
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.ops.onehot import davis_centroids
    from semi_supervised_vos_tpu.train.loop import (
        LossSpec,
        make_geometry_fn,
        make_train_step,
        mining_mode,
    )
    from semi_supervised_vos_tpu.train.miners import SkeletonMiner
    from semi_supervised_vos_tpu.train.train_state import (
        init_train_state,
        make_optimizer,
    )

    crop = 32
    net = VOSNet(model="resnet18")
    tx = make_optimizer()
    spec = LossSpec(name="triplet", miner=SkeletonMiner(max_triplets=64))

    imgs = rng.integers(0, 255, (2, 3, crop, crop, 3)).astype(np.uint8)
    anns = np.zeros((2, 3, crop, crop, 3), np.uint8)
    anns[:, :, 8:20, 10:24] = [128, 0, 0]
    centroids = jnp.asarray(davis_centroids(), jnp.float32)
    key = jax.random.PRNGKey(1)

    losses = {}
    for mode in ("callback", "pipelined"):
        monkeypatch.setenv("SVOS_MINING", mode)
        assert mining_mode(spec) == mode
        state = init_train_state(net, jax.random.PRNGKey(0), (1, crop, crop, 3), tx)
        step = make_train_step(net, spec, tx)
        geometry_fn = make_geometry_fn(spec, davis_centroids())
        if mode == "pipelined":
            assert geometry_fn is not None
            geom = tuple(jnp.asarray(g) for g in geometry_fn(anns))
            _, loss = step(state, imgs, anns, centroids, key, geom)
        else:
            assert geometry_fn is None
            _, loss = step(state, imgs, anns, centroids, key)
        losses[mode] = float(loss)
        assert np.isfinite(losses[mode])
    assert losses["pipelined"] == pytest.approx(losses["callback"], rel=1e-4)


def test_morphology_miners_under_jit_and_grad(rng):
    """Distance/skeleton miners run as host callbacks inside jit+grad."""
    emb = rng.standard_normal((2, 12, 12, 8)).astype(np.float32)
    labels = _blob_labels(rng, 2, 12, 12)

    for miner in [
        DistanceTransformationMiner(metric="euclidean", max_triplets=16),
        DistanceTransformationMiner(metric="manhattan", max_triplets=16),
        SkeletonMiner(max_triplets=16),
    ]:
        def loss(e):
            from semi_supervised_vos_tpu.train.losses import triplet_margin_loss

            a, p, n, valid = miner.mine(e, jnp.asarray(labels), None, jax.random.PRNGKey(0))
            # margin 2.0 keeps the hinge active (cos deltas live in [-2, 2]),
            # so a zero gradient would mean mining/gather is broken
            return triplet_margin_loss(a, p, n, valid, margin=2.0)

        val, grad = jax.jit(jax.value_and_grad(loss))(jnp.asarray(emb))
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).sum()) > 0  # gradients flow into embeddings
