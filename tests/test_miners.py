"""Miner tests: registry parity, in-jit miners vs torch transcriptions of
``/root/reference/src/model/triplet_miners.py``, morphology miners via host
callbacks, and the full triplet loss under jit+grad."""

import jax
import jax.numpy as jnp
import numpy as np
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
