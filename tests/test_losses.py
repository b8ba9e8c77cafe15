"""Loss parity vs torch transcriptions of ``/root/reference/src/model/loss.py``."""

import numpy as np
import torch
import torch.nn.functional as F

from semi_supervised_vos_tpu.train.losses import (
    contrastive_loss,
    cross_entropy_loss,
    focal_loss,
    triplet_margin_loss,
)


def _setup(rng, b=2, r=3, c=8, h=4, w=5, d=6):
    ref = rng.standard_normal((b, r, c, h, w)).astype(np.float32)
    target = rng.standard_normal((b, c, h, w)).astype(np.float32)
    labels = rng.integers(0, d, size=(b, r, h, w))
    onehot = np.zeros((b, r, d, h, w), np.float32)
    for bi in range(b):
        for ri in range(r):
            for y in range(h):
                for x in range(w):
                    onehot[bi, ri, labels[bi, ri, y, x], y, x] = 1
    tlabel = rng.integers(0, d, size=(b, h, w))
    return ref, target, onehot, tlabel


def torch_ce(ref, target, ref_label, target_label, temperature):
    """Transcription of CrossEntropy.forward (loss.py:45-66)."""
    b, r, c, h, w = ref.shape
    sim = ref.permute(0, 1, 3, 4, 2).reshape(b, -1, c).bmm(target.reshape(b, c, -1))
    sim = (sim * temperature).softmax(dim=1)
    d = ref_label.shape[2]
    pred = ref_label.transpose(1, 2).reshape(b, d, -1).bmm(sim).reshape(b, d, h, w)
    pred = torch.log(pred + 1e-14)
    return torch.nn.NLLLoss()(pred, target_label), pred


def test_cross_entropy_matches_torch(rng):
    ref, target, onehot, tlabel = _setup(rng)
    t_loss, _ = torch_ce(
        torch.from_numpy(ref), torch.from_numpy(target),
        torch.from_numpy(onehot), torch.from_numpy(tlabel),
        1.4,
    )
    loss = cross_entropy_loss(
        ref.transpose(0, 1, 3, 4, 2), target.transpose(0, 2, 3, 1),
        onehot.transpose(0, 1, 3, 4, 2), tlabel,
        temperature=1.4, precision="highest",
    )
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)


def test_contrastive_matches_torch(rng):
    ref, target, onehot, tlabel = _setup(rng)
    tref, ttgt = torch.from_numpy(ref), torch.from_numpy(target)
    t_ce, pred = torch_ce(tref, ttgt, torch.from_numpy(onehot), torch.from_numpy(tlabel), 1.0)
    prediction = pred.softmax(dim=1).argmax(dim=1)
    y = torch.ones(size=prediction.shape)
    y[prediction != torch.from_numpy(tlabel)] = -1
    # torch 2.x's CosineEmbeddingLoss rejects the reference's multi-dim target
    # (accepted under the torch 1.8 pin); compute its documented formula:
    # y=1 -> 1 - cos ; y=-1 -> max(0, cos), cosine over the channel dim.
    cos = torch.nn.functional.cosine_similarity(tref[:, -1], ttgt, dim=1)
    metric = torch.where(y > 0, 1 - cos, cos.clamp(min=0)).mean()
    expect = float(t_ce + metric)

    loss = contrastive_loss(
        ref.transpose(0, 1, 3, 4, 2), target.transpose(0, 2, 3, 1),
        onehot.transpose(0, 1, 3, 4, 2), tlabel,
        temperature=1.0, precision="highest",
    )
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_focal_matches_torch(rng):
    ref, target, onehot, tlabel = _setup(rng)
    b, r, c, h, w = ref.shape
    d = onehot.shape[2]
    tref, ttgt = torch.from_numpy(ref), torch.from_numpy(target)
    sim = tref.permute(0, 1, 3, 4, 2).reshape(b, -1, c).bmm(ttgt.reshape(b, c, -1)).softmax(dim=1)
    pred = torch.from_numpy(onehot).transpose(1, 2).reshape(b, d, -1).bmm(sim).reshape(b, d, h, w)
    prediction = pred.permute(0, 2, 3, 1).reshape(-1, d)
    label_flat = torch.from_numpy(tlabel).reshape(-1)
    log_p = F.log_softmax(prediction, dim=-1)
    ce = torch.nn.NLLLoss()(log_p, label_flat)
    log_pt = log_p[torch.arange(len(prediction)), label_flat]
    pt = log_pt.exp()
    expect = float(((1 - pt) ** 0.5 * ce).mean())

    loss = focal_loss(
        ref.transpose(0, 1, 3, 4, 2), target.transpose(0, 2, 3, 1),
        onehot.transpose(0, 1, 3, 4, 2), tlabel, precision="highest",
    )
    np.testing.assert_allclose(float(loss), expect, rtol=1e-4)


def test_triplet_margin_matches_torch(rng):
    a = rng.standard_normal((2, 7, 16)).astype(np.float32)
    p = rng.standard_normal((2, 7, 16)).astype(np.float32)
    n = rng.standard_normal((2, 7, 16)).astype(np.float32)
    cos = torch.nn.CosineSimilarity(dim=-1)
    t_loss = torch.nn.TripletMarginWithDistanceLoss(
        margin=0.3, distance_function=cos
    )(torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n))
    loss = triplet_margin_loss(a, p, n, margin=0.3)
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)


def test_triplet_margin_masked_ignores_padding(rng):
    a = rng.standard_normal((1, 4, 8)).astype(np.float32)
    p = rng.standard_normal((1, 4, 8)).astype(np.float32)
    n = rng.standard_normal((1, 4, 8)).astype(np.float32)
    full = triplet_margin_loss(a[:, :2], p[:, :2], n[:, :2], margin=1.0)
    valid = np.array([[1.0, 1.0, 0.0, 0.0]], np.float32)
    masked = triplet_margin_loss(a, p, n, valid, margin=1.0)
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)
