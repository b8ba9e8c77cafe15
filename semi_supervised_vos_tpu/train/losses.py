"""Training losses (reference ``src/model/loss.py``).

All functions are pure and jit/grad-friendly; layouts are channels-last
(ref (B, R, H, W, C), target (B, H, W, C), ref_label (B, R, H, W, D) one-hot,
target_label (B, H, W) int).

Intent-over-bug deviations (documented):
  * ``FocalLoss.forward`` in the reference takes 6 args while the training
    step passes 7 (``train.py:209`` vs ``loss.py:144``) — ``--loss focal``
    crashes upstream. The math here follows the reference body exactly
    (including its *second* per-pixel log-softmax and the
    ``mean(focal_term) * mean_ce`` coupling) with a working signature.
  * ``TripletLossWithMiner`` constructs ``nn.CosineSimilarity()`` with the
    default ``dim=1`` (the triplet axis) as its "distance"; the evident
    intent (and what the miners themselves use, ``triplet_miners.py:43``)
    is the feature axis, used here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from semi_supervised_vos_tpu.core.propagation import batch_predict, batch_similarity

EPS = 1e-14


def _propagated_log_probs(ref, target, ref_label, temperature, precision):
    sim = batch_similarity(ref, target, precision)  # (B, R*H*W, H*W)
    sim = sim * jnp.float32(temperature)
    soft = jnp.exp(sim - jnp.max(sim, axis=1, keepdims=True))
    soft = soft / jnp.sum(soft, axis=1, keepdims=True)
    pred = batch_predict(soft, ref_label, precision)  # (B, H, W, D)
    return jnp.log(pred + EPS)


def _nll(log_probs: jnp.ndarray, target_label: jnp.ndarray) -> jnp.ndarray:
    picked = jnp.take_along_axis(
        log_probs, target_label[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    return -jnp.mean(picked)


def cross_entropy_loss(
    ref,
    target,
    ref_label,
    target_label,
    *,
    temperature: float = 1.0,
    return_prediction: bool = False,
    precision="default",
):
    """Reference ``loss.py:39-66`` (CrossEntropy)."""
    log_probs = _propagated_log_probs(ref, target, ref_label, temperature, precision)
    loss = _nll(log_probs, target_label)
    if return_prediction:
        return loss, jnp.argmax(log_probs, axis=-1)
    return loss


def contrastive_loss(
    ref,
    target,
    ref_label,
    target_label,
    *,
    temperature: float = 1.0,
    precision="default",
):
    """Reference ``loss.py:69-99``: CE + CosineEmbeddingLoss between the
    last reference frame and the target, keyed on per-pixel prediction
    correctness."""
    log_probs = _propagated_log_probs(ref, target, ref_label, temperature, precision)
    loss = _nll(log_probs, target_label)

    prediction = jnp.argmax(log_probs, axis=-1)  # (B, H, W)
    correct = prediction == target_label

    a = ref[:, -1]  # (B, H, W, C)
    b = target
    # nn.CosineSimilarity semantics: per-pixel cosine over channels with
    # each norm clamped to eps.
    eps = 1e-8
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    cos = jnp.sum(a * b, axis=-1) / (na * nb)
    # CosineEmbeddingLoss (margin 0): y=+1 → 1-cos ; y=-1 → max(0, cos)
    per_pixel = jnp.where(correct, 1.0 - cos, jnp.maximum(cos, 0.0))
    return loss + jnp.mean(per_pixel)


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    eps = 1e-8
    na = jnp.maximum(jnp.linalg.norm(a, axis=axis), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=axis), eps)
    return jnp.sum(a * b, axis=axis) / (na * nb)


def triplet_margin_loss(
    anchors: jnp.ndarray,
    positives: jnp.ndarray,
    negatives: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    margin: float = 1.0,
) -> jnp.ndarray:
    """``nn.TripletMarginWithDistanceLoss`` with a cosine-similarity
    "distance" (reference ``loss.py:107``): mean of
    ``max(d(a, p) - d(a, n) + margin, 0)`` over (valid) triplets."""
    d_ap = cosine_similarity(anchors, positives)
    d_an = cosine_similarity(anchors, negatives)
    per = jnp.maximum(d_ap - d_an + margin, 0.0)
    if valid is None:
        return jnp.mean(per)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(per * valid) / count


def triplet_loss_with_miner(
    ref,
    target,
    ref_label,
    target_label,
    miner,
    *,
    rng,
    extra_embeddings=None,
    extra_labels=None,
    margin: float = 1.0,
    weights: Tuple[float, float] = (1.0, 1.0),
    temperature: float = 1.0,
    precision="default",
    geometry=None,
):
    """Reference ``loss.py:102-134``: CE + mined triplet margin loss,
    weighted sum normalised by the weight total. With ``geometry`` set
    (host-precomputed label morphology, ``train.loop.make_geometry_fn``)
    the morphology miners run their callback-free in-jit path."""
    ce, prediction = cross_entropy_loss(
        ref,
        target,
        ref_label,
        target_label,
        temperature=temperature,
        return_prediction=True,
        precision=precision,
    )
    mine_emb = target if extra_embeddings is None else extra_embeddings
    mine_lab = target_label if extra_labels is None else extra_labels
    if geometry is not None:
        anchors, positives, negatives, valid = miner.mine_from_geometry(
            mine_emb, mine_lab, geometry, rng
        )
    else:
        anchors, positives, negatives, valid = miner.mine(
            mine_emb, mine_lab, prediction, rng
        )
    metric = triplet_margin_loss(anchors, positives, negatives, valid, margin)
    # if the miner found nothing, metric contributes 0 (reference loss.py:129-132)
    metric = jnp.where(jnp.sum(valid) > 0, metric, 0.0)
    w0, w1 = weights
    return (ce * w0 + metric * w1) / (w0 + w1)


def focal_loss(
    ref,
    target,
    ref_label,
    target_label,
    *,
    gamma: float = 0.5,
    reduction: str = "mean",
    precision="default",
):
    """Reference ``loss.py:137-184`` (FocalLoss; no temperature step, and a
    second log-softmax over the propagated class scores — kept verbatim)."""
    sim = batch_similarity(ref, target, precision)
    soft = jnp.exp(sim - jnp.max(sim, axis=1, keepdims=True))
    soft = soft / jnp.sum(soft, axis=1, keepdims=True)
    pred = batch_predict(soft, ref_label, precision)  # (B, H, W, D)

    d = pred.shape[-1]
    flat = pred.reshape(-1, d)
    labels = target_label.reshape(-1).astype(jnp.int32)

    log_p = flat - jnp.log(jnp.sum(jnp.exp(flat - flat.max(-1, keepdims=True)), -1, keepdims=True)) - flat.max(-1, keepdims=True)
    ce = -jnp.mean(jnp.take_along_axis(log_p, labels[:, None], axis=1)[:, 0])

    log_pt = jnp.take_along_axis(log_p, labels[:, None], axis=1)[:, 0]
    pt = jnp.exp(log_pt)
    focal_term = (1.0 - pt) ** gamma
    loss = focal_term * ce  # scalar ce scales the per-pixel focal terms

    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
