"""Triplet miners (reference ``src/model/triplet_miners.py``).

Registry parity: ``default`` (3x3 kernel), ``kernel_7x7``, ``temporal``,
``one_back_one_ahead``, ``euclidean``/``manhattan``/``chebyshev`` (distance
transform), ``skeleton``, ``skeleton_nearest_negative``, ``skeleton_temporal``
(``triplet_miners.py:21-32``).

TPU-native split: the similarity-driven miners (kernel, temporal) are pure
jnp and run **inside** the jitted train step on the MXU — the reference runs
the same cdist math on device too. The morphology-driven miners (distance
transform, skeleton) have two modes (selected by ``train.loop.mining_mode``):

* ``callback`` — SciPy on the host exactly as the reference's
  ``.cpu().numpy()`` roundtrips do (``triplet_miners.py:187-191``), via
  ``jax.pure_callback`` with statically-shaped padded outputs so the train
  step remains one compiled program.
* ``pipelined`` (default on TPU) — the SciPy work depends ONLY on the label
  image, so :func:`host_geometry` computes it on the host BEFORE the step
  (the staging thread overlaps it with the previous device step) and the
  embedding-dependent argmin/argmax picks run in-jit on the MXU
  (:meth:`DistanceTransformationMiner.mine_from_geometry`). Same triplet
  set, no device→host→device round trip — and the only option on runtimes
  whose PJRT plugin rejects host callbacks (the axon tunnel does).

Every miner returns fixed-budget gathered triplets
``(anchors, positives, negatives, valid)`` with shapes (B, N, C) / (B, N):
the XLA answer to the reference's variable-length triplet lists. ``N`` is
``max_triplets`` when set, else ``default_budget``. When more triplets exist
than fit, a random subset is taken (``limit_triplets``,
``triplet_miners.py:50-67``); selection happens on indices, so gradients flow
through the gathered embeddings only — identical to the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BUDGET = 1024
_BIG = 10.0  # reference's sentinel for "excluded from argmin" (triplet_miners.py:103-104)


def _l2_normalize(x, axis=-1, eps=1e-12):
    # torch F.normalize semantics: x / max(||x||, eps)
    n = jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
    return x / n


def _cosine_sim_matrix(a, b):
    """1 - euclidean cdist of l2-normalised vectors == the reference's
    ``1 - cdist(normalize(a), normalize(b))`` up to the monotone mapping;
    the reference uses it only through argmin/argmax, and
    1 - ||â - b̂|| is ordered identically to cos(a, b), so argmin/argmax
    agree. Computed directly as cosine for MXU efficiency."""
    return jnp.einsum(
        "...nc,...mc->...nm", _l2_normalize(a), _l2_normalize(b),
        preferred_element_type=jnp.float32,
    )


def _limit(
    rng, idx_a, idx_p, idx_n, valid, budget: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random subsample to the fixed budget (``limit_triplets``)."""
    b, n = idx_a.shape
    if n <= budget:
        pad = budget - n
        z = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        return z(idx_a), z(idx_p), z(idx_n), jnp.pad(valid, ((0, 0), (0, pad)))
    # random permutation per batch row, keep `budget`
    keys = jax.random.split(rng, b)
    perm = jax.vmap(lambda k: jax.random.permutation(k, n))(keys)  # (B, n)
    take = perm[:, :budget]
    g = lambda x: jnp.take_along_axis(x, take, axis=1)
    return g(idx_a), g(idx_p), g(idx_n), jnp.take_along_axis(valid, take, axis=1)


@dataclasses.dataclass
class AbstractMiner:
    """Base: fixed triplet budget + gather helper."""

    max_triplets: int = 0

    @property
    def budget(self) -> int:
        return self.max_triplets if self.max_triplets > 0 else DEFAULT_BUDGET

    def mine(self, embeddings, labels, prediction, rng):
        raise NotImplementedError

    @staticmethod
    def _gather(flat_emb, idx):
        """(B, P, C) gathered at (B, N) -> (B, N, C)."""
        return jnp.take_along_axis(
            flat_emb, idx[..., None].astype(jnp.int32), axis=1
        )


@dataclasses.dataclass
class KernelMiner(AbstractMiner):
    """Reference ``triplet_miners.py:78-125``: non-overlapping k×k patches,
    anchor = patch centre, positive = least-similar same-label pixel in the
    patch, negative = most-similar different-label pixel globally."""

    kernel_size: int = 3
    stride: int = 3

    def mine(self, embeddings, labels, prediction, rng):
        # embeddings (B, H, W, C); labels (B, H, W)
        b, h, w, c = embeddings.shape
        k, s = self.kernel_size, self.stride
        ph, pw = (h - k) // s + 1, (w - k) // s + 1

        emb = embeddings[:, : ph * s, : pw * s].astype(jnp.float32)
        lab = labels[:, : ph * s, : pw * s]
        # torch .unfold(2, k, s).unfold(3, k, s) with s == k tiles exactly:
        patches = emb[:, : ph * k, : pw * k].reshape(b, ph, k, pw, k, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph * pw, k * k, c)
        plabs = lab[:, : ph * k, : pw * k].reshape(b, ph, k, pw, k)
        plabs = plabs.transpose(0, 1, 3, 2, 4).reshape(b, ph * pw, k * k)

        centre = (k * k) // 2
        anchors = patches[:, :, centre]  # (B, NP, C)
        anchor_labels = plabs[:, :, centre]  # (B, NP)

        sim = jnp.einsum(
            "bnc,bnkc->bnk", _l2_normalize(anchors), _l2_normalize(patches),
            preferred_element_type=jnp.float32,
        )
        sim = jnp.where(plabs != anchor_labels[:, :, None], _BIG, sim)
        sim = sim.at[:, :, centre].set(_BIG)
        pos_in_patch = jnp.argmin(sim, axis=-1)  # (B, NP)

        # map patch-local index back to a flat (H*W) pixel index
        np_idx = jnp.arange(ph * pw)
        py, px = np_idx // pw, np_idx % pw
        ky, kx = pos_in_patch // k, pos_in_patch % k
        pos_flat = (py[None, :] * s + ky) * w + (px[None, :] * s + kx)
        anchor_flat = (py * s + centre // k) * w + (px * s + centre % k)
        anchor_flat = jnp.broadcast_to(anchor_flat[None], (b, ph * pw))

        # global hardest negative (triplet_miners.py:115-125)
        flat_emb = embeddings.reshape(b, h * w, c).astype(jnp.float32)
        flat_lab = labels.reshape(b, h * w)
        dist = _cosine_sim_matrix(anchors, flat_emb)  # (B, NP, H*W)
        invalid = anchor_labels[:, :, None] == flat_lab[:, None, :]
        dist = jnp.where(invalid, -1.0, dist)
        neg_flat = jnp.argmax(dist, axis=-1)  # (B, NP)
        # a patch whose label has no complement anywhere yields dist all -1;
        # argmax then points at pixel 0 — mark invalid
        has_neg = jnp.any(~invalid, axis=-1)

        a_i, p_i, n_i, valid = _limit(
            rng, anchor_flat, pos_flat, neg_flat, has_neg, self.budget
        )
        fe = embeddings.reshape(b, h * w, c)
        return (
            self._gather(fe, a_i),
            self._gather(fe, p_i),
            self._gather(fe, n_i),
            valid.astype(jnp.float32),
        )


@dataclasses.dataclass
class TemporalMiner(AbstractMiner):
    """Reference ``triplet_miners.py:128-159``: anchors = last frame's
    pixels; positives = least-similar same-label pixel in earlier frames;
    negatives = most-similar different-label pixel in earlier frames."""

    def mine(self, embeddings, labels, prediction, rng):
        # embeddings (B, T, H, W, C); labels (B, T, H, W)
        b, t, h, w, c = embeddings.shape
        last = embeddings[:, -1].reshape(b, h * w, c).astype(jnp.float32)
        last_lab = labels[:, -1].reshape(b, h * w)
        cand = embeddings[:, :-1].reshape(b, (t - 1) * h * w, c).astype(jnp.float32)
        cand_lab = labels[:, :-1].reshape(b, (t - 1) * h * w)

        sim = _cosine_sim_matrix(last, cand)  # (B, HW, (T-1)HW)
        same = last_lab[:, :, None] == cand_lab[:, None, :]

        neg_sim = jnp.where(same, -1.0, sim)
        pos_sim = jnp.where(~same, _BIG, sim)
        neg_idx = jnp.argmax(neg_sim, axis=-1)
        pos_idx = jnp.argmin(pos_sim, axis=-1)
        has_both = jnp.any(same, -1) & jnp.any(~same, -1)

        anchor_idx = jnp.broadcast_to(jnp.arange(h * w)[None], (b, h * w))
        a_i, p_i, n_i, valid = _limit(
            rng, anchor_idx, pos_idx, neg_idx, has_both, self.budget
        )
        return (
            self._gather(embeddings[:, -1].reshape(b, h * w, c), a_i),
            self._gather(embeddings[:, :-1].reshape(b, (t - 1) * h * w, c), p_i),
            self._gather(embeddings[:, :-1].reshape(b, (t - 1) * h * w, c), n_i),
            valid.astype(jnp.float32),
        )


@dataclasses.dataclass
class OneBackOneAheadMiner(TemporalMiner):
    """Delegates to TemporalMiner (``triplet_miners.py:162-168``); the
    difference is the frame slicing done by the training step
    (``train.py:191-199``)."""


def _host_morphology_mine(embeddings, labels, seeds, budget, mode, metric):
    """Host-side mining shared by the distance-transform and skeleton miners.

    Returns flat-pixel index triplets padded to ``budget`` with a validity
    mask. ``mode``: 'distance' (``triplet_miners.py:171-224``), 'skeleton'
    (``:227-285``) or 'skeleton_distance' (``:288-359``).
    """
    from semi_supervised_vos_tpu.utils.morphology import distance_transform, skeletonize

    embeddings = np.asarray(embeddings)  # (B, H, W, C)
    labels = np.asarray(labels)  # (B, H, W)
    b, h, w, c = embeddings.shape
    out_a = np.zeros((b, budget), np.int32)
    out_p = np.zeros((b, budget), np.int32)
    out_n = np.zeros((b, budget), np.int32)
    out_v = np.zeros((b, budget), np.float32)

    def norm(x):
        n = np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x / n

    for bi in range(b):
        emb = embeddings[bi]
        lab = labels[bi]
        anchors, positives, negatives = [], [], []
        for label in np.unique(lab):
            mask = (lab == label).astype(np.int32)
            if mode == "distance":
                distances, indices = distance_transform(mask, metric, return_indices=True)
                pix = np.argwhere(distances != 0)
                if len(pix) == 0:
                    continue
                # positives: least-similar in-region pixel per anchor
                cand = pix  # interior pixels are the positive candidate pool
                cand_emb = norm(emb[cand[:, 0], cand[:, 1]])
                sims = cand_emb @ cand_emb.T
                pos_pick = np.argmin(sims, axis=1)
                for a_k, (i, j) in enumerate(pix):
                    anchors.append(i * w + j)
                    x, y = indices[:, i, j]
                    negatives.append(x * w + y)
                    pi, pj = cand[pos_pick[a_k]]
                    positives.append(pi * w + pj)
            else:
                skel = skeletonize(mask)
                a_pix = np.argwhere(skel == 1)
                if mode == "skeleton":
                    p_mask = mask == 1
                    n_pix = np.argwhere(mask == 0)
                    if len(a_pix) == 0 or len(n_pix) == 0 or not p_mask.any():
                        continue
                    p_pix = np.argwhere(p_mask)
                    a_emb = norm(emb[a_pix[:, 0], a_pix[:, 1]])
                    p_emb = norm(emb[p_pix[:, 0], p_pix[:, 1]])
                    n_emb = norm(emb[n_pix[:, 0], n_pix[:, 1]])
                    pos_pick = np.argmin(a_emb @ p_emb.T, axis=1)
                    neg_pick = np.argmax(a_emb @ n_emb.T, axis=1)
                    for a_k, (i, j) in enumerate(a_pix):
                        anchors.append(i * w + j)
                        pi, pj = p_pix[pos_pick[a_k]]
                        positives.append(pi * w + pj)
                        ni, nj = n_pix[neg_pick[a_k]]
                        negatives.append(ni * w + nj)
                else:  # skeleton_distance
                    distances, indices = distance_transform(mask, metric, return_indices=True)
                    a_sel = np.logical_and(distances != 0, skel == 1)
                    a_pix = np.argwhere(a_sel)
                    p_mask = np.logical_and(mask == 1, skel == 0)
                    if len(a_pix) == 0 or not p_mask.any():
                        continue
                    p_pix = np.argwhere(p_mask)
                    a_emb = norm(emb[a_pix[:, 0], a_pix[:, 1]])
                    p_emb = norm(emb[p_pix[:, 0], p_pix[:, 1]])
                    pos_pick = np.argmin(a_emb @ p_emb.T, axis=1)
                    for a_k, (i, j) in enumerate(a_pix):
                        anchors.append(i * w + j)
                        x, y = indices[:, i, j]
                        negatives.append(x * w + y)
                        pi, pj = p_pix[pos_pick[a_k]]
                        positives.append(pi * w + pj)
        n_found = len(anchors)
        if n_found == 0:
            continue
        order = np.random.default_rng(int(seeds[bi])).permutation(n_found)[:budget]
        take = order
        out_a[bi, : len(take)] = np.asarray(anchors, np.int32)[take]
        out_p[bi, : len(take)] = np.asarray(positives, np.int32)[take]
        out_n[bi, : len(take)] = np.asarray(negatives, np.int32)[take]
        out_v[bi, : len(take)] = 1.0
    return out_a, out_p, out_n, out_v


def host_geometry(labels, mode: str, metric: str):
    """Label-only morphology geometry for the callback-free mining path.

    Everything the morphology miners take from SciPy depends ONLY on the
    label image — never on the embeddings — so it can run on the host
    *before* the step (overlapped with the previous device step by the
    staging thread) and enter the compiled program as plain arguments. The
    embedding-dependent argmin/argmax picks stay in-jit
    (:meth:`DistanceTransformationMiner.mine_from_geometry`).

    Args:
      labels: (B, H, W) int array — the same label image
        ``_host_morphology_mine`` mines from.
      mode / metric: as on the miner.

    Returns (all (B, H*W), np arrays):
      interior_region: int32 — the pixel's label value where the label
        region's distance transform is non-zero, else -1 (used by
        'distance' / 'skeleton_distance'; all -1 for 'skeleton').
      skel: bool — pixel on its label region's Zhang-Suen skeleton
        ('skeleton' / 'skeleton_distance'; all False for 'distance').
      nb_idx: int32 — flat index of the nearest boundary pixel
        (distance-transform indices) where interior, else 0.
    """
    from semi_supervised_vos_tpu.utils.morphology import (
        distance_transform,
        skeletonize,
    )

    labels = np.asarray(labels)
    b, h, w = labels.shape
    p = h * w
    interior = np.full((b, p), -1, np.int32)
    skel = np.zeros((b, p), bool)
    nb_idx = np.zeros((b, p), np.int32)
    for bi in range(b):
        lab = labels[bi]
        for label in np.unique(lab):
            mask = (lab == label).astype(np.int32)
            if mode in ("distance", "skeleton_distance"):
                distances, indices = distance_transform(
                    mask, metric, return_indices=True
                )
                inside = (distances != 0).reshape(p)
                interior[bi, inside] = label
                nb_flat = (indices[0] * w + indices[1]).reshape(p)
                nb_idx[bi, inside] = nb_flat[inside]
            if mode in ("skeleton", "skeleton_distance"):
                skel[bi] |= (skeletonize(mask) == 1).reshape(p)
    return interior, skel, nb_idx


@dataclasses.dataclass
class DistanceTransformationMiner(AbstractMiner):
    """Reference ``triplet_miners.py:171-224``: anchors = region-interior
    pixels, negatives = their nearest boundary pixel (distance-transform
    indices), positives = least-similar in-region pixel."""

    metric: str = "euclidean"
    mode: str = "distance"

    def mine_from_geometry(self, embeddings, labels, geometry, rng):
        """Callback-free morphology mining (the ``pipelined`` mode).

        ``geometry`` is :func:`host_geometry`'s output for this batch's
        label image, passed into the step as arguments. The reference's
        embedding-dependent picks (``triplet_miners.py:196-281``) — the
        least-similar in-pool positive and, for the skeleton miner, the
        most-similar out-of-region negative — run here in-jit on the MXU.
        Produces the same triplet set as the ``pure_callback`` path
        (``tests/test_miners.py`` pins it); anchor subsampling to the
        budget is uniform, like ``limit_triplets``. Required on runtimes
        without host-callback support (the axon PJRT plugin rejects
        ``pure_callback`` outright) and removes the device→host→device
        round trip from the step everywhere else.
        """
        b, h, w, c = embeddings.shape
        fe = embeddings.reshape(b, h * w, c)
        a_i, p_i, n_i, valid = self.mine_indices_from_geometry(
            embeddings, labels, geometry, rng
        )
        return (
            self._gather(fe, a_i),
            self._gather(fe, p_i),
            self._gather(fe, n_i),
            valid,
        )

    def mine_indices_from_geometry(self, embeddings, labels, geometry, rng):
        """Index-level core of :meth:`mine_from_geometry`: (B, budget)
        anchor/positive/negative flat-pixel indices + float validity."""
        b, h, w, c = embeddings.shape
        p = h * w
        budget = self.budget
        fe = embeddings.reshape(b, p, c)
        flat_lab = labels.reshape(b, p)
        interior, skel, nb_idx = geometry

        if self.mode == "distance":
            a_valid = interior >= 0
        elif self.mode == "skeleton":
            a_valid = skel
        else:  # skeleton_distance
            a_valid = skel & (interior >= 0)

        # uniform anchor subsample to the budget (== limit_triplets
        # semantics: every miner emits exactly one triplet per anchor, so
        # subsampling anchors == subsampling triplets)
        na = min(p, budget)
        scores = jax.random.uniform(rng, (b, p))
        scores = jnp.where(a_valid, scores, 2.0)  # invalid anchors sort last
        order = jnp.argsort(scores, axis=-1)
        a_idx = order[:, :na]  # (B, NA)
        take = lambda x: jnp.take_along_axis(x, a_idx, axis=1)
        a_valid = take(a_valid)

        nemb = _l2_normalize(fe.astype(jnp.float32))
        a_emb = jnp.take_along_axis(
            nemb, a_idx[..., None].astype(jnp.int32), axis=1
        )  # (B, NA, C)
        sims = jnp.einsum(
            "bnc,bmc->bnm", a_emb, nemb, preferred_element_type=jnp.float32
        )  # (B, NA, P)

        if self.mode == "distance":
            # positive pool: same-region interior pixels (incl. the anchor,
            # as the reference's pool does); negative: nearest boundary
            pos_ok = take(interior)[:, :, None] == interior[:, None, :]
            neg_idx = take(nb_idx)
        elif self.mode == "skeleton":
            same = take(flat_lab)[:, :, None] == flat_lab[:, None, :]
            pos_ok = same
            # mask strictly below any cosine (-1.0 would tie with a
            # legitimate antiparallel negative and argmax could then pick
            # a same-label pixel; the host path argmaxes over the negative
            # pool only and can never do that)
            neg_sim = jnp.where(same, -1e30, sims)
            neg_idx = jnp.argmax(neg_sim, axis=-1)
            a_valid = a_valid & jnp.any(~same, axis=-1)  # region == whole image
        else:  # skeleton_distance: positives exclude the skeleton itself
            same = take(flat_lab)[:, :, None] == flat_lab[:, None, :]
            pos_ok = same & ~skel[:, None, :]
            neg_idx = take(nb_idx)
            a_valid = a_valid & jnp.any(pos_ok, axis=-1)

        pos_idx = jnp.argmin(jnp.where(pos_ok, sims, _BIG), axis=-1)

        pad = budget - na
        z = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        return (
            z(a_idx).astype(jnp.int32),
            z(pos_idx).astype(jnp.int32),
            z(neg_idx).astype(jnp.int32),
            z(a_valid.astype(jnp.float32)),
        )

    def mine(self, embeddings, labels, prediction, rng):
        # embeddings (B, H, W, C); labels (B, H, W)
        b, h, w, c = embeddings.shape
        budget = self.budget
        seeds = jax.random.randint(rng, (b,), 0, 2**31 - 1)
        shapes = (
            jax.ShapeDtypeStruct((b, budget), jnp.int32),
            jax.ShapeDtypeStruct((b, budget), jnp.int32),
            jax.ShapeDtypeStruct((b, budget), jnp.int32),
            jax.ShapeDtypeStruct((b, budget), jnp.float32),
        )
        a_i, p_i, n_i, valid = jax.pure_callback(
            lambda e, l, s: _host_morphology_mine(
                e, l, s, budget, self.mode, self.metric
            ),
            shapes,
            jax.lax.stop_gradient(embeddings),
            labels,
            seeds,
        )
        fe = embeddings.reshape(b, h * w, c)
        return (
            self._gather(fe, a_i),
            self._gather(fe, p_i),
            self._gather(fe, n_i),
            valid,
        )


@dataclasses.dataclass
class SkeletonMiner(DistanceTransformationMiner):
    """Reference ``triplet_miners.py:227-285``."""

    metric: str = "euclidean"
    mode: str = "skeleton"


@dataclasses.dataclass
class SkeletonWithDistanceTransformMiner(DistanceTransformationMiner):
    """Reference ``triplet_miners.py:288-359`` (manhattan by default)."""

    metric: str = "manhattan"
    mode: str = "skeleton_distance"


@dataclasses.dataclass
class SkeletonTemporalMiner(SkeletonMiner):
    """Delegates to SkeletonMiner (``triplet_miners.py:362-368``); the
    5-frame stacking happens in the training step (``train.py:200-204``)."""


def get_miner(miner_name: str) -> Optional[AbstractMiner]:
    """Registry (reference ``triplet_miners.py:21-32``)."""
    miners = {
        "default": KernelMiner(kernel_size=3, stride=3),
        "kernel_7x7": KernelMiner(kernel_size=7, stride=7),
        "temporal": TemporalMiner(),
        "one_back_one_ahead": OneBackOneAheadMiner(),
        "euclidean": DistanceTransformationMiner(metric="euclidean"),
        "manhattan": DistanceTransformationMiner(metric="manhattan"),
        "chebyshev": DistanceTransformationMiner(metric="chessboard"),
        "skeleton": SkeletonMiner(),
        "skeleton_nearest_negative": SkeletonWithDistanceTransformMiner(),
        "skeleton_temporal": SkeletonTemporalMiner(),
    }
    return miners.get(miner_name)
