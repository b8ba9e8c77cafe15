"""Batched multi-video inference.

The reference runs inference strictly one frame of one video at a time
(batch_size=1, ``src/inference.py:75-78``) — on TPU that leaves the chip
mostly idle between small kernels. This module propagates **B videos in
lockstep**: one backbone forward over the (B, H, W, 3) frame batch, a
vmapped fused-affinity over per-video memory banks, and batched bank
updates — the straightforward TPU throughput win the reference architecture
cannot express (SURVEY.md §7 step 7).

Videos are grouped by resolution and padded to the longest video in the
group (the padded tail recomputes the last real frame; its outputs are
dropped host-side). The math is identical to running each video through the
single engine: per-video state never mixes, and the shared ``frame_idx``
schedule is the same for all. On CPU f32 this is bit-identical (pinned by
tests); on TPU bf16 the conv *dispatch batch* differs between engines
(chunk-batched encode), so XLA may tile/reassociate reductions differently
— the same order-of-magnitude deviation the bf16 cast itself introduces
(see the fast-encoder cosine gate in bench.py), with occasional argmax
flips only on near-tie scores.

Resolution/batch envelope: per-lane HBM footprint (ring bank + the native-
conv early-stage activations) scales with the feature-pixel count, and
1080p-scale lanes beyond 2 RESOURCE_EXHAUST chip HBM at runtime — the
runners clamp each resolution group to the per-chip lane envelope
(``_hbm_lanes_cap``; scaled by the data-mesh size), which costs nothing:
one 1080p stream already saturates the chip (BASELINE.md). 480p runs
B = 8 comfortably.
"""

from __future__ import annotations

import math
from collections import defaultdict
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_vos_tpu.core.sampling import sample_frames
from semi_supervised_vos_tpu.infer.engine import (
    BankState,
    EngineConfig,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from semi_supervised_vos_tpu.models.resnet import out_spatial
from semi_supervised_vos_tpu.ops.onehot import index_to_onehot
from semi_supervised_vos_tpu.parallel import collectives
from semi_supervised_vos_tpu.ops.resize import nearest_resize
from semi_supervised_vos_tpu.utils.image import (
    copy_first_annotation,
    first_annotation_path,
    load_annotation,
    save_predictions,
)
from semi_supervised_vos_tpu.utils.logging import logger


import dataclasses


# budget growth and the SVOS_CHUNK knob are shared with the single-video
# runner (one source of truth for both rules)
from semi_supervised_vos_tpu.infer.strategies import _chunk_len, _with_budget


@dataclasses.dataclass(frozen=True)
class LaneFusion:
    """Multi-stream strategies under lockstep batching.

    Each video occupies ``len(pred_flips)`` consecutive engine lanes (e.g.
    hor-flip: lane 0 = original stream, lane 1 = mirrored stream). Label
    histories stay strictly per-lane — exactly the reference's per-stream
    ``label_history``/``label_history_flipped`` (``inference_utils.py:90-193``)
    — and only the *saved* output fuses the lanes: per-lane full-res unflip
    (``pred_flips``), then max of class indices (label mode) or the
    ``reduction`` of probability maps + fp16 argmax (probability mode).
    """

    pred_flips: Tuple[Optional[str], ...]  # per-lane: None | 'h' | 'v'
    probability: bool = False
    reduction: str = "mean"

    @property
    def lanes(self) -> int:
        return len(self.pred_flips)


def _unflip(x, how, h_axis, w_axis):
    if how == "h":
        return jnp.flip(x, axis=w_axis)
    if how == "v":
        return jnp.flip(x, axis=h_axis)
    return x


class BatchedPropagationEngine:
    """Lockstep propagation for B same-resolution video streams.

    First-class sibling of :class:`PropagationEngine`: the banks live
    **slot-major** — (capacity, B, P_pad, C) features and
    (capacity, B, P_pad, D_pad) bf16 labels — so each frame's bank update is
    one contiguous dynamic-slice write, and the fused kernel
    (``affinity_from_bank_batched``) streams reference tiles for all B videos
    straight from HBM via scalar-prefetched slot indices: no (B, K, P, C)
    gather, no f32 label copies.

    With ``fusion`` set, ``batch`` counts *lanes* (videos × streams) and the
    step output is one fused mask per video; without it, one mask per lane.

    With ``bank_axis`` set (the name of a mesh axis the caller shard_maps
    this engine over — ``parallel/batched_dp.py``), every lane's bank is
    additionally sharded over its reference-pixel rows: this engine instance
    becomes the per-shard program, holding ``p_loc`` global rows starting at
    ``axis_index(bank_axis) * p_loc``, and ``_propagate`` runs the
    distributed online softmax (per-shard statistics + ``pmax``/``psum``
    over ``bank_axis`` — the same decomposition as
    ``parallel/engine_sharded.py``, here batched over lanes).
    """

    def __init__(self, model, variables, frame_hw: Tuple[int, int], batch: int,
                 cfg: EngineConfig, fusion: Optional[LaneFusion] = None,
                 interpret: bool = False, bank_axis: Optional[str] = None,
                 bank_shards: int = 1):
        self.fusion = fusion
        if fusion is not None:
            assert batch % fusion.lanes == 0, (batch, fusion.lanes)
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.b = batch
        self.h, self.w = frame_hw
        self.hd, self.wd = out_spatial(self.h, self.w)
        self.p = self.hd * self.wd
        self._bank_axis = bank_axis
        self._bank_shards = bank_shards if bank_axis is not None else 1

        # interpret=True lowers the bank kernel in interpreter mode off-TPU —
        # virtual-mesh validation of the kernel path (as ShardedPropagationEngine)
        self._interpret = interpret
        self._use_pallas = cfg.use_pallas and (
            jax.default_backend() == "tpu" or interpret
        )
        # resolution-dependent sweep optimum (ops.affinity_pallas.default_blocks)
        from semi_supervised_vos_tpu.ops.affinity_pallas import default_blocks

        self._block_r, self._block_t = default_blocks(self.p)
        if bank_axis is not None:
            # pixel-sharded banks: this instance holds p_loc rows per lane;
            # p_pad is the LOCAL row count (the shard_map-visible bank shape).
            # Block sizes follow the same resolution rule, shrunk when a
            # shard's rows are fewer than one tile.
            per = -(-self.p // self._bank_shards)
            self._wd = self._ws = None
            if self._use_pallas:
                base_r, base_t = self._block_r, self._block_t
                self._block_r = base_r if per >= base_r else -(-per // 8) * 8
                self._block_t = (
                    base_t if self.p >= base_t else -(-self.p // 128) * 128
                )
                self.p_loc = -(-per // self._block_r) * self._block_r
                self.d_pad = -(-cfg.num_classes // 8) * 8
            else:
                self.p_loc = per
                self.d_pad = cfg.num_classes
            self.p_pad = self.p_loc
            self.p_global = self.p_loc * self._bank_shards
        elif self._use_pallas:
            self.p_pad = -(-self.p // self._block_r) * self._block_r
            self.d_pad = -(-cfg.num_classes // 8) * 8
            self._wd = self._ws = None
        else:
            self.p_pad = self.p
            self.d_pad = cfg.num_classes
            if cfg.probability_propagation:
                self._wd = self._ws = None
            else:
                from semi_supervised_vos_tpu.core.spatial import spatial_weight

                self._wd = spatial_weight((self.hd, self.wd), cfg.sigma_1)
                self._ws = spatial_weight((self.hd, self.wd), cfg.sigma_2)

        # BN-folded fast forward (see PropagationEngine): folded table flows
        # through jit as the `variables` argument, never a closure constant.
        from semi_supervised_vos_tpu.infer.engine import _maybe_fold_fast_encoder

        self.enc_params = variables
        self._fast, self._fast_arch = _maybe_fold_fast_encoder(
            model, variables, cfg
        )
        if self._fast is not None:
            self.enc_params = self._fast

        self._first = jax.jit(self._first_impl, donate_argnums=(2,))
        self._step = jax.jit(self._step_impl, donate_argnums=(2,))
        self._step_chunk = jax.jit(self._step_chunk_impl, donate_argnums=(2,))
        self._step_chunk_small = jax.jit(
            self._step_chunk_small_impl, donate_argnums=(2,)
        )
        self._step_chunk_scores = jax.jit(
            self._step_chunk_scores_impl, donate_argnums=(2,)
        )

    def _normalize(self, frames_u8):
        x = frames_u8.astype(jnp.float32) / 255.0
        return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    def _encode(self, variables, frames_u8):
        from semi_supervised_vos_tpu.infer.engine import backbone_encode

        feats = backbone_encode(
            self.model,
            self._fast,
            self._fast_arch,
            self.cfg.compute_dtype,
            variables,
            self._normalize(frames_u8),
        )
        return feats.reshape(self.b, self.p, self.cfg.feature_dim).astype(
            self.cfg.compute_dtype
        )

    def _local_rows(self, x):
        """(B, P, ...) full-pixel array → this shard's (B, p_loc, ...) global
        row block [row_base, row_base + p_loc). Padded rows (the last shard's
        overhang) are zeros; exactness comes from the row-validity masks both
        propagate paths derive from GLOBAL indices."""
        x = jnp.pad(
            x, ((0, 0), (0, self.p_global - self.p)) + ((0, 0),) * (x.ndim - 2)
        )
        row_base = jax.lax.axis_index(self._bank_axis) * self.p_loc
        return jax.lax.dynamic_slice_in_dim(x, row_base, self.p_loc, axis=1)

    def _bank_write(self, state: BankState, slot, targets, labels_f32):
        """Write one frame's (B, P, C) features + (B, P, D) labels into bank
        slot ``slot`` — whole-pixel on one chip, this shard's row block when
        the bank is pixel-sharded (writes are purely chip-local either way)."""
        if self._bank_axis is not None:
            lab = jnp.pad(
                labels_f32,
                ((0, 0), (0, 0), (0, self.d_pad - self.cfg.num_classes)),
            )
            return BankState(
                feats=state.feats.at[slot].set(
                    self._local_rows(targets).astype(state.feats.dtype)
                ),
                labels=state.labels.at[slot].set(
                    self._local_rows(lab).astype(state.labels.dtype)
                ),
            )
        # whole-slot single-index DUS: the interior .at[slot, :, :p].set
        # form measured 0.73 ms/frame at 480p (XLA cannot lower a
        # partial-interior DUS on the carried bank in place); padding the
        # rows/classes first is zeros over zeros — bit-identical bank state
        # (see PropagationEngine._pad_slot)
        tp = jnp.pad(targets, ((0, 0), (0, self.p_pad - self.p), (0, 0)))
        lp = jnp.pad(
            labels_f32,
            (
                (0, 0),
                (0, self.p_pad - self.p),
                (0, self.d_pad - self.cfg.num_classes),
            ),
        )
        return BankState(
            feats=state.feats.at[slot].set(tp.astype(state.feats.dtype)),
            labels=state.labels.at[slot].set(lp.astype(state.labels.dtype)),
        )

    def _first_impl(self, variables, frames_u8, state: BankState, labels_full):
        feats = self._encode(variables, frames_u8)  # (B, P, C)
        label_small = nearest_resize(
            labels_full[:, :, :, None], (self.hd, self.wd), hw_axes=(1, 2)
        ).reshape(self.b, self.p)
        onehot = index_to_onehot(label_small, self.cfg.num_classes, jnp.float32)
        return self._bank_write(state, 0, feats, onehot)

    def _transpose_targets(self, targets):
        """(B, P, C) encoded lanes → the kernel's pre-transposed
        (B, C, t_pad) ``target_t`` operand, temperature folded in (the exact
        value chain of the kernel's own fallback: f32 ``targets`` × f32 T →
        compute dtype — bit-identical). The chunked paths call this OUTSIDE
        the propagate scan: a trace-level transpose inside the scan body
        makes XLA lay out the loop-carried bank p-minor ({2,3,1,0}) to get
        the transpose for free, which then costs a full-bank {3,2,1,0} copy
        per iteration against the Pallas operand constraint — 1.23 GB/step
        at 480p B=8, the entire batched-vs-single step gap (prof/ab_glue2.py
        bisection + prof/ab_hlo.py HLO evidence)."""
        from semi_supervised_vos_tpu.ops.affinity_pallas import target_tiling

        t_pad, _, _ = target_tiling(self.p, self._block_t)
        tt = (
            (targets.astype(jnp.float32) * jnp.float32(self.cfg.temperature))
            .astype(self.cfg.compute_dtype)
            .swapaxes(-1, -2)
        )
        pad = ((0, 0),) * (tt.ndim - 1) + ((0, t_pad - self.p),)
        return jnp.pad(tt, pad)

    def _propagate(self, targets, state: BankState, frame_idx, targets_t=None):
        """(B, P, C) targets + banks -> (B, D, P) scores."""
        cfg = self.cfg
        idx, valid, dense = sample_frames(
            frame_idx, cfg.frame_range, cfg.ref_num, cfg.continuous_frame
        )
        slots = idx % cfg.capacity
        if self._bank_axis is not None:
            return self._propagate_bank_sharded(
                targets, state, slots, valid, dense, targets_t
            )
        if self._use_pallas:
            from semi_supervised_vos_tpu.ops.affinity_pallas import (
                affinity_from_bank_batched,
            )

            pred = affinity_from_bank_batched(
                state.feats,
                state.labels,
                targets.astype(jnp.float32),
                slots,
                target_t=targets_t,
                feature_hw=(self.hd, self.wd),
                temperature=cfg.temperature,
                valid=valid,
                dense=dense,
                sigma_1=cfg.sigma_1,
                sigma_2=cfg.sigma_2,
                spatial=not cfg.probability_propagation,
                interpret=self._interpret,
                block_r=self._block_r,
                block_t=self._block_t,
            )
            return pred[:, : cfg.num_classes]

        from semi_supervised_vos_tpu.core.propagation import affinity_propagate

        ref_f = state.feats[slots].transpose(1, 0, 2, 3)  # (B, K, P, C)
        ref_l = state.labels[slots].transpose(1, 0, 2, 3).astype(jnp.float32)
        return jax.vmap(
            lambda rf, t, rl: affinity_propagate(
                rf,
                t,
                rl,
                temperature=cfg.temperature,
                valid=valid,
                dense=dense,
                weight_dense=self._wd,
                weight_sparse=self._ws,
                precision=cfg.matmul_precision,
            )
        )(ref_f, targets, ref_l)

    def _propagate_bank_sharded(
        self, targets, state, slots, valid, dense, targets_t=None
    ):
        """Distributed online softmax over ``bank_axis``: this shard scores
        its global row block [row_base, row_base + p_loc) of every lane's
        bank against the (replicated) full targets, and the statistics
        combine with ``pmax``/``psum`` — the denominator stays unweighted
        over ALL bank pixels and the Gaussian prior multiplies the numerator
        only, exactly matching the single-chip semantics (``predict.py:55-66``).
        """
        cfg = self.cfg
        row_base = jax.lax.axis_index(self._bank_axis) * self.p_loc
        if self._use_pallas:
            from semi_supervised_vos_tpu.ops.affinity_pallas import (
                affinity_from_bank_batched,
            )
            from semi_supervised_vos_tpu.parallel.sharded_affinity import (
                distributed_softmax_combine,
            )

            m, l, acc = affinity_from_bank_batched(
                state.feats,
                state.labels,
                targets.astype(jnp.float32),
                slots,
                target_t=targets_t,
                feature_hw=(self.hd, self.wd),
                temperature=cfg.temperature,
                valid=valid,
                dense=dense,
                sigma_1=cfg.sigma_1,
                sigma_2=cfg.sigma_2,
                spatial=not cfg.probability_propagation,
                interpret=self._interpret,
                block_r=self._block_r,
                block_t=self._block_t,
                row_base=row_base,
                return_stats=True,
            )
            pred = distributed_softmax_combine(m, l, acc, self._bank_axis)
            return pred[:, : cfg.num_classes]

        # jnp fallback (CPU CLI runs): the (B, K, p_loc, P) similarity is
        # materialised PER SHARD — row masks and Gaussian rows derive from
        # global indices in-body, the dense (P, P) matrices never exist
        from semi_supervised_vos_tpu.core.propagation import NEG_INF

        gidx = row_base + jnp.arange(self.p_loc)
        rows_valid = gidx < self.p
        ref_f = state.feats[slots].astype(jnp.float32)  # (K, B, p_loc, C)
        ref_l = state.labels[slots].astype(jnp.float32)  # (K, B, p_loc, D)
        sim = jnp.einsum(
            "kbpc,bqc->bkpq", ref_f, targets.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(cfg.temperature)
        mask = valid[None, :, None, None] & rows_valid[None, None, :, None]
        sim = jnp.where(mask, sim, NEG_INF)

        m = collectives.pmax(jnp.max(sim, axis=(1, 2)), self._bank_axis)  # (B, P)
        e = jnp.where(mask, jnp.exp(sim - m[:, None, None, :]), 0.0)
        denom = collectives.psum(jnp.sum(e, axis=(1, 2)), self._bank_axis)
        if not cfg.probability_propagation:
            # reference coordinate quirk (core/spatial.py::spatial_coords):
            # fractional row = idx / W with true division
            fw = float(self.wd)
            i = gidx.astype(jnp.float32)
            j = jnp.arange(self.p, dtype=jnp.float32)
            dr = j[None, :] / fw - (i / fw)[:, None]
            dc = j[None, :] % fw - (i % fw)[:, None]
            dist2 = dr * dr + dc * dc
            w_dense = jnp.exp(-dist2 / jnp.float32(cfg.sigma_1**2))
            w_sparse = jnp.exp(-dist2 / jnp.float32(cfg.sigma_2**2))
            w = jnp.where(dense[:, None, None], w_dense[None], w_sparse[None])
            e = e * w[None]  # (B, K, p_loc, P)
        acc = jnp.einsum(
            "kbpd,bkpq->bdq", ref_l, e, preferred_element_type=jnp.float32
        )
        acc = collectives.psum(acc, self._bank_axis)
        return acc / jnp.maximum(denom, 1e-30)[:, None, :]

    def _encode_chunk(self, variables, frames_u8):
        """(N, B, H, W, 3) u8 → (N, B, P, C): batched backbone forwards
        grouping ``g`` lockstep steps per dispatch (g·B images, capped by
        the measured HBM activation envelope). Encoding is bank-independent
        — only propagation is sequential — so the chunked paths hoist it out
        of the scan (the same hoist as
        ``PropagationEngine._encode_batch_impl``). This matters most for
        thin-lane engines (hor-flip's 2 fusion lanes, 1-lane DP shards):
        their per-step encode batch is only B, well under the batch that
        fills the MXU."""
        from semi_supervised_vos_tpu.infer.engine import backbone_encode, grouped_map

        def enc(fb):  # (g, B, H, W, 3) -> (g, B, P, C)
            g = fb.shape[0]
            x = self._normalize(fb.reshape((g * self.b,) + fb.shape[2:]))
            feats = backbone_encode(
                self.model,
                self._fast,
                self._fast_arch,
                self.cfg.compute_dtype,
                variables,
                x,
            )
            return feats.reshape(g, self.b, self.p, self.cfg.feature_dim)

        cap = max(1, _hbm_lanes_cap((self.h, self.w)) // self.b)
        return grouped_map(enc, frames_u8, cap).astype(self.cfg.compute_dtype)

    def _advance(self, variables, frames_u8, state: BankState, frame_idx):
        """Encode + propagate + bank write-back: -> ((B, D, P) scores, state)."""
        targets = self._encode(variables, frames_u8)  # (B, P, C)
        return self._advance_from_feats(targets, state, frame_idx)

    def _advance_from_feats(
        self, targets, state: BankState, frame_idx, targets_t=None
    ):
        """Propagate + bank write for already-encoded (B, P, C) lanes (the
        chunked paths encode whole chunks batched, then scan this)."""
        cfg = self.cfg
        pred = self._propagate(targets, state, frame_idx, targets_t)  # (B, D, P)

        if cfg.probability_propagation:
            new_label = pred.transpose(0, 2, 1)
        else:
            new_label = index_to_onehot(
                jnp.argmax(pred, axis=1), cfg.num_classes, jnp.float32
            )
        state = self._bank_write(
            state, frame_idx % cfg.capacity, targets, new_label
        )
        return pred, state

    def _step_impl(self, variables, frames_u8, state: BankState, frame_idx):
        pred, state = self._advance(variables, frames_u8, state, frame_idx)
        return self._finalize(pred), state

    def _finalize(self, pred):
        """(B, D, P) scores → per-lane or per-video fused (·, H, W) masks.

        Order matches the reference and the single-engine strategies: argmax
        at feature resolution (commutes with nearest upsample), upsample to
        full res, THEN unflip — nearest upsampling is not flip-equivariant on
        non-divisible grids, so unflipping after upsample is load-bearing.
        """
        cfg = self.cfg
        fusion = self.fusion
        # single-lane: the saved mask is argmax of the (upsampled) scores in
        # both modes (softmax is monotone), so no fusion tail is needed
        if fusion is None or fusion.lanes == 1:
            masks = jnp.argmax(pred, axis=1).reshape(self.b, self.hd, self.wd)
            masks = nearest_resize(
                masks[:, :, :, None], (self.h, self.w), hw_axes=(1, 2)
            )
            return masks[:, :, :, 0].astype(jnp.uint8)

        lanes = fusion.lanes
        v = self.b // lanes
        if fusion.probability:
            x = pred.transpose(0, 2, 1).reshape(
                self.b, self.hd, self.wd, cfg.num_classes
            )
            x = nearest_resize(x, (self.h, self.w), hw_axes=(1, 2))
            x = x.reshape(v, lanes, self.h, self.w, cfg.num_classes)
            fused = None
            from semi_supervised_vos_tpu.infer.strategies import REDUCTIONS

            for l, flip in enumerate(fusion.pred_flips):
                xl = _unflip(x[:, l], flip, h_axis=1, w_axis=2)
                fused = xl if fused is None else REDUCTIONS[fusion.reduction](fused, xl)
            # fp16 quantisation before argmax, as the reference's
            # ``.cpu().half()`` tail (``inference_utils.py:180-182``)
            return jnp.argmax(fused.astype(jnp.float16), axis=-1).astype(jnp.uint8)

        masks = jnp.argmax(pred, axis=1).reshape(self.b, self.hd, self.wd)
        masks = nearest_resize(
            masks[:, :, :, None], (self.h, self.w), hw_axes=(1, 2)
        )[:, :, :, 0]
        masks = masks.reshape(v, lanes, self.h, self.w)
        fused = None
        for l, flip in enumerate(fusion.pred_flips):
            ml = _unflip(masks[:, l], flip, h_axis=1, w_axis=2)
            fused = ml if fused is None else jnp.maximum(fused, ml)
        return fused.astype(jnp.uint8)

    def _step_chunk_impl(self, variables, frames_u8, state: BankState, start_idx):
        """(N, B, H, W, 3) frames through one scanned program: one batched
        backbone pass for the chunk, then the sequential propagate scan."""
        feats = self._encode_chunk(variables, frames_u8)
        feats_t = self._transpose_targets(feats) if self._use_pallas else feats

        def body(carry, xs):
            targets, targets_t = xs
            st, idx = carry
            pred, st = self._advance_from_feats(
                targets, st, idx, targets_t if self._use_pallas else None
            )
            return (st, idx + 1), self._finalize(pred)

        (state, _), masks = jax.lax.scan(
            body, (state, jnp.int32(start_idx)), (feats, feats_t)
        )
        return masks, state  # (N, B, H, W)

    def _step_chunk_small_impl(self, variables, frames_u8, state: BankState, start_idx):
        """Chunk step with FEATURE-resolution masks (single-lane engines
        only): (N, B, hd, wd) uint8, for host-side nearest upsampling —
        ~60x less D2H traffic, which dominates on this tunnel."""
        assert self.fusion is None or self.fusion.lanes == 1
        feats = self._encode_chunk(variables, frames_u8)
        feats_t = self._transpose_targets(feats) if self._use_pallas else feats

        def body(carry, xs):
            targets, targets_t = xs
            st, idx = carry
            pred, st = self._advance_from_feats(
                targets, st, idx, targets_t if self._use_pallas else None
            )
            mask = jnp.argmax(pred, axis=1).reshape(self.b, self.hd, self.wd)
            return (st, idx + 1), mask.astype(jnp.uint8)

        (state, _), masks = jax.lax.scan(
            body, (state, jnp.int32(start_idx)), (feats, feats_t)
        )
        return masks, state

    def init_state(self) -> BankState:
        cfg = self.cfg
        label_dtype = jnp.bfloat16 if self._use_pallas else jnp.float32
        return BankState(
            feats=jnp.zeros(
                (cfg.capacity, self.b, self.p_pad, cfg.feature_dim),
                cfg.compute_dtype,
            ),
            labels=jnp.zeros(
                (cfg.capacity, self.b, self.p_pad, self.d_pad), label_dtype
            ),
        )

    def start_videos(self, frames_u8: np.ndarray, labels_full: np.ndarray) -> BankState:
        return self._first(self.enc_params, frames_u8, self.init_state(), labels_full)

    def step(self, frames_u8, state, frame_idx):
        return self._step(self.enc_params, frames_u8, state, jnp.int32(frame_idx))

    def step_chunk(self, frames_u8, state, start_idx):
        """(N, B, H, W, 3) frames → ((N, B, H, W) uint8 masks, state)."""
        return self._step_chunk(self.enc_params, frames_u8, state, jnp.int32(start_idx))

    def step_chunk_small(self, frames_u8, state, start_idx):
        """(N, B, H, W, 3) frames → ((N, B, hd, wd) uint8 feature-res masks,
        state); caller upsamples on host. Single-lane engines only."""
        return self._step_chunk_small(
            self.enc_params, frames_u8, state, jnp.int32(start_idx)
        )

    def _step_chunk_scores_impl(self, variables, frames_u8, state, start_idx):
        assert self.fusion is None or self.fusion.lanes == 1
        feats = self._encode_chunk(variables, frames_u8)
        feats_t = self._transpose_targets(feats) if self._use_pallas else feats

        def body(carry, xs):
            targets, targets_t = xs
            st, idx = carry
            pred, st = self._advance_from_feats(
                targets, st, idx, targets_t if self._use_pallas else None
            )
            return (st, idx + 1), pred

        (state, _), preds = jax.lax.scan(
            body, (state, jnp.int32(start_idx)), (feats, feats_t)
        )
        return preds, state  # (N, B, D, P)

    def step_chunk_scores(self, frames_u8, state, start_idx):
        """(N, B, H, W, 3) frames → ((N, B, D, P) f32 scores, state). The
        scores stay on device — cross-engine fusion (multimodel) consumes
        them in a follow-up jit without any host round trip."""
        return self._step_chunk_scores(
            self.enc_params, frames_u8, state, jnp.int32(start_idx)
        )


# per-strategy lane wiring: (dataset item index | None, first-frame label
# flip, full-res prediction unflip) per lane — mirrors
# ``strategies.py``'s Stream definitions for the same strategies
_STRATEGY_LANES = {
    "single": ((None, None, None),),
    "hor-flip": ((0, None, None), (1, "h", "h")),
    "vert-flip": ((0, None, None), (1, "v", "v")),
}

BATCHABLE_STRATEGIES = tuple(_STRATEGY_LANES)


# Per-chip HBM envelope for lockstep lanes, in lane-grid-pixels, from two
# measured anchors on this 16 GB chip: 16 lanes at 480p (P = 6420; B=16 ran
# clean) and 2 lanes at 1080p (P = 32400; B=4 RESOURCE_EXHAUSTs at runtime
# since the encoder's early stages lowered natively). A single linear model
# cannot fit both — the early-stage activations scale super-linearly with
# the frame — so between the anchors the budget is interpolated in log
# space (a power law through both measurements) rather than stepped: a
# hard step at some pivot would grant mid-band resolutions (e.g. 720p,
# P≈14400) the full 480p budget, ~1.6x the measured-safe 1080p one.
# Outside the anchors it clamps: ≤480p-scale keeps the 480p budget,
# ≥1080p-scale the conservative 1080p one (4K lands at 1 lane).
_HBM_ANCHOR_P_SMALL = 6420
_HBM_ANCHOR_P_LARGE = 32400
_HBM_LANE_PX_SMALL = 16 * _HBM_ANCHOR_P_SMALL
_HBM_LANE_PX_LARGE = 2 * _HBM_ANCHOR_P_LARGE


def _hbm_lanes_cap(hw: Tuple[int, int]) -> int:
    """Max lockstep lanes PER CHIP for this frame size (see the anchors)."""
    hd, wd = out_spatial(hw[0], hw[1])
    p = hd * wd
    if p <= _HBM_ANCHOR_P_SMALL:
        budget = _HBM_LANE_PX_SMALL
    elif p >= _HBM_ANCHOR_P_LARGE:
        budget = _HBM_LANE_PX_LARGE
    else:
        frac = math.log(p / _HBM_ANCHOR_P_SMALL) / math.log(
            _HBM_ANCHOR_P_LARGE / _HBM_ANCHOR_P_SMALL
        )
        budget = _HBM_LANE_PX_SMALL * (
            _HBM_LANE_PX_LARGE / _HBM_LANE_PX_SMALL
        ) ** frac
    return max(1, int(budget) // p)


def _clamp_video_batch(video_batch: int, lanes: int, *hws, n_chips: int = 1) -> int:
    """Clamp a runner's videos-per-group so every chip's lanes stay inside
    the HBM envelope of every engine resolution involved. The per-chip cap
    applies FIRST (the data-parallel wrapper pads videos to a multiple of
    ``n_chips``, so each chip carries ceil(vb/n)·lanes lanes), then scales
    by the mesh size; logs when it bites. Batching past the envelope gains
    nothing anyway — a single 1080p-scale stream already saturates one chip
    (BASELINE.md)."""
    governing = min(hws, key=_hbm_lanes_cap)
    per_chip_videos = max(1, _hbm_lanes_cap(governing) // lanes)
    vb = max(1, min(video_batch, per_chip_videos * max(n_chips, 1)))
    if vb < video_batch:
        logger.info(
            f"video-batch {video_batch} exceeds the HBM envelope at "
            f"{governing} ({per_chip_videos} video(s) x {lanes} lanes per "
            f"chip over {n_chips} chip(s)); running groups of {vb}."
        )
    return vb


def _mesh_data_chips(mesh) -> int:
    """Chips the lane axis spreads over (1 without a mesh)."""
    return mesh.shape.get("data", 1) if mesh is not None else 1


def _make_engine(model, variables, hw, b, cfg, fusion=None, mesh=None):
    """Single-chip lockstep engine, or the mesh wrapper (lanes sharded over
    ``data``, bank rows over ``model``) when a >1-device mesh is given."""
    if mesh is not None and (
        mesh.shape.get("data", 1) > 1 or mesh.shape.get("model", 1) > 1
    ):
        from semi_supervised_vos_tpu.parallel.batched_dp import (
            DataParallelBatchedEngine,
        )

        return DataParallelBatchedEngine(
            model, variables, hw, b, cfg, fusion=fusion, mesh=mesh
        )
    return BatchedPropagationEngine(model, variables, hw, b, cfg, fusion=fusion)


def _flip2d(label: np.ndarray, how: Optional[str]) -> np.ndarray:
    if how == "h":
        return label[:, ::-1]
    if how == "v":
        return label[::-1, :]
    return label


def _drain_collect(chunk, lengths, chunks_iter):
    """Assemble per-video mask lists from pipelined lockstep conversions.

    ``chunks_iter`` yields ``(convert, t0, n)`` per device chunk: ``convert``
    fetches + post-processes that chunk's masks into an (n, B, H, W) array.
    Conversions run in order on one :class:`MaskDrain` worker, overlapping
    the device compute the generator keeps dispatching — one D2H per chunk
    instead of one per (frame, video) slice, and never on the critical path.
    """
    from semi_supervised_vos_tpu.infer.drain import MaskDrain

    metas = []
    with MaskDrain() as drain:
        for convert, t0, n in chunks_iter:
            drain.submit(convert)
            metas.append((t0, n))
        arrays = drain.drain()
    collected: Dict[str, List[np.ndarray]] = {v: [] for v in chunk}
    for (t0, n), arr in zip(metas, arrays):
        for tt in range(n):
            for i, v in enumerate(chunk):
                if t0 + tt < lengths[i]:
                    collected[v].append(arr[tt, i])
    return collected


def inference_batched(
    dataset,
    annotation_dir,
    save_dir,
    model,
    variables,
    cfg: EngineConfig,
    video_batch: int = 4,
    strategy: str = "single",
    probability: bool = False,
    reduction: str = "mean",
    progress: Optional[Callable[[], None]] = None,
    mesh=None,
) -> None:
    """Lockstep-batched inference for the single-resolution strategies
    (``single``, ``hor-flip``, ``vert-flip``): groups videos by resolution
    and runs ``video_batch`` of them (× lanes per strategy) in lockstep.
    With ``mesh``, lanes shard over its ``data`` axis (``parallel/batched_dp``)."""
    lane_spec = _STRATEGY_LANES[strategy]
    lanes = len(lane_spec)
    fusion = LaneFusion(
        pred_flips=tuple(s[2] for s in lane_spec),
        probability=probability,
        reduction=reduction,
    )

    def lane_frames(item):
        """Dataset item → per-lane (H, W, 3) frames."""
        return [item if s[0] is None else item[s[0]] for s in lane_spec]

    # group frame indices per video (dataset order is video-major)
    per_video: Dict[str, List[int]] = defaultdict(list)
    for i, (_, v) in enumerate(dataset.imgs):
        per_video[dataset.idx_to_class[v]].append(i)

    def resolution(video):
        item, _ = dataset[per_video[video][0]]
        return lane_frames(item)[0].shape[:2]

    groups: Dict[Tuple[int, int], List[str]] = defaultdict(list)
    for video in per_video:
        groups[resolution(video)].append(video)

    for hw, videos in groups.items():
        vb = _clamp_video_batch(video_batch, lanes, hw, n_chips=_mesh_data_chips(mesh))
        for start in range(0, len(videos), vb):
            chunk = sorted(videos[start : start + vb])
            b = len(chunk) * lanes
            lengths = [len(per_video[v]) for v in chunk]
            t_max = max(lengths)

            labels = []
            palettes = {}
            d_max = 0
            for v in chunk:
                ann = first_annotation_path(annotation_dir, v)
                label, d, palette = load_annotation(ann)
                d_max = max(d_max, d)
                palettes[v] = palette
                copy_first_annotation(ann, save_dir, v)
                labels.extend(
                    np.ascontiguousarray(_flip2d(label, s[1])) for s in lane_spec
                )
            engine = _make_engine(
                model, variables, hw, b, _with_budget(cfg, d_max),
                fusion=fusion, mesh=mesh,
            )

            def frame_row(t_index):
                """All lanes of all chunk videos for one time step."""
                return np.stack(
                    [
                        lane
                        for i, v in enumerate(chunk)
                        for lane in lane_frames(
                            dataset[per_video[v][min(t_index, lengths[i] - 1)]][0]
                        )
                    ]
                )

            state = engine.start_videos(
                frame_row(0), np.stack(labels).astype(np.int32)
            )
            if progress:
                progress()

            # single-lane engines emit feature-res masks (upsampled on host);
            # fused multi-lane strategies keep full-res device fusion (the
            # per-lane unflip is only exact after upsampling)
            small = lanes == 1
            from semi_supervised_vos_tpu.ops.resize import nearest_resize_host

            chunk_n = _chunk_len()

            def chunks_iter():
                nonlocal state
                t = 1
                while t < t_max:
                    n = min(chunk_n, t_max - t)
                    batch = np.stack([frame_row(tt) for tt in range(t, t + n)])
                    if n < chunk_n:  # pad the tail chunk (outputs dropped)
                        batch = np.concatenate(
                            [batch, np.repeat(batch[-1:], chunk_n - n, axis=0)]
                        )
                    step = engine.step_chunk_small if small else engine.step_chunk
                    masks, state = step(batch, state, t)

                    def convert(m=masks, k=n):
                        a = np.asarray(m)[:k]
                        if small:
                            a = nearest_resize_host(a, hw, hw_axes=(2, 3))
                        return a

                    yield convert, t, n
                    if progress:
                        for _ in range(n):
                            progress()
                    t += n

            collected = _drain_collect(chunk, lengths, chunks_iter())
            for v in chunk:
                save_predictions(collected[v], palettes[v], save_dir, v)
            logger.info(f"batched group {chunk} ({strategy}) done.")


def inference_single_batched(
    dataset, annotation_dir, save_dir, model, variables, cfg: EngineConfig,
    video_batch: int = 4, progress: Optional[Callable[[], None]] = None,
    mesh=None,
) -> None:
    """Back-compat alias: the ``single`` strategy through the generic
    lockstep-batched runner."""
    inference_batched(
        dataset, annotation_dir, save_dir, model, variables, cfg,
        video_batch=video_batch, strategy="single", progress=progress,
        mesh=mesh,
    )


def inference_multimodel_batched(
    dataset,
    annotation_dir,
    save_dir,
    model,
    variables,
    additional_model,
    additional_variables,
    cfg: EngineConfig,
    video_batch: int = 4,
    probability: bool = False,
    reduction: str = "mean",
    progress: Optional[Callable[[], None]] = None,
    mesh=None,
) -> None:
    """Lockstep-batched ``multimodel`` strategy: each backbone keeps its own
    bank/label history (reference ``inference_utils.py:411-511``); per-frame
    fusion happens at FEATURE resolution on device — exact, because with no
    flips both streams share the grid, so the nearest upsample commutes with
    argmax/max (label mode) and with the reduction + fp16 argmax
    (probability mode)."""
    import functools

    from semi_supervised_vos_tpu.infer.strategies import REDUCTIONS
    from semi_supervised_vos_tpu.ops.resize import nearest_resize_host

    per_video: Dict[str, List[int]] = defaultdict(list)
    for i, (_, v) in enumerate(dataset.imgs):
        per_video[dataset.idx_to_class[v]].append(i)

    def resolution(video):
        frame, _ = dataset[per_video[video][0]]
        return frame.shape[:2]

    groups: Dict[Tuple[int, int], List[str]] = defaultdict(list)
    for video in per_video:
        groups[resolution(video)].append(video)

    @functools.partial(jax.jit, static_argnames=("hd", "wd"))
    def fuse(s1, s2, hd, wd):
        if probability:
            fused = REDUCTIONS[reduction](s1, s2)
            m = jnp.argmax(fused.astype(jnp.float16), axis=2)
        else:
            m = jnp.maximum(jnp.argmax(s1, axis=2), jnp.argmax(s2, axis=2))
        n, b = m.shape[:2]
        return m.reshape(n, b, hd, wd).astype(jnp.uint8)

    for hw, videos in groups.items():
        # two engines share the chip — halve the lane envelope
        vb = _clamp_video_batch(video_batch, 2, hw, n_chips=_mesh_data_chips(mesh))
        for start in range(0, len(videos), vb):
            chunk = sorted(videos[start : start + vb])
            b = len(chunk)
            lengths = [len(per_video[v]) for v in chunk]
            t_max = max(lengths)

            labels, palettes = [], {}
            d_max = 0
            for v in chunk:
                ann = first_annotation_path(annotation_dir, v)
                label, d, palette = load_annotation(ann)
                d_max = max(d_max, d)
                palettes[v] = palette
                copy_first_annotation(ann, save_dir, v)
                labels.append(label)
            labels = np.stack(labels).astype(np.int32)
            gcfg = _with_budget(cfg, d_max)
            e1 = _make_engine(model, variables, hw, b, gcfg, mesh=mesh)
            e2 = _make_engine(
                additional_model, additional_variables, hw, b, gcfg, mesh=mesh
            )

            def frame_row(t_index):
                return np.stack(
                    [
                        dataset[per_video[v][min(t_index, lengths[i] - 1)]][0]
                        for i, v in enumerate(chunk)
                    ]
                )

            st1 = e1.start_videos(frame_row(0), labels)
            st2 = e2.start_videos(frame_row(0), labels)
            if progress:
                progress()

            chunk_n = _chunk_len()

            def chunks_iter():
                nonlocal st1, st2
                t = 1
                while t < t_max:
                    n = min(chunk_n, t_max - t)
                    batch = np.stack([frame_row(tt) for tt in range(t, t + n)])
                    if n < chunk_n:
                        batch = np.concatenate(
                            [batch, np.repeat(batch[-1:], chunk_n - n, axis=0)]
                        )
                    s1, st1 = e1.step_chunk_scores(batch, st1, t)
                    s2, st2 = e2.step_chunk_scores(batch, st2, t)
                    masks = fuse(s1, s2, e1.hd, e1.wd)

                    def convert(m=masks, k=n):
                        return nearest_resize_host(
                            np.asarray(m)[:k], hw, hw_axes=(2, 3)
                        )

                    yield convert, t, n
                    if progress:
                        for _ in range(n):
                            progress()
                    t += n

            collected = _drain_collect(chunk, lengths, chunks_iter())
            for v in chunk:
                save_predictions(collected[v], palettes[v], save_dir, v)
            logger.info(f"batched group {chunk} (multimodel) done.")


def inference_2_scale_batched(
    dataset,
    annotation_dir,
    save_dir,
    model,
    variables,
    cfg: EngineConfig,
    video_batch: int = 4,
    scale: float = 1.15,
    flip_pred: bool = False,
    probability: bool = False,
    reduction: str = "mean",
    progress: Optional[Callable[[], None]] = None,
    mesh=None,
) -> None:
    """Lockstep-batched ``2-scale`` / ``hor-2-scale``: one engine per
    resolution (the second-scale stream has its own feature grid), each with
    its own per-video banks. Label mode fuses on host — per-stream argmax
    commutes with its nearest upsample, and the hor-2-scale unflip happens
    after upsampling, exactly as the reference (``inference_utils.py:386-396``).
    Probability mode fuses on device per chunk (upsample → unflip →
    reduction → fp16 argmax)."""
    import functools

    from semi_supervised_vos_tpu.infer.strategies import REDUCTIONS
    from semi_supervised_vos_tpu.ops.resize import nearest_resize_host

    per_video: Dict[str, List[int]] = defaultdict(list)
    for i, (_, v) in enumerate(dataset.imgs):
        per_video[dataset.idx_to_class[v]].append(i)

    def resolutions(video):
        item, _ = dataset[per_video[video][0]]
        return item[0].shape[:2], item[1].shape[:2]

    groups: Dict[Tuple, List[str]] = defaultdict(list)
    for video in per_video:
        groups[resolutions(video)].append(video)

    for (hw1, hw2), videos in groups.items():
        # two per-resolution engines share the chip — halve the envelope
        vb = _clamp_video_batch(video_batch, 2, hw1, hw2, n_chips=_mesh_data_chips(mesh))
        for start in range(0, len(videos), vb):
            chunk = sorted(videos[start : start + vb])
            b = len(chunk)
            lengths = [len(per_video[v]) for v in chunk]
            t_max = max(lengths)

            labels, palettes = [], {}
            d_max = 0
            for v in chunk:
                ann = first_annotation_path(annotation_dir, v)
                label, d, palette = load_annotation(ann)
                d_max = max(d_max, d)
                palettes[v] = palette
                copy_first_annotation(ann, save_dir, v)
                labels.append(label)
            gcfg = _with_budget(cfg, d_max)
            e1 = _make_engine(model, variables, hw1, b, gcfg, mesh=mesh)
            e2 = _make_engine(model, variables, hw2, b, gcfg, mesh=mesh)
            labels1 = np.stack(labels).astype(np.int32)
            # stream 2: the reference downsamples the FULL-RES label to the
            # second-scale grid (get_labels, predict.py:136-142); for
            # hor-2-scale we mirror the full-res label to match the mirrored
            # input stream (documented deviation, infer/strategies.py:25-27)
            labels2 = np.stack(
                [_flip2d(l, "h" if flip_pred else None) for l in labels]
            ).astype(np.int32)

            def rows(t_index, lane):
                return np.stack(
                    [
                        dataset[per_video[v][min(t_index, lengths[i] - 1)]][0][lane]
                        for i, v in enumerate(chunk)
                    ]
                )

            st1 = e1.start_videos(rows(0, 0), labels1)
            st2 = e2.start_videos(rows(0, 1), labels2)
            if progress:
                progress()

            @functools.partial(jax.jit, static_argnames=())
            def fuse_prob(s1, s2):
                def one(args):
                    a, b2 = args  # (B, D, P_i)
                    x1 = nearest_resize(
                        a.transpose(0, 2, 1).reshape(b, e1.hd, e1.wd, gcfg.num_classes),
                        hw1, hw_axes=(1, 2),
                    )
                    x2 = nearest_resize(
                        b2.transpose(0, 2, 1).reshape(b, e2.hd, e2.wd, gcfg.num_classes),
                        hw1, hw_axes=(1, 2),
                    )
                    if flip_pred:
                        x2 = x2[:, :, ::-1, :]
                    fused = REDUCTIONS[reduction](x1, x2)
                    return jnp.argmax(fused.astype(jnp.float16), axis=-1).astype(jnp.uint8)

                return jax.lax.map(one, (s1, s2))  # (N, B, H, W)

            chunk_n = _chunk_len()

            def chunks_iter():
                nonlocal st1, st2
                t = 1
                while t < t_max:
                    n = min(chunk_n, t_max - t)

                    def batch(lane):
                        x = np.stack([rows(tt, lane) for tt in range(t, t + n)])
                        if n < chunk_n:
                            x = np.concatenate(
                                [x, np.repeat(x[-1:], chunk_n - n, axis=0)]
                            )
                        return x

                    if probability:
                        s1, st1 = e1.step_chunk_scores(batch(0), st1, t)
                        s2, st2 = e2.step_chunk_scores(batch(1), st2, t)
                        fused = fuse_prob(s1, s2)  # (chunk_n, B, H, W) device

                        def convert(m=fused, k=n):
                            return np.asarray(m)[:k]

                    else:
                        m1, st1 = e1.step_chunk_small(batch(0), st1, t)
                        m2, st2 = e2.step_chunk_small(batch(1), st2, t)

                        def convert(m1=m1, m2=m2, k=n):
                            a1 = nearest_resize_host(
                                np.asarray(m1)[:k], hw1, hw_axes=(2, 3)
                            )
                            a2 = nearest_resize_host(
                                np.asarray(m2)[:k], hw1, hw_axes=(2, 3)
                            )
                            if flip_pred:
                                a2 = a2[:, :, :, ::-1]
                            return np.maximum(a1, a2)

                    yield convert, t, n
                    if progress:
                        for _ in range(n):
                            progress()
                    t += n

            collected = _drain_collect(chunk, lengths, chunks_iter())
            for v in chunk:
                save_predictions(collected[v], palettes[v], save_dir, v)
            logger.info(f"batched group {chunk} (2-scale) done.")


def inference_3_scale_batched(
    dataset,
    annotation_dir,
    save_dir,
    model,
    variables,
    cfg: EngineConfig,
    video_batch: int = 4,
    scale: float = 1.0,
    progress: Optional[Callable[[], None]] = None,
    mesh=None,
) -> None:
    """Lockstep-batched ``3-scale``: three sequential passes at input scales
    [0.9, 1.0, user] (reference ``inference_utils.py:514-595``), each pass
    running ``video_batch`` videos per resolution group; per-pass masks are
    host-upsampled to the reference's hard-coded (480, 910) fuse resolution
    (``:574``) and fused with per-pixel max."""
    from semi_supervised_vos_tpu.ops.resize import nearest_resize_host

    scales = [0.9, 1.0, scale]
    out_hw = (480, 910)
    predictions: Dict[str, List[List[np.ndarray]]] = defaultdict(list)
    palettes: Dict[str, Optional[list]] = {}

    per_video: Dict[str, List[int]] = defaultdict(list)
    for i, (_, v) in enumerate(dataset.imgs):
        per_video[dataset.idx_to_class[v]].append(i)

    def native_resolution(video):
        frame, _ = dataset[per_video[video][0]]
        return frame.shape[:2]

    def scaled_frame(video, t_index, sc, length):
        frame, _ = dataset[per_video[video][min(t_index, length - 1)]]
        h, w = frame.shape[:2]
        hd, wd = int(np.ceil(h * sc)), int(np.ceil(w * sc))
        ri = (np.arange(hd) * h) // hd
        ci = (np.arange(wd) * w) // wd
        return frame[ri][:, ci]

    for s_i, sc in enumerate(scales):
        groups: Dict[Tuple[int, int], List[str]] = defaultdict(list)
        for video in per_video:
            h, w = native_resolution(video)
            groups[(int(np.ceil(h * sc)), int(np.ceil(w * sc)))].append(video)

        for hw, videos in groups.items():
            vb = _clamp_video_batch(video_batch, 1, hw, n_chips=_mesh_data_chips(mesh))
            for start in range(0, len(videos), vb):
                chunk = sorted(videos[start : start + vb])
                b = len(chunk)
                lengths = [len(per_video[v]) for v in chunk]
                t_max = max(lengths)

                labels = []
                d_max = 0
                for v in chunk:
                    ann = first_annotation_path(annotation_dir, v)
                    label, d, palette = load_annotation(ann)
                    d_max = max(d_max, d)
                    palettes[v] = palette
                    if s_i == 0:
                        copy_first_annotation(ann, save_dir, v)
                    labels.append(label)
                engine = _make_engine(
                    model, variables, hw, b, _with_budget(cfg, d_max), mesh=mesh
                )

                def rows(t_index):
                    return np.stack(
                        [
                            scaled_frame(v, t_index, sc, lengths[i])
                            for i, v in enumerate(chunk)
                        ]
                    )

                state = engine.start_videos(
                    rows(0), np.stack(labels).astype(np.int32)
                )
                if progress:
                    progress()

                chunk_n = _chunk_len()

                def chunks_iter():
                    nonlocal state
                    t = 1
                    while t < t_max:
                        n = min(chunk_n, t_max - t)
                        batch = np.stack([rows(tt) for tt in range(t, t + n)])
                        if n < chunk_n:
                            batch = np.concatenate(
                                [batch, np.repeat(batch[-1:], chunk_n - n, axis=0)]
                            )
                        masks, state = engine.step_chunk_small(batch, state, t)

                        def convert(m=masks, k=n):
                            return nearest_resize_host(
                                np.asarray(m)[:k], out_hw, hw_axes=(2, 3)
                            )

                        yield convert, t, n
                        if progress:
                            for _ in range(n):
                                progress()
                        t += n

                collected = _drain_collect(chunk, lengths, chunks_iter())
                for v in chunk:
                    predictions[v].append(collected[v])

    logger.info("Fusing 3-scale predictions.")
    for video, passes in predictions.items():
        fused = [np.maximum(np.maximum(a, b), c) for a, b, c in zip(*passes)]
        save_predictions(fused, palettes[video], save_dir, video)
