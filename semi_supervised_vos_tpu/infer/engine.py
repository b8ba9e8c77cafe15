"""Per-video propagation engine with a fixed-capacity ring memory bank.

TPU-native replacement for the reference's per-frame loop state
(``src/utils/inference_utils.py:23-87``): instead of unboundedly growing
``feats_history``/``label_history`` via ``torch.cat`` (``:71-72``), features
and labels live in preallocated ring buffers of capacity
``frame_range + continuous_frame + 1``. The sampling schedule never reaches
further back than that (see ``core.sampling.bank_capacity``), so the ring is
lossless — and HBM use is O(frame_range), not O(video length).

One jitted step serves every frame of a video: ``frame_idx`` is a traced
scalar, shapes are static per (H, W) resolution, and the per-frame work
(backbone forward → masked-softmax affinity → label write-back → upsampled
argmax) is a single XLA program with the bank buffers donated, so updates
happen in place.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_vos_tpu.config import DEFAULT
from semi_supervised_vos_tpu.core.propagation import affinity_propagate
from semi_supervised_vos_tpu.core.sampling import bank_capacity, sample_frames
from semi_supervised_vos_tpu.core.spatial import spatial_weight
from semi_supervised_vos_tpu.models.resnet import out_spatial
from semi_supervised_vos_tpu.ops.onehot import index_to_onehot
from semi_supervised_vos_tpu.ops.resize import nearest_resize

# ImageNet normalisation (reference ``src/utils/datasets.py:36-39``).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def backbone_encode(model, fast, fast_arch, compute_dtype, variables, x):
    """Normalised (n, H, W, 3) frames → backbone feature maps, on the
    BN-folded fast path when built, else the flax forward. Shared by the
    single, lockstep-batched and bank-sharded engines so the fast-encoder
    dispatch lives in exactly one place."""
    if fast is not None:
        from semi_supervised_vos_tpu.models.infer_fast import fast_encode

        return fast_encode(variables, x, dtype=compute_dtype, arch=fast_arch)
    return model.apply(variables, x, train=False)


def grouped_map(fn, x, cap: int):
    """``fn`` over leading-axis groups of ≤ ``cap`` rows: full groups
    through one ``lax.scan``-backed ``lax.map``, plus one remainder call.
    Keeps the encode batch at the HBM activation cap even when the chunk
    length is coprime with it (a largest-divisor scheme would silently
    degrade e.g. SVOS_CHUNK=9 at a 1080p-scale cap of 2 to nine per-frame
    forwards)."""
    n = x.shape[0]
    g = max(1, min(cap, n))
    if g >= n:
        return fn(x)
    full = (n // g) * g
    main = jax.lax.map(fn, x[:full].reshape((n // g, g) + x.shape[1:]))
    main = main.reshape((full,) + main.shape[2:])
    if full == n:
        return main
    return jnp.concatenate([main, fn(x[full:])], axis=0)


class BankState(NamedTuple):
    """Ring memory bank: features (cap, P, C) and labels (cap, P, D)."""

    feats: jnp.ndarray
    labels: jnp.ndarray


def _maybe_fold_fast_encoder(model, variables, cfg):
    """(folded weight table, arch) for the fast inference forward, or
    (None, None) when the fast path doesn't apply (non-bottleneck backbone,
    non-TPU, or disabled)."""
    import os

    arch = getattr(model, "model", None)
    if (
        not cfg.fast_encoder
        or arch not in ("resnet18", "resnet50", "resnet101", "facebook")
        or jax.default_backend() != "tpu"
        or os.environ.get("SVOS_FAST_ENCODER", "1") == "0"
    ):
        return None, None
    from semi_supervised_vos_tpu.models.fold import fold_vosnet

    return fold_vosnet(variables, arch, cfg.compute_dtype), arch


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    ref_num: int = 9
    frame_range: int = 40
    temperature: float = 1.0
    sigma_1: float = 8.0
    sigma_2: float = 21.0
    probability_propagation: bool = False
    num_classes: int = DEFAULT.num_classes
    feature_dim: int = 256
    compute_dtype: Any = jnp.bfloat16
    continuous_frame: int = DEFAULT.continuous_frame
    use_pallas: bool = True
    matmul_precision: str = "default"
    # BN-folded forward with the fused bottleneck-stack Pallas kernel
    # (models/infer_fast.py); engaged on TPU for resnet50 only. Override
    # with SVOS_FAST_ENCODER=0.
    fast_encoder: bool = True

    @property
    def capacity(self) -> int:
        return bank_capacity(self.frame_range, self.continuous_frame)


class PropagationEngine:
    """Drives one or more same-resolution video streams through propagation.

    The engine is resolution-specific: (H, W) fixes the feature grid P and
    hence every compiled shape. Distinct resolutions (2-scale strategies)
    use two engines.
    """

    def __init__(self, model, variables, frame_hw: Tuple[int, int], cfg: EngineConfig):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.h, self.w = frame_hw
        self.hd, self.wd = out_spatial(self.h, self.w)
        self.p = self.hd * self.wd

        # The fused Pallas kernel computes spatial weights on the fly; the
        # jnp fallback needs the dense (P, P) matrices. They are passed as
        # runtime arguments, never baked into the jitted graph — as closure
        # constants the 165 MB matrices overflow remote-compile payloads and
        # bloat every executable.
        self._use_pallas = cfg.use_pallas and jax.default_backend() == "tpu"
        # pallas path: banks live padded so the kernel can stream tiles
        # straight from HBM via scalar-prefetched slot indices (no gather).
        # Resolution-dependent block sizes (ops.affinity_pallas.default_blocks,
        # re-swept after the far-tile numerator skip landed — finer tiles give
        # the skip finer granularity, which flipped the 480p optimum to
        # (512, 512); 1080p still wants MXU-saturating (1024, 1024)).
        from semi_supervised_vos_tpu.ops.affinity_pallas import default_blocks

        self._block_r, self._block_t = default_blocks(self.p)
        if self._use_pallas:
            self.p_pad = -(-self.p // self._block_r) * self._block_r
            self.d_pad = -(-cfg.num_classes // 8) * 8
        else:
            self.p_pad = self.p
            self.d_pad = cfg.num_classes
        if cfg.probability_propagation or self._use_pallas:
            self._wd = self._ws = None
        else:
            self._wd = spatial_weight((self.hd, self.wd), cfg.sigma_1)
            self._ws = spatial_weight((self.hd, self.wd), cfg.sigma_2)

        # BN-folded fast forward (fused bottleneck-stack kernel): the folded
        # table is passed through jit as the `variables` argument — never a
        # closure constant (remote-compile payload limit).
        self.enc_params = variables
        self._fast, self._fast_arch = _maybe_fold_fast_encoder(
            model, variables, cfg
        )
        if self._fast is not None:
            self.enc_params = self._fast

        self._encode = jax.jit(self._encode_impl)
        self._first = jax.jit(self._first_impl, donate_argnums=(2,))
        self._step = jax.jit(self._step_impl, donate_argnums=(2,))
        self._step_final = jax.jit(self._step_final_impl, donate_argnums=(2,))
        self._step_chunk = jax.jit(self._step_chunk_impl, donate_argnums=(2,))
        self._step_chunk_small = jax.jit(
            self._step_chunk_small_impl, donate_argnums=(2,)
        )
        self._step_chunk_scores = jax.jit(
            self._step_chunk_scores_impl, donate_argnums=(2,)
        )

    # ---- jitted impls ------------------------------------------------------

    def _normalize(self, frame_u8: jnp.ndarray) -> jnp.ndarray:
        x = frame_u8.astype(jnp.float32) / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        return x[None]  # (1, H, W, 3)

    def _encode_impl(self, variables, frame_u8):
        feats = backbone_encode(
            self.model,
            self._fast,
            self._fast_arch,
            self.cfg.compute_dtype,
            variables,
            self._normalize(frame_u8),
        )
        return feats.reshape(self.p, self.cfg.feature_dim).astype(self.cfg.compute_dtype)

    def _encode_batch_impl(self, variables, frames_u8):
        """(N, H, W, 3) u8 → (N, P, C) in one (or few) batched backbone
        forwards. Encoding is bank-independent — only propagation is
        sequential — so the chunked paths hoist it out of the scan: batched
        convs amortise per-dispatch latency and fill the MXU better than
        eight B=1 forwards (the same effect that makes the B=8 lockstep
        engine outrun single-stream, BASELINE.md). Per-frame results are
        the same dot products in the same order, so masks are unchanged
        (pinned by the parity suite)."""
        from semi_supervised_vos_tpu.infer.batched import _hbm_lanes_cap

        x = frames_u8.astype(jnp.float32) / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD  # (N, H, W, 3)

        def enc(xb):
            feats = backbone_encode(
                self.model,
                self._fast,
                self._fast_arch,
                self.cfg.compute_dtype,
                variables,
                xb,
            )
            return feats.reshape(xb.shape[0], self.p, self.cfg.feature_dim)

        feats = grouped_map(enc, x, _hbm_lanes_cap((self.h, self.w)))
        return feats.astype(self.cfg.compute_dtype)

    def _pad_slot(self, rows, x_pad: Optional[int] = None):
        """(P, X) → (P_pad, x_pad or X) zero-padded full slot. Bank writes
        use whole-slot single-index dynamic-update-slices: the interior
        ``.at[slot, :p].set`` form measured **0.73 ms/frame** at 480p (the
        entire step residual — XLA cannot lower a partial-interior DUS on
        the carried bank in place) vs 0.18 ms for the full-row write. The
        padded rows/classes are zeros over zeros (the kernel masks rows
        ≥ p via ``pad_bias`` and never reads classes ≥ num_classes), so
        the bank state is bit-identical."""
        if x_pad is None:
            x_pad = rows.shape[-1]
        return jnp.pad(
            rows,
            ((0, self.p_pad - self.p), (0, x_pad - rows.shape[-1])),
        )

    def _first_impl(self, variables, frame_u8, state: BankState, label_full):
        """Frame 0: encode + store features and the downsampled annotation."""
        feats = self._encode_impl(variables, frame_u8)
        label_small = nearest_resize(
            label_full[:, :, None], (self.hd, self.wd)
        ).reshape(self.p)
        onehot = index_to_onehot(label_small, self.cfg.num_classes, jnp.float32)
        return BankState(
            feats=state.feats.at[0].set(self._pad_slot(feats)),
            labels=state.labels.at[0].set(
                self._pad_slot(onehot, self.d_pad).astype(state.labels.dtype)
            ),
        )

    def _propagate(self, target, state: BankState, frame_idx, wd, ws):
        cfg = self.cfg
        idx, valid, dense = sample_frames(
            frame_idx, cfg.frame_range, cfg.ref_num, cfg.continuous_frame
        )
        slots = idx % cfg.capacity
        if self._use_pallas:
            from semi_supervised_vos_tpu.ops.affinity_pallas import (
                affinity_from_bank,
            )

            pred = affinity_from_bank(
                state.feats,
                state.labels,
                target.astype(jnp.float32),
                slots,
                feature_hw=(self.hd, self.wd),
                temperature=cfg.temperature,
                valid=valid,
                dense=dense,
                sigma_1=cfg.sigma_1,
                sigma_2=cfg.sigma_2,
                spatial=not cfg.probability_propagation,
                block_r=self._block_r,
                block_t=self._block_t,
            )
            return pred[: cfg.num_classes]
        ref_f = state.feats[slots]
        ref_l = state.labels[slots].astype(jnp.float32)
        return affinity_propagate(
            ref_f,
            target,
            ref_l,
            temperature=cfg.temperature,
            valid=valid,
            dense=dense,
            weight_dense=wd,
            weight_sparse=ws,
            precision=cfg.matmul_precision,
        )  # (D, P)

    def _step_impl(self, variables, frame_u8, state: BankState, frame_idx, wd, ws):
        target = self._encode_impl(variables, frame_u8)
        return self._step_from_feats(target, state, frame_idx, wd, ws)

    def _step_from_feats(self, target, state: BankState, frame_idx, wd, ws):
        """Propagate + bank write-back for an already-encoded (P, C) frame
        (the chunked paths encode whole chunks batched, then scan this)."""
        cfg = self.cfg
        pred = self._propagate(target, state, frame_idx, wd, ws)  # (D, P)

        if cfg.probability_propagation:
            new_label = pred.T  # store soft probabilities (inference_utils.py:68)
        else:
            new_label = index_to_onehot(
                jnp.argmax(pred, axis=0), cfg.num_classes, jnp.float32
            )

        slot = frame_idx % cfg.capacity
        state = BankState(
            feats=state.feats.at[slot].set(self._pad_slot(target)),
            labels=state.labels.at[slot].set(
                self._pad_slot(new_label, self.d_pad).astype(state.labels.dtype)
            ),
        )
        # Return the feature-resolution scores (D, P); the strategy layer
        # upsamples/argmaxes/fuses on device. Nearest upsampling commutes
        # with argmax and with the elementwise fusion ops, so deferring it
        # is exact while avoiding a (H, W, 22) full-res intermediate
        # (reference upsamples first — inference_utils.py:74).
        return pred, state

    def _step_chunk_impl(self, variables, frames_u8, state: BankState, start_idx, wd, ws):
        """N frames in one program: ONE batched backbone forward for the
        whole chunk (encoding is bank-independent), then a lax.scan of the
        sequential propagate/bank-write with the bank as carry — a single
        dispatch and a single (N, H, W) mask transfer."""
        feats = self._encode_batch_impl(variables, frames_u8)

        def body(carry, target):
            st, idx = carry
            pred, st = self._step_from_feats(target, st, idx, wd, ws)
            mask = jnp.argmax(pred, axis=0).reshape(self.hd, self.wd)
            mask = nearest_resize(mask[:, :, None], (self.h, self.w))[:, :, 0]
            return (st, idx + 1), mask.astype(jnp.uint8)

        (state, _), masks = jax.lax.scan(
            body, (state, jnp.int32(start_idx)), feats
        )
        return masks, state

    def _step_chunk_small_impl(self, variables, frames_u8, state: BankState, start_idx, wd, ws):
        """Like ``_step_chunk_impl`` but masks stay at FEATURE resolution
        ((N, hd, wd) uint8): argmax commutes with the nearest upsample, so
        the caller upsamples on host (``ops.resize.nearest_resize_host``) —
        ~60x less device→host traffic, which dominates on this tunnel."""
        feats = self._encode_batch_impl(variables, frames_u8)

        def body(carry, target):
            st, idx = carry
            pred, st = self._step_from_feats(target, st, idx, wd, ws)
            mask = jnp.argmax(pred, axis=0).reshape(self.hd, self.wd)
            return (st, idx + 1), mask.astype(jnp.uint8)

        (state, _), masks = jax.lax.scan(
            body, (state, jnp.int32(start_idx)), feats
        )
        return masks, state

    def _step_chunk_scores_impl(self, variables, frames_u8, state: BankState, start_idx, wd, ws):
        """N frames in one scanned program, RAW feature-res scores out
        ((N, D, P) f32): the multi-stream strategies' chunked path — each
        stream scans its chunk, then the (vmapped) fusion tail combines
        per frame. Identical math to N ``step`` calls; one dispatch."""
        feats = self._encode_batch_impl(variables, frames_u8)

        def body(carry, target):
            st, idx = carry
            pred, st = self._step_from_feats(target, st, idx, wd, ws)
            return (st, idx + 1), pred

        (state, _), preds = jax.lax.scan(
            body, (state, jnp.int32(start_idx)), feats
        )
        return preds, state

    def _step_final_impl(self, variables, frame_u8, state: BankState, frame_idx, wd, ws):
        """Step + single-stream finalisation fused into one program (argmax
        commutes with the nearest upsample, so this equals upsample-then-
        argmax — ``inference_utils.py:74-75``). One device round trip per
        frame instead of two."""
        pred, state = self._step_impl(variables, frame_u8, state, frame_idx, wd, ws)
        mask = jnp.argmax(pred, axis=0).reshape(self.hd, self.wd)
        mask = nearest_resize(mask[:, :, None], (self.h, self.w))[:, :, 0]
        return mask.astype(jnp.uint8), state

    # ---- public API --------------------------------------------------------

    def init_state(self) -> BankState:
        cfg = self.cfg
        label_dtype = jnp.bfloat16 if self._use_pallas else jnp.float32
        return BankState(
            feats=jnp.zeros(
                (cfg.capacity, self.p_pad, cfg.feature_dim), cfg.compute_dtype
            ),
            labels=jnp.zeros((cfg.capacity, self.p_pad, self.d_pad), label_dtype),
        )

    def start_video(self, frame_u8: np.ndarray, label_full: np.ndarray) -> BankState:
        """Process frame 0 (features + ground-truth annotation)."""
        return self._first(self.enc_params, frame_u8, self.init_state(), label_full)

    def step(
        self, frame_u8: np.ndarray, state: BankState, frame_idx: int
    ) -> Tuple[jnp.ndarray, BankState]:
        """Process one frame; returns ((D, P) feature-res scores, new state)."""
        return self._step(
            self.enc_params, frame_u8, state, jnp.int32(frame_idx), self._wd, self._ws
        )

    def step_final(
        self, frame_u8: np.ndarray, state: BankState, frame_idx: int
    ) -> Tuple[jnp.ndarray, BankState]:
        """Process one frame and finalise: ((H, W) uint8 mask, new state)."""
        return self._step_final(
            self.enc_params, frame_u8, state, jnp.int32(frame_idx), self._wd, self._ws
        )

    def step_chunk(
        self, frames_u8: np.ndarray, state: BankState, start_idx: int
    ) -> Tuple[jnp.ndarray, BankState]:
        """Process N frames in one scanned program:
        ((N, H, W) uint8 masks, new state)."""
        return self._step_chunk(
            self.enc_params, frames_u8, state, jnp.int32(start_idx), self._wd, self._ws
        )

    def step_chunk_small(
        self, frames_u8: np.ndarray, state: BankState, start_idx: int
    ) -> Tuple[jnp.ndarray, BankState]:
        """Process N frames; masks at FEATURE resolution ((N, hd, wd) uint8)
        for host-side upsampling (exact — argmax commutes with nearest)."""
        return self._step_chunk_small(
            self.enc_params, frames_u8, state, jnp.int32(start_idx), self._wd, self._ws
        )

    def step_chunk_scores(
        self, frames_u8: np.ndarray, state: BankState, start_idx: int
    ) -> Tuple[jnp.ndarray, BankState]:
        """Process N frames; raw (N, D, P) feature-res scores out — the
        chunked multi-stream path (``strategies.run_streams``)."""
        return self._step_chunk_scores(
            self.enc_params, frames_u8, state, jnp.int32(start_idx), self._wd, self._ws
        )
