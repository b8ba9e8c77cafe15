"""Mesh-parallel lockstep inference: video lanes over ``data``, and
(optionally) every bank's reference-pixel rows over ``model``.

``BatchedPropagationEngine`` packs B lanes (videos × strategy streams) into
one chip's banks; this wrapper spreads those lanes across the mesh's
``data`` axis — the scale-out axis the reference cannot express at all (its
inference is strictly batch_size=1 single-GPU, ``src/inference.py:75-78``).
Lanes are fully independent, so the data axis is embarrassingly parallel:
``jax.shard_map`` runs the UNMODIFIED single-chip engine program per shard
(including the fused bank-direct Pallas kernel — each device sees a local
lane block exactly shaped like a single-chip batch) and no collective is
inserted along ``data``. Throughput scales linearly with chips until the
host-side frame feed saturates.

A mesh with ``model`` > 1 composes the second axis: within each data group,
every lane's memory bank is sharded over its reference pixels (the
sequence-parallel axis of ``parallel/engine_sharded.py``, here batched) and
the per-shard engine runs the distributed online softmax — per-shard
statistics from the fused kernel in stats mode, combined with ``pmax`` /
``psum`` over ``model`` only. That is the full 2-D inference mesh: DP for
throughput × bank sharding for banks bigger than one chip's HBM.

Sharding layout (global shapes):
  * bank feats   (capacity, B, n_bank·P_loc, C) → B over ``data``, rows over ``model``
  * bank labels  (capacity, B, n_bank·P_loc, D) → B over ``data``, rows over ``model``
  * frames       (N, B, H, W, 3) / (B, H, W, 3) → B sharded (replicated over ``model``)
  * masks/scores (N, B|V, ...)              → lane/video axis sharded

Lanes of one video never straddle shards: the lane axis is video-major
(``_STRATEGY_LANES`` order) and the batch is padded to a multiple of
``n_shards`` whole videos (the padded videos replay the last real video;
their outputs are stripped before returning). Fusion therefore stays a
shard-local reduction.

Drop-in: public surface (``start_videos`` / ``step_chunk`` /
``step_chunk_small`` / ``step_chunk_scores`` / ``hd`` / ``wd``) matches the
single-chip engine with GLOBAL (unpadded) shapes, so every batched runner
works unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from semi_supervised_vos_tpu.infer.batched import (
    BatchedPropagationEngine,
    LaneFusion,
)
from semi_supervised_vos_tpu.infer.engine import BankState, EngineConfig
from semi_supervised_vos_tpu.utils.logging import logger


class DataParallelBatchedEngine:
    """B lockstep lanes sharded over ``data``; with a ``model`` axis > 1,
    each lane's bank rows additionally shard over ``model`` (2-D mesh)."""

    def __init__(self, model, variables, frame_hw: Tuple[int, int], batch: int,
                 cfg: EngineConfig, fusion: Optional[LaneFusion] = None, *,
                 mesh: Mesh, interpret: bool = False):
        assert "data" in mesh.axis_names, mesh.axis_names
        n = mesh.shape["data"]
        n_bank = mesh.shape.get("model", 1)
        lanes = fusion.lanes if fusion is not None else 1
        assert batch % lanes == 0, (batch, lanes)
        self.mesh = mesh
        self.n_shards = n
        self.n_bank = n_bank
        self.fusion = fusion
        self.lanes = lanes
        self.b = batch
        self.videos = batch // lanes
        self.v_pad = -(-self.videos // n) * n
        self.b_pad = self.v_pad * lanes
        if self.v_pad > self.videos:
            logger.info(
                f"data-parallel lockstep: {self.videos} video(s) over "
                f"{n} chip(s) pads to {self.v_pad} — "
                f"{self.v_pad - self.videos} duplicated full-video "
                f"inference(s) per group (results are discarded)."
            )

        inner = BatchedPropagationEngine(
            model, variables, frame_hw, self.b_pad // n, cfg,
            fusion=fusion, interpret=interpret,
            bank_axis="model" if n_bank > 1 else None, bank_shards=n_bank,
        )
        self.inner = inner
        self.cfg = inner.cfg
        self.h, self.w = inner.h, inner.w
        self.hd, self.wd = inner.hd, inner.wd
        self.p = inner.p
        self.enc_params = inner.enc_params
        # fused multi-lane engines emit per-VIDEO masks; everything else per-lane
        self._video_rows = fusion is not None and lanes > 1

        # bank rows shard over 'model' when it exists; outputs/frames are
        # replicated along it (every model shard sees the same psum result)
        bank = P(None, "data", "model") if n_bank > 1 else P(None, "data")
        st = BankState(feats=bank, labels=bank)
        rep = P()
        smap = functools.partial(jax.shard_map, mesh=mesh, check_vma=False)

        self._init_state = jax.jit(smap(inner.init_state, in_specs=(), out_specs=st))
        self._first = jax.jit(
            smap(inner._first_impl,
                 in_specs=(rep, P("data"), st, P("data")), out_specs=st),
            donate_argnums=(2,),
        )
        self._step = jax.jit(
            smap(inner._step_impl,
                 in_specs=(rep, P("data"), st, rep),
                 out_specs=(P("data"), st)),
            donate_argnums=(2,),
        )
        chunk_specs = dict(
            in_specs=(rep, P(None, "data"), st, rep),
            out_specs=(P(None, "data"), st),
        )
        self._step_chunk = jax.jit(
            smap(inner._step_chunk_impl, **chunk_specs), donate_argnums=(2,)
        )
        self._step_chunk_small = jax.jit(
            smap(inner._step_chunk_small_impl, **chunk_specs), donate_argnums=(2,)
        )
        self._step_chunk_scores = jax.jit(
            smap(inner._step_chunk_scores_impl, **chunk_specs), donate_argnums=(2,)
        )

    # --- host-side lane padding -------------------------------------------
    def _pad(self, x: np.ndarray, axis: int) -> np.ndarray:
        """Pad the lane axis to ``b_pad`` by replaying the last video's lanes
        (their outputs are stripped — same recipe as the runners' tail-chunk
        padding)."""
        if self.b_pad == self.b:
            return x
        x = np.asarray(x)
        sel = [slice(None)] * x.ndim
        sel[axis] = slice(x.shape[axis] - self.lanes, x.shape[axis])
        last = x[tuple(sel)]
        reps = [1] * x.ndim
        reps[axis] = self.v_pad - self.videos
        return np.concatenate([x, np.tile(last, reps)], axis=axis)

    # --- public surface (global, unpadded shapes) --------------------------
    def init_state(self) -> BankState:
        return self._init_state()

    def start_videos(self, frames_u8, labels_full) -> BankState:
        return self._first(
            self.enc_params, self._pad(frames_u8, 0), self.init_state(),
            self._pad(np.asarray(labels_full), 0),
        )

    def step(self, frames_u8, state, frame_idx):
        masks, state = self._step(
            self.enc_params, self._pad(frames_u8, 0), state, jnp.int32(frame_idx)
        )
        k = self.videos if self._video_rows else self.b
        return masks[:k], state

    def step_chunk(self, frames_u8, state, start_idx):
        masks, state = self._step_chunk(
            self.enc_params, self._pad(frames_u8, 1), state, jnp.int32(start_idx)
        )
        k = self.videos if self._video_rows else self.b
        return masks[:, :k], state

    def step_chunk_small(self, frames_u8, state, start_idx):
        masks, state = self._step_chunk_small(
            self.enc_params, self._pad(frames_u8, 1), state, jnp.int32(start_idx)
        )
        return masks[:, : self.b], state

    def step_chunk_scores(self, frames_u8, state, start_idx):
        scores, state = self._step_chunk_scores(
            self.enc_params, self._pad(frames_u8, 1), state, jnp.int32(start_idx)
        )
        return scores[:, : self.b], state
