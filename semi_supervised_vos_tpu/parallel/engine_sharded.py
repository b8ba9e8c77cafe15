"""Multi-chip propagation engine: memory bank sharded over reference pixels.

Single-chip inference caps the memory bank at HBM size; for long videos,
high resolutions, or small-HBM parts the bank must span chips. This engine
shards the bank's **pixel** axis over the mesh's ``model`` axis (the
sequence-parallel analog of SURVEY.md §2 — the bank IS the cross-attention
context, ``src/utils/inference_utils.py:71-72``):

  * bank features (cap, P/n, C) and labels (cap, P/n, D) live per-chip;
    per-frame bank writes are purely local (each chip stores its own pixel
    block of the new frame — zero write traffic over ICI);
  * the affinity runs the distributed online softmax: each chip scores its
    reference-pixel block against the replicated target, and the softmax
    statistics combine with ``pmax``/``psum`` over ICI — the denominator
    stays unweighted and the Gaussian prior multiplies the numerator only,
    exactly matching single-chip semantics (``predict.py:55-66``);
  * on TPU each chip's local scoring runs the **fused bank-direct Pallas
    kernel** in stats mode (``ops.affinity_pallas.affinity_from_bank_stats``):
    the kernel already maintains the online-softmax (m, l, acc) per tile, so
    the shard emits them raw and the cross-chip combine is three
    collectives. The jnp formulation (kept as the non-TPU fallback)
    materialises the (K, P_loc, P) similarity in HBM — the exact shape the
    single-chip kernel exists to avoid (it does not even compile at 480p);
  * the backbone is replicated (it is small; batch/data parallelism is the
    other mesh axis).

Equality with the single-chip engine is pinned on a virtual 8-device CPU
mesh in ``tests/test_parallel.py`` (kernel path in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semi_supervised_vos_tpu.core.propagation import NEG_INF
from semi_supervised_vos_tpu.parallel import collectives
from semi_supervised_vos_tpu.core.sampling import bank_capacity, sample_frames
from semi_supervised_vos_tpu.infer.engine import (
    BankState,
    EngineConfig,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from semi_supervised_vos_tpu.models.resnet import out_spatial
from semi_supervised_vos_tpu.ops.onehot import index_to_onehot
from semi_supervised_vos_tpu.ops.resize import nearest_resize


class ShardedPropagationEngine:
    """One video stream whose memory bank spans the mesh's ``model`` axis."""

    def __init__(self, model, variables, frame_hw: Tuple[int, int], cfg: EngineConfig,
                 mesh: Mesh, interpret: bool = False):
        assert "model" in mesh.axis_names, mesh.axis_names
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.mesh = mesh
        self.n_shards = mesh.shape["model"]
        self.h, self.w = frame_hw
        self.hd, self.wd = out_spatial(self.h, self.w)
        self.p = self.hd * self.wd
        # kernel path: fused bank-direct stats kernel per shard (TPU; or
        # interpret mode for virtual-mesh validation). Fallback: plain jnp.
        self._use_pallas = cfg.use_pallas and (
            jax.default_backend() == "tpu" or interpret
        )
        self._interpret = interpret
        if self._use_pallas:
            # per-shard rows padded to a block_r multiple (kernel tiling);
            # block sizes follow the resolution-dependent swept optimum
            # (ops.affinity_pallas.default_blocks), shrunk when a shard's
            # rows are fewer than one tile
            from semi_supervised_vos_tpu.ops.affinity_pallas import default_blocks

            base_r, base_t = default_blocks(self.p)
            per = -(-self.p // self.n_shards)
            self._block_r = base_r if per >= base_r else -(-per // 8) * 8
            self._block_t = base_t if self.p >= base_t else -(-self.p // 128) * 128
            self.p_loc = -(-per // self._block_r) * self._block_r
            self.p_pad = self.p_loc * self.n_shards
            self.d_pad = -(-cfg.num_classes // 8) * 8
        else:
            # pad the pixel axis so every chip holds an equal block; padded
            # pixels carry -inf similarity via the row mask, so they are exact
            self.p_pad = -(-self.p // self.n_shards) * self.n_shards
            self.p_loc = self.p_pad // self.n_shards
            self.d_pad = cfg.num_classes

        # BN-folded fast forward (see infer/engine.py): the folded table is
        # passed through jit as the `variables` argument, never a closure
        from semi_supervised_vos_tpu.infer.engine import _maybe_fold_fast_encoder

        self.enc_params = variables
        self._fast, self._fast_arch = _maybe_fold_fast_encoder(
            model, variables, cfg
        )
        if self._fast is not None:
            self.enc_params = self._fast

        # the shard-mapped distributed-softmax propagate, shared by the
        # per-frame step and the scanned chunk
        self._propagate = functools.partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(None, "model", None),  # bank feats (cap, P_pad, C)
                P(None, "model", None),  # bank labels
                P(),                     # target (replicated)
                P(), P(), P(),           # slots, valid, dense
            ),
            out_specs=P(),
            check_vma=False,
        )(self._propagate_sharded)

        self._first = jax.jit(self._first_impl, donate_argnums=(2,))
        self._step = jax.jit(self._step_impl, donate_argnums=(2,))
        self._step_chunk_small = jax.jit(
            self._step_chunk_small_impl, donate_argnums=(2,)
        )
        self._step_chunk_scores = jax.jit(
            self._step_chunk_scores_impl, donate_argnums=(2,)
        )

    # ---- helpers -----------------------------------------------------------

    def _normalize(self, frame_u8):
        x = frame_u8.astype(jnp.float32) / 255.0
        return ((x - IMAGENET_MEAN) / IMAGENET_STD)[None]

    def _encode(self, variables, frame_u8):
        x = self._normalize(frame_u8)
        if self._fast is not None:
            from semi_supervised_vos_tpu.models.infer_fast import fast_encode

            feats = fast_encode(
                variables, x, dtype=self.cfg.compute_dtype, arch=self._fast_arch
            )
        else:
            feats = self.model.apply(variables, x, train=False)
        return feats.reshape(self.p, self.cfg.feature_dim).astype(
            self.cfg.compute_dtype
        )

    def _encode_batch(self, variables, frames_u8):
        """(N, H, W, 3) u8 → (N, P, C): one batched backbone forward for a
        whole chunk (encoding is bank-independent; only propagation is
        sequential — same hoist as ``PropagationEngine._encode_batch_impl``).
        The encode is replicated per chip, so the per-chip activation
        envelope is the single-chip one; sub-batch at big grids."""
        from semi_supervised_vos_tpu.infer.batched import _hbm_lanes_cap
        from semi_supervised_vos_tpu.infer.engine import backbone_encode, grouped_map

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

    def _pad_rows(self, x):
        return jnp.pad(x, ((0, self.p_pad - self.p),) + ((0, 0),) * (x.ndim - 1))

    # ---- jitted impls ------------------------------------------------------

    def _pad_classes(self, x):
        return jnp.pad(x, ((0, 0), (0, self.d_pad - self.cfg.num_classes)))

    def _first_impl(self, variables, frame_u8, state: BankState, label_full):
        feats = self._pad_rows(self._encode(variables, frame_u8))
        label_small = nearest_resize(
            label_full[:, :, None], (self.hd, self.wd)
        ).reshape(self.p)
        onehot = self._pad_classes(
            self._pad_rows(
                index_to_onehot(label_small, self.cfg.num_classes, jnp.float32)
            )
        )
        return BankState(
            feats=state.feats.at[0].set(feats.astype(state.feats.dtype)),
            labels=state.labels.at[0].set(onehot.astype(state.labels.dtype)),
        )

    def _propagate_sharded(self, bank_f, bank_l, target, slots, valid, dense):
        """shard_map body: local pixel-block softmax statistics + combine.

        Kernel path (TPU / interpret): the fused bank-direct kernel emits its
        per-tile online-softmax statistics raw (``affinity_from_bank_stats``)
        with this shard's global row offset, and the combine is pmax/psum —
        the shard never materialises a similarity bigger than one kernel
        tile. jnp fallback: the padded-row mask and the Gaussian
        spatial-prior rows are derived from this shard's global pixel
        indices in-body — the dense (P_pad, P) matrices are never
        materialised, neither in HBM nor as jit closure constants (165 MB
        each at 480p, ~4 GB at 1080p). Both return (d_pad, P) scores."""
        cfg = self.cfg
        if self._use_pallas:
            from semi_supervised_vos_tpu.ops.affinity_pallas import (
                affinity_from_bank_stats,
            )

            row_base = jax.lax.axis_index("model") * self.p_loc
            m, l, acc = affinity_from_bank_stats(
                bank_f,
                bank_l,
                target.astype(jnp.float32),
                slots,
                row_base=row_base,
                feature_hw=(self.hd, self.wd),
                temperature=cfg.temperature,
                valid=valid,
                dense=dense,
                sigma_1=cfg.sigma_1,
                sigma_2=cfg.sigma_2,
                spatial=not cfg.probability_propagation,
                block_r=self._block_r,
                block_t=self._block_t,
                interpret=self._interpret,
            )
            from semi_supervised_vos_tpu.parallel.sharded_affinity import (
                distributed_softmax_combine,
            )

            return distributed_softmax_combine(m, l, acc, "model")

        gidx = jax.lax.axis_index("model") * self.p_loc + jnp.arange(self.p_loc)
        rows_valid = gidx < self.p

        ref_f = bank_f[slots].astype(jnp.float32)  # (K, p_loc, C)
        ref_l = bank_l[slots].astype(jnp.float32)  # (K, p_loc, D)
        sim = jnp.einsum(
            "kpc,qc->kpq", ref_f, target.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(cfg.temperature)
        mask = valid[:, None, None] & rows_valid[None, :, None]
        sim = jnp.where(mask, sim, NEG_INF)

        m = collectives.pmax(jnp.max(sim, axis=(0, 1)), "model")  # (P_t,)
        e = jnp.where(mask, jnp.exp(sim - m[None, None, :]), 0.0)
        denom = collectives.psum(jnp.sum(e, axis=(0, 1)), "model")
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
            e = e * w
        acc = jnp.einsum(
            "kpd,kpq->dq", ref_l, e, preferred_element_type=jnp.float32
        )
        acc = collectives.psum(acc, "model")
        return acc / jnp.maximum(denom, 1e-30)[None, :]  # (D, P_t) replicated

    def _step_core(self, variables, frame_u8, st: BankState, idx):
        """One frame: encode → distributed propagate → bank write-back.
        Returns ((num_classes, P) f32 scores, new state)."""
        target = self._encode(variables, frame_u8)
        return self._step_core_from_feats(target, st, idx)

    def _step_core_from_feats(self, target, st: BankState, idx):
        """Propagate + bank write for an already-encoded (P, C) frame (the
        chunked paths encode whole chunks batched, then scan this)."""
        cfg = self.cfg
        idxs, valid, dense = sample_frames(
            idx, cfg.frame_range, cfg.ref_num, cfg.continuous_frame
        )
        slots = idxs % cfg.capacity
        pred = self._propagate(
            st.feats, st.labels, target, slots, valid, dense,
        )[: cfg.num_classes]  # (D, P)

        if cfg.probability_propagation:
            new_label = pred.T
        else:
            new_label = index_to_onehot(
                jnp.argmax(pred, axis=0), cfg.num_classes, jnp.float32
            )
        slot = idx % cfg.capacity
        st = BankState(
            feats=st.feats.at[slot].set(
                self._pad_rows(target).astype(st.feats.dtype)
            ),
            labels=st.labels.at[slot].set(
                self._pad_classes(self._pad_rows(new_label)).astype(
                    st.labels.dtype
                )
            ),
        )
        return pred, st

    def _step_impl(self, variables, frame_u8, state: BankState, frame_idx):
        return self._step_core(variables, frame_u8, state, frame_idx)

    def _step_chunk_small_impl(self, variables, frames_u8, state: BankState, start_idx):
        feats = self._encode_batch(variables, frames_u8)

        def body(carry, target):
            st, idx = carry
            pred, st = self._step_core_from_feats(target, st, idx)
            mask = jnp.argmax(pred, axis=0).reshape(self.hd, self.wd)
            return (st, idx + 1), mask.astype(jnp.uint8)

        (state, _), masks = jax.lax.scan(
            body, (state, jnp.int32(start_idx)), feats
        )
        return masks, state

    def _step_chunk_scores_impl(self, variables, frames_u8, state: BankState, start_idx):
        feats = self._encode_batch(variables, frames_u8)

        def body(carry, target):
            st, idx = carry
            pred, st = self._step_core_from_feats(target, st, idx)
            return (st, idx + 1), pred

        (state, _), preds = jax.lax.scan(
            body, (state, jnp.int32(start_idx)), feats
        )
        return preds, state

    # ---- public API --------------------------------------------------------

    def init_state(self) -> BankState:
        cfg = self.cfg
        sharding = NamedSharding(self.mesh, P(None, "model", None))
        label_dtype = jnp.bfloat16 if self._use_pallas else jnp.float32
        return BankState(
            feats=jax.device_put(
                jnp.zeros(
                    (cfg.capacity, self.p_pad, cfg.feature_dim),
                    cfg.compute_dtype,
                ),
                sharding,
            ),
            labels=jax.device_put(
                jnp.zeros((cfg.capacity, self.p_pad, self.d_pad), label_dtype),
                sharding,
            ),
        )

    def start_video(self, frame_u8: np.ndarray, label_full: np.ndarray) -> BankState:
        return self._first(self.enc_params, frame_u8, self.init_state(), label_full)

    def step(self, frame_u8, state, frame_idx):
        """One frame → ((num_classes, P) f32 scores, state) — the interface
        the multi-stream strategy fusion tail consumes
        (``infer/strategies.py::run_streams``)."""
        return self._step(
            self.enc_params, frame_u8, state, jnp.int32(frame_idx)
        )

    def step_chunk_small(self, frames_u8, state, start_idx):
        """(N, H, W, 3) frames → ((N, hd, wd) uint8 masks, state); masks are
        feature-resolution (host-upsample with ``nearest_resize_host``)."""
        return self._step_chunk_small(
            self.enc_params, frames_u8, state, jnp.int32(start_idx)
        )

    def step_chunk_scores(self, frames_u8, state, start_idx):
        """(N, H, W, 3) frames → ((N, num_classes, P) f32 scores, state) —
        the chunked multi-stream path (``strategies.run_streams``)."""
        return self._step_chunk_scores(
            self.enc_params, frames_u8, state, jnp.int32(start_idx)
        )
