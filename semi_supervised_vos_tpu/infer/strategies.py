"""The seven inference strategies.

Reference: ``src/utils/inference_utils.py`` — ``single`` (:23), ``hor-flip``
(:90), ``vert-flip`` (:196), ``2-scale``/``hor-2-scale`` (:302),
``multimodel`` (:411), ``3-scale`` (:514). Each strategy runs 1-2 propagation
streams per frame and fuses:

* label propagation (default): per-stream nearest-upsample + argmax, then an
  elementwise **max of class indices** (``inference_utils.py:184``);
* ``--probability``: per-stream upsampled probability maps combined with the
  ``maximum``/``minimum``/``mean`` reduction (``:18-20``), then argmax.

TPU-native structure: engines return feature-resolution scores; the
upsample/flip/fuse/argmax tail is one jitted program per strategy, and only
the final (H, W) uint8 mask crosses device→host.

Intent-over-bug deviations (documented; SURVEY.md §7 directs reproducing
intent, not crashes):
  * ``vert-flip`` un-flips its second stream with ``fliplr`` in the reference
    (``inference_utils.py:279``) even though the stream is vertically
    flipped; here it un-flips vertically.
  * probability mode + flip strategies apply ``torch.fliplr`` to a
    (1, d, H, W) tensor in the reference, flipping the *class* axis; here
    the spatial axis is flipped.
  * ``hor-2-scale`` mirrors the second input stream but not its first-frame
    labels (``predict.py:136-142``); here the labels are mirrored to match.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_vos_tpu.data.davis import InferenceDataset
from semi_supervised_vos_tpu.data.loader import prefetch_dataset
from semi_supervised_vos_tpu.infer.engine import PropagationEngine
from semi_supervised_vos_tpu.ops.resize import nearest_resize
from semi_supervised_vos_tpu.utils.image import (
    copy_first_annotation,
    first_annotation_path,
    load_annotation,
    save_predictions,
)
from semi_supervised_vos_tpu.utils.logging import logger
from semi_supervised_vos_tpu.utils.profiling import PhaseTimer, trace

REDUCTIONS = {
    "maximum": jnp.maximum,
    "minimum": jnp.minimum,
    "mean": lambda x, y: (x + y) / 2.0,
}


@dataclasses.dataclass
class Stream:
    """One propagation stream of a strategy."""

    engine: PropagationEngine
    input_idx: Optional[int]  # index into the dataset item tuple (None = whole item)
    label_flip: Optional[str] = None  # flip of the first-frame labels: 'h' | 'v'
    pred_flip: Optional[str] = None  # flip of the full-res prediction: 'h' | 'v'
    state: object = None


def _flip_label(label: np.ndarray, how: Optional[str]) -> np.ndarray:
    if how == "h":
        return label[:, ::-1]
    if how == "v":
        return label[::-1, :]
    return label


def _make_fuser(
    streams: Sequence[Stream],
    out_hw: Tuple[int, int],
    probability: bool,
    reduction: str,
    chunked: bool = False,
):
    """Build the jitted fusion tail: per-stream (D, P) scores → (H, W) uint8
    (``chunked``: (N, D, P) per stream → (N, H, W), the vmapped form the
    chunked multi-stream runner feeds)."""

    def fuse(*preds):
        full = []
        for s, pred in zip(streams, preds):
            e = s.engine
            if probability:
                x = nearest_resize(
                    pred.T.reshape(e.hd, e.wd, e.cfg.num_classes), out_hw
                )  # (H, W, D)
                if s.pred_flip == "h":
                    x = x[:, ::-1, :]
                elif s.pred_flip == "v":
                    x = x[::-1, :, :]
            else:
                mask = jnp.argmax(pred, axis=0).reshape(e.hd, e.wd)
                x = nearest_resize(mask[:, :, None], out_hw)[:, :, 0]
                if s.pred_flip == "h":
                    x = x[:, ::-1]
                elif s.pred_flip == "v":
                    x = x[::-1, :]
            full.append(x)
        if probability:
            fused = full[0]
            for x in full[1:]:
                fused = REDUCTIONS[reduction](fused, x)
            # the reference quantises the fused map to fp16 before the final
            # argmax (``inference_utils.py:180-182`` ``.cpu().half()``) —
            # reproduced so argmax tie-breaking matches bit-for-bit
            return jnp.argmax(fused.astype(jnp.float16), axis=-1).astype(jnp.uint8)
        fused = full[0]
        for x in full[1:]:
            fused = jnp.maximum(fused, x)
        return fused.astype(jnp.uint8)

    if not chunked:
        return jax.jit(fuse)

    # sequential per-frame fusion inside one program: a vmapped tail would
    # materialise per-stream (N, H, W, D) full-res f32 maps in probability
    # mode (~1.5 GB per stream at 1080p, chunk 8) where one frame at a time
    # peaks at the old per-frame fuser's footprint; the tail is a trivial
    # fraction of step compute, so the scan costs nothing measurable
    def fuse_chunk(*preds):
        return jax.lax.map(lambda xs: fuse(*xs), preds)

    return jax.jit(fuse_chunk)


def _chunk_len() -> int:
    """Frames per device dispatch (``SVOS_CHUNK``, clamped to >= 1); shared
    by the single-video and lockstep-batched runners."""
    import os

    return max(1, int(os.environ.get("SVOS_CHUNK", "8")))


def _with_budget(cfg, num_classes: int):
    """Grow the padded class budget when a video has more objects than the
    default 22-colour table (the reference sizes d per video,
    predict.py:113; we pad for static shapes)."""
    if num_classes <= cfg.num_classes:
        return cfg
    import dataclasses

    return dataclasses.replace(cfg, num_classes=num_classes)


def _make_engine(model, variables, hw, cfg, mesh=None):
    """Single-chip engine, or — with a mesh — the bank-sharded multi-chip
    engine (``--bank-shards``; ``parallel/engine_sharded.py``). Every
    strategy builds engines through this factory, so bank sharding composes
    with all seven strategies: each stream's bank shards its pixel axis
    identically and the streams' fusion tail is unchanged."""
    if mesh is None:
        return PropagationEngine(model, variables, hw, cfg)
    from semi_supervised_vos_tpu.parallel.engine_sharded import (
        ShardedPropagationEngine,
    )

    return ShardedPropagationEngine(model, variables, hw, cfg, mesh)


def run_streams(
    dataset: InferenceDataset,
    annotation_dir,
    save_dir,
    make_streams: Callable[[Tuple[int, int]], List[Stream]],
    probability: bool,
    reduction: str,
    progress: Optional[Callable[[], None]] = None,
) -> None:
    """Generic per-frame loop over an ordered (video-grouped) dataset.

    Set ``SVOS_PROFILE=1`` for per-phase timing, ``SVOS_TRACE_DIR=<dir>``
    for a TensorBoard-loadable jax.profiler trace.
    """
    import os
    from pathlib import Path

    from semi_supervised_vos_tpu.infer.drain import MaskDrain
    from semi_supervised_vos_tpu.ops.resize import nearest_resize_host

    timer = PhaseTimer() if os.environ.get("SVOS_PROFILE") else None
    chunk_n = _chunk_len()
    streams: List[Stream] = []
    fuser = None
    out_hw = None
    # device→host conversions run on the drain's worker thread, overlapping
    # later chunks' device compute; flush() collects the per-video results
    drain = MaskDrain()
    pending: List[np.ndarray] = []  # buffered frames for the chunked path
    palette = None
    last_video = None
    frame_idx = 0

    def _stream_batch(s: Stream, n: int) -> np.ndarray:
        """This stream's (chunk_n, H, W, 3) input chunk from the buffered
        items; the final partial chunk pads by repeating the last frame
        (video is over, so the bank corruption past the end is
        unobservable)."""
        frames = [it if s.input_idx is None else it[s.input_idx] for it in pending]
        return np.stack(frames + [frames[-1]] * (chunk_n - n))

    def run_pending():
        """N buffered frames → ONE scanned device program per stream.

        Single stream: FEATURE-resolution masks (fetched whole-chunk and
        upsampled on the drain worker — one D2H per chunk, not per frame,
        and overlapped with the next chunk's compute). Multi-stream: each
        stream scans its chunk to raw (N, D, P) scores and the vmapped
        fusion tail combines per frame — identical math to the per-frame
        loop (pinned bit-exact vs the live reference in
        ``tests/test_reference_parity.py``) at 1/chunk_n the dispatches;
        the reference steps each of its 1-2 streams per frame
        (``inference_utils.py:90-193``)."""
        nonlocal frame_idx
        if not pending:
            return
        n = len(pending)
        if len(streams) == 1:
            s = streams[0]
            batch = _stream_batch(s, n)
            if timer is not None:
                with timer.phase("chunk_dispatch"):
                    out, s.state = s.engine.step_chunk_small(batch, s.state, frame_idx)
                with timer.phase("chunk_sync", sync=out):
                    pass
            else:
                out, s.state = s.engine.step_chunk_small(batch, s.state, frame_idx)

            def convert(o=out, k=n, hw=out_hw):
                a = np.asarray(o)[:k]
                if a.shape[1:3] != tuple(hw):
                    a = nearest_resize_host(a, hw, hw_axes=(1, 2))
                return list(a)

            drain.submit(convert)
        else:
            preds = []
            for s in streams:
                scores, s.state = s.engine.step_chunk_scores(
                    _stream_batch(s, n), s.state, frame_idx
                )
                preds.append(scores)
            masks = fuser(*preds)  # (chunk_n, H, W) uint8
            drain.submit(lambda m=masks, k=n: list(np.asarray(m)[:k]))
        frame_idx += n
        pending.clear()

    def flush():
        if last_video is None:
            return
        if pending:
            run_pending()
        masks = [m for group in drain.drain() for m in group]
        if masks:
            save_predictions(masks, palette, save_dir, last_video)

    trace_ctx = trace()  # no-op unless SVOS_TRACE_DIR is set
    trace_ctx.__enter__()
    for item, video in prefetch_dataset(dataset):
        if video != last_video and last_video is not None:
            flush()
            frame_idx = 0
        if frame_idx == 0:
            first = item if not isinstance(item, tuple) else item[0]
            out_hw = first.shape[:2]
            annotation = first_annotation_path(annotation_dir, video)
            label, d, palette = load_annotation(annotation)
            budget = streams[0].engine.cfg.num_classes if streams else 0
            if (
                not streams
                or streams[0].engine.h != out_hw[0]
                or streams[0].engine.w != out_hw[1]
                # a video with more objects than the padded class budget
                # (the 22-colour DAVIS table) grows the budget + recompiles
                or d > budget
            ):
                streams = make_streams(out_hw, max(d, budget))
                fuser = _make_fuser(
                    streams, out_hw, probability, reduction,
                    chunked=len(streams) > 1,
                )
            copy_first_annotation(annotation, save_dir, video)
            for s in streams:
                frame = item if s.input_idx is None else item[s.input_idx]
                s.state = s.engine.start_video(
                    frame, _flip_label(label, s.label_flip)
                )
            frame_idx = 1
            last_video = video
            if progress:
                progress()
            continue

        # frames buffer into fixed-size chunks that run as one scanned
        # device program (per stream) each — argmax/upsample ordering and
        # the per-frame fusion are exchange-exact
        pending.append(item)
        if len(pending) == chunk_n:
            run_pending()
        last_video = video
        if progress:
            progress()

    try:
        flush()
    finally:
        drain.close()
    trace_ctx.__exit__(None, None, None)
    if timer is not None:
        timer.report()


# ---- strategy entry points -------------------------------------------------


def inference_single(dataset, annotation_dir, save_dir, model, variables, cfg, reduction="mean", progress=None, mesh=None):
    """Reference ``inference_utils.py:23-87``."""

    def make(hw, d):
        c = _with_budget(cfg, d)
        return [Stream(_make_engine(model, variables, hw, c, mesh), None)]

    run_streams(dataset, annotation_dir, save_dir, make, cfg.probability_propagation, reduction, progress)


def inference_single_sharded(dataset, annotation_dir, save_dir, model, variables, cfg, mesh, reduction="mean", progress=None):
    """``single`` strategy with the memory bank sharded over the mesh's
    ``model`` axis (``parallel/engine_sharded.py``) — kept as a thin alias;
    every strategy now takes ``mesh`` directly (``--bank-shards`` composes
    with all seven). The reference has no multi-device inference at all
    (``src/inference.py`` is strictly single-GPU); semantics are pinned
    equal to the single-chip engine in ``tests/test_parallel.py``."""
    inference_single(dataset, annotation_dir, save_dir, model, variables, cfg, reduction, progress, mesh=mesh)


def inference_hor_flip(dataset, annotation_dir, save_dir, model, variables, cfg, reduction="mean", progress=None, mesh=None):
    """Reference ``inference_utils.py:90-193``."""

    def make(hw, d):
        e = _make_engine(model, variables, hw, _with_budget(cfg, d), mesh)
        return [
            Stream(e, 0),
            Stream(e, 1, label_flip="h", pred_flip="h"),
        ]

    run_streams(dataset, annotation_dir, save_dir, make, cfg.probability_propagation, reduction, progress)


def inference_ver_flip(dataset, annotation_dir, save_dir, model, variables, cfg, reduction="mean", progress=None, mesh=None):
    """Reference ``inference_utils.py:196-299`` (vertical un-flip applied —
    see module docstring on the reference's fliplr quirk)."""

    def make(hw, d):
        e = _make_engine(model, variables, hw, _with_budget(cfg, d), mesh)
        return [
            Stream(e, 0),
            Stream(e, 1, label_flip="v", pred_flip="v"),
        ]

    run_streams(dataset, annotation_dir, save_dir, make, cfg.probability_propagation, reduction, progress)


def inference_2_scale(dataset, annotation_dir, save_dir, model, variables, cfg, scale, reduction="mean", flip_pred=False, progress=None, mesh=None):
    """Reference ``inference_utils.py:302-408`` (flip_pred=True is the
    ``hor-2-scale`` variant)."""

    def make(hw, d):
        h, w = hw
        c = _with_budget(cfg, d)
        hw2 = (int(np.ceil(h * scale)), int(np.ceil(w * scale)))
        e1 = _make_engine(model, variables, hw, c, mesh)
        e2 = _make_engine(model, variables, hw2, c, mesh)
        return [
            Stream(e1, 0),
            Stream(
                e2,
                1,
                label_flip="h" if flip_pred else None,
                pred_flip="h" if flip_pred else None,
            ),
        ]

    run_streams(dataset, annotation_dir, save_dir, make, cfg.probability_propagation, reduction, progress)


def inference_multimodel(dataset, annotation_dir, save_dir, model, variables, additional_model, additional_variables, cfg, reduction="mean", progress=None, mesh=None):
    """Reference ``inference_utils.py:411-511``."""

    def make(hw, d):
        c = _with_budget(cfg, d)
        return [
            Stream(_make_engine(model, variables, hw, c, mesh), None),
            Stream(_make_engine(additional_model, additional_variables, hw, c, mesh), None),
        ]

    run_streams(dataset, annotation_dir, save_dir, make, cfg.probability_propagation, reduction, progress)


def inference_3_scale(dataset, annotation_dir, save_dir, model, variables, cfg, scale, progress=None, mesh=None):
    """Reference ``inference_utils.py:514-595``: three sequential passes over
    the whole dataset at input scales [0.9, 1.0, user], per-pixel max fusion.

    The reference upsamples every pass's prediction to a hard-coded
    (480, 910) (``inference_utils.py:574``) before fusing; kept verbatim for
    output parity.
    """
    from pathlib import Path

    scales = [0.9, 1.0, scale]
    out_hw = (480, 910)
    predictions = {}
    palettes = {}

    from semi_supervised_vos_tpu.infer.drain import MaskDrain
    from semi_supervised_vos_tpu.ops.resize import nearest_resize_host

    chunk_n = _chunk_len()
    for s_i, sc in enumerate(scales):
        engine = None
        state = None
        last_video = None
        frame_idx = 0
        pending: List[np.ndarray] = []
        # per-chunk D2H + host upsample overlap the next chunk's dispatch
        drain = MaskDrain()

        def run_pending3():
            """Buffered frames → one scanned program; feature-res masks
            upsampled to the hard-coded (480, 910) on the drain worker
            (argmax commutes with nearest — same op order as the reference's
            per-frame argmax-then-resize, ``inference_utils.py:570-574``).
            The final partial chunk pads by repeating the last frame."""
            nonlocal frame_idx, state
            if not pending:
                return
            n = len(pending)
            batch = np.stack(pending + [pending[-1]] * (chunk_n - n))
            masks, state = engine.step_chunk_small(batch, state, frame_idx)

            def convert(m=masks, k=n):
                a = np.asarray(m)[:k]
                return list(nearest_resize_host(a, out_hw, hw_axes=(1, 2)))

            drain.submit(convert)
            frame_idx += n
            pending.clear()

        def flush():
            if last_video is None:
                return
            if pending:
                run_pending3()
            fetched = [m for group in drain.drain() for m in group]
            if fetched:
                predictions.setdefault(last_video, []).append(fetched)

        for item, video in prefetch_dataset(dataset):
            frame = item if not isinstance(item, tuple) else item[0]
            h, w = frame.shape[:2]
            hd, wd = int(np.ceil(h * sc)), int(np.ceil(w * sc))
            # nearest input rescale on host (u8; commutes with the on-device
            # normalisation — reference resizes the normalised tensor,
            # inference_utils.py:526)
            ri = (np.arange(hd) * h) // hd
            ci = (np.arange(wd) * w) // wd
            frame = frame[ri][:, ci]

            if video != last_video and last_video is not None:
                flush()
                frame_idx = 0
            if frame_idx == 0:
                annotation = first_annotation_path(annotation_dir, video)
                label, d, palette = load_annotation(annotation)
                budget = engine.cfg.num_classes if engine is not None else 0
                if engine is None or engine.h != hd or engine.w != wd or d > budget:
                    engine = _make_engine(
                        model, variables, (hd, wd),
                        _with_budget(cfg, max(d, budget)), mesh,
                    )
                palettes[video] = palette
                if s_i == 0:
                    copy_first_annotation(annotation, save_dir, video)
                # first-frame labels come from the *scaled* grid
                # (prepare_first_frame 3-scale branch, predict.py:146-153)
                state = engine.start_video(frame, label)
                frame_idx = 1
                last_video = video
                if progress:
                    progress()
                continue

            pending.append(frame)
            if len(pending) == chunk_n:
                run_pending3()
            last_video = video
            if progress:
                progress()
        try:
            flush()
        finally:
            drain.close()

    logger.info("Fusing 3-scale predictions.")
    for video, passes in predictions.items():
        fused = [
            np.maximum(np.maximum(a, b), c) for a, b, c in zip(*passes)
        ]
        save_predictions(fused, palettes[video], save_dir, video)
