"""Training/validation loop (reference ``src/train.py:25-216``).

The shared step (``train.py:155-216``) becomes one jitted, optionally
pjit-sharded program: device-side normalisation, backbone forward over the
B·T clip frames, annotation downsample + centroid quantisation, one-hot
reference labels, loss (with in-jit or host-callback triplet mining), grad,
and the SGD update — no host round trip inside an optimizer step.

Parallelism: with a mesh, the batch axis is sharded over ``data`` and
parameters are replicated; XLA inserts the gradient all-reduce over ICI —
the TPU-native replacement for ``torch.nn.DataParallel`` (``train.py:113``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_vos_tpu.config import DEFAULT
from semi_supervised_vos_tpu.infer.engine import IMAGENET_MEAN, IMAGENET_STD
from semi_supervised_vos_tpu.models import resnet
from semi_supervised_vos_tpu.ops.onehot import color_to_class, index_to_onehot
from semi_supervised_vos_tpu.ops.resize import nearest_resize
from semi_supervised_vos_tpu.train import losses
from semi_supervised_vos_tpu.train.miners import (
    AbstractMiner,
    DistanceTransformationMiner,
    OneBackOneAheadMiner,
    SkeletonTemporalMiner,
    TemporalMiner,
    host_geometry,
)
from semi_supervised_vos_tpu.train.train_state import TrainState


@dataclasses.dataclass(frozen=True)
class LossSpec:
    """Which loss to run and its hyper-parameters (``train.py:59-73``)."""

    name: str = "cross_entropy"
    temperature: float = 1.0
    margin: float = 0.1
    loss_weight: float = 1.0
    miner: Optional[AbstractMiner] = None


def mining_mode(spec: "LossSpec") -> Optional[str]:
    """How the morphology miners run, or None for non-morphology specs.

    'callback': the reference-parity formulation — SciPy morphology via
    ``jax.pure_callback`` inside the compiled step (the golden tests pin
    this path).
    'pipelined': label-only geometry computed on the host BEFORE the step
    (overlapped with the previous device step by the staging thread) and
    the embedding-dependent picks in-jit (``mine_from_geometry``). Default
    on TPU: the axon PJRT runtime rejects host callbacks outright
    (UNIMPLEMENTED: host send/recv), and on any TPU this removes the
    device→host→device round trip from the step. ``SVOS_MINING`` overrides.
    """
    import os

    if not isinstance(spec.miner, DistanceTransformationMiner):
        return None
    env = os.environ.get("SVOS_MINING")
    if env is not None:
        if env not in ("pipelined", "callback"):
            raise ValueError(
                f"SVOS_MINING={env!r}: expected 'pipelined' or 'callback'"
            )
        return env
    return "pipelined" if jax.default_backend() == "tpu" else "callback"


def host_ann_classes(anns: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Host twin of the in-step annotation pipeline: nearest ×1/8 downsample
    + centroid quantisation (``loss_fn`` body; reference ``train.py:166-172``).
    Same integer-floor nearest mapping (``nearest_resize_host``) and the same
    expanded-square argmin as ``ops.onehot.color_to_class`` — pinned equal to
    the device path in ``tests/test_miners.py``."""
    from semi_supervised_vos_tpu.models.resnet import out_spatial
    from semi_supervised_vos_tpu.ops.resize import nearest_resize_host

    b, t, h, w, _ = anns.shape
    hd, wd = out_spatial(h, w)
    small = nearest_resize_host(
        anns.reshape(-1, h, w, 3).astype(np.float32), (hd, wd), hw_axes=(1, 2)
    )
    x2 = np.sum(small * small, axis=-1, keepdims=True)
    xc = small @ centroids.T.astype(np.float32)
    c2 = np.sum(centroids * centroids, axis=-1)
    cls = np.argmin(x2 - 2.0 * xc + c2, axis=-1).astype(np.int32)
    return cls.reshape(b, t, hd, wd)


def mining_labels_host(ann_cls: np.ndarray, miner) -> np.ndarray:
    """The label image the morphology miner sees — host twin of the
    ``_miner_extras`` label slicing + the target-frame default."""
    b, t, hd, wd = ann_cls.shape
    if isinstance(miner, SkeletonTemporalMiner):
        # five frames stacked into one tall image (train.py:200-204)
        return ann_cls[:, -5:].transpose(0, 2, 1, 3).reshape(b, 5 * hd, wd)
    return ann_cls[:, -1]


def make_geometry_fn(spec: "LossSpec", centroids):
    """Per-batch host geometry for pipelined morphology mining (or None).

    The returned ``fn(anns) -> (interior, skel, nb_idx)`` runs on the
    staging thread, so the SciPy morphology for batch t+1 overlaps batch
    t's device step — stale-free (geometry depends only on labels)."""
    if mining_mode(spec) != "pipelined":
        return None
    miner = spec.miner
    centroids = np.asarray(centroids, np.float32)

    def geometry_fn(anns: np.ndarray):
        ann_cls = host_ann_classes(np.asarray(anns), centroids)
        lab = mining_labels_host(ann_cls, miner)
        return host_geometry(lab, miner.mode, miner.metric)

    return geometry_fn


def _miner_extras(feats, ann_cls, miner):
    """Miner-specific extra-embedding slicing (``train.py:186-204``).

    feats: (B, T, Hd, Wd, C); ann_cls: (B, T, Hd, Wd).
    Returns (extra_embeddings, extra_labels) or (None, None).
    """
    if miner is None:
        return None, None
    b, t, hd, wd, c = feats.shape
    if isinstance(miner, OneBackOneAheadMiner):
        emb = jnp.concatenate(
            [feats[:, -5:-3], feats[:, -2:], feats[:, -3][:, None]], axis=1
        )
        lab = jnp.concatenate(
            [ann_cls[:, -5:-3], ann_cls[:, -2:], ann_cls[:, -3][:, None]], axis=1
        )
        return emb, lab
    if isinstance(miner, SkeletonTemporalMiner):
        # five frames stacked into one tall image (train.py:200-204)
        emb = feats[:, -5:].transpose(0, 2, 1, 3, 4).reshape(b, 5 * hd, wd, c)
        lab = ann_cls[:, -5:].transpose(0, 2, 1, 3).reshape(b, 5 * hd, wd)
        return emb, lab
    if isinstance(miner, TemporalMiner):
        return feats[:, -5:], ann_cls[:, -5:]
    return None, None  # kernel miners mine the plain target frame


def make_loss_fn(net, spec: LossSpec, num_classes: int = DEFAULT.num_classes):
    """Build loss_fn(params, batch_stats, imgs, anns, centroids, rng, train,
    geometry=None) — ``geometry`` is :func:`make_geometry_fn`'s per-batch
    output when the spec mines morphology in pipelined mode."""

    def loss_fn(params, batch_stats, imgs, anns, centroids, rng, train: bool,
                geometry=None):
        b, t, h, w, _ = imgs.shape
        x = imgs.reshape(-1, h, w, 3).astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

        variables = {"params": params, "batch_stats": batch_stats}
        # Differentiated forwards trace with the native-conv impl: the
        # tap-loop matmul backward is ~14x slower (see resnet.grad_conv_impl).
        with resnet.conv_impl(resnet.grad_conv_impl()):
            if train:
                out, mutated = net.apply(
                    variables, x, train=True, mutable=["batch_stats"]
                )
                new_stats = mutated["batch_stats"]
            else:
                out = net.apply(variables, x, train=False)
                new_stats = batch_stats

        hd, wd = out.shape[1], out.shape[2]
        c = out.shape[-1]
        feats = out.reshape(b, t, hd, wd, c)

        # annotation downsample (nearest, ×SCALE — train.py:166-168) +
        # centroid quantisation (train.py:172), all on device
        ann = anns.reshape(-1, h, w, 3).astype(jnp.float32)
        ann_small = nearest_resize(ann, (hd, wd))
        ann_cls = color_to_class(ann_small, centroids).reshape(b, t, hd, wd)

        ref = feats[:, : t - 1]
        target = feats[:, -1]
        ref_label = index_to_onehot(ann_cls[:, : t - 1], num_classes)
        target_label = ann_cls[:, -1]

        if spec.name == "cross_entropy":
            loss = losses.cross_entropy_loss(
                ref, target, ref_label, target_label, temperature=spec.temperature
            )
        elif spec.name == "focal":
            loss = losses.focal_loss(ref, target, ref_label, target_label)
        elif spec.name == "contrastive":
            loss = losses.contrastive_loss(
                ref, target, ref_label, target_label, temperature=spec.temperature
            )
        elif spec.name == "triplet":
            extra_emb, extra_lab = _miner_extras(feats, ann_cls, spec.miner)
            loss = losses.triplet_loss_with_miner(
                ref,
                target,
                ref_label,
                target_label,
                spec.miner,
                rng=rng,
                extra_embeddings=extra_emb,
                extra_labels=extra_lab,
                margin=spec.margin,
                weights=(1.0, spec.loss_weight),
                temperature=spec.temperature,
                geometry=geometry,
            )
        else:
            raise RuntimeError("Invalid loss type.")
        return loss, new_stats

    return loss_fn


def make_train_step(net, spec: LossSpec, tx, frozen_mask=None, num_classes=DEFAULT.num_classes):
    """One optimizer step; jitted with donated state.

    When the spec mines morphology in pipelined mode (:func:`mining_mode`),
    the step takes a trailing ``geometry`` argument — produce it per batch
    with :func:`make_geometry_fn` (``run_epoch`` wires this up)."""
    loss_fn = make_loss_fn(net, spec, num_classes)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, imgs, anns, centroids, rng, geometry=None):
        def wrapped(params):
            return loss_fn(
                params, state.batch_stats, imgs, anns, centroids, rng, True,
                geometry,
            )

        (loss, new_stats), grads = jax.value_and_grad(wrapped, has_aux=True)(state.params)
        if frozen_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * m, grads, frozen_mask
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if frozen_mask is not None:
            # weight decay is coupled into the update (torch semantics), so
            # frozen params must mask the *update* too — torch freezing
            # removes them from the optimizer entirely (train.py:124-128)
            updates = jax.tree_util.tree_map(
                lambda u, m: u * m, updates, frozen_mask
            )
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        return (
            TrainState(new_params, new_stats, new_opt, state.epoch),
            loss,
        )

    return train_step


def make_eval_step(net, spec: LossSpec, num_classes=DEFAULT.num_classes):
    loss_fn = make_loss_fn(net, spec, num_classes)

    @jax.jit
    def eval_step(state: TrainState, imgs, anns, centroids, rng, geometry=None):
        loss, _ = loss_fn(
            state.params, state.batch_stats, imgs, anns, centroids, rng, False,
            geometry,
        )
        return loss

    return eval_step


def iterate_batches(
    dataset, batch_size: int, drop_last: bool = True, num_workers: int = 0
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Sequential batching (the reference uses shuffle=False — ``train.py:88``)
    with optional thread-pool prefetch of items."""
    n = len(dataset)
    indices = range(n)

    if num_workers > 1:
        # bounded prefetch (data/loader.py): decodes ahead of the device loop
        # without submitting the whole epoch at once (Executor.map holds
        # every decoded item in flight — ~16 GB for a DAVIS epoch) and shuts
        # its pool down when the generator closes
        from semi_supervised_vos_tpu.data.loader import prefetch

        items = prefetch(
            dataset.__getitem__, n,
            depth=max(2 * num_workers, 8), workers=num_workers,
        )
    else:
        items = map(dataset.__getitem__, indices)

    imgs_buf, anns_buf = [], []
    for imgs, anns, _ in items:
        imgs_buf.append(imgs)
        anns_buf.append(anns)
        if len(imgs_buf) == batch_size:
            yield np.stack(imgs_buf), np.stack(anns_buf)
            imgs_buf, anns_buf = [], []
    if imgs_buf and not drop_last:
        yield np.stack(imgs_buf), np.stack(anns_buf)


def _device_stage(loader, shard_fn, depth: int = 2, geometry_fn=None):
    """Stage batches onto the device one step ahead, on a thread.

    Without this, each step's host→device copy (63 MB of uint8 at the
    reference config) serialises with both the decode loader and the device
    step; staging ahead overlaps all three, so epoch rate approaches
    min(loader rate, device rate). ``shard_fn`` (mesh placement) and
    ``geometry_fn`` (host morphology for pipelined mining) run on the
    staging thread too — the SciPy work for batch t+1 overlaps batch t's
    device step."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err = []
    stop = threading.Event()  # consumer gone — producer must not block

    def _put(item) -> bool:
        """Bounded put that gives up once the consumer has left: a plain
        q.put would block forever on a full queue if the epoch loop aborts
        mid-stream (train-step exception, generator GC), leaking the thread
        and ~depth staged device batches."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for imgs, anns in loader:
                geom = geometry_fn(anns) if geometry_fn is not None else None
                if shard_fn is not None:
                    imgs, anns = shard_fn(imgs, anns)
                    if geom is not None:
                        geom = shard_fn(*geom)
                else:
                    imgs, anns = jax.device_put(imgs), jax.device_put(anns)
                    if geom is not None:
                        geom = jax.device_put(geom)
                if not _put((imgs, anns, geom)):
                    return
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            _put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()
        while True:  # unblock a producer parked on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)
    if err:
        raise err[0]


def run_epoch(
    step_fn,
    state,
    loader,
    centroids,
    rng,
    train: bool,
    progress: Optional[Callable[[], None]] = None,
    shard_fn: Optional[Callable] = None,
    geometry_fn: Optional[Callable] = None,
):
    """Shared train/val epoch (reference ``step()``, ``train.py:155-216``).

    ``shard_fn(*arrays)`` places host batches with the batch axis sharded
    over a data-parallel mesh. ``geometry_fn`` (:func:`make_geometry_fn`)
    adds per-batch host morphology geometry for pipelined mining.
    """
    mean_loss = []
    for i, (imgs, anns, geom) in enumerate(
        _device_stage(loader, shard_fn, geometry_fn=geometry_fn)
    ):
        extra = (geom,) if geom is not None else ()
        rng, sub = jax.random.split(rng)
        if train:
            state, loss = step_fn(state, imgs, anns, centroids, sub, *extra)
        else:
            loss = step_fn(state, imgs, anns, centroids, sub, *extra)
        mean_loss.append(loss)
        if progress:
            progress()
    mean = float(np.mean([jax.device_get(l) for l in mean_loss])) if mean_loss else float("nan")
    return state, mean
