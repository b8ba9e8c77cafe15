"""Training-step benchmark at the reference configuration.

Times ``make_train_step`` (ResNet-50 VOSNet, cross-entropy label-propagation
loss) at the reference defaults — batch 16, 10-frame clips, 256x256 crops
(``src/train.py:26-48``, ``src/utils/datasets.py:23``) — on the current
backend, and reports steps/sec plus effective TFLOPs / approximate MFU.

The benchmark chip is shared/multi-tenant (throughput swings >10x), so the
numbers are best-of-``PASSES`` and should be read against the same-window
matmul ceiling printed alongside. Not driver-run; results are recorded in
BASELINE.md's measured table.
"""

import json
import statistics
import sys
import time

import numpy as np

BS = 16
FRAMES = 10
CROP = 256
PASSES = 6
# fwd FLOPs: ResNet50-VOS stride-8 forward ≈ 23.5 GFLOP per 256² crop
# (scaled from 147 GFLOP at 480x854); train step ≈ 3x fwd (fwd+bwd)
STEP_TFLOP = (BS * FRAMES) * 23.5e9 * 3 / 1e12
V5E_PEAK_TFLOPS = 197.0  # bf16


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _build_disk_dataset(root, videos=2, frames=96, h=480, w=854):
    """Synthetic on-disk DAVIS-layout dataset at true 480p (JPEG images +
    palette-PNG annotations) — the point is to exercise the REAL
    decode+crop+flip loader path, so bytes must come off disk through the
    actual codecs."""
    from pathlib import Path

    from PIL import Image

    from semi_supervised_vos_tpu.ops.onehot import davis_palette

    root = Path(root)
    marker = root / f".complete_{videos}x{frames}_{h}x{w}"
    if marker.exists():
        return root
    rng = np.random.default_rng(0)
    palette = davis_palette().reshape(-1).tolist()
    for v in range(videos):
        img_dir = root / "JPEGImages" / "480p" / f"video{v:02d}"
        ann_dir = root / "Annotations" / "480p" / f"video{v:02d}"
        img_dir.mkdir(parents=True, exist_ok=True)
        ann_dir.mkdir(parents=True, exist_ok=True)
        bg = rng.integers(0, 120, size=(h, w, 3), dtype=np.uint8)
        for t in range(frames):
            img = bg.copy()
            label = np.zeros((h, w), np.uint8)
            y, x = 80 + (3 * t) % 200, 120 + (5 * t) % 400
            img[y : y + 160, x : x + 240] = [210, 60 + v * 20, 50]
            label[y : y + 160, x : x + 240] = 1
            Image.fromarray(img).save(img_dir / f"{t:05d}.jpg", quality=90)
            ann = Image.fromarray(label, mode="P")
            ann.putpalette(palette)
            ann.save(ann_dir / f"{t:05d}.png")
    marker.touch()
    return root


def input_pipeline_bench():
    """The honest end-to-end training number (VERDICT r2 weak #5): feed the
    REAL TrainDataset (disk JPEG/PNG -> decode -> shared crop/flip -> stack)
    through the actual train step, vs the HBM-staged ceiling measured by
    ``main()``. Reports loader images/sec and end-to-end steps/sec."""
    from semi_supervised_vos_tpu.utils.runtime import setup_backend

    setup_backend()

    import jax
    import jax.numpy as jnp

    from semi_supervised_vos_tpu.config import default_num_workers
    from semi_supervised_vos_tpu.data.davis import TrainDataset
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.ops.onehot import davis_centroids
    from semi_supervised_vos_tpu.train.loop import (
        LossSpec,
        iterate_batches,
        make_train_step,
    )
    from semi_supervised_vos_tpu.train.train_state import (
        init_train_state,
        make_optimizer,
    )

    log(f"backend: {jax.default_backend()}")
    root = _build_disk_dataset("/tmp/svos_bench_davis")
    dataset = TrainDataset(
        f"{root}/JPEGImages/480p", f"{root}/Annotations/480p",
        cropping=CROP, frame_num=FRAMES,
    )
    workers = default_num_workers()
    n_batches = len(dataset) // BS
    imgs_per_batch = BS * FRAMES

    # --- loader only (decode + crop + flip + stack, threaded prefetch) ------
    import os

    loader_rates = []
    for _ in range(2):
        t0 = time.perf_counter()
        n = 0
        for imgs, anns in iterate_batches(dataset, BS, num_workers=workers):
            n += imgs_per_batch
        loader_rates.append(n / (time.perf_counter() - t0))
        log(f"loader pass: {loader_rates[-1]:.1f} images/sec ({workers} workers)")

    # --- end to end: real loader feeding the real train step ----------------
    dtype = jnp.dtype(os.environ.get("SVOS_BENCH_DTYPE", "bfloat16"))
    net = VOSNet(model="resnet50", dtype=dtype)
    tx = make_optimizer()
    state = init_train_state(net, jax.random.PRNGKey(0), (1, CROP, CROP, 3), tx)
    step = make_train_step(net, LossSpec(name="cross_entropy"), tx)
    centroids = jnp.asarray(davis_centroids(), jnp.float32)
    key = jax.random.PRNGKey(1)

    log("compiling train step ...")
    first = next(iterate_batches(dataset, BS, num_workers=workers))
    t0 = time.perf_counter()
    state, loss = step(state, first[0], first[1], centroids, key)
    log(f"compile+first step {time.perf_counter() - t0:.0f}s, loss {float(loss):.4f}")

    from semi_supervised_vos_tpu.train.loop import _device_stage

    e2e_rates = []
    for p in range(2):
        t0 = time.perf_counter()
        n = 0
        losses = []
        # the production epoch path: loader -> staging thread (H2D one step
        # ahead) -> train step; decode, transfer and compute all overlap
        for imgs, anns in _device_stage(
            iterate_batches(dataset, BS, num_workers=workers), None
        ):
            key, sub = jax.random.split(key)
            state, loss = step(state, imgs, anns, centroids, sub)
            losses.append(loss)
            n += 1
        jax.block_until_ready(losses)
        float(losses[-1])  # force a real fetch (sync on this runtime)
        e2e_rates.append(n / (time.perf_counter() - t0))
        log(f"e2e pass {p}: {e2e_rates[-1]:.3f} steps/sec ({n} steps)")

    # --- decoded-frame cache (SVOS_DECODE_CACHE): epochs >= 2 skip decode ---
    # The cache holds every decoded frame in host RAM (~15 GB at DAVIS
    # scale) — opt out with SVOS_DECODE_CACHE=0 on small-RAM hosts; a
    # MemoryError during the warm pass degrades to "skipped" too.
    cached_loader = None
    cached_e2e_rates = []
    if os.environ.get("SVOS_DECODE_CACHE", "1") != "0":
        try:
            dataset_c = TrainDataset(
                f"{root}/JPEGImages/480p", f"{root}/Annotations/480p",
                cropping=CROP, frame_num=FRAMES, decode_cache=True,
            )
            for _ in iterate_batches(dataset_c, BS, num_workers=workers):
                pass  # warm pass: epoch-1 cost, populates the cache
            t0 = time.perf_counter()
            n = 0
            for imgs, anns in iterate_batches(dataset_c, BS, num_workers=workers):
                n += imgs_per_batch
            cached_loader = n / (time.perf_counter() - t0)
            log(f"cached loader pass: {cached_loader:.1f} images/sec")

            for p in range(2):
                t0 = time.perf_counter()
                n = 0
                losses = []
                for imgs, anns in _device_stage(
                    iterate_batches(dataset_c, BS, num_workers=workers), None
                ):
                    key, sub = jax.random.split(key)
                    state, loss = step(state, imgs, anns, centroids, sub)
                    losses.append(loss)
                    n += 1
                jax.block_until_ready(losses)
                float(losses[-1])
                cached_e2e_rates.append(n / (time.perf_counter() - t0))
                log(f"cached e2e pass {p}: {cached_e2e_rates[-1]:.3f} steps/sec")
        except MemoryError:
            cached_loader, cached_e2e_rates = None, []
            log("decoded-frame cache skipped: MemoryError during warm pass")
    else:
        log("decoded-frame cache skipped (SVOS_DECODE_CACHE=0)")

    print(
        json.dumps(
            {
                "metric": "train_input_pipeline_bs16_10f_256",
                "value": round(max(e2e_rates), 4),
                "unit": "steps/sec",
                "loader_images_per_sec": round(max(loader_rates), 1),
                "loader_workers": workers,
                "images_per_step": imgs_per_batch,
                "loader_bound_steps_per_sec": round(
                    max(loader_rates) / imgs_per_batch, 4
                ),
                "cached_loader_images_per_sec": (
                    round(cached_loader, 1) if cached_loader else None
                ),
                "cached_steps_per_sec": (
                    round(max(cached_e2e_rates), 4) if cached_e2e_rates else None
                ),
                "note": "real disk decode+augment loader feeding the real "
                "train step; compare with the HBM-staged ceiling from the "
                "default mode. cached_* = decoded-frame cache "
                "(SVOS_DECODE_CACHE) steady state: epochs >= 2 skip decode",
            }
        )
    )


def loss_family_bench():
    """Steps/sec for every loss family (VERDICT r3 #4): the default bench
    only measured cross-entropy, leaving the triplet configs — whose
    scipy/skeleton miners run through ``jax.pure_callback`` INSIDE the
    jitted step, a device→host→device round trip per step — unmeasured on
    TPU. Reference surface: ``src/train.py:59-73`` (loss choice),
    ``src/model/triplet_miners.py:21-32`` (miner registry).

    ``SVOS_BENCH_LOSS=all`` (or a comma list of names below) selects it."""
    from semi_supervised_vos_tpu.utils.runtime import setup_backend

    setup_backend()

    import os

    import jax
    import jax.numpy as jnp

    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.ops.onehot import davis_centroids
    from semi_supervised_vos_tpu.train.loop import (
        LossSpec,
        make_geometry_fn,
        make_train_step,
        mining_mode,
    )
    from semi_supervised_vos_tpu.train.miners import get_miner
    from semi_supervised_vos_tpu.train.train_state import (
        init_train_state,
        make_optimizer,
    )

    log(f"backend: {jax.default_backend()}")
    dtype = jnp.dtype(os.environ.get("SVOS_BENCH_DTYPE", "bfloat16"))
    net = VOSNet(model="resnet50", dtype=dtype)
    tx = make_optimizer()
    state = init_train_state(net, jax.random.PRNGKey(0), (1, CROP, CROP, 3), tx)

    # one config per loss family; triplet covers the three miner families —
    # in-jit kernel windows, in-jit temporal, and the host-callback
    # morphology miners (scipy distance transform / Zhang-Suen skeleton)
    configs = {
        "cross_entropy": LossSpec(name="cross_entropy"),
        "contrastive": LossSpec(name="contrastive"),
        "focal": LossSpec(name="focal"),
        "triplet_kernel": LossSpec(name="triplet", miner=get_miner("default")),
        "triplet_temporal": LossSpec(
            name="triplet", miner=get_miner("temporal")
        ),
        "triplet_euclidean": LossSpec(
            name="triplet", miner=get_miner("euclidean")
        ),
        "triplet_skeleton": LossSpec(
            name="triplet", miner=get_miner("skeleton")
        ),
    }
    sel = os.environ.get("SVOS_BENCH_LOSS", "all")
    if sel != "all":
        names = [s.strip() for s in sel.split(",")]
        configs = {k: v for k, v in configs.items() if k in names}

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (BS, FRAMES, CROP, CROP, 3)).astype(np.uint8)
    anns = np.zeros((BS, FRAMES, CROP, CROP, 3), np.uint8)
    anns[:, :, 64:160, 80:200] = [128, 0, 0]
    anns[:, :, 180:220, 40:120] = [0, 128, 0]  # second object: miners need >1 class
    centroids = jnp.asarray(davis_centroids(), jnp.float32)
    key = jax.random.PRNGKey(1)
    imgs, anns = jax.device_put(imgs), jax.device_put(anns)

    anns_host = np.asarray(jax.device_get(anns))
    results = {}
    passes = int(os.environ.get("SVOS_BENCH_LOSS_PASSES", "4"))
    for name, spec in configs.items():
        step = make_train_step(net, spec, tx)
        # morphology miners run the pipelined (callback-free) path on TPU:
        # host geometry enters as step arguments (axon PJRT rejects
        # pure_callback outright — UNIMPLEMENTED: host send/recv). The
        # geometry is staged in HBM once here; the production loop computes
        # it per batch on the staging thread, overlapped with the device step.
        geometry_fn = make_geometry_fn(spec, davis_centroids())
        extra = ()
        if geometry_fn is not None:
            extra = (jax.device_put(tuple(geometry_fn(anns_host))),)
        log(f"compiling {name} (mining={mining_mode(spec)}) ...")
        t0 = time.perf_counter()
        state, loss = step(state, imgs, anns, centroids, key, *extra)
        loss = float(loss)
        log(f"  compile+first {time.perf_counter() - t0:.0f}s, loss {loss:.4f}")
        assert np.isfinite(loss), name
        times = []
        for p in range(passes):
            t0 = time.perf_counter()
            state, loss = step(state, imgs, anns, centroids, key, *extra)
            float(loss)
            times.append(time.perf_counter() - t0)
        best, med = min(times), statistics.median(times)
        results[name] = {
            "steps_per_sec_best": round(1.0 / best, 4),
            "steps_per_sec_median": round(1.0 / med, 4),
        }
        log(f"  {name}: {1.0/best:.3f} best / {1.0/med:.3f} median steps/s")

    base = results.get("cross_entropy", {}).get("steps_per_sec_best")
    print(
        json.dumps(
            {
                "metric": "train_loss_family_steps_per_sec_bs16_10f_256",
                "value": base,
                "unit": "steps/sec (cross_entropy best)",
                "families": results,
                "note": "same staged batch, same state threaded through; "
                "triplet_euclidean/skeleton mine morphology in pipelined "
                "mode on TPU (host geometry as step arguments; axon PJRT "
                "rejects pure_callback) — here the geometry is pre-staged, "
                "so the rows are the pure device-step rate",
            }
        )
    )


def main():
    from semi_supervised_vos_tpu.utils.runtime import setup_backend

    setup_backend()  # persistent compilation cache: re-runs skip XLA

    import jax
    import jax.numpy as jnp

    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.ops.onehot import davis_centroids
    from semi_supervised_vos_tpu.train.loop import LossSpec, make_train_step
    from semi_supervised_vos_tpu.train.train_state import (
        init_train_state,
        make_optimizer,
    )

    log(f"backend: {jax.default_backend()}")

    import os

    # bf16 backbone compute (the CLI's --bf16) by default; SVOS_BENCH_DTYPE=
    # float32 measures the reference-parity full-precision configuration
    dtype = jnp.dtype(os.environ.get("SVOS_BENCH_DTYPE", "bfloat16"))
    log(f"compute dtype: {dtype}")
    net = VOSNet(model="resnet50", dtype=dtype)
    tx = make_optimizer()
    state = init_train_state(net, jax.random.PRNGKey(0), (1, CROP, CROP, 3), tx)
    step = make_train_step(net, LossSpec(name="cross_entropy"), tx)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (BS, FRAMES, CROP, CROP, 3)).astype(np.uint8)
    anns = np.zeros((BS, FRAMES, CROP, CROP, 3), np.uint8)
    anns[:, :, 64:160, 80:200] = [128, 0, 0]
    centroids = jnp.asarray(davis_centroids(), jnp.float32)
    key = jax.random.PRNGKey(1)

    # numpy args re-cross the host↔device tunnel (~20-40 MB/s here) on every
    # call — 63 MB/step of uint8 batches would dominate the timing. Stage the
    # batch in HBM once: the chip-rate number, as a host feeding over
    # PCIe/DMA (or an on-device data pipeline) would see it.
    imgs, anns = jax.device_put(imgs), jax.device_put(anns)

    log("compiling train step ...")
    t0 = time.perf_counter()
    state, loss = step(state, imgs, anns, centroids, key)
    loss = float(loss)
    log(f"compile+first step {time.perf_counter() - t0:.0f}s, loss {loss:.4f}")
    assert np.isfinite(loss)

    times = []
    for p in range(PASSES):
        t0 = time.perf_counter()
        state, loss = step(state, imgs, anns, centroids, key)
        float(loss)  # sync
        times.append(time.perf_counter() - t0)
        log(f"pass {p}: {times[-1]*1e3:.0f} ms")

    best = min(times)
    med = statistics.median(times)
    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec_bs16_10f_256",
                "value": round(1.0 / best, 4),
                "unit": "steps/sec",
                "median_steps_per_sec": round(1.0 / med, 4),
                "step_tflop": round(STEP_TFLOP, 2),
                "effective_tflops": round(STEP_TFLOP / best, 2),
                "approx_mfu_vs_v5e_peak": round(STEP_TFLOP / best / V5E_PEAK_TFLOPS, 4),
            }
        )
    )


if __name__ == "__main__":
    import os

    if os.environ.get("SVOS_BENCH_INPUT") == "1" or "--input-pipeline" in sys.argv:
        input_pipeline_bench()
    elif os.environ.get("SVOS_BENCH_LOSS") or "--loss-families" in sys.argv:
        loss_family_bench()
    else:
        main()
