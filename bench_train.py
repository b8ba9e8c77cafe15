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
    main()
