"""Attribute the bench's batched-resident deficit: compute vs drain.

The post-fix phase probe (prof/ab_batched.py) shows equal per-lane-frame
step slopes (batched 4.68 vs single 4.76 ms), yet BENCH's batched-resident
fps trails device-resident by ~25%. The difference between the two
protocols is the DRAIN: the bench fetches every chunk's masks (batched: 8x
the bytes, 8x the host upsample work) through `_pipelined_masks`. This
times, interleaved in one window:

  single_drain  : run_single_resident protocol (fetch+upsample per chunk)
  single_nodrain: same dispatches, one scalar fetch at the end
  batched_drain : run_batched_resident protocol
  batched_nodrain: same dispatches, one scalar fetch at the end

nodrain fps ~= the chip rate the slopes predict; drain - nodrain = what the
mask-delivery path costs each engine at this window's tunnel bandwidth.
"""
import statistics
import time

import numpy as np

from semi_supervised_vos_tpu.utils.runtime import setup_backend

setup_backend()

import jax
import jax.numpy as jnp

from semi_supervised_vos_tpu.infer.batched import BatchedPropagationEngine
from semi_supervised_vos_tpu.infer.engine import EngineConfig, PropagationEngine
from semi_supervised_vos_tpu.models.vos_net import VOSNet
from semi_supervised_vos_tpu.ops.resize import nearest_resize_host

H, W = 480, 854
B, CHUNK, FRAMES = 8, 8, 64

rng = np.random.default_rng(0)
net = VOSNet(model="resnet50", dtype=jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
cfg = EngineConfig()

eng = PropagationEngine(net, variables, (H, W), cfg)
beng = BatchedPropagationEngine(net, variables, (H, W), B, cfg)

frames = rng.integers(0, 255, size=(1 + FRAMES, H, W, 3), dtype=np.uint8)
label0 = np.zeros((H, W), np.int32)
label0[100:300, 200:500] = 1
frames_b = np.broadcast_to(frames[:, None], (1 + FRAMES, B, H, W, 3)).copy()
labels_b = np.stack([label0] * B)

frames_dev = jax.device_put(frames)
chunks_b = [
    jax.device_put(frames_b[s : s + CHUNK]) for s in range(1, 1 + FRAMES, CHUNK)
]
starts = list(range(1, 1 + FRAMES, CHUNK))


def pipelined(gen, hw_axes):
    from concurrent.futures import ThreadPoolExecutor

    def fetch(m):
        return nearest_resize_host(np.asarray(m), (H, W), hw_axes=hw_axes)

    with ThreadPoolExecutor(1) as ex:
        futs = [ex.submit(fetch, m) for m in gen]
        return [f.result() for f in futs]


def single_drain():
    st = eng.start_video(frames[0], label0)
    t0 = time.perf_counter()

    def gen():
        s = st
        for start in starts:
            m, s = eng.step_chunk_small(frames_dev[start : start + CHUNK], s, start)
            yield m

    full = pipelined(gen(), (1, 2))
    n = sum(f.shape[0] for f in full)
    return n / (time.perf_counter() - t0)


def single_nodrain():
    st = eng.start_video(frames[0], label0)
    t0 = time.perf_counter()
    last = None
    for start in starts:
        last, st = eng.step_chunk_small(frames_dev[start : start + CHUNK], st, start)
    float(last[0].reshape(-1)[0])
    return FRAMES / (time.perf_counter() - t0)


def batched_drain():
    st = beng.start_videos(frames_b[0], labels_b)
    t0 = time.perf_counter()

    def gen():
        s = st
        for i, start in enumerate(starts):
            m, s = beng.step_chunk_small(chunks_b[i], s, start)
            yield m

    full = pipelined(gen(), (2, 3))
    n = sum(f.shape[0] * f.shape[1] for f in full)
    return n / (time.perf_counter() - t0)


def batched_nodrain():
    st = beng.start_videos(frames_b[0], labels_b)
    t0 = time.perf_counter()
    last = None
    for i, start in enumerate(starts):
        last, st = beng.step_chunk_small(chunks_b[i], st, start)
    float(last[0].reshape(-1)[0])
    return FRAMES * B / (time.perf_counter() - t0)


progs = {
    "single_drain": single_drain,
    "single_nodrain": single_nodrain,
    "batched_drain": batched_drain,
    "batched_nodrain": batched_nodrain,
}
for k, f in progs.items():
    f()  # warmup/compile
vals = {k: [] for k in progs}
for r in range(5):
    for k, f in progs.items():
        vals[k].append(f())
    print(f"round {r}: " + " | ".join(f"{k} {vals[k][-1]:.1f}" for k in progs),
          flush=True)

print("\nmedian fps:")
for k, v in vals.items():
    print(f"  {k}: {statistics.median(v):.1f} (best {max(v):.1f})")
