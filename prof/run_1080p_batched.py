"""EXECUTED 1080p B=2 check (upgrade of prof/check_1080p_batched.py).

check_1080p_batched.py proved the post-fix B=2 1080p chunk program
*compiles* inside HBM (12.13 GB peak-ish of ~16). This runs it: allocates
the real 2-lane banks, propagates 16 frames on-chip, then frees the batched
engine and runs the single engine over the same video, comparing every mask
pixel of lane 0 against the single engine's output. Gates two things the
compile-only check cannot:

  1. runtime HBM (the compiler's memory analysis excludes the live bank of
     the *other* chunk boundary + staging buffers);
  2. batched-vs-single numerics at the 1080p geometry post bank-layout fix
     (the 480p gate lives in bench.py's kernel_check; 1080p's tile shapes
     and far-tile-skip engagement differ, so it is a distinct lowering).

Engines run sequentially (batched freed before the single allocates) —
together they exceed HBM; that is exactly why the runners clamp 1080p-scale
groups to 2 lanes (`infer/batched.py::_hbm_lanes_cap`).

Reference semantics being gated: per-frame propagation predict,
/root/reference/src/model/predict.py:47-89 (batch size 1 upstream; the
lockstep lanes are ours).
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

H, W = 1080, 1920
B, CHUNK, N = 2, 8, 16

rng = np.random.default_rng(0)
net = VOSNet(model="resnet50", dtype=jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
cfg = EngineConfig()

frames = rng.integers(0, 255, size=(1 + N, H, W, 3), dtype=np.uint8)
label0 = np.zeros((H, W), np.int32)
label0[200:700, 400:1100] = 1
label0[300:500, 1200:1600] = 2
# lane 1 gets the SAME video: lane agreement is then also a cross-talk gate.
frames_b = np.broadcast_to(frames[:, None], (1 + N, B, H, W, 3)).copy()
labels_b = np.stack([label0] * B)

# ---- batched pass ---------------------------------------------------------
print("compiling + running batched B=2 ...", flush=True)
beng = BatchedPropagationEngine(net, variables, (H, W), B, cfg)
fb_dev = jax.device_put(frames_b[1:])


def pass_batched():
    st = beng.start_videos(frames_b[0], labels_b)
    out = []
    t0 = time.perf_counter()
    for i, s in enumerate(range(1, 1 + N, CHUNK)):
        m, st = beng.step_chunk_small(fb_dev[s - 1 : s - 1 + CHUNK], st, s)
        out.append(np.asarray(m))  # D2H fetch = the only real sync here
    dt = time.perf_counter() - t0
    return np.concatenate(out, axis=0), dt


masks_b, dt0 = pass_batched()
times = [pass_batched()[1] for _ in range(2)]
ms_lane = statistics.median(times) / (N * B) * 1e3
print(
    f"batched B=2 1080p: warm chunks {dt0:.1f}s first pass | "
    f"median {statistics.median(times):.2f}s / pass = {ms_lane:.2f} ms/lane-frame "
    f"({N * B / statistics.median(times):.2f} fps aggregate)",
    flush=True,
)
lane_agree = float(np.mean(masks_b[:, 0] == masks_b[:, 1]))
print(f"lane0-vs-lane1 agreement (identical inputs): {lane_agree:.6f}", flush=True)

# free the batched banks before the single engine allocates its own
del beng, fb_dev
masks_lane0 = masks_b[:, 0]
del masks_b

# ---- single pass ----------------------------------------------------------
print("compiling + running single ...", flush=True)
eng = PropagationEngine(net, variables, (H, W), cfg)
fs_dev = jax.device_put(frames[1:])
st = eng.start_video(frames[0], label0)
out = []
t0 = time.perf_counter()
for s in range(1, 1 + N, CHUNK):
    m, st = eng.step_chunk_small(fs_dev[s - 1 : s - 1 + CHUNK], st, s)
    out.append(np.asarray(m))
dt_s = time.perf_counter() - t0
masks_s = np.concatenate(out, axis=0)
print(f"single 1080p: {dt_s:.2f}s incl. compile-cached warmup", flush=True)

agree = float(np.mean(masks_lane0 == masks_s))
print(
    f"batched-lane0 vs single mask agreement at 1080p: {agree:.6f} "
    f"(lane cross-talk gate: {lane_agree:.6f})",
    flush=True,
)
