"""Attribute the batched-vs-single device-resident gap at 480p (BASELINE r4:
196.6 single vs 159.2 batched-resident aggregate, B=8 — ~19%).

Slope-times (two-length protocol, see bench.py) the three phases of BOTH
engines interleaved in one window:
  * encode   : chunk-batched backbone forward (8 imgs vs 64 imgs/chunk)
  * affinity : fused bank kernel scan (single vs B=8 batched kernel)
  * step     : full chunk step (encode + scan(propagate+write+argmax))
Per-lane-frame ms is comparable across engines; the phase whose per-frame
slope diverges is the gap.
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

H, W = 480, 854
B, CHUNK = 8, 8
N_LONG = 3 * CHUNK

rng = np.random.default_rng(0)
net = VOSNet(model="resnet50", dtype=jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
cfg = EngineConfig()

frames = rng.integers(0, 255, size=(1 + N_LONG, H, W, 3), dtype=np.uint8)
label0 = np.zeros((H, W), np.int32)
label0[100:300, 200:500] = 1

eng = PropagationEngine(net, variables, (H, W), cfg)
beng = BatchedPropagationEngine(net, variables, (H, W), B, cfg)

frames_b = np.broadcast_to(frames[:, None], (1 + N_LONG, B, H, W, 3)).copy()
labels_b = np.stack([label0] * B)

f8 = jax.device_put(frames[1 : 1 + CHUNK])
f24 = jax.device_put(frames[1 : 1 + N_LONG])
fb8 = jax.device_put(frames_b[1 : 1 + CHUNK])
fb24 = jax.device_put(frames_b[1 : 1 + N_LONG])
g1 = jax.device_put(frames[1 : 1 + CHUNK][None])
g3 = jax.device_put(frames[1 : 1 + N_LONG].reshape(3, CHUNK, H, W, 3))
gb1 = jax.device_put(frames_b[1 : 1 + CHUNK][None])
gb3 = jax.device_put(frames_b[1 : 1 + N_LONG].reshape(3, CHUNK, B, H, W, 3))


@jax.jit
def enc_scan_s(v, fr):
    def body(c, f):
        feats = eng._encode_batch_impl(v, f)
        return c + jnp.sum(feats.astype(jnp.float32)), None

    return jax.lax.scan(body, jnp.float32(0), fr)[0]


@jax.jit
def enc_scan_b(v, fr):
    def body(c, f):
        feats = beng._encode_chunk(v, f)
        return c + jnp.sum(feats.astype(jnp.float32)), None

    return jax.lax.scan(body, jnp.float32(0), fr)[0]


st_s = eng.start_video(frames[0], label0)
st_b = beng.start_videos(frames_b[0], labels_b)
tgt_s = eng._encode(eng.enc_params, jax.device_put(frames[1]))
# BatchedPropagationEngine never jits _encode itself — jit here, or the full
# ResNet-50 runs eagerly per-op (pathological on the remote-TPU runtime).
tgt_b = jax.jit(beng._encode)(beng.enc_params, jax.device_put(frames_b[1]))
# Only a D2H fetch synchronises on axon (block_until_ready is a no-op);
# drain the warmup encodes with scalar fetches before round 0 starts.
float(jnp.sum(tgt_s.astype(jnp.float32)))
float(jnp.sum(tgt_b.astype(jnp.float32)))


@jax.jit
def prop_scan_s(t, st, idxs, wd, ws):
    # wd/ws as runtime args, never closure constants: on the non-Pallas
    # fallback they are the dense (P,P) spatial matrices (engine.py contract).
    def body(c, i):
        pred = eng._propagate(t, st, i, wd, ws)
        return c + jnp.sum(pred), None

    return jax.lax.scan(body, jnp.float32(0), idxs)[0]


@jax.jit
def prop_scan_b(t, st, idxs):
    def body(c, i):
        pred = beng._propagate(t, st, i)
        return c + jnp.sum(pred), None

    return jax.lax.scan(body, jnp.float32(0), idxs)[0]


i8 = jax.device_put(np.arange(50, 50 + CHUNK, dtype=np.int32))
i24 = jax.device_put(np.arange(50, 50 + N_LONG, dtype=np.int32))

hold = {"s": eng.start_video(frames[0], label0),
        "b": beng.start_videos(frames_b[0], labels_b)}


def step_s(fr):
    m, hold["s"] = eng.step_chunk_small(fr, hold["s"], 50)
    float(m[0, 0, 0])  # D2H scalar fetch = the only real sync on axon


def step_b(fr):
    m, hold["b"] = beng.step_chunk_small(fr, hold["b"], 50)
    float(m[0, 0, 0, 0])


# On this runtime ONLY a D2H fetch synchronises (block_until_ready is a
# no-op on axon buffers — CLAUDE.md rule; verified: repeat dispatches timed
# 0.1 ms). Fetch the scalar result to close every timed region; the fetch
# RPC is a per-call constant the slope cancels.
progs = {
    "enc_s": (lambda: float(enc_scan_s(eng.enc_params, g1)),
              lambda: float(enc_scan_s(eng.enc_params, g3)), 1),
    "enc_b": (lambda: float(enc_scan_b(beng.enc_params, gb1)),
              lambda: float(enc_scan_b(beng.enc_params, gb3)), B),
    "aff_s": (lambda: float(prop_scan_s(tgt_s, st_s, i8, eng._wd, eng._ws)),
              lambda: float(prop_scan_s(tgt_s, st_s, i24, eng._wd, eng._ws)), 1),
    "aff_b": (lambda: float(prop_scan_b(tgt_b, st_b, i8)),
              lambda: float(prop_scan_b(tgt_b, st_b, i24)), B),
    "step_s": (lambda: step_s(f8), lambda: step_s(f24), 1),
    "step_b": (lambda: step_b(fb8), lambda: step_b(fb24), B),
}

slopes = {k: [] for k in progs}
for r in range(8):
    raw = []
    for k, (short, long, lanes) in progs.items():
        t0 = time.perf_counter(); short(); ts = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter(); long(); tl = (time.perf_counter() - t0) * 1e3
        raw.append(f"{k} {ts:.1f}/{tl:.1f}")
        if r > 0:
            # slope per LANE-FRAME: per chunk-iteration slope / lanes
            slopes[k].append((tl - ts) / (N_LONG - CHUNK) / lanes)
    print(f"raw round {r}: " + " | ".join(raw), flush=True)
    if r > 0:
        print(f"round {r}: " + " | ".join(
            f"{k} {slopes[k][-1]:.3f}" for k in progs), flush=True)

print("\nmedian ms per lane-frame:")
for k in progs:
    print(f"  {k}: {statistics.median(slopes[k]):.3f}")
