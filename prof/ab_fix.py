"""One-window A/B of the batched bank-layout fix (prof/ab_hlo.py follow-up).

Three scanned chunk programs, slope-timed interleaved:
  step_s   : single engine _step_chunk_small (the 480p reference point)
  step_old : batched scan body with the target transpose INSIDE the body
             (targets_t=None — the pre-fix program: XLA carries the bank
             p-minor and pays a 1.23 GB layout copy per iteration)
  step_new : the engine's actual _step_chunk_small (hoisted feats_t)

Expected: step_new/lane ~= enc+aff ~= 4.7 ms; step_old/lane ~= 5.1 ms.
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
B, CHUNK, N_LONG = 8, 8, 24

rng = np.random.default_rng(0)
net = VOSNet(model="resnet50", dtype=jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
cfg = EngineConfig()

eng = PropagationEngine(net, variables, (H, W), cfg)
beng = BatchedPropagationEngine(net, variables, (H, W), B, cfg)

frames = rng.integers(0, 255, size=(1 + N_LONG, H, W, 3), dtype=np.uint8)
label0 = np.zeros((H, W), np.int32)
label0[100:300, 200:500] = 1
frames_b = np.broadcast_to(frames[:, None], (1 + N_LONG, B, H, W, 3)).copy()
labels_b = np.stack([label0] * B)

st_s0 = eng.start_video(frames[0], label0)
st_b0 = beng.start_videos(frames_b[0], labels_b)

f_s8 = jax.device_put(frames[1 : 1 + CHUNK])
f_s24 = jax.device_put(frames[1 : 1 + N_LONG + 1][:N_LONG])
f_b8 = jax.device_put(frames_b[1 : 1 + CHUNK])
f_b24 = jax.device_put(frames_b[1 : 1 + N_LONG + 1][:N_LONG])


def old_chunk_small_impl(variables_, frames_u8, state, start_idx):
    feats = beng._encode_chunk(variables_, frames_u8)

    def body(carry, targets):
        st, idx = carry
        pred, st = beng._advance_from_feats(targets, st, idx, None)
        mask = jnp.argmax(pred, axis=1).reshape(beng.b, beng.hd, beng.wd)
        return (st, idx + 1), mask.astype(jnp.uint8)

    (state, _), masks = jax.lax.scan(body, (state, jnp.int32(start_idx)), feats)
    return masks, state


old_chunk = jax.jit(old_chunk_small_impl, donate_argnums=(2,))


def run_s(f):
    m, st = eng.step_chunk_small(f, st_s0, 50)
    # bank carry not reused across calls on purpose (same state each call);
    # fetch one scalar = the only real sync on this runtime
    return float(m[0].reshape(-1)[0])


def run_new(f):
    m, st = beng.step_chunk_small(f, st_b0, 50)
    return float(m[0].reshape(-1)[0])


def run_old(f):
    m, st = old_chunk(beng.enc_params, f, st_b0, jnp.int32(50))
    return float(m[0].reshape(-1)[0])


# NOTE: states are donated; clone fresh ones per call
def fresh_s():
    return eng.start_video(frames[0], label0)


def fresh_b():
    return beng.start_videos(frames_b[0], labels_b)


progs = {}
for name, runner, fresh, f8, f24, lanes in (
    ("step_s", lambda f, st: eng.step_chunk_small(f, st, 50), fresh_s, f_s8, f_s24, 1),
    ("step_new", lambda f, st: beng.step_chunk_small(f, st, 50), fresh_b, f_b8, f_b24, B),
    ("step_old", lambda f, st: old_chunk(beng.enc_params, f, st, jnp.int32(50)), fresh_b, f_b8, f_b24, B),
):
    def short(runner=runner, fresh=fresh, f=f8):
        m, _ = runner(f, fresh())
        return float(m[0].reshape(-1)[0])

    def long(runner=runner, fresh=fresh, f=f24):
        m, _ = runner(f, fresh())
        return float(m[0].reshape(-1)[0])

    progs[name] = (short, long, lanes)

# numerics gate first: old vs new masks identical
m_new, _ = beng.step_chunk_small(f_b8, fresh_b(), 1)
m_old, _ = old_chunk(beng.enc_params, f_b8, fresh_b(), jnp.int32(1))
agree = float((np.asarray(m_new) == np.asarray(m_old)).mean())
print(f"mask agreement old-vs-new: {agree:.6f}", flush=True)

slopes = {k: [] for k in progs}
for r in range(8):
    for k, (short, long, lanes) in progs.items():
        t0 = time.perf_counter(); short(); ts = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter(); long(); tl = (time.perf_counter() - t0) * 1e3
        if r > 0:
            slopes[k].append((tl - ts) / (N_LONG - CHUNK) / lanes)
    if r > 0:
        print(f"round {r}: " + " | ".join(
            f"{k} {slopes[k][-1]:.3f}" for k in progs), flush=True)

print("\nmedian ms per lane-frame:")
for k, v in slopes.items():
    print(f"  {k}: {statistics.median(v):.3f}")
