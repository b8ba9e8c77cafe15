"""Bisect the batched engine's scan body (follow-up to prof/ab_glue.py).

prof/ab_batched.py established (same window, per lane-frame): encode and
affinity are equal across engines, but step_b - enc_b - aff_b = 0.52 ms
vs 0.01 ms for the single engine. This script times the engines' EXACT
chunk-scan bodies (pre-encoded feats as xs, bank carry donated — the real
``_step_chunk_small_impl`` minus encode) and three ablations, interleaved:

  full    : propagate -> onehot(argmax) -> bank write -> uint8 mask out
  nowrite : propagate -> onehot(argmax) -> uint8 mask out (bank unchanged)
  noonehot: propagate -> bank write with a CONSTANT label -> mask out
  maskonly: propagate -> uint8 mask out

full_b - full_s localises the gap; the ablation that closes it names the op.
"""
import statistics
import time

import numpy as np

from semi_supervised_vos_tpu.utils.runtime import setup_backend

setup_backend()

import jax
import jax.numpy as jnp

from semi_supervised_vos_tpu.infer.batched import BatchedPropagationEngine
from semi_supervised_vos_tpu.infer.engine import (
    BankState,
    EngineConfig,
    PropagationEngine,
)
from semi_supervised_vos_tpu.models.vos_net import VOSNet
from semi_supervised_vos_tpu.ops.onehot import index_to_onehot

H, W = 480, 854
B, CHUNK = 8, 8
N_LONG = 3 * CHUNK

rng = np.random.default_rng(0)
net = VOSNet(model="resnet50", dtype=jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
cfg = EngineConfig()

frames = rng.integers(0, 255, size=(2, H, W, 3), dtype=np.uint8)
label0 = np.zeros((H, W), np.int32)
label0[100:300, 200:500] = 1

eng = PropagationEngine(net, variables, (H, W), cfg)
beng = BatchedPropagationEngine(net, variables, (H, W), B, cfg)

frames_b = np.broadcast_to(frames[:, None], (2, B, H, W, 3)).copy()
labels_b = np.stack([label0] * B)

st_s0 = eng.start_video(frames[0], label0)
st_b0 = beng.start_videos(frames_b[0], labels_b)
tgt_s = eng._encode(eng.enc_params, jax.device_put(frames[1]))
tgt_b = jax.jit(beng._encode)(beng.enc_params, jax.device_put(frames_b[1]))
float(jnp.sum(tgt_s.astype(jnp.float32)))
float(jnp.sum(tgt_b.astype(jnp.float32)))

# feats xs: N copies of the encoded frame (as the real scan sees them)
feats_s8 = jnp.stack([tgt_s] * CHUNK)
feats_s24 = jnp.stack([tgt_s] * N_LONG)
feats_b8 = jnp.stack([tgt_b] * CHUNK)
feats_b24 = jnp.stack([tgt_b] * N_LONG)

const_lab_s = index_to_onehot(
    jnp.zeros((eng.p,), jnp.int32), cfg.num_classes, jnp.float32
)
const_lab_b = index_to_onehot(
    jnp.zeros((B, beng.p), jnp.int32), cfg.num_classes, jnp.float32
)


def make_scan(engine, variant, batched):
    def body(carry, target):
        st, idx = carry
        if batched:
            pred = beng._propagate(target, st, idx)
        else:
            pred = eng._propagate(target, st, idx, eng._wd, eng._ws)
        if variant in ("full", "nowrite"):
            lab = index_to_onehot(
                jnp.argmax(pred, axis=1 if batched else 0),
                cfg.num_classes,
                jnp.float32,
            )
        elif variant == "noonehot":
            lab = const_lab_b if batched else const_lab_s
        else:
            lab = None
        if variant in ("full", "noonehot"):
            if batched:
                st = beng._bank_write(st, idx % cfg.capacity, target, lab)
            else:
                slot = idx % cfg.capacity
                st = BankState(
                    feats=st.feats.at[slot].set(eng._pad_slot(target)),
                    labels=st.labels.at[slot].set(
                        eng._pad_slot(lab, eng.d_pad).astype(st.labels.dtype)
                    ),
                )
        if batched:
            mask = jnp.argmax(pred, axis=1).reshape(B, beng.hd, beng.wd)
        else:
            mask = jnp.argmax(pred, axis=0).reshape(eng.hd, eng.wd)
        return (st, idx + 1), mask.astype(jnp.uint8)

    @jax.jit
    def run(feats, st, start):
        (st, _), masks = jax.lax.scan(body, (st, start), feats)
        return masks, st

    return run


progs = {}
for name, batched in (("s", False), ("b", True)):
    for variant in ("full", "nowrite", "noonehot", "maskonly"):
        run = make_scan(eng, variant, batched)
        f8 = feats_b8 if batched else feats_s8
        f24 = feats_b24 if batched else feats_s24
        st0 = st_b0 if batched else st_s0
        lanes = B if batched else 1

        def short(run=run, f=f8, st=st0):
            m, _ = run(f, st, jnp.int32(50))
            float(m[0].reshape(-1)[0])

        def long(run=run, f=f24, st=st0):
            m, _ = run(f, st, jnp.int32(50))
            float(m[0].reshape(-1)[0])

        progs[f"{variant}_{name}"] = (short, long, lanes)

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
med = {k: statistics.median(v) for k, v in slopes.items()}
for k, v in med.items():
    print(f"  {k}: {v:.3f}")
for v in ("full", "nowrite", "noonehot", "maskonly"):
    print(f"{v}: single {med[v + '_s']:.3f} vs batched {med[v + '_b']:.3f} "
          f"(gap {med[v + '_b'] - med[v + '_s']:+.3f})")
