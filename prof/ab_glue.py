"""Isolate the batched engine's step-glue overhead (follow-up to
prof/ab_batched.py, which pinned the batched-vs-single 480p gap to the step
glue: residual = step - encode - affinity was 0.01 ms/lane-frame single vs
0.52 batched).

Interleaved two-length slope timings of three scanned programs per engine,
all on device-resident inputs, same window:

  prop   : propagate only (the affinity phase, for reference)
  adv    : propagate + onehot + bank write (the scan body minus encode/mask)
  write  : bank write only (pad + whole-slot DUS on the carried bank)

If `write` carries the difference, the 1.2 GB batched bank's carry/DUS is
the offender; if `adv - prop - write` does, it's the onehot/argmax glue.
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

st_s = eng.start_video(frames[0], label0)
st_b = beng.start_videos(frames_b[0], labels_b)
tgt_s = eng._encode(eng.enc_params, jax.device_put(frames[1]))
tgt_b = jax.jit(beng._encode)(beng.enc_params, jax.device_put(frames_b[1]))
float(jnp.sum(tgt_s.astype(jnp.float32)))
float(jnp.sum(tgt_b.astype(jnp.float32)))


def scan_factory(body):
    @jax.jit
    def scan(t, st, idxs):
        def b(carry, i):
            return body(t, carry, i)

        st, outs = jax.lax.scan(b, st, idxs)
        return jnp.float32(0) + outs.sum(), st

    return scan


# --- single-engine bodies ----------------------------------------------------
def s_prop(t, st, i):
    pred = eng._propagate(t, st, i, eng._wd, eng._ws)
    return st, jnp.sum(pred)


def s_adv(t, st, i):
    pred, st = eng._step_from_feats(t, st, i, eng._wd, eng._ws)
    return st, jnp.sum(pred)


def s_write(t, st, i):
    slot = i % cfg.capacity
    lab = index_to_onehot(
        (i + jnp.arange(eng.p)) % cfg.num_classes, cfg.num_classes, jnp.float32
    )
    from semi_supervised_vos_tpu.infer.engine import BankState

    st = BankState(
        feats=st.feats.at[slot].set(eng._pad_slot(t)),
        labels=st.labels.at[slot].set(
            eng._pad_slot(lab, eng.d_pad).astype(st.labels.dtype)
        ),
    )
    return st, jnp.float32(0)


# --- batched bodies ------------------------------------------------------------
def b_prop(t, st, i):
    pred = beng._propagate(t, st, i)
    return st, jnp.sum(pred)


def b_adv(t, st, i):
    pred, st = beng._advance_from_feats(t, st, i)
    return st, jnp.sum(pred)


def b_write(t, st, i):
    lab = index_to_onehot(
        (i + jnp.arange(beng.p))[None].repeat(B, 0) % cfg.num_classes,
        cfg.num_classes,
        jnp.float32,
    )
    st = beng._bank_write(st, i % cfg.capacity, t, lab)
    return st, jnp.float32(0)


i8 = jax.device_put(np.arange(50, 50 + CHUNK, dtype=np.int32))
i24 = jax.device_put(np.arange(50, 50 + N_LONG, dtype=np.int32))

progs = {}
for name, body, tgt, st0, lanes in (
    ("prop_s", s_prop, tgt_s, st_s, 1),
    ("adv_s", s_adv, tgt_s, st_s, 1),
    ("write_s", s_write, tgt_s, st_s, 1),
    ("prop_b", b_prop, tgt_b, st_b, B),
    ("adv_b", b_adv, tgt_b, st_b, B),
    ("write_b", b_write, tgt_b, st_b, B),
):
    scan = scan_factory(body)
    # carried state as runtime arg; fetch the scalar to sync (axon rule)
    progs[name] = (
        (lambda sc=scan, t=tgt, s=st0: float(sc(t, s, i8)[0])),
        (lambda sc=scan, t=tgt, s=st0: float(sc(t, s, i24)[0])),
        lanes,
    )

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
print(f"\nglue_s (adv - prop): {med['adv_s'] - med['prop_s']:.3f}")
print(f"glue_b (adv - prop): {med['adv_b'] - med['prop_b']:.3f}")
print(f"write_s: {med['write_s']:.3f}  write_b: {med['write_b']:.3f}")
