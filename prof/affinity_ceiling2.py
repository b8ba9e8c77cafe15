"""Decompose the 480p kernel's gap to the MXU floor (follow-up to
prof/affinity_ceiling.py, which measured kernel 2.55-2.66 ms vs bare floor
1.37 ms in a 194 TF/s window, with the far-tile skip engaging on 0.5% of
tiles — irrelevant at this geometry).

Variants (one window, interleaved, slope-timed):
  matmul_ceiling : window TF/s probe
  bare_floor     : sim + label-agg matmuls only (no softmax/prior)
  kern_512x512   : production default
  kern_1024x512  : the sweep's best-in-window candidate
  kern_noprior   : spatial=False — the SAME online softmax minus the
                   Gaussian prior chain (dy/dx/exp/e*w). kern - noprior =
                   the prior's true cost; noprior - floor = softmax VPU cost.
"""
import statistics
import time

import numpy as np

from semi_supervised_vos_tpu.utils.runtime import setup_backend

setup_backend()

import jax
import jax.numpy as jnp

from semi_supervised_vos_tpu.core.sampling import sample_frames
from semi_supervised_vos_tpu.ops import affinity_pallas as ap

HD, WD, C, K, CAP = 60, 107, 256, 9, 45
P = HD * WD
D_PAD = 24
CHUNK, N_LONG = 8, 24
FRAME_IDX = 50

rng = np.random.default_rng(0)
idx, valid, dense = sample_frames(FRAME_IDX, 40, K)
slots = jnp.asarray(np.asarray(idx) % CAP)


def make_kernel(block_r, block_t, spatial=True):
    p_pad = -(-P // block_r) * block_r
    bank_f = jnp.asarray(
        rng.standard_normal((CAP, p_pad, C)) * 0.2, jnp.bfloat16
    )
    bank_l = jnp.zeros((CAP, p_pad, D_PAD), jnp.bfloat16)
    cls = rng.integers(0, 22, size=(CAP, P))
    bank_l = bank_l.at[
        jnp.arange(CAP)[:, None], jnp.arange(P)[None, :], jnp.asarray(cls)
    ].set(1.0)
    tgt = jnp.asarray(rng.standard_normal((P, C)) * 0.2, jnp.float32)

    @jax.jit
    def scan(bf, bl, t, idxs):
        def body(c, i):
            pred = ap.affinity_from_bank(
                bf, bl, t * (1.0 + 1e-6 * i.astype(jnp.float32)), slots,
                feature_hw=(HD, WD), temperature=1.0,
                valid=valid, dense=dense, spatial=spatial,
                block_r=block_r, block_t=block_t,
            )
            return c + jnp.sum(pred), None

        return jax.lax.scan(body, jnp.float32(0), idxs)[0]

    i8 = jnp.arange(CHUNK, dtype=jnp.int32)
    i24 = jnp.arange(N_LONG, dtype=jnp.int32)
    short = lambda: float(scan(bank_f, bank_l, tgt, i8))
    long = lambda: float(scan(bank_f, bank_l, tgt, i24))
    short(); long()
    return short, long


def make_bare_floor():
    kp = K * (-(-P // 512) * 512)
    ref = jnp.asarray(rng.standard_normal((kp, C)) * 0.2, jnp.bfloat16)
    lab = jnp.asarray(rng.standard_normal((D_PAD, kp)) * 0.2, jnp.bfloat16)
    tgt = jnp.asarray(rng.standard_normal((C, P)) * 0.2, jnp.bfloat16)

    @jax.jit
    def scan(r, l, t, idxs):
        def body(c, i):
            s = jnp.dot(
                r, t * (1.0 + 1e-6 * i.astype(jnp.float32)).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            o = jnp.dot(l, s.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            return c + jnp.sum(o), None

        return jax.lax.scan(body, jnp.float32(0), idxs)[0]

    i8 = jnp.arange(CHUNK, dtype=jnp.int32)
    i24 = jnp.arange(N_LONG, dtype=jnp.int32)
    short = lambda: float(scan(ref, lab, tgt, i8))
    long = lambda: float(scan(ref, lab, tgt, i24))
    short(); long()
    return short, long


def make_matmul_probe():
    n = 8192
    a = jnp.asarray(rng.standard_normal((n, n)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)) * 0.1, jnp.bfloat16)

    @jax.jit
    def scan(a_, b_, idxs):
        def body(c, i):
            o = jnp.dot(
                a_ * (1.0 + 1e-6 * i.astype(jnp.float32)).astype(jnp.bfloat16),
                b_, preferred_element_type=jnp.float32,
            )
            return c + jnp.sum(o), None

        return jax.lax.scan(body, jnp.float32(0), idxs)[0]

    i2 = jnp.arange(2, dtype=jnp.int32)
    i6 = jnp.arange(6, dtype=jnp.int32)
    short = lambda: float(scan(a, b, i2))
    long = lambda: float(scan(a, b, i6))
    short(); long()
    return short, long, 2 * n**3, 4


print("building variants ...", flush=True)
progs = {}
mm_s, mm_l, mm_flop, mm_d = make_matmul_probe()
progs["matmul_ceiling"] = (mm_s, mm_l, mm_d)
bf_s, bf_l = make_bare_floor()
progs["bare_floor"] = (bf_s, bf_l, N_LONG - CHUNK)
s, l = make_kernel(512, 512)
progs["kern_512x512"] = (s, l, N_LONG - CHUNK)
s, l = make_kernel(1024, 512)
progs["kern_1024x512"] = (s, l, N_LONG - CHUNK)
s, l = make_kernel(512, 512, spatial=False)
progs["kern_noprior"] = (s, l, N_LONG - CHUNK)

slopes = {k: [] for k in progs}
for r in range(8):
    for k, (short, long, denom) in progs.items():
        t0 = time.perf_counter(); short(); ts = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter(); long(); tl = (time.perf_counter() - t0) * 1e3
        if r > 0:
            slopes[k].append((tl - ts) / denom)
    if r > 0:
        print(f"round {r}: " + " | ".join(
            f"{k} {slopes[k][-1]:.3f}" for k in progs), flush=True)

print("\nmedians (ms/iter):")
med = {k: statistics.median(v) for k, v in slopes.items()}
ceiling_tf = mm_flop / (med["matmul_ceiling"] * 1e-3) / 1e12
print(f"  matmul_ceiling: {med['matmul_ceiling']:.2f} ms -> {ceiling_tf:.1f} TF/s")
for k in progs:
    if k != "matmul_ceiling":
        print(f"  {k}: {med[k]:.3f} ms/frame")
print(f"\nprior cost (kern - noprior): {med['kern_512x512'] - med['kern_noprior']:+.3f} ms")
print(f"softmax cost (noprior - floor): {med['kern_noprior'] - med['bare_floor']:+.3f} ms")
