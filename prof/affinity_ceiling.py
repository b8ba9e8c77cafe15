"""480p affinity kernel: eff-TF/s vs same-window matmul ceiling (the
1080p-grade proof demanded by VERDICT r4 item 2).

All variants are slope-timed ((t_3N - t_N)/2N scans) and interleaved per
round in ONE process/window, so the numbers are comparable:

  * matmul_ceiling : 8192^3 bf16 XLA matmul — the window's achievable TF/s.
  * bare_floor     : the kernel's irreducible MXU work as plain XLA matmuls
                     (similarity (K*P_pad, C)@(C, P) + label aggregation
                     (D_pad, K*P_pad)@(K*P_pad, P)) with NO softmax/spatial —
                     a lower bound no legal kernel can beat.
  * kern_<blocks>  : the fused bank kernel at candidate (block_r, block_t).
  * kern_noskip    : default blocks with the far-tile skip disabled
                     (_TILESKIP_THRESH = inf at trace time) — quantifies the
                     skip's net effect at this geometry.

Also prints the analytic far-tile-skip engagement fraction at 480p
(dense sigma_1 = 8 slots; sparse sigma_2 = 21 never engages at 60 rows).

Reference semantics under test: src/model/predict.py:47-70.
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

# --- analytic skip engagement at this geometry ------------------------------
def skip_fraction(block_r, block_t):
    tm_rows = block_r / WD  # rows spanned by one bank tile
    n_r = -(-P // block_r)
    n_t = -(-P // block_t)
    tot = near = 0
    for sigma, is_dense in ((8.0, True), (21.0, False)):
        nslots = int(np.asarray(dense).sum()) if is_dense else K - int(np.asarray(dense).sum())
        inv = 1.0 / sigma**2
        for i in range(n_r):
            for j in range(n_t):
                r_lo, r_hi = i * block_r / WD, (i * block_r + block_r - 1) / WD
                t_lo, t_hi = j * block_t / WD, (j * block_t + block_t - 1) / WD
                gap = max(t_lo - r_hi, r_lo - t_hi, 0.0)
                tot += nslots
                if gap * gap * inv < ap._TILESKIP_THRESH:
                    near += nslots
    return 1.0 - near / tot


# --- build variants ----------------------------------------------------------
def make_kernel(block_r, block_t, thresh=None):
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

    old = ap._TILESKIP_THRESH
    if thresh is not None:
        ap._TILESKIP_THRESH = thresh

    @jax.jit
    def scan(bf, bl, t, idxs):
        def body(c, i):
            pred = ap.affinity_from_bank(
                bf, bl, t * (1.0 + 1e-6 * i.astype(jnp.float32)), slots,
                feature_hw=(HD, WD), temperature=1.0,
                valid=valid, dense=dense,
                block_r=block_r, block_t=block_t,
            )
            return c + jnp.sum(pred), None

        return jax.lax.scan(body, jnp.float32(0), idxs)[0]

    # trace now (so the thresh monkeypatch is captured), then restore
    i8 = jnp.arange(CHUNK, dtype=jnp.int32)
    i24 = jnp.arange(N_LONG, dtype=jnp.int32)
    short = lambda: float(scan(bank_f, bank_l, tgt, i8))
    long = lambda: float(scan(bank_f, bank_l, tgt, i24))
    short(); long()  # compile
    ap._TILESKIP_THRESH = old
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
    return short, long, 2 * n**3, 4  # flop per iter, iter delta


print("building variants ...", flush=True)
progs = {}
mm_s, mm_l, mm_flop, mm_d = make_matmul_probe()
progs["matmul_ceiling"] = (mm_s, mm_l, mm_d)
bf_s, bf_l = make_bare_floor()
progs["bare_floor"] = (bf_s, bf_l, N_LONG - CHUNK)
for br, bt in ((512, 512), (1024, 1024), (512, 1024), (1024, 512), (256, 512)):
    s, l = make_kernel(br, bt)
    progs[f"kern_{br}x{bt}"] = (s, l, N_LONG - CHUNK)
s, l = make_kernel(512, 512, thresh=float("inf"))
progs["kern_noskip_512x512"] = (s, l, N_LONG - CHUNK)

kern_flop = 2 * K * P * P * C + 2 * D_PAD * K * P * P  # sim + label agg
print(f"kernel MXU work: {kern_flop/1e9:.1f} GFLOP/frame", flush=True)
print(f"skip engagement (512,512): {skip_fraction(512,512)*100:.1f}% of "
      f"(tile,chunk,slot) numerator triples", flush=True)
print(f"skip engagement (1024,1024): {skip_fraction(1024,1024)*100:.1f}%", flush=True)

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
ceiling_ms = statistics.median(slopes["matmul_ceiling"])
ceiling_tf = mm_flop / (ceiling_ms * 1e-3) / 1e12
print(f"  matmul_ceiling: {ceiling_ms:.2f} ms -> {ceiling_tf:.1f} TF/s")
for k in progs:
    if k == "matmul_ceiling":
        continue
    ms = statistics.median(slopes[k])
    tf = kern_flop / (ms * 1e-3) / 1e12
    print(f"  {k}: {ms:.3f} ms/frame -> {tf:.1f} eff TF/s "
          f"({tf/ceiling_tf*100:.0f}% of window ceiling)")
