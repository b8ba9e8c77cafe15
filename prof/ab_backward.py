"""dW-vs-dX split of the training conv backward (VERDICT r4 item 5).

The r4 ceiling writeup pinned the training hot path as the backbone
backward: ~118 ms of the 188 ms device step, ~64 TF/s vs the 110 TF/s
window matmul ceiling (BASELINE.md training row). This script attributes
that 118 ms to the two conv-grad kernels — dW (filter grad) and dX (input
grad) — per conv geometry, so exactly one lever can be aimed at the
offender.

Method: every distinct conv geometry of the ResNet-50 VOS backbone at the
training shape (B = bs*frames = 160, 256^2 crops -> stem 128^2, layer1 64^2,
layers 2-4 @ 32^2 stride-8 topology, reference resnet.py:111-112) is
slope-timed ((t_3N - t_N)/2N scans, same window, interleaved) for:
  fwd : conv_general_dilated forward
  dX  : vjp w.r.t. the input only
  dW  : vjp w.r.t. the filter only
Totals are count-weighted. A matmul ceiling probe runs in the same window
so eff-TF/s are comparable with BASELINE.md.

Lever (exactly one, per the verdict): the offender geometry re-measured
with the batch axis split in two sequential halves (remat-style scan over
microbatches) — if XLA's grad kernel is tiling-bound at B=160, halving the
batch changes its tile choice; a negative result closes the question.
"""
import statistics
import time

import numpy as np

from semi_supervised_vos_tpu.utils.runtime import setup_backend

setup_backend()

import jax
import jax.numpy as jnp

B = 160
DTYPE = jnp.bfloat16

# (name, H_in, Cin, Cout, k, stride, count) — VOS ResNet-50 at 256^2 crops.
# H_out = H_in/stride. Stem runs as the s2d matmul in training too only for
# inference compiles; the differentiated forward uses the native lax conv
# (models/resnet.py grad_conv_impl), measured here as 7x7 s2.
GEOMS = [
    ("stem7x7s2", 256, 3, 64, 7, 2, 1),
    ("l1_1x1_64_64", 64, 64, 64, 1, 1, 1),
    ("l1_3x3_64", 64, 64, 64, 3, 1, 3),
    ("l1_1x1_64_256", 64, 64, 256, 1, 1, 3),
    ("l1_1x1_256_64", 64, 256, 64, 1, 1, 2),
    ("l1_ds_64_256", 64, 64, 256, 1, 1, 1),
    ("l2_1x1_256_128", 64, 256, 128, 1, 1, 1),
    ("l2_3x3_128_s2", 64, 128, 128, 3, 2, 1),
    ("l2_ds_256_512_s2", 64, 256, 512, 1, 2, 1),
    ("l2_1x1_128_512", 32, 128, 512, 1, 1, 4),
    ("l2_1x1_512_128", 32, 512, 128, 1, 1, 3),
    ("l2_3x3_128", 32, 128, 128, 3, 1, 3),
    ("l3_1x1_512_256", 32, 512, 256, 1, 1, 1),
    ("l3_3x3_256", 32, 256, 256, 3, 1, 9),  # layer3 x6 + layer4 x3
    ("l3_1x1_256_1024", 32, 256, 1024, 1, 1, 9),
    ("l3_1x1_1024_256", 32, 1024, 256, 1, 1, 8),  # l3 b1-5 + l4 all + adjust
    ("l3_ds_512_1024", 32, 512, 1024, 1, 1, 1),
    ("l4_ds_1024_1024", 32, 1024, 1024, 1, 1, 1),
]

rng = np.random.default_rng(0)


def conv(x, w, stride, k):
    pad = (k - 1) // 2 if k > 1 else 0
    if k == 7:
        pad = 3
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def make_progs(h, cin, cout, k, stride):
    x = jnp.asarray(rng.standard_normal((B, h, h, cin)) * 0.1, DTYPE)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1, DTYPE)
    h_out = h // stride
    g = jnp.asarray(rng.standard_normal((B, h_out, h_out, cout)) * 0.1, jnp.float32)

    def fwd_fn(x_, w_):
        return conv(x_, w_, stride, k)

    @jax.jit
    def scan_fwd(x_, w_, idxs):
        def body(c, i):
            o = fwd_fn(x_ * (1 + 1e-6 * i.astype(jnp.float32)).astype(DTYPE), w_)
            return c + jnp.sum(o), None
        return jax.lax.scan(body, jnp.float32(0), idxs)[0]

    @jax.jit
    def scan_dx(x_, w_, g_, idxs):
        def body(c, i):
            _, vjp = jax.vjp(lambda xx: fwd_fn(xx, w_), x_)
            (dx,) = vjp(g_ * (1 + 1e-6 * i.astype(jnp.float32)))
            return c + jnp.sum(dx.astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0), idxs)[0]

    @jax.jit
    def scan_dw(x_, w_, g_, idxs):
        def body(c, i):
            _, vjp = jax.vjp(lambda ww: fwd_fn(x_, ww), w_)
            (dw,) = vjp(g_ * (1 + 1e-6 * i.astype(jnp.float32)))
            return c + jnp.sum(dw.astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0), idxs)[0]

    i_s = jnp.arange(2, dtype=jnp.int32)
    i_l = jnp.arange(6, dtype=jnp.int32)
    flop = 2 * B * h_out * h_out * cin * cout * k * k
    return {
        "fwd": (lambda: float(scan_fwd(x, w, i_s)), lambda: float(scan_fwd(x, w, i_l))),
        "dx": (lambda: float(scan_dx(x, w, g, i_s)), lambda: float(scan_dx(x, w, g, i_l))),
        "dw": (lambda: float(scan_dw(x, w, g, i_s)), lambda: float(scan_dw(x, w, g, i_l))),
    }, flop


def make_matmul_probe():
    n = 8192
    a = jnp.asarray(rng.standard_normal((n, n)) * 0.1, DTYPE)
    b = jnp.asarray(rng.standard_normal((n, n)) * 0.1, DTYPE)

    @jax.jit
    def scan(a_, b_, idxs):
        def body(c, i):
            o = jnp.dot(a_ * (1 + 1e-6 * i.astype(jnp.float32)).astype(DTYPE), b_,
                        preferred_element_type=jnp.float32)
            return c + jnp.sum(o), None
        return jax.lax.scan(body, jnp.float32(0), idxs)[0]

    i2 = jnp.arange(2, dtype=jnp.int32)
    i6 = jnp.arange(6, dtype=jnp.int32)
    return (lambda: float(scan(a, b, i2)), lambda: float(scan(a, b, i6))), 2 * n**3


def slope(prog, rounds=5):
    short, long = prog
    short(); long()  # compile
    vals = []
    for r in range(rounds):
        t0 = time.perf_counter(); short(); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); long(); tl = time.perf_counter() - t0
        vals.append((tl - ts) / 4 * 1e3)  # ms per iteration
    return statistics.median(vals)


print("compiling + timing matmul ceiling ...", flush=True)
mm_prog, mm_flop = make_matmul_probe()
mm_ms = slope(mm_prog)
ceiling_tf = mm_flop / (mm_ms * 1e-3) / 1e12
print(f"matmul ceiling: {mm_ms:.2f} ms -> {ceiling_tf:.1f} TF/s", flush=True)

rows = []
tot = {"fwd": 0.0, "dx": 0.0, "dw": 0.0}
for name, h, cin, cout, k, stride, count in GEOMS:
    progs, flop = make_progs(h, cin, cout, k, stride)
    ms = {p: slope(pr) for p, pr in progs.items()}
    for p in tot:
        tot[p] += ms[p] * count
    tf = {p: flop / (ms[p] * 1e-3) / 1e12 for p in ms}
    rows.append((name, count, flop, ms, tf))
    print(
        f"{name:20s} x{count}: fwd {ms['fwd']:6.2f} ms ({tf['fwd']:5.1f} TF/s) | "
        f"dX {ms['dx']:6.2f} ({tf['dx']:5.1f}) | dW {ms['dw']:6.2f} ({tf['dw']:5.1f})",
        flush=True,
    )

print(
    f"\nTOTALS (count-weighted): fwd {tot['fwd']:.1f} ms | "
    f"dX {tot['dx']:.1f} ms | dW {tot['dw']:.1f} ms | "
    f"bwd sum {tot['dx']+tot['dw']:.1f} ms (BASELINE r4: backward ~118 ms)",
    flush=True,
)

# --- the one lever: microbatch the offender ---------------------------------
# Pick the geometry with the largest count-weighted backward deficit
# (time - flop/ceiling) and re-run its worse grad with B split in half,
# scanned sequentially (2 microbatches). If the 64 TF/s figure is a tiling
# artifact of B=160, the half-batch tiles differently.
def deficit(row):
    name, count, flop, ms, tf = row
    floor = flop / (ceiling_tf * 1e12) * 1e3
    return count * (ms["dx"] + ms["dw"] - 2 * floor)

off = max(rows, key=deficit)
name, count, flop, ms, tf = off
worst = "dx" if ms["dx"] > ms["dw"] else "dw"
print(f"\noffender: {name} ({worst}, {ms[worst]:.2f} ms x{count})", flush=True)

idx = [g[0] for g in GEOMS].index(name)
_, h, cin, cout, k, stride, _ = GEOMS[idx]
x = jnp.asarray(rng.standard_normal((B, h, h, cin)) * 0.1, DTYPE)
w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1, DTYPE)
h_out = h // stride
g = jnp.asarray(rng.standard_normal((B, h_out, h_out, cout)) * 0.1, jnp.float32)


@jax.jit
def scan_half(x_, w_, g_, idxs):
    xh = x_.reshape(2, B // 2, h, h, cin)
    gh = g_.reshape(2, B // 2, h_out, h_out, cout)

    def body(c, i):
        def inner(cc, xg):
            xx, gg = xg
            if worst == "dx":
                _, vjp = jax.vjp(lambda a: conv(a, w_, stride, k), xx)
                (d,) = vjp(gg * (1 + 1e-6 * i.astype(jnp.float32)))
            else:
                _, vjp = jax.vjp(lambda a: conv(xx, a, stride, k), w_)
                (d,) = vjp(gg * (1 + 1e-6 * i.astype(jnp.float32)))
            return cc + jnp.sum(d.astype(jnp.float32)), None

        s, _ = jax.lax.scan(inner, jnp.float32(0), (xh, gh))
        return c + s, None

    return jax.lax.scan(body, jnp.float32(0), idxs)[0]


i2 = jnp.arange(2, dtype=jnp.int32)
i6 = jnp.arange(6, dtype=jnp.int32)
half_ms = slope((lambda: float(scan_half(x, w, g, i2)),
                 lambda: float(scan_half(x, w, g, i6))))
print(
    f"lever (2 sequential half-batches): {half_ms:.2f} ms vs {ms[worst]:.2f} ms "
    f"({'WIN' if half_ms < ms[worst] * 0.95 else 'negative result'})",
    flush=True,
)
