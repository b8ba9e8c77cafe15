"""dW-vs-dX split of the training conv backward (VERDICT r4 item 5).

The r4 ceiling writeup pinned the training hot path as the backbone
backward: ~118 ms of the 188 ms device step. This script attributes that to
the two conv-grad kernels — dW (filter grad) and dX (input grad) — per conv
geometry, so exactly one lever can be aimed at the offender.

Methodology note (first attempt was WRONG): perturbing the varying operand
with a scalar multiply `x*(1+eps*i)` lets XLA hoist the conv out of the
scan (convs are linear; the algebraic simplifier moves scalar multiplies
across them) — measured "360 TF/s" on a 197 TF/s v5e chip. Here every
iteration's varying operand is a LOOP CARRY whose single element [0,...]
is updated from the previous iteration's result: a data dependence no
simplifier can remove, at the cost of one in-place one-element DUS.

Each geometry of the VOS ResNet-50 at the training shape (B = bs*frames =
160, 256^2 crops -> stem 128^2, layer1 64^2, layers 2-4 @ 32^2 stride-8
topology, reference resnet.py:111-112) is slope-timed ((t_6 - t_2)/4
scans, same window, interleaved rounds) for fwd / dX / dW. Convs use
preferred_element_type=bf16 exactly like the model (models/resnet.py:215).

Lever (exactly one, per the verdict): the worst count-weighted backward
geometry re-measured with the batch split in two sequential halves
(remat-style microbatching) — if XLA's grad kernel is tiling-bound at
B=160, half-batch tiles differently; a negative result closes the question.
"""
import functools
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
    # preferred_element_type matches the model's convs (resnet.py:215)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=DTYPE,
    )


def _feedback(d):
    """A scalar derived from the result, scaled to vanish numerically —
    the data dependence that pins every iteration to the previous one.

    The optimization barrier is load-bearing: without it, reading one
    element lets XLA dead-code-slice the producing conv/matmul down to
    that element's slice (measured: the 8192^3 matmul probe collapsed to
    0.01 ms/iter = a single dot-product row). The barrier forces the full
    result to exist; its own cost is nil (the op writes the buffer anyway)."""
    d = jax.lax.optimization_barrier(d)
    return (d.reshape(-1)[0].astype(jnp.float32) * 1e-24).astype(DTYPE)


def make_progs(h, cin, cout, k, stride):
    x = jnp.asarray(rng.standard_normal((B, h, h, cin)) * 0.1, DTYPE)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1, DTYPE)
    h_out = h // stride
    g = jnp.asarray(rng.standard_normal((B, h_out, h_out, cout)) * 0.1, DTYPE)

    @functools.partial(jax.jit, static_argnums=(2,))
    def scan_fwd(x_, w_, n):
        def body(xc, _):
            o = conv(xc, w_, stride, k)
            return xc.at[0, 0, 0, 0].add(_feedback(o)), None

        xf, _ = jax.lax.scan(body, x_, None, length=n)
        return jnp.sum(xf[0, 0, 0, :8].astype(jnp.float32))

    @functools.partial(jax.jit, static_argnums=(3,))
    def scan_dx(x_, w_, g_, n):
        def body(gc, _):
            _, vjp = jax.vjp(lambda a: conv(a, w_, stride, k), x_)
            (dx,) = vjp(gc)
            return gc.at[0, 0, 0, 0].add(_feedback(dx)), None

        gf, _ = jax.lax.scan(body, g_, None, length=n)
        return jnp.sum(gf[0, 0, 0, :8].astype(jnp.float32))

    @functools.partial(jax.jit, static_argnums=(3,))
    def scan_dw(x_, w_, g_, n):
        def body(gc, _):
            _, vjp = jax.vjp(lambda a: conv(x_, a, stride, k), w_)
            (dw,) = vjp(gc)
            return gc.at[0, 0, 0, 0].add(_feedback(dw)), None

        gf, _ = jax.lax.scan(body, g_, None, length=n)
        return jnp.sum(gf[0, 0, 0, :8].astype(jnp.float32))

    flop = 2 * B * h_out * h_out * cin * cout * k * k
    # scan lengths sized so the long-short compute delta is ~300 ms at an
    # assumed ~80 TF/s — the per-dispatch RPC jitter here is tens of ms, so
    # a fixed tiny delta (first attempt: 4 iterations = 0.4-22 ms) drowns
    # and slopes go negative
    n_diff = max(8, int(0.3 / (flop / 80e12)))
    n_short = max(2, n_diff // 4)
    n_long = n_short + n_diff
    return {
        "fwd": (lambda: float(scan_fwd(x, w, n_short)),
                lambda: float(scan_fwd(x, w, n_long))),
        "dx": (lambda: float(scan_dx(x, w, g, n_short)),
               lambda: float(scan_dx(x, w, g, n_long))),
        "dw": (lambda: float(scan_dw(x, w, g, n_short)),
               lambda: float(scan_dw(x, w, g, n_long))),
    }, flop, n_diff


def make_matmul_probe():
    n = 8192
    a = jnp.asarray(rng.standard_normal((n, n)) * 0.1, DTYPE)
    b = jnp.asarray(rng.standard_normal((n, n)) * 0.1, DTYPE)

    @functools.partial(jax.jit, static_argnums=(2,))
    def scan(a_, b_, n_):
        def body(ac, _):
            o = jnp.dot(ac, b_, preferred_element_type=jnp.float32)
            return ac.at[0, 0].add(_feedback(o)), None

        af, _ = jax.lax.scan(body, a_, None, length=n_)
        return jnp.sum(af[0, :8].astype(jnp.float32))

    flop = 2 * n**3
    n_diff = max(8, int(0.3 / (flop / 80e12)))
    n_short = max(2, n_diff // 4)
    return (
        lambda: float(scan(a, b, n_short)),
        lambda: float(scan(a, b, n_short + n_diff)),
    ), flop, n_diff


def slope(prog, n_diff, rounds=5):
    short, long = prog
    short(); long()  # compile
    vals = []
    for r in range(rounds):
        t0 = time.perf_counter(); short(); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); long(); tl = time.perf_counter() - t0
        vals.append((tl - ts) / n_diff * 1e3)  # ms per iteration
    return statistics.median(vals)


print("compiling + timing matmul ceiling ...", flush=True)
mm_prog, mm_flop, mm_diff = make_matmul_probe()
mm_ms = slope(mm_prog, mm_diff)
ceiling_tf = mm_flop / (mm_ms * 1e-3) / 1e12
print(f"matmul ceiling: {mm_ms:.2f} ms -> {ceiling_tf:.1f} TF/s", flush=True)

rows = []
tot = {"fwd": 0.0, "dx": 0.0, "dw": 0.0}
for name, h, cin, cout, k, stride, count in GEOMS:
    progs, flop, n_diff = make_progs(h, cin, cout, k, stride)
    ms = {p: slope(pr, n_diff) for p, pr in progs.items()}
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
g = jnp.asarray(rng.standard_normal((B, h_out, h_out, cout)) * 0.1, DTYPE)


@functools.partial(jax.jit, static_argnums=(3,))
def scan_half(x_, w_, g_, n):
    xh = x_.reshape(2, B // 2, h, h, cin)

    def body(gc, _):
        gh = gc.reshape(2, B // 2, h_out, h_out, cout)

        def inner(cc, xg):
            xx, gg = xg
            if worst == "dx":
                _, vjp = jax.vjp(lambda a: conv(a, w_, stride, k), xx)
                (d,) = vjp(gg)
            else:
                _, vjp = jax.vjp(lambda a: conv(xx, a, stride, k), w_)
                (d,) = vjp(gg)
            return cc + _feedback(d).astype(jnp.float32), None

        s, _ = jax.lax.scan(inner, jnp.float32(0), (xh, gh))
        return gc.at[0, 0, 0, 0].add(s.astype(DTYPE) * 1), None

    gf, _ = jax.lax.scan(body, g_, None, length=n)
    return jnp.sum(gf[0, 0, 0, :8].astype(jnp.float32))


flop_off = 2 * B * h_out * h_out * cin * cout * k * k
nd_off = max(8, int(0.3 / (flop_off / 80e12)))
ns_off = max(2, nd_off // 4)
half_ms = slope((lambda: float(scan_half(x, w, g, ns_off)),
                 lambda: float(scan_half(x, w, g, ns_off + nd_off))), nd_off)
print(
    f"lever (2 sequential half-batches): {half_ms:.2f} ms vs {ms[worst]:.2f} ms "
    f"({'WIN' if half_ms < ms[worst] * 0.95 else 'negative result'})",
    flush=True,
)
