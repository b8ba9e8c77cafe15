"""BN-folded fast inference forward for the bottleneck VOSNets
(resnet50 / resnet101 / facebook).

The flax module (:mod:`semi_supervised_vos_tpu.models.vos_net`) is the
source of truth for training and checkpoints. At inference this module
replays the same math from a folded weight table
(:func:`semi_supervised_vos_tpu.models.fold.fold_vosnet`):

  * every conv+BN pair becomes conv+bias (no BN traffic);
  * every stride-1 block without a downsample branch (13 of 16: layer1_1..2,
    layer2_1..3, layer3_1..5, layer4_0..2) runs as a fused Pallas kernel
    (:mod:`semi_supervised_vos_tpu.ops.bottleneck_pallas`) whose bottleneck
    intermediates never leave VMEM — the dispatch lives in
    ``fast_encode.run_block`` (fused unless downsample/strided/too wide for
    one VMEM row strip);
  * the rest (stem, the four stage-entry blocks, head) uses the MXU-native
    shifted-matmul convolution (``models/resnet.py``).

Equivalence with ``VOSNet.apply(train=False)`` is pinned by
``tests/test_infer_fast.py``.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from semi_supervised_vos_tpu.models.resnet import conv_matmul
from semi_supervised_vos_tpu.ops.bottleneck_pallas import (
    _pick_strip,
    bottleneck_stack,
)

def _conv1x1(x, kernel, bias, stride: int = 1):
    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    y = x @ kernel.reshape(cin, cout).astype(x.dtype)
    return y + bias.astype(x.dtype)


def _basic_block(x, t: Dict, name: str, stride: int, downsample: bool):
    """Folded BasicBlock (resnet18): 3x3 — 3x3 + residual
    (``models/resnet.py::BasicBlock``). No Pallas fusing — the fused kernel
    is shaped for the 1x1-3x3-1x1 bottleneck; folding + matmul convs alone
    already removes the eager-BN traffic."""
    y = conv_matmul(x, t[f"{name}/conv1/kernel"], stride, 1)
    y = nn.relu(y + t[f"{name}/conv1/bias"].astype(y.dtype))
    y = conv_matmul(y, t[f"{name}/conv2/kernel"], 1, 1)
    y = y + t[f"{name}/conv2/bias"].astype(y.dtype)
    if downsample:
        residual = _conv1x1(
            x, t[f"{name}/downsample/kernel"], t[f"{name}/downsample/bias"], stride
        )
    else:
        residual = x
    return nn.relu(y + residual)


def _bottleneck(x, t: Dict, name: str, stride: int, downsample: bool):
    y = nn.relu(_conv1x1(x, t[f"{name}/conv1/kernel"], t[f"{name}/conv1/bias"]))
    y = conv_matmul(y, t[f"{name}/conv2/kernel"], stride, 1)
    y = nn.relu(y + t[f"{name}/conv2/bias"].astype(y.dtype))
    y = _conv1x1(y, t[f"{name}/conv3/kernel"], t[f"{name}/conv3/bias"])
    if downsample:
        residual = _conv1x1(
            x, t[f"{name}/downsample/kernel"], t[f"{name}/downsample/bias"], stride
        )
    else:
        residual = x
    return nn.relu(y + residual)


# stage widths of each VOSNet variant (models/resnet.py:247-264,
# vos_net.py:32-49); strides are (1, 2, 1, 1) for the stride-8 VOS topology
ARCH_PLANES = {
    "resnet18": (64, 128, 256, 256),
    "resnet50": (64, 128, 256, 256),
    "resnet101": (64, 128, 256, 256),
    "facebook": (64, 128, 256, 512),
}


def fast_encode(
    table: Dict,
    x,
    dtype=jnp.bfloat16,
    use_fused_stack: bool = True,
    interpret: bool = False,
    arch: str = "resnet50",
):
    """Folded-weight bottleneck-VOSNet forward: (B, H, W, 3) normalised
    images → (B, H/8, W/8, 256) embeddings. ``arch`` selects the topology
    (resnet50 / resnet101 / the torchvision-shaped ``facebook`` variant).

    ``table`` (from :func:`semi_supervised_vos_tpu.models.fold.fold_vosnet`)
    must be passed as a jit ARGUMENT, never closed over — ~50 MB of weights
    as closure constants overflow this runtime's remote-compile payload
    limit.
    """
    from semi_supervised_vos_tpu.models.fold import ARCH_LAYERS

    basic = arch == "resnet18"

    def run_block(x, name, stride=1, downsample=False):
        if basic:
            return _basic_block(x, table, name, stride, downsample)
        # the fused kernel streams row strips whose working set must fit the
        # ~16 MB scoped VMEM (ops/bottleneck_pallas.py::_pick_strip); images
        # wider than one maximal strip cannot be row-stripped at all.
        # Strips of R < 2 are also excluded: wide-image geometries (bisected
        # at 1080p, layer1 W=480 — both the R=1 ring and an R=2/960-px-cap
        # experiment) reproducibly fault the TPU runtime when composed with
        # downstream fused blocks in one program, though isolated kernels
        # run correctly. The 856-px cap + this gate keep every production
        # geometry inside the proven envelope (all fused widths <= 428).
        # A TRANSPOSED-orientation dispatch exists for wide geometries (swap
        # H/W, swap the 3x3 dy/dx taps, transpose back — exact, pinned in
        # tests/test_bottleneck_pallas.py) but is OPT-IN
        # (SVOS_TRANSPOSED_STRIPS=1): at 1080p layer1 (transposed to
        # W'=270, R=3, 810-px strips) it too faulted the TPU worker when
        # composed into the full engine program (r3 bisect), and layer1
        # fusion is perf-irrelevant at 1080p anyway — the frame is ~95%
        # affinity-bound (85 of 88 ms; BASELINE.md ceiling analysis).
        if (
            downsample
            or stride != 1
            or not use_fused_stack
            # c > 1024 (facebook layer4) is an uncalibrated scoped-VMEM
            # geometry — stay on the matmul path there
            or x.shape[3] > 1024
        ):
            return _bottleneck(x, table, name, stride, downsample)
        blk = (
            table[f"{name}/conv1/kernel"], table[f"{name}/conv1/bias"],
            table[f"{name}/conv2/kernel"], table[f"{name}/conv2/bias"],
            table[f"{name}/conv3/kernel"], table[f"{name}/conv3/bias"],
        )
        import os

        c4 = x.shape[3] // 4
        h, w = x.shape[1], x.shape[2]
        if _pick_strip(h, w, x.shape[3], c4) >= 2:
            return bottleneck_stack(x, [blk], interpret=interpret)
        # Width-split dispatch for wide geometries (1080p layer1: W=480):
        # run the fused kernel on two overlapping halves in NATIVE
        # orientation. The 3x3 tap needs a 1-column halo; a 2-column halo is
        # used so each half's width w/2+2 stays EVEN (Mosaic rejects
        # odd-width strip reshapes: "unsupported shape cast"). Left half
        # sees [0, w/2+2) and keeps [0, w/2); right half sees [w/2-2, w)
        # and keeps [w/2, w). Exact (tests/test_bottleneck_pallas.py) —
        # but OPT-IN (SVOS_WSPLIT_STRIPS=1): like the transposed dispatch,
        # the (270, 242, C4=64) halves fault the TPU worker when composed
        # into the full 1080p engine program (r3 bisects; three distinct
        # layer1-shaped fused geometries now crash composed while layer2's
        # (135, 240, C4=128) runs — a Mosaic lowering bug to route around).
        # Perf context: 1080p is affinity-bound (61 of 85 ms), so the
        # matmul fallback costs ~13% there.
        # the halves' width w/2 + 2 must itself be EVEN (the invariant the
        # 2-column halo exists for), so the gate needs w % 4 == 0, not just
        # even w — w ≡ 2 (mod 4) would hand Mosaic odd-width halves
        half = w // 2
        if (
            os.environ.get("SVOS_WSPLIT_STRIPS", "0") == "1"
            and w % 4 == 0
            and _pick_strip(h, half + 2, x.shape[3], c4) >= 2
        ):
            left = bottleneck_stack(
                x[:, :, : half + 2], [blk], interpret=interpret
            )
            right = bottleneck_stack(
                x[:, :, half - 2 :], [blk], interpret=interpret
            )
            return jnp.concatenate([left[:, :, :half], right[:, :, 2:]], axis=2)
        if (
            os.environ.get("SVOS_TRANSPOSED_STRIPS", "0") == "1"
            and _pick_strip(x.shape[2], x.shape[1], x.shape[3], c4) >= 2
        ):
            w1, b1, w2, b2, w3, b3 = blk
            y = bottleneck_stack(
                jnp.transpose(x, (0, 2, 1, 3)),
                [(w1, b1, jnp.swapaxes(w2, 0, 1), b2, w3, b3)],
                interpret=interpret,
            )
            return jnp.transpose(y, (0, 2, 1, 3))
        return _bottleneck(x, table, name, stride, downsample)

    x = x.astype(dtype)
    x = conv_matmul(x, table["stem/kernel"], 2, 3)
    x = nn.relu(x + table["stem/bias"].astype(x.dtype))
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    # same stage walk as ResNetBackbone (models/resnet.py:280-294): the
    # stage-entry block has a downsample branch iff it strides or widens
    expansion = 1 if basic else 4
    inplanes = 64
    strides = (1, 2, 1, 1)
    for stage, (planes, blocks, stride) in enumerate(
        zip(ARCH_PLANES[arch], ARCH_LAYERS[arch], strides), start=1
    ):
        for b in range(blocks):
            s = stride if b == 0 else 1
            has_ds = b == 0 and (s != 1 or inplanes != planes * expansion)
            x = run_block(x, f"layer{stage}_{b}", s, has_ds)
            inplanes = planes * expansion

    if basic:
        return x  # bare truncated backbone, already 256-d (vos_net.py:63-65)
    if arch == "facebook":
        # BN-less 2048→1024 adjust_dim_0, then adjust_dim_1+bn256 folded
        # (vos_net.py:68-71; no ReLU between them)
        x = _conv1x1(x, table["head0/kernel"], table["head0/bias"])
    return _conv1x1(x, table["head/kernel"], table["head/bias"])


def build_fast_encoder(
    variables,
    dtype=jnp.bfloat16,
    use_fused_stack: bool = True,
    interpret: bool = False,
    arch: str = "resnet50",
):
    """Convenience closure over :func:`fast_encode` (tests / one-off use;
    engines pass the table as a jit argument instead)."""
    from semi_supervised_vos_tpu.models.fold import fold_vosnet

    table = fold_vosnet(variables, arch, dtype)

    def encode(x):
        return fast_encode(
            table, x, dtype=dtype, use_fused_stack=use_fused_stack,
            interpret=interpret, arch=arch,
        )

    return encode
