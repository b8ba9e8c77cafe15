"""BN-folded fast inference forward for the bottleneck VOSNets
(resnet50 / resnet101 / facebook).

The flax module (:mod:`semi_supervised_vos_tpu.models.vos_net`) is the
source of truth for training and checkpoints. At inference this module
replays the same math from a folded weight table
(:func:`semi_supervised_vos_tpu.models.fold.fold_vosnet`):

  * every conv+BN pair becomes conv+bias (no BN traffic);
  * wide stride-1 blocks without a downsample branch and C in [512, 1024]
    (11 of 16: layer2_1..3, layer3_1..5, layer4_0..2) run as a fused Pallas
    kernel (:mod:`semi_supervised_vos_tpu.ops.bottleneck_pallas`) whose
    bottleneck intermediates never leave VMEM — the dispatch lives in
    ``fast_encode.run_block``;
  * everything else — the stem (7x7/s2, input channels zero-padded 3 -> 8),
    layer1 (C=256, where the fused kernel measured slower AND its wide
    geometries fault Mosaic when composed), the stage-entry blocks, the
    facebook C>1024 stage — lowers through XLA's native convolution
    (``_conv_native``; see its docstring for the on-chip measurements).
    The head stays a 1x1 matmul.

Equivalence with ``VOSNet.apply(train=False)`` is pinned by
``tests/test_infer_fast.py``.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
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


def _conv_native(x, kernel, stride: int = 1):
    """Spatial conv via XLA's native TPU lowering (torch-style symmetric
    padding). Measured on-chip at 480p, this beats both the shifted-matmul
    tap loop AND, at narrow-channel geometries, the fused VMEM kernel:
    layer1 bottleneck 0.09 ms (native) vs 0.27 (matmul taps) vs 0.32
    (fused); the strided layer2 entry 0.07 vs 0.46 (the stride-2 taps were
    the cost). The r2 matmul-conv redesign fixed the pathological tap loop
    but native conv was the stronger baseline for these stages all along —
    the fused stack still matches/wins at the wide stride-1 stages where
    its intermediates stay VMEM-resident."""
    pad = kernel.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        (stride, stride),
        [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _basic_block(x, t: Dict, name: str, stride: int, downsample: bool):
    """Folded BasicBlock (resnet18): 3x3 — 3x3 + residual
    (``models/resnet.py::BasicBlock``). No Pallas fusing — the fused kernel
    is shaped for the 1x1-3x3-1x1 bottleneck; folding + native convs alone
    already remove the eager-BN traffic."""
    y = _conv_native(x, t[f"{name}/conv1/kernel"], stride)
    y = nn.relu(y + t[f"{name}/conv1/bias"].astype(y.dtype))
    y = _conv_native(y, t[f"{name}/conv2/kernel"], 1)
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
    y = _conv_native(y, t[f"{name}/conv2/kernel"], stride)
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
        # Fused-kernel envelope: wide stride-1 bottlenecks with C >= 512,
        # whose row strips fit the ~16 MB scoped VMEM with R >= 2
        # (ops/bottleneck_pallas.py::_pick_strip). Everything else runs the
        # native-conv bottleneck, which on-chip measurement made the clear
        # choice outside that envelope:
        #   * narrow C (layer1, C=256): native 0.09 ms vs fused 0.32 vs
        #     matmul taps 0.27 at 480p — the fused kernel's VMEM residency
        #     doesn't pay at c4=64, and at 1080p its layer1-shaped
        #     geometries (R=1 strips, width-split halves, transposed
        #     orientation — all exact in isolation, pinned in
        #     tests/test_bottleneck_pallas.py) reproducibly fault the TPU
        #     worker when composed into the full engine program (r3
        #     bisects — a Mosaic lowering bug this gate routes around);
        #   * strided / downsample entries: the old stride-2 matmul taps
        #     were the cost (layer2_0: 0.46 -> 0.07 ms native);
        #   * C > 1024 (facebook layer4): uncalibrated scoped-VMEM geometry.
        if (
            downsample
            or stride != 1
            or not use_fused_stack
            or x.shape[3] < 512
            or x.shape[3] > 1024
        ):
            return _bottleneck(x, table, name, stride, downsample)
        blk = (
            table[f"{name}/conv1/kernel"], table[f"{name}/conv1/bias"],
            table[f"{name}/conv2/kernel"], table[f"{name}/conv2/bias"],
            table[f"{name}/conv3/kernel"], table[f"{name}/conv3/bias"],
        )
        c4 = x.shape[3] // 4
        h, w = x.shape[1], x.shape[2]
        if _pick_strip(h, w, x.shape[3], c4) >= 2:
            return bottleneck_stack(x, [blk], interpret=interpret)
        return _bottleneck(x, table, name, stride, downsample)

    x = x.astype(dtype)
    # stem: native 7x7/s2 conv with input channels zero-padded 3 -> 8 — the
    # C=3 layout is the pathology (measured 480p: 0.34 ms padded-native vs
    # 0.73 native vs 0.99 s2d-im2col vs ~42 ms stride-2 matmul taps);
    # padding channels hit zero kernel rows, so the result is exact
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 8 - x.shape[3])))
    k8 = jnp.pad(table["stem/kernel"], ((0, 0), (0, 0), (0, 5), (0, 0)))
    x = _conv_native(x, k8, 2)
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
