"""BatchNorm folding for inference.

At inference BN is an affine map per channel: ``y = (x - μ)·γ/√(σ²+ε) + β``.
Folding multiplies the preceding convolution's kernel by ``γ/√(σ²+ε)``
(output-channel-wise) and turns the rest into a bias — the BN op (and its
extra HBM round trip, when XLA fails to fuse it) disappears. The reference
never does this (torch modules run BN eagerly, ``vos_net.py:23``); it is a
pure inference-time optimisation with identical math.

Produces the flat weight table consumed by
:mod:`semi_supervised_vos_tpu.models.infer_fast`.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # torch BatchNorm2d default (models/resnet.py:_bn)


def fold_conv_bn(kernel, bn_params, bn_stats, eps: float = BN_EPS):
    """(kh, kw, cin, cout) kernel + BN params/stats → (kernel', bias')."""
    gamma = bn_params["scale"].astype(jnp.float32)
    beta = bn_params["bias"].astype(jnp.float32)
    mean = bn_stats["mean"].astype(jnp.float32)
    var = bn_stats["var"].astype(jnp.float32)
    inv_std = gamma / jnp.sqrt(var + eps)
    folded_kernel = kernel.astype(jnp.float32) * inv_std  # broadcast over cout
    bias = beta - mean * inv_std
    return folded_kernel, bias


def _block_names(layers) -> list:
    names = []
    for stage, blocks in enumerate(layers, start=1):
        names.extend(f"layer{stage}_{b}" for b in range(blocks))
    return names


# blocks per stage of each VOSNet variant (vos_net.py:32-49)
ARCH_LAYERS = {
    "resnet18": (2, 2, 2, 2),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "facebook": (3, 4, 6, 3),
}


def fold_vosnet(
    variables, model: str = "resnet50", dtype=jnp.bfloat16
) -> Dict[str, jnp.ndarray]:
    """Fold every conv+BN pair of a VOSNet into (kernel, bias).

    Returns a flat dict: ``stem/kernel``, ``stem/bias``,
    ``<block>/{conv1,conv2[,conv3],downsample}/{kernel,bias}`` (conv3 for
    bottleneck variants only), and the head — ``head/{kernel,bias}``
    (adjust_dim + bn256; absent for resnet18, whose backbone already ends at
    256 channels, ``vos_net.py:63-65``); the ``facebook`` variant
    additionally carries ``head0`` for its BN-less 2048→1024 ``adjust_dim_0``
    (``vos_net.py:68-71``; its bias is zero). Kernels are cast to ``dtype``;
    biases stay f32.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    bb_p, bb_s = params["backbone"], stats["backbone"]
    out: Dict[str, jnp.ndarray] = {}

    def put(name, kernel, bias):
        out[f"{name}/kernel"] = kernel.astype(dtype)
        out[f"{name}/bias"] = bias.astype(jnp.float32)

    k, b = fold_conv_bn(bb_p["conv1"]["conv"]["kernel"], bb_p["bn1"], bb_s["bn1"])
    put("stem", k, b)

    convs = (("conv1", "bn1"), ("conv2", "bn2"))
    if model != "resnet18":
        convs += (("conv3", "bn3"),)
    for name in _block_names(ARCH_LAYERS[model]):
        blk_p, blk_s = bb_p[name], bb_s[name]
        for conv, bn in convs:
            k, b = fold_conv_bn(
                blk_p[conv]["conv"]["kernel"], blk_p[bn], blk_s[bn]
            )
            put(f"{name}/{conv}", k, b)
        if "downsample_conv" in blk_p:
            k, b = fold_conv_bn(
                blk_p["downsample_conv"]["conv"]["kernel"],
                blk_p["downsample_bn"],
                blk_s["downsample_bn"],
            )
            put(f"{name}/downsample", k, b)

    if model == "resnet18":
        return out  # bare truncated backbone, no head (vos_net.py:63-65)
    if model == "facebook":
        k0 = params["adjust_dim_0"]["conv"]["kernel"]
        put("head0", k0, jnp.zeros((k0.shape[-1],), jnp.float32))
        k, b = fold_conv_bn(
            params["adjust_dim_1"]["conv"]["kernel"],
            params["bn256"],
            stats["bn256"],
        )
    else:
        k, b = fold_conv_bn(
            params["adjust_dim"]["conv"]["kernel"], params["bn256"], stats["bn256"]
        )
    put("head", k, b)
    return out


def fold_vosnet_resnet50(variables, dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Back-compat alias for :func:`fold_vosnet` with ``model='resnet50'``."""
    return fold_vosnet(variables, "resnet50", dtype)
