"""VOSNet: stride-8 backbone + 256-d embedding head.

Reference ``/root/reference/src/model/vos_net.py:9-54``:
  * ``resnet18``: bare truncated backbone (ends at 256 channels already);
  * ``resnet50``/``resnet101``: backbone (1024 ch) → 1x1 conv ``adjust_dim``
    to 256 → BatchNorm ``bn256``;
  * ``facebook``: torchvision-shaped resnet50 (swsl weights) with layer3/4
    strides patched to 1, then 2048 → 1024 → 256 1x1 convs → ``bn256``.

The torch.hub download of swsl weights is replaced by offline checkpoint
conversion (:mod:`semi_supervised_vos_tpu.models.convert`); architecture
parity is kept so converted weights drop in.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from semi_supervised_vos_tpu.models.resnet import (
    ConvTorchPad,
    ResNetBackbone,
    _bn,
    resnet18,
    resnet50,
    resnet101,
)

MODEL_NAMES = ("resnet18", "resnet50", "resnet101", "facebook")


def _build_backbone(model: str, dtype) -> ResNetBackbone:
    if model == "resnet18":
        return resnet18(dtype=dtype)
    if model == "resnet50":
        return resnet50(dtype=dtype)
    if model == "resnet101":
        return resnet101(dtype=dtype)
    if model == "facebook":
        # torchvision-shaped ResNet-50 (stage widths 64/128/256/512) with
        # layer3 and layer4 forced to stride 1 (vos_net.py:32-35).
        return ResNetBackbone(
            block="bottleneck",
            layers=(3, 4, 6, 3),
            stage_planes=(64, 128, 256, 512),
            stage_strides=(1, 2, 1, 1),
            dtype=dtype,
        )
    raise NotImplementedError(f"unknown model {model!r}")


class VOSNet(nn.Module):
    """256-d per-pixel embedding network, NHWC.

    Call with (B, H, W, 3) images; returns (B, ceil(H/8), ceil(W/8), 256).
    """

    model: str = "resnet50"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = _build_backbone(self.model, self.dtype).copy(name="backbone")(x, train)
        if self.model in ("resnet50", "resnet101"):
            x = ConvTorchPad(256, 1, 1, 0, self.dtype, name="adjust_dim")(x)
            x = _bn(self.dtype, "bn256")(x, use_running_average=not train)
        elif self.model == "facebook":
            x = ConvTorchPad(1024, 1, 1, 0, self.dtype, name="adjust_dim_0")(x)
            x = ConvTorchPad(256, 1, 1, 0, self.dtype, name="adjust_dim_1")(x)
            x = _bn(self.dtype, "bn256")(x, use_running_average=not train)
        return x

    def frozen_backbone_mask(self, params) -> dict:
        """Pytree mask: True for trainable params when the feature extractor
        is frozen (reference ``vos_net.py:53-54`` + ``train.py:124-128`` —
        only the head trains)."""
        import jax

        return jax.tree_util.tree_map_with_path(
            lambda path, _: not any(
                getattr(k, "key", None) == "backbone" for k in path
            ),
            params,
        )
