"""Flax ResNet backbones with the reference's VOS topology.

Reproduces ``/root/reference/src/model/backbone/resnet.py`` semantics, built
TPU-first: NHWC layout (XLA:TPU's native convolution layout), explicit
torch-style symmetric padding (so spatial sizes match torch exactly — XLA
``SAME`` pads asymmetrically for even inputs and would shift features), and
bf16-friendly compute dtype with f32 parameters.

Topology quirks kept from the reference:
  * layer3 AND layer4 run at stride 1 → overall stride 8
    (``resnet.py:111-112``), matching ``Config.SCALE = 0.125``;
  * layer4 is built with ``planes=256`` (not torchvision's 512), so a
    Bottleneck backbone ends at 1024 channels and — because
    ``inplanes == planes * expansion`` and stride == 1 — layer4's first block
    has **no downsample branch** (``resnet.py:124-131``);
  * torchvision-pretrained loading must drop ``layer4.*``/``fc.*`` keys
    (shape mismatch, ``resnet.py:194-199``) — handled in
    :mod:`semi_supervised_vos_tpu.models.convert`.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


# Convolution implementation selector, read at trace time:
#   "lax"    — XLA's native convolution;
#   "matmul" — kh·kw shifted matmuls (exact same math, MXU-native
#              formulation);
#   "auto"   — matmul on TPU, lax elsewhere (matmul compiles ~40x faster on
#              the remote-compile runtime — 18 s vs 678 s for the 480p
#              forward — at equal or better run time; the 7×7/s2 stem
#              dispatches to the space-to-depth form either way, see
#              _stem_conv_s2d).
# Conv implementation selector, read at TRACE time. A ContextVar (not a
# module global): concurrent traces — threaded prefetch triggering a jit
# retrace, async eval — each see their own value, and the conv_impl()
# context restores exactly what its own context saw.
_CONV_IMPL = contextvars.ContextVar("svos_conv_impl", default="auto")


def _auto_impl() -> str:
    import jax

    return "matmul" if jax.default_backend() == "tpu" else "lax"


def set_conv_impl(impl: str) -> None:
    assert impl in ("auto", "lax", "matmul"), impl
    _CONV_IMPL.set(impl)


def _conv_impl_now() -> str:
    v = _CONV_IMPL.get()
    if v != "auto":
        return v
    return _auto_impl()


@contextlib.contextmanager
def conv_impl(impl: str):
    """Temporarily pin the conv implementation (read at trace time)."""
    assert impl in ("auto", "lax", "matmul"), impl
    token = _CONV_IMPL.set(impl)
    try:
        yield
    finally:
        _CONV_IMPL.reset(token)


def grad_conv_impl() -> str:
    """Conv implementation for *differentiated* forwards (training/eval).

    The tap-loop matmul formulation wins on inference compiles (18 s vs
    678 s for the 480p forward on the remote-compile runtime) at equal run
    time, but its autodiff is pathological: the layer1 (64², 64-ch)
    backward alone measured ~2.9 s for a bs·T=160 step where XLA's native
    conv transpose runs the whole backbone fwd+bwd in 216 ms (~57% of the
    same-window matmul ceiling). Train-sized programs (256² crops) also
    compile fast natively (16 s), so under "auto" every differentiated
    forward uses lax; an explicit set_conv_impl choice is respected.
    """
    v = _CONV_IMPL.get()
    return v if v != "auto" else "lax"


def _stem_conv_s2d(x, kernel):
    """7×7 stride-2 conv (torch padding 3) as space-to-depth + ONE matmul.

    The generic tap-loop formulation is pathological for the ResNet stem:
    49 stride-2 slices of a (H, W, 3) array whose 3-channel minor dim
    defeats the (8, 128) TPU tiling — measured 42 ms/frame at 480p, ~16×
    the cost of the entire rest of ResNet-50. Here the padded image is
    space-to-depth'd by 2 (channels 3→12; the stride-2 becomes stride-1 and
    the zero-padded 8×8 kernel becomes 4×4), the 16 taps are concatenated
    into an im2col tensor, and the conv collapses to a single
    (H/2·W/2, 192) @ (192, 64) MXU matmul. Bit-comparable to the tap loop
    (same dtype/accumulation; tap order differs only in f32-sum order).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    h_out, w_out = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    ph, pw = 2 * h_out + 6, 2 * w_out + 6  # even padded extents
    xp = jnp.pad(x, ((0, 0), (3, ph - h - 3), (3, pw - w - 3), (0, 0)))
    xs = (
        xp.reshape(b, ph // 2, 2, pw // 2, 2, cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, ph // 2, pw // 2, 4 * cin)
    )
    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    ks = (
        k8.reshape(4, 2, 4, 2, cin, cout)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(16 * 4 * cin, cout)
    )
    cols = jnp.concatenate(
        [
            xs[:, dy : dy + h_out, dx : dx + w_out, :]
            for dy in range(4)
            for dx in range(4)
        ],
        axis=-1,
    )
    out = jnp.dot(
        cols.reshape(-1, 16 * 4 * cin), ks, preferred_element_type=x.dtype
    )
    return out.reshape(b, h_out, w_out, cout)


def conv_matmul(x, kernel, stride: int, padding: int):
    """Convolution as kh·kw shifted matmuls (MXU-native formulation).

    Exactly equivalent to a torch-padded conv: for each kernel tap (dy, dx)
    the strided input window contributes one (pixels, Cin)·(Cin, Cout)
    matmul. XLA keeps the accumulation in registers; no im2col buffer.

    The 7×7/stride-2/pad-3 stem case dispatches to the space-to-depth
    single-matmul formulation (:func:`_stem_conv_s2d`) — the tap loop's
    stride-2 slices on a 3-channel array are ~16× the cost of the whole
    rest of the backbone on TPU.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    if (kh, kw, stride, padding) == (7, 7, 2, 3):
        return _stem_conv_s2d(x, kernel)
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    h_out = (h + 2 * padding - kh) // stride + 1
    w_out = (w + 2 * padding - kw) // stride + 1
    out = None
    for dy in range(kh):
        for dx in range(kw):
            patch = xp[
                :, dy : dy + stride * h_out : stride, dx : dx + stride * w_out : stride, :
            ]
            term = jnp.dot(
                patch.reshape(-1, cin),
                kernel[dy, dx],
                preferred_element_type=x.dtype,
            )
            out = term if out is None else out + term
    return out.reshape(b, h_out, w_out, cout)


class _ConvKernel(nn.Module):
    """Owns the HWIO kernel parameter at the same tree path ('conv/kernel')
    as flax ``nn.Conv``, so both conv implementations share checkpoints."""

    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class ConvTorchPad(nn.Module):
    """Conv2D with torch-style symmetric padding and no bias."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = _ConvKernel(
            (k, k, x.shape[-1], self.features), name="conv"
        )()
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if _conv_impl_now() == "matmul":
            return conv_matmul(x, kernel, self.stride, self.padding)
        if x.shape[-1] == 3:
            # the C=3 NHWC layout defeats TPU lane tiling; zero-pad input
            # channels 3 -> 8 (forward bit-exact — padded channels hit zero
            # kernel rows; grads equal up to fp-accumulation order, the
            # transposed conv reduces over the widened axis) — the native
            # stem conv measured 2x faster padded at 480p inference
            # (models/infer_fast.py does the same for the folded path)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
            kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, 5), (0, 0)))
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )


def _bn(dtype, name):
    # torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (flax momentum = 0.9).
    return nn.BatchNorm(
        use_running_average=None,  # taken from the `use_running_average` call arg
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """Reference ``resnet.py:28-57``."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = ConvTorchPad(self.planes, 3, self.stride, 1, self.dtype, name="conv1")(x)
        out = _bn(self.dtype, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = ConvTorchPad(self.planes, 3, 1, 1, self.dtype, name="conv2")(out)
        out = _bn(self.dtype, "bn2")(out, use_running_average=not train)
        if self.has_downsample:
            residual = ConvTorchPad(
                self.planes * self.expansion, 1, self.stride, 0, self.dtype,
                name="downsample_conv",
            )(x)
            residual = _bn(self.dtype, "downsample_bn")(
                residual, use_running_average=not train
            )
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """Reference ``resnet.py:60-96``."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = ConvTorchPad(self.planes, 1, 1, 0, self.dtype, name="conv1")(x)
        out = _bn(self.dtype, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = ConvTorchPad(self.planes, 3, self.stride, 1, self.dtype, name="conv2")(out)
        out = _bn(self.dtype, "bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = ConvTorchPad(self.planes * 4, 1, 1, 0, self.dtype, name="conv3")(out)
        out = _bn(self.dtype, "bn3")(out, use_running_average=not train)
        if self.has_downsample:
            residual = ConvTorchPad(
                self.planes * 4, 1, self.stride, 0, self.dtype,
                name="downsample_conv",
            )(x)
            residual = _bn(self.dtype, "downsample_bn")(
                residual, use_running_average=not train
            )
        return nn.relu(out + residual)


class ResNetBackbone(nn.Module):
    """conv1..layer4 feature extractor (the reference keeps children [0:8] of
    its ResNet — ``vos_net.py:18`` — i.e. exactly this truncation).

    Args:
      block: "basic" or "bottleneck".
      layers: blocks per stage, e.g. (3, 4, 6, 3) for ResNet-50.
      stage_planes: width per stage; the reference uses (64, 128, 256, 256)
        (narrow layer4, ``resnet.py:109-112``); torchvision-style variants
        (the ``facebook`` swsl backbone) use (64, 128, 256, 512).
      stage_strides: stride of the first block per stage; (1, 2, 1, 1) for
        the stride-8 VOS topology.
    """

    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    stage_planes: Sequence[int] = (64, 128, 256, 256)
    stage_strides: Sequence[int] = (1, 2, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4

        x = ConvTorchPad(64, 7, 2, 3, self.dtype, name="conv1")(x)
        x = _bn(self.dtype, "bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1): pad with -inf.
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

        inplanes = 64
        for stage, (planes, blocks, stride) in enumerate(
            zip(self.stage_planes, self.layers, self.stage_strides), start=1
        ):
            for b in range(blocks):
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != planes * expansion)
                x = block_cls(
                    planes=planes,
                    stride=s,
                    has_downsample=has_ds,
                    dtype=self.dtype,
                    name=f"layer{stage}_{b}",
                )(x, train)
                inplanes = planes * expansion
        return x


def resnet18(**kw) -> ResNetBackbone:
    """Reference ``resnet.py:159-173`` (VOS topology, stride 8)."""
    return ResNetBackbone(block="basic", layers=(2, 2, 2, 2), **kw)


def resnet34(**kw) -> ResNetBackbone:
    """Reference ``resnet.py:176-184``."""
    return ResNetBackbone(block="basic", layers=(3, 4, 6, 3), **kw)


def resnet50(**kw) -> ResNetBackbone:
    """Reference ``resnet.py:187-200``."""
    return ResNetBackbone(block="bottleneck", layers=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNetBackbone:
    """Reference ``resnet.py:203-216``."""
    return ResNetBackbone(block="bottleneck", layers=(3, 4, 23, 3), **kw)


def resnet152(**kw) -> ResNetBackbone:
    """Reference ``resnet.py:219-227``."""
    return ResNetBackbone(block="bottleneck", layers=(3, 8, 36, 3), **kw)


def feature_dim(model: str) -> int:
    """Channel width of the VOSNet embedding for each backbone name."""
    return 256 if model == "resnet18" else 256  # all variants end at 256


def backbone_out_channels(model: str) -> int:
    """Channels exiting the raw backbone (before adjust_dim)."""
    return {
        "resnet18": 256,
        "resnet50": 1024,
        "resnet101": 1024,
        "facebook": 2048,
    }[model]


def out_spatial(h: int, w: int) -> Tuple[int, int]:
    """Stride-8 output size for a given input (matches torch conv arithmetic
    and ``ceil(size * Config.SCALE)`` used by the reference for labels)."""

    def one(n: int) -> int:
        n = (n + 2 * 3 - 7) // 2 + 1  # conv1 k7 s2 p3
        n = (n + 2 * 1 - 3) // 2 + 1  # maxpool k3 s2 p1
        n = (n + 2 * 1 - 3) // 2 + 1  # layer2 first 3x3 s2 p1
        return n

    return one(h), one(w)
