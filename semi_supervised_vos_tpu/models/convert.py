"""PyTorch checkpoint → Flax variable conversion.

Keeps the reference CLI contract alive: ``-r checkpoint.pth.tar`` files
produced by the reference trainer (``src/train.py:146-151``: a dict with
``state_dict``/``optimizer``/``scheduler``) or raw state_dicts
(``src/utils/utils.py:78-81``) load directly into the Flax VOSNet. The
``module.`` prefix left by ``torch.nn.DataParallel`` is stripped, mirroring
the reference's DataParallel fallback (``utils.py:88-94``).

Also converts torchvision-format ImageNet ResNet checkpoints for pretrained
initialisation, dropping ``layer4.*``/``fc.*`` exactly like the reference
(``resnet.py:194-199`` — layer4's shape differs in the VOS topology, so it
keeps its fresh initialisation).

Layout notes: torch convs are OIHW; Flax wants HWIO. BatchNorm
``weight/bias/running_mean/running_var`` map to ``scale/bias`` params and
``mean/var`` batch_stats. All tensors land as float32 numpy.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from semi_supervised_vos_tpu.utils.logging import logger

_STAGE_LAYERS = {
    "resnet18": (2, 2, 2, 2),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "facebook": (3, 4, 6, 3),
}
_BLOCK_CONVS = {
    "resnet18": 2,  # BasicBlock
    "resnet50": 3,  # Bottleneck
    "resnet101": 3,
    "facebook": 3,
}


def _conv_kernel(t) -> np.ndarray:
    return np.asarray(t, dtype=np.float32).transpose(2, 3, 1, 0)


def _strip_module_prefix(sd: Dict) -> Dict:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def convert_vosnet_state_dict(
    state_dict: Dict, model: str = "resnet50"
) -> Dict:
    """Convert a reference-VOSNet torch state_dict to Flax variables.

    Torch module naming (``vos_net.py:18-38``): ``backbone`` is an
    ``nn.Sequential`` of the ResNet children [0:8], so key prefixes are
    ``backbone.0`` (conv1), ``backbone.1`` (bn1), ``backbone.4..7``
    (layer1..4); plus ``adjust_dim`` / ``bn256`` heads.

    Returns:
      ``{"params": ..., "batch_stats": ...}`` matching
      :class:`semi_supervised_vos_tpu.models.vos_net.VOSNet`.
    """
    sd = _strip_module_prefix(state_dict)
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}

    def put_conv(path: Tuple[str, ...], key: str):
        params[path + ("conv", "kernel")] = _conv_kernel(sd[key])

    def put_bn(path: Tuple[str, ...], prefix: str):
        params[path + ("scale",)] = np.asarray(sd[prefix + ".weight"], np.float32)
        params[path + ("bias",)] = np.asarray(sd[prefix + ".bias"], np.float32)
        stats[path + ("mean",)] = np.asarray(sd[prefix + ".running_mean"], np.float32)
        stats[path + ("var",)] = np.asarray(sd[prefix + ".running_var"], np.float32)

    put_conv(("backbone", "conv1"), "backbone.0.weight")
    put_bn(("backbone", "bn1"), "backbone.1")

    n_convs = _BLOCK_CONVS[model]
    for stage, blocks in enumerate(_STAGE_LAYERS[model], start=1):
        seq = stage + 3  # Sequential index of layer{stage} (children 4..7)
        for b in range(blocks):
            tprefix = f"backbone.{seq}.{b}"
            fprefix = ("backbone", f"layer{stage}_{b}")
            for j in range(1, n_convs + 1):
                put_conv(fprefix + (f"conv{j}",), f"{tprefix}.conv{j}.weight")
                put_bn(fprefix + (f"bn{j}",), f"{tprefix}.bn{j}")
            if f"{tprefix}.downsample.0.weight" in sd:
                put_conv(fprefix + ("downsample_conv",), f"{tprefix}.downsample.0.weight")
                put_bn(fprefix + ("downsample_bn",), f"{tprefix}.downsample.1")

    if model in ("resnet50", "resnet101"):
        put_conv(("adjust_dim",), "adjust_dim.weight")
        put_bn(("bn256",), "bn256")
    elif model == "facebook":
        put_conv(("adjust_dim_0",), "adjust_dim.0.weight")
        put_conv(("adjust_dim_1",), "adjust_dim.1.weight")
        put_bn(("bn256",), "bn256")

    from flax.traverse_util import unflatten_dict

    return {
        "params": unflatten_dict(params),
        "batch_stats": unflatten_dict(stats),
    }


def convert_torchvision_backbone(
    state_dict: Dict, variables: Dict, model: str = "resnet50"
) -> Dict:
    """Merge a torchvision ImageNet ResNet state_dict into freshly
    initialised VOSNet variables (pretrained init path).

    Drops ``layer4.*`` and ``fc.*`` like the reference (``resnet.py:194-199``)
    — layer4 keeps the fresh init. The head (adjust_dim/bn256) is always
    fresh (it does not exist in ImageNet checkpoints).

    The ``facebook`` variant is the exception: the reference loads the full
    swsl hub checkpoint including layer4 and only patches strides afterwards
    (``vos_net.py:29-38`` — the stride change does not alter weight shapes),
    so here layer4 is merged too and only ``fc.*`` is dropped.
    """
    sd = _strip_module_prefix(state_dict)
    keep_layer4 = model == "facebook"
    sd = {
        k: v
        for k, v in sd.items()
        if not (k.startswith("fc") or (k.startswith("layer4") and not keep_layer4))
    }

    from flax.traverse_util import flatten_dict, unflatten_dict

    params = dict(flatten_dict(variables["params"]))
    stats = dict(flatten_dict(variables["batch_stats"]))

    def put_conv(path, key):
        kernel = _conv_kernel(sd[key])
        assert params[path + ("conv", "kernel")].shape == kernel.shape, (path, key)
        params[path + ("conv", "kernel")] = kernel

    def put_bn(path, prefix):
        params[path + ("scale",)] = np.asarray(sd[prefix + ".weight"], np.float32)
        params[path + ("bias",)] = np.asarray(sd[prefix + ".bias"], np.float32)
        stats[path + ("mean",)] = np.asarray(sd[prefix + ".running_mean"], np.float32)
        stats[path + ("var",)] = np.asarray(sd[prefix + ".running_var"], np.float32)

    put_conv(("backbone", "conv1"), "conv1.weight")
    put_bn(("backbone", "bn1"), "bn1")
    n_convs = _BLOCK_CONVS[model]
    n_stages = 4 if keep_layer4 else 3
    for stage, blocks in enumerate(_STAGE_LAYERS[model][:n_stages], start=1):
        for b in range(blocks):
            tprefix = f"layer{stage}.{b}"
            fprefix = ("backbone", f"layer{stage}_{b}")
            for j in range(1, n_convs + 1):
                put_conv(fprefix + (f"conv{j}",), f"{tprefix}.conv{j}.weight")
                put_bn(fprefix + (f"bn{j}",), f"{tprefix}.bn{j}")
            if f"{tprefix}.downsample.0.weight" in sd:
                put_conv(fprefix + ("downsample_conv",), f"{tprefix}.downsample.0.weight")
                put_bn(fprefix + ("downsample_bn",), f"{tprefix}.downsample.1")

    return {
        "params": unflatten_dict(params),
        "batch_stats": unflatten_dict(stats),
    }


def export_torch_state_dict(variables: Dict, model: str = "resnet50") -> Dict:
    """Inverse conversion: Flax VOSNet variables → a reference-format torch
    state_dict (``backbone.N...`` Sequential naming, OIHW kernels), so models
    trained here run in the PyTorch reference unchanged."""
    from flax.traverse_util import flatten_dict

    params = flatten_dict(variables["params"])
    stats = flatten_dict(variables["batch_stats"])
    sd: Dict[str, "object"] = {}

    def put_conv(key: str, path: Tuple[str, ...]):
        sd[key + ".weight"] = np.asarray(params[path + ("conv", "kernel")]).transpose(
            3, 2, 0, 1
        )

    def put_bn(prefix: str, path: Tuple[str, ...]):
        sd[prefix + ".weight"] = np.asarray(params[path + ("scale",)])
        sd[prefix + ".bias"] = np.asarray(params[path + ("bias",)])
        sd[prefix + ".running_mean"] = np.asarray(stats[path + ("mean",)])
        sd[prefix + ".running_var"] = np.asarray(stats[path + ("var",)])
        sd[prefix + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    put_conv("backbone.0", ("backbone", "conv1"))
    put_bn("backbone.1", ("backbone", "bn1"))
    n_convs = _BLOCK_CONVS[model]
    for stage, blocks in enumerate(_STAGE_LAYERS[model], start=1):
        seq = stage + 3
        for b in range(blocks):
            fprefix = ("backbone", f"layer{stage}_{b}")
            tprefix = f"backbone.{seq}.{b}"
            for j in range(1, n_convs + 1):
                put_conv(f"{tprefix}.conv{j}", fprefix + (f"conv{j}",))
                put_bn(f"{tprefix}.bn{j}", fprefix + (f"bn{j}",))
            if fprefix + ("downsample_conv", "conv", "kernel") in params:
                put_conv(f"{tprefix}.downsample.0", fprefix + ("downsample_conv",))
                put_bn(f"{tprefix}.downsample.1", fprefix + ("downsample_bn",))

    if model in ("resnet50", "resnet101"):
        put_conv("adjust_dim", ("adjust_dim",))
        put_bn("bn256", ("bn256",))
    elif model == "facebook":
        put_conv("adjust_dim.0", ("adjust_dim_0",))
        put_conv("adjust_dim.1", ("adjust_dim_1",))
        put_bn("bn256", ("bn256",))
    return sd


def export_torch_checkpoint(variables: Dict, path: str, model: str = "resnet50") -> None:
    """Write a ``.pth.tar`` the reference's ``load_model`` accepts
    (``utils.py:78-81`` dict-with-state_dict form)."""
    import torch

    sd = {
        k: (torch.from_numpy(np.ascontiguousarray(v)) if isinstance(v, np.ndarray) else torch.tensor(v))
        for k, v in export_torch_state_dict(variables, model).items()
    }
    torch.save({"state_dict": sd}, path)
    logger.info(f"=> exported torch checkpoint '{path}'")


def load_checkpoint_variables(path: str, model: str = "resnet50") -> Dict:
    """Load inference variables from either checkpoint format: a torch
    ``.pth.tar``/``.pth`` file (reference format) or an Orbax train-state
    directory produced by our trainer."""
    import os

    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        logger.info(f"=> loaded checkpoint '{path}'")
        return {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }
    return load_torch_checkpoint(path, model)


def load_torch_checkpoint(path: str, model: str = "resnet50") -> Dict:
    """Load a reference ``.pth.tar`` (or raw state_dict ``.pth``) and convert.

    Mirrors ``src/utils/utils.py:71-94``: accepts either a dict with a
    ``state_dict`` entry or a bare state_dict; tolerates DataParallel
    ``module.`` prefixes.
    """
    import os
    import sys

    import torch

    if not os.path.isfile(path):
        # reference behaviour: log and exit (utils.py:83-85)
        logger.info(f"=> no checkpoint found at '{path}'")
        sys.exit(-1)
    logger.info(f"=> loading checkpoint '{path}'")
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:  # older pickles with non-tensor payloads
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in ckpt.items()}
    variables = convert_vosnet_state_dict(sd, model)
    logger.info(f"=> loaded checkpoint '{path}'")
    return variables
