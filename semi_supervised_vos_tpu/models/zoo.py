"""Model-zoo bootstrap with offline fallback.

The reference self-initialises its backbone by downloading torchvision
ImageNet weights at construction time (``reference/src/model/backbone/
resnet.py:13-19,159-171`` — ``model_zoo.load_url`` with ``layer4.*``/``fc.*``
keys dropped because the VOS topology changes their shapes). This repo keeps
``--pretrained <file>`` as the explicit path (the right default for air-
gapped hosts), and this module restores the reference's out-of-box behaviour
on egress-enabled hosts: when ``--pretrained`` is omitted, attempt the zoo
URL, cache the file locally, and fall back gracefully (random init + an
actionable message) when offline.

The layer4/fc-drop semantics live in
:func:`semi_supervised_vos_tpu.models.convert.convert_torchvision_backbone`,
shared with the explicit ``--pretrained`` path.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

from semi_supervised_vos_tpu.utils.logging import logger

# torchvision model-zoo URLs, verbatim from the reference
# (``reference/src/model/backbone/resnet.py:13-19``). The ``facebook``
# variant bootstraps via torch.hub in the reference (``vos_net.py:29-38``)
# and has no direct URL — it stays explicit-checkpoint-only here.
MODEL_ZOO_URLS = {
    "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
    "resnet101": "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth",
}


def _cache_dir() -> Path:
    return Path(
        os.environ.get("SVOS_ZOO_DIR")
        or Path.home() / ".cache" / "svos_model_zoo"
    )


def fetch_pretrained(
    model: str,
    url: Optional[str] = None,
    cache_dir: Optional[os.PathLike] = None,
    timeout: float = 60.0,
) -> Optional[str]:
    """Return a local path to the ImageNet checkpoint for ``model``, or None.

    Resolution order: explicit ``url`` (or ``SVOS_ZOO_URL``) > the
    reference's torchvision URL table. An already-cached file is returned
    without touching the network; a download lands atomically in the cache
    (``SVOS_ZOO_DIR`` or ~/.cache/svos_model_zoo). Any network failure —
    including fully air-gapped hosts — returns None instead of raising.
    ``file://`` URLs work (offline tests / local mirrors).
    """
    import urllib.parse
    import urllib.request

    url = url or os.environ.get("SVOS_ZOO_URL") or MODEL_ZOO_URLS.get(model)
    if url is None:
        return None
    cache = Path(cache_dir) if cache_dir is not None else _cache_dir()
    name = Path(urllib.parse.urlparse(url).path).name or f"{model}.pth"
    dest = cache / name
    if dest.exists():
        return str(dest)
    cache.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(dest.suffix + ".part")
    try:
        import shutil

        with urllib.request.urlopen(url, timeout=timeout) as r, open(
            tmp, "wb"
        ) as f:
            shutil.copyfileobj(r, f)
        os.replace(tmp, dest)
        logger.info(f"Fetched pretrained weights: {url} -> {dest}")
        return str(dest)
    except Exception as e:  # offline / DNS / 404 / permission — all fall back
        tmp.unlink(missing_ok=True)
        logger.warning(
            f"Could not fetch pretrained weights from {url} ({e}); "
            "continuing without."
        )
        return None


def auto_pretrained_path(model: str) -> Optional[str]:
    """The --pretrained default: try the zoo (cache-first), explain the
    fallback. Returns a local file path or None (random init).
    ``SVOS_ZOO=0`` disables the attempt entirely (hermetic runs/tests)."""
    if os.environ.get("SVOS_ZOO", "1") == "0":
        return None
    path = fetch_pretrained(model)
    if path is None:
        logger.info(
            "No pretrained backbone available (offline and nothing cached); "
            "training from random init. Pass --pretrained <file> or set "
            "SVOS_ZOO_URL — provisioning recipe in example.sh."
        )
    return path
