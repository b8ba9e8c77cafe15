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
# variant bootstraps via torch.hub in the reference (``vos_net.py:29-38`` —
# ``resnet50_swsl`` from facebookresearch/semi-supervised-ImageNet1K-models);
# torch.hub resolves that entry to a stable fbaipublicfiles direct URL, used
# here so the same sha-verified cache + offline-fallback machinery covers it.
MODEL_ZOO_URLS = {
    "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
    "resnet101": "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth",
    "facebook": "https://dl.fbaipublicfiles.com/semiweaksupervision/"
    "model_files/semi_weakly_supervised_resnet50-16a12f1b.pth",
}


def _cache_dir() -> Path:
    return Path(
        os.environ.get("SVOS_ZOO_DIR")
        or Path.home() / ".cache" / "svos_model_zoo"
    )


def _hash_ok(path: Path, name: Optional[str] = None) -> bool:
    """torchvision zoo filenames embed a sha256 prefix (``name-<hex>.pth``,
    ``model_zoo.load_url``'s check_hash contract); verify it when present so
    a truncated/corrupted download is never published or served from cache.
    ``name`` overrides the filename carrying the expected hash (the download
    is checked in its anonymous temp file against the DESTINATION name).
    Files without the pattern (custom mirrors) pass — nothing to check."""
    import hashlib
    import re

    m = re.search(r"-([0-9a-f]{8,})\.pth$", name or path.name)
    if m is None:
        return True
    digest = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            digest.update(block)
    return digest.hexdigest().startswith(m.group(1))


def fetch_pretrained(
    model: str,
    url: Optional[str] = None,
    cache_dir: Optional[os.PathLike] = None,
    timeout: float = 60.0,
) -> Optional[str]:
    """Return a local path to the ImageNet checkpoint for ``model``, or None.

    Resolution order: explicit ``url`` > ``SVOS_ZOO_URL_<MODEL>`` (per-model
    mirror) > ``SVOS_ZOO_URL`` (single-model mirror — applies to every model
    name, so cache entries are keyed by model to keep a resnet18 mirror from
    ever being served for resnet50) > the reference's torchvision URL table.
    An already-cached file is returned without touching the network after a
    sha256 spot-check (torchvision filenames embed the hash prefix); a
    download lands atomically in the cache (``SVOS_ZOO_DIR`` or
    ~/.cache/svos_model_zoo) via a unique temp file, so concurrent fetches
    cannot interleave. Any network failure — including fully air-gapped
    hosts — returns None instead of raising. ``file://`` URLs work (offline
    tests / local mirrors).
    """
    import tempfile
    import urllib.parse
    import urllib.request

    env_url = os.environ.get(f"SVOS_ZOO_URL_{model.upper()}") or os.environ.get(
        "SVOS_ZOO_URL"
    )
    url = url or env_url or MODEL_ZOO_URLS.get(model)
    if url is None:
        return None
    cache = Path(cache_dir) if cache_dir is not None else _cache_dir()
    name = Path(urllib.parse.urlparse(url).path).name or f"{model}.pth"
    if url not in MODEL_ZOO_URLS.values():
        name = f"{model}-{name}"  # mirror URLs: key the cache by model too
    dest = cache / name
    if dest.exists():
        if _hash_ok(dest):
            return str(dest)
        logger.warning(f"Cached {dest} fails its hash check; re-fetching.")
        dest.unlink()
    cache.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(suffix=".part", dir=cache)
    try:
        import shutil

        with os.fdopen(fd, "wb") as f, urllib.request.urlopen(
            url, timeout=timeout
        ) as r:
            shutil.copyfileobj(r, f)
        if not _hash_ok(Path(tmp), name=dest.name):
            raise OSError("downloaded file fails its embedded sha256 prefix")
        os.replace(tmp, dest)
        logger.info(f"Fetched pretrained weights: {url} -> {dest}")
        return str(dest)
    except Exception as e:  # offline / DNS / 404 / permission — all fall back
        Path(tmp).unlink(missing_ok=True)
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
