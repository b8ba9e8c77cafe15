"""Backend selection + persistent compilation cache for the CLI commands.

The reference picks its device with ``Config.DEVICE`` (``src/config.py:14``);
here the per-command ``--device`` flag maps onto JAX's platform selection,
which must happen before the first backend query locks a plugin in.

Compilation on this runtime can take minutes (remote-compile tunnel for the
TPU plugin; 480p inference programs are large), so every CLI entry point
also enables JAX's persistent compilation cache: repeat invocations with
unchanged shapes/programs skip XLA entirely. Opt out with
``SVOS_COMPILE_CACHE=off``; point it elsewhere with
``SVOS_COMPILE_CACHE=/path``.
"""

from __future__ import annotations

import os


def setup_backend(device: str | None = None) -> None:
    """Apply ``--device`` and enable the persistent compilation cache.

    Must run before any JAX backend initialisation.
    """
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    cache = os.environ.get("SVOS_COMPILE_CACHE", "")
    if cache.lower() in ("off", "0", "none"):
        return
    if not cache:
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return  # respect an explicit JAX-native cache location
        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "svos_jax_cache"
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache every program that took meaningful compile time; the
        # default (1 s) already covers the expensive inference/train steps
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (AttributeError, ValueError):  # very old jax: cache unsupported
        pass
