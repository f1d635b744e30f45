"""Persistent XLA compilation cache.

This host class (single CPU core driving a tunneled TPU) pays 1-20 minutes of
XLA compile time for the big fused edit programs while device execution is
milliseconds. Enabling JAX's persistent compilation cache makes every
entry-point/bench rerun start hot. Called by bench.py and all CLIs.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the JAX persistent compilation cache.

    Also honors RGIE_PLATFORM (e.g. "cpu"): some deployment environments
    force the platform list from sitecustomize via jax.config (overriding the
    JAX_PLATFORMS env var), so a config-level update after import is the only
    reliable override.
    """
    global _ENABLED
    import jax

    platform = os.environ.get("RGIE_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    path = Path(cache_dir or os.environ.get("RGIE_JAX_CACHE_DIR",
                                            Path.home() / ".cache" / "rgie_jax"))
    path.mkdir(parents=True, exist_ok=True)
    if not _ENABLED:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ENABLED = True
    return str(path)
