"""Persistent XLA compilation cache.

This host class (single CPU core driving a tunneled TPU) pays 1-20 minutes of
XLA compile time for the big fused edit programs while device execution is
milliseconds. Enabling JAX's persistent compilation cache makes every
entry-point/bench rerun start hot. Called by bench.py and all CLIs.
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform
from pathlib import Path

_ENABLED = False


def host_cpu_features() -> str:
    """A string identifying this host's CPU ISA surface.

    XLA:CPU AOT results compiled for one machine type can SIGILL or
    miscompile when loaded on another — the risk behind the
    ``cpu_aot_loader.cc`` warnings that flooded the round-4 multichip
    dryrun tail (VERDICT r4 #7). model name + flags of cpu0 + the machine
    arch pin the entry to hosts where it is valid.

    A RESIDUAL warning remains even same-host and is benign by
    construction: XLA embeds its own tuning pseudo-features
    (``+prefer-no-scatter``/``+prefer-no-gather``, derived from the CPU
    model, not CPUID) into the compile-side feature list, while the
    load-side detector reports raw CPUID flags only — so ANY cross-process
    reuse of a cache entry logs the mismatch line, including reuse on the
    very machine that wrote it. Identical hardware cannot SIGILL on a
    pseudo-feature; the cross-machine case (real ISA differences) is what
    this scoping eliminates, because the model name that drives the tuning
    is part of the hash.
    """
    model, flags = "", ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                elif not flags and line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                if model and flags:
                    break
    except OSError:
        pass
    return f"{_platform.machine()}|{model}|{flags}"


def host_scoped_cache_dir(base: str | Path, features: str | None = None) -> Path:
    """Scope a cache dir by host CPU feature hash.

    Two hosts with different CPU feature strings get disjoint cache dirs, so
    a persistent-cache entry AOT-compiled for one machine type is never
    loaded on another (driver-gate reliability: the dryrun must not depend
    on which machine last wrote the cache).
    """
    feats = host_cpu_features() if features is None else features
    tag = hashlib.sha256(feats.encode()).hexdigest()[:12]
    return Path(base) / f"host-{tag}"


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

    base = Path(cache_dir or os.environ.get("RGIE_JAX_CACHE_DIR",
                                            Path.home() / ".cache" / "rgie_jax"))
    path = host_scoped_cache_dir(base)
    path.mkdir(parents=True, exist_ok=True)
    if not _ENABLED:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ENABLED = True
    return str(path)
