"""Platform helpers: compilation cache + CPU forcing.

The axon TPU tunnel in this environment compiles remotely (40 s - 3 min per
shape bucket); the persistent compilation cache makes warm restarts and
repeated benches start in seconds.
"""

from __future__ import annotations

import os

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    path = path or os.path.expanduser("~/.cache/nvx_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _CACHE_ENABLED = True
    except Exception:
        pass  # older jax or unsupported backend: harmless


def force_cpu() -> None:
    """Pin jax to CPU. The env var alone is NOT enough in this container:
    the axon sitecustomize half-attaches the TPU plugin and device execution
    deadlocks (see .claude/skills/verify/SKILL.md)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
