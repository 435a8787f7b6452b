"""Runtime/global JAX configuration.

This environment compiles TPU programs remotely (PALLAS_AXON_REMOTE_COMPILE),
which makes cold compiles slow. The persistent compilation cache makes every
program a one-time cost per machine.
"""

from __future__ import annotations

import os

_CONFIGURED = False


def configure(cache_dir: str | None = None) -> None:
    """Idempotent global JAX setup: persistent compile cache."""
    global _CONFIGURED
    if _CONFIGURED:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "ROBUST_CVD_JAX_CACHE", os.path.expanduser("~/.cache/robust_cvd_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these knobs
    _CONFIGURED = True
