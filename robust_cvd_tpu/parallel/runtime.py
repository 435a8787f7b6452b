"""Runtime/global JAX configuration.

This environment compiles TPU programs remotely (PALLAS_AXON_REMOTE_COMPILE),
which makes cold compiles slow. The persistent compilation cache makes every
program a one-time cost per machine.
"""

from __future__ import annotations

import os

_CONFIGURED = False


def configure(cache_dir: str | None = None) -> None:
    """Idempotent global JAX setup: persistent compile cache.

    CPU backends NEVER get the persistent cache on this host: XLA:CPU's AOT
    loader rejects the recorded machine features (+prefer-no-gather /
    +prefer-no-scatter mismatch, logged as cpu_aot_loader.cc errors warning
    of SIGILL) and deserialization segfaulted a full test-suite run inside
    compilation_cache.get_executable_and_time (round-5 pytest log). The TPU
    path compiles remotely through a different cache and keeps it."""
    global _CONFIGURED
    if _CONFIGURED:
        return
    import jax

    platforms = str(
        os.environ.get("JAX_PLATFORMS", "") or jax.config.jax_platforms or ""
    )
    if "cpu" in platforms:
        _CONFIGURED = True
        return

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
