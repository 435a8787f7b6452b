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
