"""Device mesh + sharding helpers.

The pipeline's natural parallel axes (SURVEY.md section 2.4: the reference
has NO distributed runtime — only single-host DataParallel):

  - "data": frame stacks (MiDaS inference), frame-pair stacks (RAFT, the
    fine-tune batch, flow masks) — batch-parallel over ICI,
  - the LM solver's constraint axis (P pairs) — residuals/jvp/vjp shard over
    pairs; the CG reductions (tree vdots) become psums over ICI.

Parameters (network weights, poses, transform grids) are small and
replicated; gradients/normal-equation products reduce with psum. This is
the v5e-8 single-slice design — no DCN axis needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devices)} device(s) "
            "exist; run under JAX_PLATFORMS=cpu with "
            f"--xla_force_host_platform_device_count={n} for a virtual mesh"
        )
    return Mesh(np.array(devices[:n]), axis_names=(axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def shard_leading(tree, mesh: Mesh, axis: str = "data"):
    """Place every array in `tree` with its leading axis sharded."""
    s = batch_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
