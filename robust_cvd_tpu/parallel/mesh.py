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


def pipeline_mesh(axis: str = "data") -> Optional[Mesh]:
    """The pipeline's auto-SPMD rule in one place: a data mesh over all
    devices when more than one exists, else None (single-device paths)."""
    return make_mesh(axis=axis) if len(jax.devices()) > 1 else None


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


def _pad_leading(x, target: int):
    pad = target - x.shape[0]
    if pad <= 0:
        return x
    import jax.numpy as jnp

    return jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)], axis=0)


def shard_pose_inputs(inputs, mesh: Mesh, axis: str = "data"):
    """Shard a solver problem over the mesh: the constraint pair axis (P)
    and triplet axis (T) are partitioned over ICI; per-frame tensors are
    replicated. The LM solver's jvp/vjp/CG reductions then run SPMD — XLA
    inserts the psums (the TPU equivalent of Ceres' 12-thread Jacobian
    evaluation, lib/PoseOptimizer.h:57).

    P/T are padded to a device multiple with zero-weight copies of row 0
    (weight 0 == skipped constraint, lib/PoseOptimizer.cpp:1177-1193), which
    leaves every residual and gradient unchanged.
    """
    import jax.numpy as jnp

    n = mesh.size
    d = inputs.data
    P = int(d.pair.shape[0])
    Pp = -(-P // n) * n
    weight = _pad_leading(d.weight, Pp)
    if Pp > P:
        weight = weight.at[P:].set(0.0)
    data = type(d)(
        pair=_pad_leading(d.pair, Pp),
        loc0=_pad_leading(d.loc0, Pp),
        loc1=_pad_leading(d.loc1, Pp),
        depth0=_pad_leading(d.depth0, Pp),
        depth1=_pad_leading(d.depth1, Pp),
        weight=weight,
    )
    data = shard_leading(data, mesh, axis)

    trip = inputs.triplets
    if trip is not None:
        T = int(trip.frame.shape[0])
        Tp = -(-T // n) * n
        tweight = _pad_leading(trip.weight, Tp)
        if Tp > T:
            tweight = tweight.at[T:].set(0.0)
        trip = type(trip)(
            frame=_pad_leading(trip.frame, Tp),
            loc=_pad_leading(trip.loc, Tp),
            depth=_pad_leading(trip.depth, Tp),
            weight=tweight,
        )
        trip = shard_leading(trip, mesh, axis)

    out = inputs._replace(
        data=data,
        triplets=trip,
        median_depth=replicate(inputs.median_depth, mesh),
    )
    if inputs.dynamic_mask is not None:
        out = out._replace(dynamic_mask=replicate(inputs.dynamic_mask, mesh))
    return out


def data_parallel_fn(apply_fn, mesh: Mesh, axis: str = "data"):
    """Compile `apply_fn(variables, x)` as ONE SPMD program: `variables`
    replicated, every array in the `x` pytree sharded on its leading
    (batch) axis, outputs batch-sharded.

    The TPU-native equivalent of the reference's torch.nn.DataParallel
    inference wrappers (monodepth/midas_v2_model.py:35-37,
    optical_flow_homography.py:252): XLA partitions the batch over ICI —
    no replica processes, no gradient bucketing. Build once, call per
    chunk (each call with a fresh jax.jit would defeat the trace cache).
    """
    return jax.jit(
        apply_fn,
        in_shardings=(replicated(mesh), batch_sharded(mesh, axis)),
        out_shardings=batch_sharded(mesh, axis),
    )


def infer_data_parallel(apply_fn, variables, x, mesh: Optional[Mesh] = None,
                        axis: str = "data"):
    """One-shot batch-parallel inference over the whole batch: pads the
    leading axis of every array in the `x` pytree to a device multiple
    (copies of row 0), runs `data_parallel_fn`, slices the pad rows off
    the output. For chunked loops, build `data_parallel_fn` once instead.
    """
    import jax.numpy as jnp

    mesh = mesh or make_mesh()
    n = mesh.size
    leaves = jax.tree.leaves(x)
    B = int(leaves[0].shape[0])
    Bp = -(-B // n) * n
    xp = jax.tree.map(lambda a: _pad_leading(jnp.asarray(a), Bp), x)
    xp = shard_leading(xp, mesh, axis)
    v = replicate(variables, mesh)
    out = data_parallel_fn(apply_fn, mesh, axis)(v, xp)
    return jax.tree.map(lambda o: o[:B], out)
