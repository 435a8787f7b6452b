"""Residual blocks for the joint pose/deformation solve (pure JAX).

Mathematical parity with the reference Ceres cost functors
(lib/PoseOptimizer.cpp:60-656), re-designed for TPU: instead of one Ceres
residual block per sparse constraint (CPU autodiff through Jet types), all
constraints are evaluated as one batched tensor program; Jacobians come from
jvp/vjp through these functions inside the matrix-free LM solver (lm.py).

Constraint layout: PAIR-BLOCKED dense tensors (P pairs x C samples per
pair, padded with weight 0). All per-constraint parameter lookups (poses,
focals, transform grids) collapse to per-PAIR gathers of size P (~hundreds)
instead of per-constraint gathers of size P*C (~10^5) — gathers are the
dominant cost of this graph on TPU; everything per-sample is dense
(P, C, ...) vector math.

Coordinate conventions (reference lib/PoseOptimizer.cpp:89-221):
  - Observation locations are NDC in [-1, 1]^2 (y up).
  - A camera-space point is (ndc_x + warp_x, ndc_y + warp_y, depth).
  - cameraToWorld: dir = (x * fx, y * fy, -1) rotated by the pose angle-axis;
    world = position + dir * depth, with fy = focal = tan(vFov/2),
    fx = fy * aspect.
  - worldToCamera: rotate (p - position) by the inverse rotation; depth = -z;
    ndc = (x / depth / fx, y / depth / fy).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PoseOptParams
from . import xforms
from .xforms import GridSpec


class SolverParams(NamedTuple):
    """The optimized parameter pytree for one solver stage.

    pose:         (N, 6)  [x, y, z, r1, r2, r3] position + angle-axis
    focal:        (N,)    tan(vFov / 2) per frame
    depth_grid:   (N, gz, gy, gx) multiplicative scale handles
    spatial_grid: (N, sy, sx, 2)  NDC warp handles
    depth_shift:  optional (N, gz, gy, gx) additive handles — present only
                  for the ScaleShift value transform (reference
                  lib/ValueTransform.h:57-94: dst = src * p0 + p1; the
                  pipeline's default is Scale, dst = src * p0)
    """

    pose: jnp.ndarray
    focal: jnp.ndarray
    depth_grid: jnp.ndarray
    spatial_grid: jnp.ndarray
    depth_shift: jnp.ndarray | None = None


class ConstraintData(NamedTuple):
    """Pair-blocked constraints (static inputs to a solve).

    pair:          (P, 2) int32 (frame_i, frame_j)
    loc0/loc1:     (P, C, 2) NDC observation locations
    depth0/depth1: (P, C) source depths sampled at the observations
    weight:        (P, C) 1.0 for valid static constraints, 0.0 for padding /
                   dynamic / invalid-depth ones (the reference skips those at
                   problem-build time, lib/PoseOptimizer.cpp:1177-1193)
    """

    pair: jnp.ndarray
    loc0: jnp.ndarray
    loc1: jnp.ndarray
    depth0: jnp.ndarray
    depth1: jnp.ndarray
    weight: jnp.ndarray


class TripletData(NamedTuple):
    """Pair-blocked triplet constraints for scene-flow smoothness.

    frame: (T,) int32 center-frame index; loc: (T, C, 3, 2); depth: (T, C, 3);
    weight: (T, C) resolved static/dynamic smoothness weight, 0 for padding.
    """

    frame: jnp.ndarray
    loc: jnp.ndarray
    depth: jnp.ndarray
    weight: jnp.ndarray


class SceneConfig(NamedTuple):
    """Static (compile-time) configuration of a solver stage."""

    aspect: float
    depth_spec: GridSpec
    spatial_spec: GridSpec
    static_loss_type: str = "ReproDisparity"
    smooth_loss_type: str = "ReproDisparityLaplacian"
    intr_opt: str = "PerFrame"
    fixed_vfocal: float = 0.3461538376301239
    static_spatial_weight: float = 1.0
    static_depth_weight: float = 1.0


_EPS = 1e-6


# ---------------------------------------------------------------------------
# Batched rotation (Rodrigues) broadcast over the sample axis.
# ---------------------------------------------------------------------------


def _rotate(aa, p):
    """aa (..., 3) angle-axis; p (..., C, 3) points (aa broadcast over C)."""
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)  # (..., 1)
    theta = jnp.sqrt(theta2 + 1e-24)
    axis = (aa / theta)[..., None, :]  # (..., 1, 3)
    c = jnp.cos(theta)[..., None]
    s = jnp.sin(theta)[..., None]
    d = jnp.sum(axis * p, axis=-1, keepdims=True)
    cross = jnp.cross(jnp.broadcast_to(axis, p.shape), p)
    rotated = c * p + s * cross + (1.0 - c) * d * axis
    small = p + jnp.cross(jnp.broadcast_to(aa[..., None, :], p.shape), p)
    return jnp.where(theta2[..., None] < 1e-16, small, rotated)


_HI = jax.lax.Precision.HIGHEST


def dense_tap_weights(
    spec: GridSpec, loc: jnp.ndarray, src_depth: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Interpolation taps expanded to DENSE per-handle weights.

    loc (..., 2) [src_depth (...,)] -> W (..., G) with G = grid handles,
    such that interp(grid) == einsum('...g,g->...', W, grid_flat).

    These are constant during a solve (they depend only on observation
    locations and SOURCE depths), so they are computed once per solver
    stage; every residual/jvp/vjp evaluation then interpolates with one MXU
    einsum instead of a gather — gathers at sub-lane widths are the dominant
    cost of this graph on TPU (measured ~3 ms vs ~0.1 ms for the einsum).
    """
    idx, w = xforms.grid_gather(spec, loc, src_depth)  # (..., K)
    G = spec.num_handles
    onehot = jax.nn.one_hot(idx, G, dtype=w.dtype)  # (..., K, G)
    return jnp.einsum("...k,...kg->...g", w, onehot, precision=_HI)


def _eval_depth_scale_rows(grid_rows, spec: GridSpec, loc, src_depth, W=None):
    """Interpolated scale for pair-blocked samples.

    grid_rows: (P, G) per-pair flattened grids; loc: (P, C, 2);
    src_depth: (P, C); W: optional precomputed dense taps (P, C, G).
    Returns (P, C)."""
    if W is not None:
        return jnp.einsum("pcg,pg->pc", W, grid_rows, precision=_HI)
    didx, dw = xforms.grid_gather(spec, loc, src_depth)  # (P, C, K)
    P, C, K = didx.shape
    vals = jnp.take_along_axis(grid_rows, didx.reshape(P, C * K), axis=1)
    return jnp.sum(vals.reshape(P, C, K) * dw, axis=-1)


def _eval_warp_rows(sgrid_rows, spec: GridSpec, loc, W=None):
    """Interpolated NDC warp for pair-blocked samples.

    sgrid_rows: (P, S, 2); loc: (P, C, 2); W: optional dense taps (P, C, S).
    Returns (P, C, 2)."""
    if W is not None:
        return jnp.einsum("pcs,psd->pcd", W, sgrid_rows, precision=_HI)
    sidx, sw = xforms.grid_gather(spec, loc)  # (P, C, K)
    P, C, K = sidx.shape
    flat = sgrid_rows.reshape(P, -1)  # (P, S*2)
    x = jnp.take_along_axis(flat, (sidx * 2).reshape(P, C * K), axis=1)
    y = jnp.take_along_axis(flat, (sidx * 2 + 1).reshape(P, C * K), axis=1)
    wx = jnp.sum(x.reshape(P, C, K) * sw, axis=-1)
    wy = jnp.sum(y.reshape(P, C, K) * sw, axis=-1)
    return jnp.stack([wx, wy], axis=-1)


class DenseTaps(NamedTuple):
    """Per-stage dense interpolation weights (see dense_tap_weights)."""

    d0: jnp.ndarray  # (P, C, Gd) depth taps at loc0
    d1: jnp.ndarray  # (P, C, Gd) depth taps at loc1
    s0: jnp.ndarray  # (P, C, Gs) spatial taps at loc0
    s1: jnp.ndarray  # (P, C, Gs) spatial taps at loc1
    scale_reg: jnp.ndarray  # (N, G_locs, Gd) taps at the scale-reg grid


def build_dense_taps(
    cfg: SceneConfig,
    data: ConstraintData,
    median_depth: jnp.ndarray,
    scale_grid_locs: jnp.ndarray,
) -> DenseTaps:
    N = median_depth.shape[0]
    G = scale_grid_locs.shape[0]
    locs = jnp.broadcast_to(scale_grid_locs[None], (N, G, 2))
    med = jnp.broadcast_to(median_depth[:, None], (N, G))
    return DenseTaps(
        d0=dense_tap_weights(cfg.depth_spec, data.loc0, data.depth0),
        d1=dense_tap_weights(cfg.depth_spec, data.loc1, data.depth1),
        s0=dense_tap_weights(cfg.spatial_spec, data.loc0),
        s1=dense_tap_weights(cfg.spatial_spec, data.loc1),
        scale_reg=dense_tap_weights(cfg.depth_spec, locs, med),
    )


def observation_to_camera(
    params: SolverParams, cfg: SceneConfig, frames: jnp.ndarray,
    loc: jnp.ndarray, src_depth: jnp.ndarray,
    dW=None, sW=None,
) -> jnp.ndarray:
    """Batched obsToCamera (reference lib/PoseOptimizer.cpp:159-171).

    frames (P,), loc (P, C, 2), src_depth (P, C) -> camera points (P, C, 3).
    """
    dgrid_rows = params.depth_grid.reshape(params.depth_grid.shape[0], -1)[frames]
    scale = _eval_depth_scale_rows(dgrid_rows, cfg.depth_spec, loc, src_depth, dW)
    depth = src_depth * scale
    if params.depth_shift is not None:
        # ScaleShift value transform: dst = src * p0 + p1 (reference
        # lib/ValueTransform.h:77-94); the shift handles share the scale
        # handles' interpolation taps
        shift_rows = params.depth_shift.reshape(
            params.depth_shift.shape[0], -1
        )[frames]
        depth = depth + _eval_depth_scale_rows(
            shift_rows, cfg.depth_spec, loc, src_depth, dW
        )

    sgrid_rows = params.spatial_grid.reshape(
        params.spatial_grid.shape[0], -1, 2
    )[frames]
    warp = _eval_warp_rows(sgrid_rows, cfg.spatial_spec, loc, sW)
    return jnp.concatenate([loc + warp, depth[..., None]], axis=-1)


def _focal_xy(params: SolverParams, cfg: SceneConfig, frames: jnp.ndarray):
    """Per-pair (fx, fy) with fy = vertical focal, fx = fy * aspect.
    frames (P,) -> ((P,), (P,))."""
    if cfg.intr_opt == "Shared":
        fy = jnp.broadcast_to(params.focal[0], frames.shape)
    elif cfg.intr_opt == "PerFrame":
        fy = params.focal[frames]
    else:  # Fixed
        fy = jnp.full(frames.shape, cfg.fixed_vfocal, jnp.float32)
    return fy * cfg.aspect, fy


def camera_to_world(point_cam, fx, fy, pose):
    """Batched cameraToWorld (reference lib/PoseOptimizer.cpp:174-192).

    point_cam (P, C, 3); fx/fy (P,); pose (P, 6) -> world (P, C, 3)."""
    dir_cam = jnp.stack(
        [
            point_cam[..., 0] * fx[:, None],
            point_cam[..., 1] * fy[:, None],
            -jnp.ones_like(point_cam[..., 0]),
        ],
        axis=-1,
    )
    dir_world = _rotate(pose[:, 3:6], dir_cam)
    return pose[:, None, 0:3] + dir_world * point_cam[..., 2:3]


def world_to_camera(point_world, fx, fy, pose):
    """Batched worldToCamera (reference lib/PoseOptimizer.cpp:195-221)."""
    rel = point_world - pose[:, None, 0:3]
    point_cam = _rotate(-pose[:, 3:6], rel)
    depth = -point_cam[..., 2]
    safe = jnp.where(jnp.abs(depth) > _EPS, depth, jnp.sign(depth) * _EPS + _EPS)
    return jnp.stack(
        [
            point_cam[..., 0] / safe / fx[:, None],
            point_cam[..., 1] / safe / fy[:, None],
            depth,
        ],
        axis=-1,
    )


def static_scene_residuals(
    params: SolverParams, cfg: SceneConfig, data: ConstraintData, taps=None
) -> jnp.ndarray:
    """StaticSceneCost over all pair constraints -> (P, C, 3) raw residuals
    (reference lib/PoseOptimizer.cpp:223-319). Weights NOT applied here —
    the LM driver combines `data.weight` with IRLS robustification.
    `taps`: optional DenseTaps turning interpolation into MXU einsums."""
    fi, fj = data.pair[:, 0], data.pair[:, 1]
    fx0, fy0 = _focal_xy(params, cfg, fi)
    fx1, fy1 = _focal_xy(params, cfg, fj)

    dW0 = taps.d0 if taps is not None else None
    dW1 = taps.d1 if taps is not None else None
    sW0 = taps.s0 if taps is not None else None
    sW1 = taps.s1 if taps is not None else None
    p0 = observation_to_camera(params, cfg, fi, data.loc0, data.depth0, dW0, sW0)
    p1 = observation_to_camera(params, cfg, fj, data.loc1, data.depth1, dW1, sW1)

    pose0 = params.pose[fi]
    pose1 = params.pose[fj]
    world0 = camera_to_world(p0, fx0, fy0, pose0)

    if cfg.static_loss_type == "Euclidean":
        world1 = camera_to_world(p1, fx1, fy1, pose1)
        return world1 - world0

    p01 = world_to_camera(world0, fx1, fy1, pose1)
    rx = (p01[..., 0] - p1[..., 0]) * cfg.static_spatial_weight
    ry = (p01[..., 1] - p1[..., 1]) * cfg.static_spatial_weight

    z01 = p01[..., 2]
    z1 = p1[..., 2]
    if cfg.static_loss_type == "ReproDisparity":
        rz = (
            1.0 / jnp.maximum(z01, _EPS) - 1.0 / jnp.maximum(z1, _EPS)
        ) * cfg.static_depth_weight
    elif cfg.static_loss_type == "ReproDepthRatio":
        mx, mn = jnp.maximum(z01, z1), jnp.minimum(z01, z1)
        rz = (mx / jnp.where(jnp.abs(mn) > _EPS, mn, _EPS) - 1.0) * cfg.static_depth_weight
    elif cfg.static_loss_type == "ReproLogDepth":
        mx, mn = jnp.maximum(z01, z1), jnp.minimum(z01, z1)
        rz = jnp.log(jnp.maximum(mn / jnp.maximum(mx, _EPS), _EPS)) * cfg.static_depth_weight
    else:
        raise ValueError(cfg.static_loss_type)
    return jnp.stack([rx, ry, rz], axis=-1)


def smoothness_residuals(
    params: SolverParams, cfg: SceneConfig, data: TripletData
) -> jnp.ndarray:
    """SceneFlowSmoothnessLoss over triplets -> (T, C, 3)
    (reference lib/PoseOptimizer.cpp:321-423)."""
    frames = [data.frame - 1, data.frame, data.frame + 1]
    pts, fxs, fys = [], [], []
    for k, f in enumerate(frames):
        fx, fy = _focal_xy(params, cfg, f)
        p = observation_to_camera(
            params, cfg, f, data.loc[:, :, k], data.depth[:, :, k]
        )
        pts.append(p)
        fxs.append(fx)
        fys.append(fy)

    poses = [params.pose[f] for f in frames]
    w0 = camera_to_world(pts[0], fxs[0], fys[0], poses[0])
    w2 = camera_to_world(pts[2], fxs[2], fys[2], poses[2])

    if cfg.smooth_loss_type == "EuclideanLaplacian":
        w1 = camera_to_world(pts[1], fxs[1], fys[1], poses[1])
        return w0 + w2 - 2.0 * w1

    p01 = world_to_camera(w0, fxs[1], fys[1], poses[1])
    p21 = world_to_camera(w2, fxs[1], fys[1], poses[1])
    p1 = pts[1]
    rx = (p01[..., 0] + p21[..., 0] - 2.0 * p1[..., 0]) / fys[1][:, None]
    ry = (p01[..., 1] + p21[..., 1] - 2.0 * p1[..., 1]) / fys[1][:, None]

    if cfg.smooth_loss_type == "ReproDisparityLaplacian":
        rz = (
            1.0 / jnp.maximum(p01[..., 2], _EPS)
            + 1.0 / jnp.maximum(p21[..., 2], _EPS)
            - 2.0 / jnp.maximum(p1[..., 2], _EPS)
        )
    else:
        base = p1[..., 2]
        other = p01[..., 2] + p21[..., 2] - p1[..., 2]
        mx, mn = jnp.maximum(base, other), jnp.minimum(base, other)
        if cfg.smooth_loss_type == "ReproDepthRatioConsistency":
            rz = mx / jnp.where(jnp.abs(mn) > _EPS, mn, _EPS) - 1.0
        elif cfg.smooth_loss_type == "ReproLogDepthConsistency":
            rz = jnp.log(jnp.maximum(mn / jnp.maximum(mx, _EPS), _EPS))
        else:
            raise ValueError(cfg.smooth_loss_type)
    return jnp.stack([rx, ry, rz], axis=-1)


def scale_reg_residuals(
    params: SolverParams,
    cfg: SceneConfig,
    median_depth: jnp.ndarray,
    grid_locs: jnp.ndarray,
    W=None,
) -> jnp.ndarray:
    """TargetDisparityCost on a per-frame grid of sample points -> (N, G)
    (reference lib/PoseOptimizer.cpp:488-517, 1341-1415). Pins the
    transformed median depth to disparity 1.0 — fixes the global scale.

    median_depth: (N,) per-frame median SOURCE depth; grid_locs: (G, 2) NDC.
    """
    N = params.depth_grid.shape[0]
    G = grid_locs.shape[0]
    locs = jnp.broadcast_to(grid_locs[None], (N, G, 2))
    med = jnp.broadcast_to(median_depth[:, None], (N, G))
    rows = params.depth_grid.reshape(N, -1)
    if W is not None:
        scale = jnp.einsum("ngk,nk->ng", W, rows, precision=_HI)
    else:
        scale = _eval_depth_scale_rows(rows, cfg.depth_spec, locs, med)
    depth = med * scale
    if params.depth_shift is not None:
        srows = params.depth_shift.reshape(N, -1)
        if W is not None:
            depth = depth + jnp.einsum("ngk,nk->ng", W, srows, precision=_HI)
        else:
            depth = depth + _eval_depth_scale_rows(
                srows, cfg.depth_spec, locs, med
            )
    return 1.0 / jnp.maximum(depth, _EPS) - 1.0


def position_reg_residuals(params: SolverParams) -> jnp.ndarray:
    """Second-difference Laplacian over camera positions -> (N-2, 3)
    (reference ParameterRegularizationCost over positions,
    lib/PoseOptimizer.cpp:464-483, 1417-1447)."""
    p = params.pose[:, 0:3]
    return p[:-2] - 2.0 * p[1:-1] + p[2:]


def focal_reg_residuals(params: SolverParams, cfg: SceneConfig) -> jnp.ndarray:
    """(focal - target) per frame (reference TargetFocalCost,
    lib/PoseOptimizer.cpp:520-533, 1524-1549)."""
    return params.focal - cfg.fixed_vfocal


class StageAux(NamedTuple):
    """Dynamic (device-resident) inputs to one solver stage, passed through
    jit as arguments — never baked into the executable as constants.

    adaptive_weights: (N, E) per-edge deformation multipliers implementing
    AdaptiveDeformationCost (reference lib/PoseOptimizer.cpp:559-656),
    already combined as (base + max-neighbor-dynamic-fraction * adaptive);
    None selects the uniform DeformationCost path.
    """

    data: ConstraintData
    median_depth: jnp.ndarray
    scale_grid_locs: jnp.ndarray
    triplets: TripletData | None = None
    adaptive_weights: jnp.ndarray | None = None
    taps: DenseTaps | None = None


def build_residual_fn(
    cfg: SceneConfig,
    opt: PoseOptParams,
    depth_deform_weight: float,
    use_triplets: bool = False,
    use_adaptive: bool = False,
):
    """Assemble the full weighted residual vector function for one stage.

    Returns `fn(params, irls_weight, aux: StageAux) -> flat residuals`, where
    `irls_weight` (P, C) carries the frozen per-constraint robustification
    weights (sqrt of the Cauchy IRLS weight), recomputed between LM outer
    iterations.
    """

    sqrt_scale_reg = float(np.sqrt(opt.scale_regularization)) if opt.scale_regularization > 0 else 0.0
    sqrt_focal_reg = float(np.sqrt(opt.focal_regularization)) if opt.focal_regularization > 0 else 0.0
    sqrt_pos_reg = float(np.sqrt(opt.position_regularization)) if opt.position_regularization > 0 else 0.0

    def fn(params: SolverParams, irls_weight: jnp.ndarray, aux: StageAux) -> jnp.ndarray:
        parts = []

        r_static = static_scene_residuals(params, cfg, aux.data, aux.taps)
        w = (aux.data.weight * irls_weight)[..., None]
        parts.append((r_static * w).reshape(-1))

        if use_triplets:
            r_sm = smoothness_residuals(params, cfg, aux.triplets)
            parts.append(
                (r_sm * jnp.sqrt(aux.triplets.weight)[..., None]).reshape(-1)
            )

        if sqrt_scale_reg > 0.0 and not opt.fix_depth_transforms:
            r_scale = scale_reg_residuals(
                params, cfg, aux.median_depth, aux.scale_grid_locs,
                aux.taps.scale_reg if aux.taps is not None else None,
            )
            parts.append((r_scale * sqrt_scale_reg).reshape(-1))

        if depth_deform_weight > 0.0:
            r_def = xforms.depth_deform_residuals(params.depth_grid)
            if use_adaptive:
                # reference multiplier: baseWeight + w_edge * adaptiveWeight
                # (lib/PoseOptimizer.cpp:631-646)
                r_def = r_def * (depth_deform_weight + aux.adaptive_weights)
            else:
                r_def = r_def * depth_deform_weight
            parts.append(r_def.reshape(-1))
            if params.depth_shift is not None:
                r_sh = xforms.shift_deform_residuals(params.depth_shift)
                parts.append((r_sh * depth_deform_weight).reshape(-1))

        if opt.spatial_deformation_regularization > 0.0:
            r_sp = xforms.spatial_deform_residuals(params.spatial_grid)
            parts.append((r_sp * opt.spatial_deformation_regularization).reshape(-1))

        if sqrt_focal_reg > 0.0 and cfg.intr_opt != "Fixed":
            parts.append(focal_reg_residuals(params, cfg) * sqrt_focal_reg)

        if sqrt_pos_reg > 0.0:
            parts.append((position_reg_residuals(params) * sqrt_pos_reg).reshape(-1))

        return jnp.concatenate(parts)

    return fn


def cauchy_irls_weight(r_static: jnp.ndarray, robustness: float) -> jnp.ndarray:
    """sqrt of the Cauchy IRLS weight per constraint.

    Ceres CauchyLoss(a): rho(s) = a^2 log(1 + s / a^2) applied to the SQUARED
    residual norm s (reference lib/PoseOptimizer.cpp:954-962 uses
    CauchyLoss(params.robustness)); the IRLS weight is rho'(s) = 1/(1 + s/a^2).
    """
    a2 = robustness * robustness
    s = jnp.sum(r_static * r_static, axis=-1)
    return 1.0 / jnp.sqrt(1.0 + s / a2)


# ---------------------------------------------------------------------------
# Exact diag(J^T J) for Jacobi preconditioning (solver/lm.py).
# ---------------------------------------------------------------------------




def build_diag_fn(
    cfg: SceneConfig,
    opt: PoseOptParams,
    depth_deform_weight: float,
    use_triplets: bool = False,
    use_adaptive: bool = False,
    pose_blocks: bool = False,
):
    """Exact diagonal of the Gauss-Newton matrix J^T J for the stage built
    by `build_residual_fn` with the same arguments.

    diag(J^T J)_k = sum over scalar residuals r_s of (w_s dr_s/dx_k)^2.
    Every family's contribution comes from autodiff of the TRUE residual
    function on a per-sample mini-problem (no hand-derived Jacobians to
    drift). Grid handles enter each residual only through interpolated
    SCALARS (scale/shift/warp = <taps, handles>), so the mini-problem is
    built on one-handle grids holding the interpolated values and the
    per-handle diagonal follows by the rank-1 chain rule:
    (dr/dhandle_g)^2 = (dr/dscalar)^2 * tap_g^2 — contracted with the
    squared dense taps on the MXU instead of materializing (P, C, 3, 2, G)
    grid Jacobians (G x less memory). Shared intrinsics accumulate the
    focal curvature on handle 0 through the same slot the residual reads.
    Matches build_residual_fn exactly — validated against a materialized
    J^T J in tests/test_solver.py.

    Returns `fn(params, irls_weight, aux) -> SolverParams-shaped pytree`
    (requires aux.taps). Callers add the LM damping lambda themselves.

    pose_blocks=True additionally accumulates the exact per-frame 6x6 pose
    blocks of J^T J (dropping only the pose_i x pose_j cross-frame
    couplings — block-Jacobi by definition) from the same per-sample
    jacobians, and `fn` returns `(diag_tree, blocks (N, 6, 6))`. Measured
    on the real pose problem (PERF.md): frame-structured preconditioning
    cuts CG iterations far below what the diagonal alone reaches
    (22-37 vs 62 from 163 plain).
    """

    sqrt_scale_reg = float(np.sqrt(opt.scale_regularization)) if opt.scale_regularization > 0 else 0.0
    sqrt_focal_reg = float(np.sqrt(opt.focal_regularization)) if opt.focal_regularization > 0 else 0.0
    sqrt_pos_reg = float(np.sqrt(opt.position_regularization)) if opt.position_regularization > 0 else 0.0
    shared_intr = cfg.intr_opt == "Shared"

    def fn(params: SolverParams, irls_weight: jnp.ndarray, aux: StageAux):
        assert aux.taps is not None, "exact diag needs dense taps"
        N = params.pose.shape[0]
        data = aux.data
        Gd = aux.taps.d0.shape[-1]
        Gs = aux.taps.s0.shape[-1]
        dshape = params.depth_grid.shape[1:]
        has_shift = params.depth_shift is not None

        d_pose = jnp.zeros_like(params.pose)
        b_pose = (
            jnp.zeros((N, 6, 6), params.pose.dtype) if pose_blocks else None
        )
        d_focal = jnp.zeros_like(params.focal)
        d_dgrid = jnp.zeros((N, Gd), params.depth_grid.dtype)
        d_sgrid = jnp.zeros((N, Gs, 2), params.spatial_grid.dtype)
        d_shift = jnp.zeros((N, Gd), params.depth_grid.dtype) if has_shift else None

        drows = params.depth_grid.reshape(N, -1)
        srows3 = params.spatial_grid.reshape(N, -1, 2)
        shrows = params.depth_shift.reshape(N, -1) if has_shift else None
        ones111 = jnp.ones((1, 1, 1), params.depth_grid.dtype)
        argnums = (0, 1, 2, 3) + ((4,) if has_shift else ())

        def mini_params(pose_k, focal_k, s_k, warp_k, shift_k, K):
            return SolverParams(
                pose=pose_k,
                focal=focal_k,
                depth_grid=s_k.reshape(K, 1, 1, 1),
                spatial_grid=warp_k.reshape(K, 1, 1, 2),
                depth_shift=(
                    shift_k.reshape(K, 1, 1, 1) if has_shift else None
                ),
            )

        def gather_focal(frames_k):
            # the VALUE each mini slot must hold so _focal_xy reproduces
            # the true focal: Shared reads mini.focal[0], so every slot
            # carries the true shared focal and its gradient lands on
            # slot 0 alone (the full shared derivative).
            if shared_intr:
                return jnp.broadcast_to(
                    params.focal[0], frames_k.shape
                )
            return params.focal[frames_k]

        # ---- static scene: per-sample 2-frame mini-problem ----------------
        def pair_res(pose2, focal2, s2, warp2, shift2, loc0, d0, loc1, d1):
            mini = mini_params(pose2, focal2, s2, warp2, shift2, 2)
            mdata = ConstraintData(
                pair=jnp.asarray([[0, 1]], jnp.int32),
                loc0=loc0[None, None], loc1=loc1[None, None],
                depth0=d0[None, None], depth1=d1[None, None],
                weight=jnp.ones((1, 1), jnp.float32),
            )
            mtaps = DenseTaps(
                d0=ones111, d1=ones111, s0=ones111, s1=ones111,
                scale_reg=None,
            )
            return static_scene_residuals(mini, cfg, mdata, mtaps)[0, 0]

        fi, fj = data.pair[:, 0], data.pair[:, 1]
        # interpolated scalars at the current point (what the residual sees)
        s0 = jnp.einsum("pcg,pg->pc", aux.taps.d0, drows[fi], precision=_HI)
        s1 = jnp.einsum("pcg,pg->pc", aux.taps.d1, drows[fj], precision=_HI)
        w0 = jnp.einsum("pcs,psd->pcd", aux.taps.s0, srows3[fi], precision=_HI)
        w1 = jnp.einsum("pcs,psd->pcd", aux.taps.s1, srows3[fj], precision=_HI)
        if has_shift:
            sh0 = jnp.einsum("pcg,pg->pc", aux.taps.d0, shrows[fi], precision=_HI)
            sh1 = jnp.einsum("pcg,pg->pc", aux.taps.d1, shrows[fj], precision=_HI)

        jac = jax.vmap(jax.vmap(
            jax.jacrev(pair_res, argnums=argnums),
            in_axes=(None, None, 0, 0, 0 if has_shift else None, 0, 0, 0, 0),
        ), in_axes=(0, 0, 0, 0, 0 if has_shift else None, 0, 0, 0, 0))
        pose2 = jnp.stack([params.pose[fi], params.pose[fj]], axis=1)
        focal2 = jnp.stack([gather_focal(fi), gather_focal(fj)], axis=1)
        s2 = jnp.stack([s0, s1], axis=-1)              # (P, C, 2)
        warp2 = jnp.stack([w0, w1], axis=-2)           # (P, C, 2, 2)
        shift2 = jnp.stack([sh0, sh1], axis=-1) if has_shift else None
        grads = jac(
            pose2, focal2, s2, warp2, shift2,
            data.loc0, data.depth0, data.loc1, data.depth1,
        )
        w2 = jnp.square(data.weight * irls_weight)[..., None]  # (P, C, 1)

        def _acc_frames(sq_slot, taps_pair, acc):
            """sq_slot (P, C, K) per-slot squared scalar-grads; contract
            with squared taps and scatter-add per frame."""
            for k, (frames_k, taps_k) in enumerate(taps_pair):
                contrib = jnp.einsum(
                    "pc,pcg->pg", sq_slot[..., k], jnp.square(taps_k),
                    precision=_HI,
                )
                acc = acc.at[frames_k].add(contrib)
            return acc

        # pose: (P, C, 3, 2, 6)
        sq_pose = jnp.sum(jnp.square(grads[0]) * w2[..., None, None], axis=(1, 2))
        d_pose = d_pose.at[fi].add(sq_pose[:, 0]).at[fj].add(sq_pose[:, 1])
        if pose_blocks:
            for k, fk in ((0, fi), (1, fj)):
                bk = jnp.einsum(
                    "pcra,pcrb,pc->pab",
                    grads[0][:, :, :, k, :], grads[0][:, :, :, k, :],
                    w2[..., 0], precision=_HI,
                )
                b_pose = b_pose.at[fk].add(bk)
        # focal: (P, C, 3, 2)
        sq_focal = jnp.sum(jnp.square(grads[1]) * w2[..., None], axis=(1, 2))
        if shared_intr:
            d_focal = d_focal.at[0].add(jnp.sum(sq_focal[:, 0]))
        else:
            d_focal = d_focal.at[fi].add(sq_focal[:, 0]).at[fj].add(sq_focal[:, 1])
        # depth scale: (P, C, 3, 2) scalar grads -> rank-1 tap contraction
        sq_s = jnp.sum(jnp.square(grads[2]) * w2[..., None], axis=2)  # (P, C, 2)
        d_dgrid = _acc_frames(
            sq_s, [(fi, aux.taps.d0), (fj, aux.taps.d1)], d_dgrid
        )
        # warp: (P, C, 3, 2, 2) -> per slot/channel
        sq_w = jnp.sum(jnp.square(grads[3]) * w2[..., None, None], axis=2)  # (P, C, 2, 2)
        for ch in range(2):
            d_sgrid = d_sgrid.at[:, :, ch].set(_acc_frames(
                sq_w[..., ch],
                [(fi, aux.taps.s0), (fj, aux.taps.s1)],
                d_sgrid[:, :, ch],
            ))
        if has_shift:
            sq_sh = jnp.sum(jnp.square(grads[4]) * w2[..., None], axis=2)
            d_shift = _acc_frames(
                sq_sh, [(fi, aux.taps.d0), (fj, aux.taps.d1)], d_shift
            )

        # ---- scene-flow smoothness: per-sample 3-frame mini-problem -------
        if use_triplets and aux.triplets is not None:
            trip = aux.triplets
            f3 = jnp.stack(
                [trip.frame - 1, trip.frame, trip.frame + 1], axis=1
            )  # (T, 3)

            def trip_res(pose3, focal3, s3, warp3, shift3, loc, depth):
                mini = mini_params(pose3, focal3, s3, warp3, shift3, 3)
                mdata = TripletData(
                    frame=jnp.asarray([1], jnp.int32),
                    loc=loc[None, None],
                    depth=depth[None, None],
                    weight=jnp.ones((1, 1), jnp.float32),
                )
                # one-handle grids: interpolation is identity on the held
                # scalars regardless of spec (taps path not used here, so
                # give the mini problem matching one-handle specs)
                mini_cfg = cfg._replace(
                    depth_spec=GridSpec(gx=1, gy=1, gz=1),
                    spatial_spec=GridSpec(gx=1, gy=1),
                )
                return smoothness_residuals(mini, mini_cfg, mdata)[0, 0]

            # interpolated scalars + dense taps per triplet slot
            t_s, t_w, t_sh, t_dtaps, t_staps = [], [], [], [], []
            for k in range(3):
                fk = f3[:, k]
                lock = trip.loc[:, :, k]
                depk = trip.depth[:, :, k]
                dW = dense_tap_weights(cfg.depth_spec, lock, depk)
                sW = dense_tap_weights(cfg.spatial_spec, lock)
                t_dtaps.append(dW)
                t_staps.append(sW)
                t_s.append(jnp.einsum("pcg,pg->pc", dW, drows[fk], precision=_HI))
                t_w.append(jnp.einsum("pcs,psd->pcd", sW, srows3[fk], precision=_HI))
                if has_shift:
                    t_sh.append(jnp.einsum("pcg,pg->pc", dW, shrows[fk], precision=_HI))

            tjac = jax.vmap(jax.vmap(
                jax.jacrev(trip_res, argnums=argnums),
                in_axes=(None, None, 0, 0, 0 if has_shift else None, 0, 0),
            ), in_axes=(0, 0, 0, 0, 0 if has_shift else None, 0, 0))
            pose3 = params.pose[f3]
            focal3 = (
                jnp.broadcast_to(params.focal[0], f3.shape)
                if shared_intr else params.focal[f3]
            )
            s3 = jnp.stack(t_s, axis=-1)                 # (T, C, 3)
            warp3 = jnp.stack(t_w, axis=-2)              # (T, C, 3, 2)
            shift3 = jnp.stack(t_sh, axis=-1) if has_shift else None
            tgrads = tjac(pose3, focal3, s3, warp3, shift3,
                          trip.loc, trip.depth)
            tw2 = trip.weight[..., None]  # residual folds sqrt(weight)

            sq_pose_t = jnp.sum(
                jnp.square(tgrads[0]) * tw2[..., None, None], axis=(1, 2)
            )  # (T, 3, 6)
            sq_focal_t = jnp.sum(
                jnp.square(tgrads[1]) * tw2[..., None], axis=(1, 2)
            )  # (T, 3)
            sq_s_t = jnp.sum(jnp.square(tgrads[2]) * tw2[..., None], axis=2)
            sq_w_t = jnp.sum(
                jnp.square(tgrads[3]) * tw2[..., None, None], axis=2
            )  # (T, C, 3, 2)
            if has_shift:
                sq_sh_t = jnp.sum(jnp.square(tgrads[4]) * tw2[..., None], axis=2)
            for k in range(3):
                fk = f3[:, k]
                d_pose = d_pose.at[fk].add(sq_pose_t[:, k])
                if pose_blocks:
                    # true J = sqrt(weight) * tgrads (the triplet residual
                    # folds sqrt(weight)), so J_a J_b = weight * g_a g_b —
                    # same weighting sq_pose_t uses above
                    b_pose = b_pose.at[fk].add(jnp.einsum(
                        "pcra,pcrb,pc->pab",
                        tgrads[0][:, :, :, k, :], tgrads[0][:, :, :, k, :],
                        trip.weight, precision=_HI,
                    ))
                if shared_intr:
                    if k == 0:
                        d_focal = d_focal.at[0].add(jnp.sum(sq_focal_t[:, 0]))
                else:
                    d_focal = d_focal.at[fk].add(sq_focal_t[:, k])
                d_dgrid = d_dgrid.at[fk].add(jnp.einsum(
                    "pc,pcg->pg", sq_s_t[..., k],
                    jnp.square(t_dtaps[k]), precision=_HI,
                ))
                for ch in range(2):
                    d_sgrid = d_sgrid.at[fk, :, ch].add(jnp.einsum(
                        "pc,pcg->pg", sq_w_t[..., k, ch],
                        jnp.square(t_staps[k]), precision=_HI,
                    ))
                if has_shift:
                    d_shift = d_shift.at[fk].add(jnp.einsum(
                        "pc,pcg->pg", sq_sh_t[..., k],
                        jnp.square(t_dtaps[k]), precision=_HI,
                    ))

        # ---- scale regularizer: rank-1 tap contraction too -----------------
        if sqrt_scale_reg > 0.0 and not opt.fix_depth_transforms:
            W = aux.taps.scale_reg  # (N, G, Gd)
            med = aux.median_depth  # (N,)
            scale = jnp.einsum("ngk,nk->ng", W, drows, precision=_HI)
            depth = med[:, None] * scale
            if has_shift:
                depth = depth + jnp.einsum("ngk,nk->ng", W, shrows, precision=_HI)
            # r = sqrt_scale * (1/max(depth, eps) - 1);
            # dr/dscale = -sqrt_scale * med / depth^2 (0 in the clip region)
            live = depth > _EPS
            dr_ddepth = jnp.where(
                live, -sqrt_scale_reg / jnp.square(jnp.maximum(depth, _EPS)), 0.0
            )
            d_dgrid = d_dgrid + jnp.einsum(
                "ng,ngk->nk", jnp.square(dr_ddepth * med[:, None]),
                jnp.square(W), precision=_HI,
            )
            if has_shift:
                d_shift = d_shift + jnp.einsum(
                    "ng,ngk->nk", jnp.square(dr_ddepth), jnp.square(W),
                    precision=_HI,
                )

        # ---- deformation regularizers: per-frame autodiff -----------------
        if depth_deform_weight > 0.0:
            def frame_def(row, wmul):
                r = xforms.depth_deform_residuals(row.reshape(dshape))
                return r * wmul

            wmul = (
                depth_deform_weight + aux.adaptive_weights
                if use_adaptive else
                jnp.full(
                    (N,) + xforms.depth_deform_residuals(
                        params.depth_grid[0]
                    ).shape,
                    depth_deform_weight,
                )
            )
            jd = jax.vmap(jax.jacrev(frame_def))(drows, wmul)
            d_dgrid = d_dgrid + jnp.sum(jnp.square(jd), axis=1)
            if has_shift:
                def frame_shdef(row):
                    return xforms.shift_deform_residuals(
                        row.reshape(dshape)
                    ) * depth_deform_weight

                js = jax.vmap(jax.jacrev(frame_shdef))(shrows)
                d_shift = d_shift + jnp.sum(jnp.square(js), axis=1)

        if opt.spatial_deformation_regularization > 0.0:
            # residual == the handles themselves * weight -> diag is const
            d_sgrid = d_sgrid + opt.spatial_deformation_regularization ** 2

        # ---- focal / position regularizers --------------------------------
        if sqrt_focal_reg > 0.0 and cfg.intr_opt != "Fixed":
            # focal_reg_residuals reads every per-frame handle directly
            # (params.focal - target), independent of the intrinsics mode
            d_focal = d_focal + sqrt_focal_reg ** 2

        if sqrt_pos_reg > 0.0:
            jp = jax.jacrev(
                lambda pose: position_reg_residuals(
                    params._replace(pose=pose)
                ) * sqrt_pos_reg
            )(params.pose)  # (N-2, 3, N, 6)
            d_pose = d_pose + jnp.sum(jnp.square(jp), axis=(0, 1))
            if pose_blocks:
                # per-frame outer products of the same jacobian rows (the
                # cross-frame couplings are dropped — block-Jacobi)
                b_pose = b_pose + jnp.einsum(
                    "rcna,rcnb->nab", jp, jp, precision=_HI
                )

        diag_tree = SolverParams(
            pose=d_pose,
            focal=d_focal,
            depth_grid=d_dgrid.reshape(params.depth_grid.shape),
            spatial_grid=d_sgrid.reshape(params.spatial_grid.shape),
            depth_shift=(
                d_shift.reshape(params.depth_shift.shape) if has_shift else None
            ),
        )
        if pose_blocks:
            return diag_tree, b_pose
        return diag_tree

    return fn
