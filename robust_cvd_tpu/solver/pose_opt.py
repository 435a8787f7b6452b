"""Pose / deformation optimization driver.

Orchestrates the TPU LM solver the way the reference drives Ceres
(lib/PoseOptimizer.cpp:788-990 `poseOptimization` + :992-1147
`normalizeDepth`, invoked through pose_optimization.py:177-240):

  1. Reset transforms: Global(Scale) depth xform, Identity spatial xform.
  2. normalize_depth: per-frame scale init pinning the median source depth to
     disparity 1.0 (first frame's transform copied to all frames).
  3. numSteps LM solves with coarse-to-fine depth-grid subdivision
     1x1 -> ctf_long x ctf_short and log-annealed deformation regularization.
  4. Optional deferred spatial optimization: a final solve with a bicubic
     warp grid.

Each coarse-to-fine stage has its own static grid shape, so each stage is a
separately-jitted LM program. Residual functions are built through cached
factories keyed on (static config) so jit caches are reused across
fine-tuning epochs; all constraint tensors flow through as dynamic jit
arguments (never baked into executables).
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import PoseOptParams
from . import lm, residuals, xforms
from .lm import LMConfig
from .residuals import ConstraintData, SceneConfig, SolverParams, StageAux, TripletData
from .xforms import GridSpec


class PoseOptInputs(NamedTuple):
    """Static inputs to a pose optimization (constant across LM stages)."""

    data: ConstraintData
    median_depth: jnp.ndarray  # (N,) per-frame median source depth
    aspect: float
    num_frames: int
    triplets: TripletData | None = None
    # (N, h, w) dynamic masks (white/True = static) for
    # AdaptiveDeformationCost (reference lib/PoseOptimizer.cpp:559-656)
    dynamic_mask: object = None


def scale_reg_grid_locs(opt: PoseOptParams, aspect: float) -> jnp.ndarray:
    """NDC sample locations for the scale regularizer
    (reference lib/PoseOptimizer.cpp:1341-1352, 1382-1385)."""
    gx = opt.scale_regularization_grid_size
    gy = int(round(gx / aspect))
    if aspect <= 1.0:
        gx, gy = gy, gx
    xs = np.linspace(-1.0, 1.0, gx)
    ys = np.linspace(-1.0, 1.0, gy)
    X, Y = np.meshgrid(xs, ys)
    return jnp.asarray(np.stack([X.ravel(), Y.ravel()], axis=-1), jnp.float32)


def ctf_grid_schedule(opt: PoseOptParams, aspect: float) -> list:
    """Depth-grid size per solver step (reference .cpp:795-871)."""
    ctf_rows, ctf_cols = opt.ctf_long, opt.ctf_short
    if aspect >= 1.0:
        ctf_rows, ctf_cols = ctf_cols, ctf_rows
    init = (1, 1)  # Global transform
    sizes = [init]
    if opt.coarse_to_fine and opt.num_steps > 1:
        for step in range(opt.num_steps - 1):
            it = (step + 1) / (opt.num_steps - 1)
            gx = int(init[0] + (ctf_cols - init[0]) * it + 0.5)
            gy = int(init[1] + (ctf_rows - init[1]) * it + 0.5)
            sizes.append((gx, gy))
    else:
        sizes += [init] * (opt.num_steps - 1)
    return sizes[: opt.num_steps]


def default_solver_params(
    num_frames: int, focal: jnp.ndarray, value_xform: str = "Scale"
) -> SolverParams:
    """Fresh Global(Scale)/Identity transforms (reference
    pose_optimization.py:195-207 Reset* ops). value_xform "ScaleShift" adds
    additive handles (reference lib/ValueTransform.h:57-94)."""
    return SolverParams(
        pose=jnp.zeros((num_frames, 6), jnp.float32),
        focal=focal,
        depth_grid=jnp.ones((num_frames, 1, 1, 1), jnp.float32),
        spatial_grid=jnp.zeros((num_frames, 1, 1, 2), jnp.float32),
        depth_shift=(
            jnp.zeros((num_frames, 1, 1, 1), jnp.float32)
            if value_xform == "ScaleShift"
            else None
        ),
    )


def _lm_config(opt: PoseOptParams) -> LMConfig:
    # --opt.max_iterations (Ceres' per-solve iteration cap, reference
    # lib/PoseOptimizer.h:56, .cpp:954-961) bounds the LM outer iterations;
    # at the defaults (1000 vs 50) the LM's own cap binds first.
    return LMConfig(
        max_outer=min(opt.lm_max_outer, opt.max_iterations),
        cg_iters=opt.lm_cg_iters,
        lam_init=opt.lm_lambda_init,
        rtol=opt.lm_rtol,
        robustness=opt.robustness,
        precond_probes=opt.lm_precond_probes,
    )


def _v_focal(opt: PoseOptParams, aspect: float) -> float:
    return opt.focal_long / aspect if aspect >= 1.0 else opt.focal_long


# --------------------------------------------------------------------------
# Cached residual-fn factories: the SAME fn object is returned for the same
# static configuration, so lm.solve's jit cache is hit across epochs.
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _normalize_res_fn(cfg: SceneConfig, sqrt_scale: float, deform_w: float):
    def wres(p: SolverParams, w, aux: StageAux):
        parts = [
            (
                residuals.scale_reg_residuals(
                    p, cfg, aux.median_depth, aux.scale_grid_locs,
                    aux.taps.scale_reg if aux.taps is not None else None,
                )
                * sqrt_scale
            ).reshape(-1)
        ]
        if deform_w > 0.0:
            parts.append(
                (xforms.depth_deform_residuals(p.depth_grid) * deform_w).reshape(-1)
            )
        return jnp.concatenate(parts)

    return wres


@lru_cache(maxsize=None)
def _stage_res_fn(
    cfg: SceneConfig, opt: PoseOptParams, deform_w: float,
    use_triplets: bool, use_adaptive: bool = False,
):
    return residuals.build_residual_fn(
        cfg, opt, depth_deform_weight=deform_w,
        use_triplets=use_triplets, use_adaptive=use_adaptive,
    )


@lru_cache(maxsize=None)
def _stage_diag_fn(
    cfg: SceneConfig, opt: PoseOptParams, deform_w: float,
    use_triplets: bool, use_adaptive: bool = False,
):
    return residuals.build_diag_fn(
        cfg, opt, depth_deform_weight=deform_w,
        use_triplets=use_triplets, use_adaptive=use_adaptive,
        pose_blocks=opt.lm_precond_pose_blocks,
    )


@lru_cache(maxsize=None)
def _robust_fn(cfg: SceneConfig):
    def robust(p: SolverParams, aux: StageAux):
        return residuals.static_scene_residuals(p, cfg, aux.data, aux.taps)

    return robust


def _project_nonneg(p: SolverParams) -> SolverParams:
    return p._replace(depth_grid=jnp.maximum(p.depth_grid, 0.0))


def _make_cfg(opt: PoseOptParams, inputs: PoseOptInputs, params: SolverParams,
              spatial_cubic: bool = False) -> SceneConfig:
    gz, gy, gx = params.depth_grid.shape[1:]
    sy, sx = params.spatial_grid.shape[1:3]
    return SceneConfig(
        aspect=inputs.aspect,
        depth_spec=GridSpec(gx=gx, gy=gy, gz=gz),
        spatial_spec=GridSpec(gx=sx, gy=sy, cubic=spatial_cubic),
        static_loss_type=opt.static_loss_type,
        smooth_loss_type=opt.smooth_loss_type,
        intr_opt=opt.intr_opt,
        fixed_vfocal=_v_focal(opt, inputs.aspect),
        static_spatial_weight=opt.static_spatial_weight,
        static_depth_weight=opt.static_depth_weight,
    )


def _aux(
    opt: PoseOptParams,
    inputs: PoseOptInputs,
    use_triplets: bool,
    cfg: SceneConfig | None = None,
) -> StageAux:
    locs = scale_reg_grid_locs(opt, inputs.aspect)
    taps = None
    adaptive = None
    if cfg is not None:
        taps = residuals.build_dense_taps(
            cfg, inputs.data, inputs.median_depth, locs
        )
        if (
            opt.adaptive_deformation_cost > 0.0
            and inputs.dynamic_mask is not None
        ):
            # store the adaptive TERM only (w_edge * adaptiveCost); the
            # residual fn adds the stage's depth_deform_weight as the base
            # (reference multiplier: baseWeight + w * adaptiveWeight)
            adaptive = xforms.adaptive_deform_weights(
                inputs.dynamic_mask, cfg.depth_spec,
                base_weight=0.0,
                adaptive_weight=opt.adaptive_deformation_cost,
            )
    return StageAux(
        data=inputs.data,
        median_depth=inputs.median_depth,
        scale_grid_locs=locs,
        triplets=inputs.triplets if use_triplets else None,
        taps=taps,
        adaptive_weights=adaptive,
    )


def normalize_depth(
    opt: PoseOptParams, inputs: PoseOptInputs, params: SolverParams
) -> SolverParams:
    """Depth normalization (reference lib/PoseOptimizer.cpp:992-1147).

    Default path (normalize_depth_from_first_frame): only the scale
    regularizer constrains each frame's transform — pinning each frame's
    median source depth to disparity 1 — then the FIRST frame's transform is
    copied to all frames. Scale handles are bounded below by 0.
    """
    cfg = _make_cfg(opt, inputs, params)
    sqrt_scale = math.sqrt(max(opt.scale_regularization, 0.0))
    wres = _normalize_res_fn(
        cfg, sqrt_scale, opt.deformation_regularization_initial
    )
    mask = lm.make_mask(params, fix_poses=True, fix_focal=True, fix_spatial=True)
    out = lm.solve(
        wres,
        None,
        params,
        mask,
        _lm_config(opt),
        aux=_aux(opt, inputs, use_triplets=False, cfg=cfg),
        project_fn=_project_nonneg,
    )
    solved = out.params

    if opt.normalize_depth_from_first_frame:
        first = solved.depth_grid[0:1]
        solved = solved._replace(
            depth_grid=jnp.broadcast_to(first, solved.depth_grid.shape)
        )
        if solved.depth_shift is not None:
            solved = solved._replace(
                depth_shift=jnp.broadcast_to(
                    solved.depth_shift[0:1], solved.depth_shift.shape
                )
            )
    return solved


def _solve_step(
    opt: PoseOptParams,
    inputs: PoseOptInputs,
    params: SolverParams,
    depth_deform_weight: float,
    spatial_cubic: bool = False,
) -> SolverParams:
    """One poseOptimizationStep (reference .cpp:890-990) as an LM solve."""
    cfg = _make_cfg(opt, inputs, params, spatial_cubic)
    use_smooth = (
        opt.smooth_static_weight > 0.0 or opt.smooth_dynamic_weight > 0.0
    ) and inputs.triplets is not None
    use_adaptive = (
        opt.adaptive_deformation_cost > 0.0 and inputs.dynamic_mask is not None
    )

    res_fn = _stage_res_fn(cfg, opt, depth_deform_weight, use_smooth, use_adaptive)
    robust_fn = _robust_fn(cfg)
    diag_fn = (
        _stage_diag_fn(cfg, opt, depth_deform_weight, use_smooth, use_adaptive)
        if opt.lm_precond_exact
        else None
    )

    fix_spatial = opt.fix_spatial_transforms or (
        params.spatial_grid.shape[1] == 1 and params.spatial_grid.shape[2] == 1
    )
    mask = lm.make_mask(
        params,
        fix_poses=opt.fix_poses,
        fix_focal=(opt.intr_opt == "Fixed") or opt.fix_poses,
        fix_depth=opt.fix_depth_transforms,
        fix_spatial=fix_spatial,
    )

    out = lm.solve(
        res_fn,
        robust_fn,
        params,
        mask,
        _lm_config(opt),
        aux=_aux(opt, inputs, use_smooth, cfg=cfg),
        diag_fn=diag_fn,
    )
    return out.params


def optimize_poses(
    opt: PoseOptParams, inputs: PoseOptInputs, params: SolverParams
) -> SolverParams:
    """Full multi-step optimization (reference .cpp:788-888)."""
    sizes = ctf_grid_schedule(opt, inputs.aspect)

    if opt.deferred_spatial_opt:
        params = params._replace(
            spatial_grid=xforms.init_spatial_grid(inputs.num_frames, 1, 1)
        )

    for step in range(opt.num_steps):
        step_iter = step / (opt.num_steps - 1) if opt.num_steps > 1 else 0.0
        if opt.graduate_deformation_regularization:
            lo = math.log(opt.deformation_regularization_initial)
            hi = math.log(opt.deformation_regularization_final)
            deform = math.exp(lo + (hi - lo) * step_iter)
        else:
            deform = opt.deformation_regularization_final

        params = _solve_step(opt, inputs, params, deform)

        if opt.coarse_to_fine and step < opt.num_steps - 1:
            gx, gy = sizes[step + 1]
            gz = params.depth_grid.shape[1]
            params = params._replace(
                depth_grid=xforms.split_grid(
                    params.depth_grid, GridSpec(gx=gx, gy=gy, gz=gz)
                )
            )
            if params.depth_shift is not None:
                params = params._replace(
                    depth_shift=xforms.split_grid(
                        params.depth_shift, GridSpec(gx=gx, gy=gy, gz=gz)
                    )
                )

    if opt.deferred_spatial_opt:
        dso_rows, dso_cols = opt.dso_long, opt.dso_short
        if inputs.aspect >= 1.0:
            dso_rows, dso_cols = dso_cols, dso_rows
        params = params._replace(
            spatial_grid=xforms.init_spatial_grid(inputs.num_frames, dso_rows, dso_cols)
        )
        params = _solve_step(
            opt,
            inputs,
            params,
            opt.deformation_regularization_final,
            spatial_cubic=True,
        )

    return params


def _warm_run(
    opt: PoseOptParams, inputs: PoseOptInputs, initial: SolverParams
) -> SolverParams:
    """One refinement solve at the previous solution's grid resolution."""
    warm = dataclasses.replace(
        opt,
        lm_max_outer=opt.lm_warm_max_outer,
        lm_cg_iters=min(opt.lm_cg_iters, opt.lm_warm_cg_iters),
        # the exact-diag preconditioner does not help warm re-solves (they
        # start near the optimum, where conditioning no longer binds —
        # tools/warm_cap_sweep.py measured 0.4896 <= plain at equal caps);
        # its ~3-residual-eval build per outer would be pure overhead here
        lm_precond_exact=False,
    )
    sy, sx = initial.spatial_grid.shape[1:3]
    spatial_cubic = sx > 2 or sy > 2
    return _solve_step(
        warm,
        inputs,
        initial,
        opt.deformation_regularization_final,
        spatial_cubic=spatial_cubic,
    )


def run(
    opt: PoseOptParams,
    inputs: PoseOptInputs,
    focal: jnp.ndarray | None = None,
    initial: SolverParams | None = None,
) -> SolverParams:
    """normalize + optimize from fresh transforms — equivalent of one
    `PoseOptimizer.optimize_poses()` call (reference
    pose_optimization.py:177-240).

    With `opt.warm_start` and a previous solution, re-solving skips the
    reset-to-1x1 + normalization + full coarse-to-fine schedule and instead
    refines the previous solution at its final grid resolution with a
    reduced iteration cap. The reference re-runs all Ceres steps from reset
    transforms every epoch (pose_optimization.py:195-212); warm starting is
    convergence-equivalent on the synthetic golden scene
    (tests/test_pose_opt.py) and is the top wall-clock lever in the
    fine-tuning alternation.
    """
    if initial is not None and opt.warm_start:
        return _warm_run(opt, inputs, initial)
    value_xform = getattr(opt, "value_xform", "Scale")
    if initial is None:
        if focal is None:
            focal = jnp.full(
                (inputs.num_frames,), _v_focal(opt, inputs.aspect), jnp.float32
            )
        initial = default_solver_params(inputs.num_frames, focal, value_xform)
    else:
        # Reset transforms, keep poses/focal (reference resets each epoch).
        initial = initial._replace(
            depth_grid=jnp.ones((inputs.num_frames, 1, 1, 1), jnp.float32),
            spatial_grid=jnp.zeros((inputs.num_frames, 1, 1, 2), jnp.float32),
            depth_shift=(
                jnp.zeros((inputs.num_frames, 1, 1, 1), jnp.float32)
                if value_xform == "ScaleShift"
                else None
            ),
        )

    params = normalize_depth(opt, inputs, initial)
    params = optimize_poses(opt, inputs, params)

    if opt.use_global_scale:
        gs_opt = dataclasses.replace(
            opt, fix_poses=True, num_steps=1, coarse_to_fine=False
        )
        params = params._replace(
            depth_grid=jnp.ones((inputs.num_frames, 1, 1, 1), jnp.float32),
            spatial_grid=jnp.zeros((inputs.num_frames, 1, 1, 2), jnp.float32),
            depth_shift=(
                jnp.zeros((inputs.num_frames, 1, 1, 1), jnp.float32)
                if params.depth_shift is not None
                else None
            ),
        )
        params = normalize_depth(gs_opt, inputs, params)
        params = optimize_poses(gs_opt, inputs, params)

    return params
