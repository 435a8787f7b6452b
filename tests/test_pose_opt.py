"""End-to-end pose optimization on a tiny synthetic scene."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from robust_cvd_tpu.config import PoseOptParams
from robust_cvd_tpu.solver import pose_opt, residuals
from robust_cvd_tpu.solver.pose_opt import PoseOptInputs
from robust_cvd_tpu.solver.residuals import ConstraintData, SceneConfig, SolverParams
from robust_cvd_tpu.solver.xforms import GridSpec

from test_solver import make_scene


def _small_opt():
    # Tiny settings so the CPU test is fast: 2 steps, small CTF grid.
    return PoseOptParams(
        num_steps=2,
        ctf_long=4,
        ctf_short=3,
        lm_max_outer=25,
        lm_cg_iters=32,
        graduate_deformation_regularization=True,
    )


def test_normalize_depth_sets_median_to_unit_disparity():
    opt = _small_opt()
    true, cfg, data = make_scene(num_frames=3, pts_per_pair=8)
    inputs = PoseOptInputs(
        data=data,
        median_depth=jnp.array([2.0, 2.5, 3.0]),
        aspect=1.0,
        num_frames=3,
    )
    params = pose_opt.default_solver_params(3, jnp.full((3,), 0.5))
    out = pose_opt.normalize_depth(opt, inputs, params)
    # first frame's scale pins median depth 2.0 -> disparity 1 => scale 0.5;
    # and it is copied to all frames.
    scales = np.asarray(out.depth_grid).reshape(3)
    np.testing.assert_allclose(scales, 0.5, atol=1e-3)


def test_ctf_schedule():
    opt = PoseOptParams(num_steps=4, ctf_long=17, ctf_short=10)
    sizes = pose_opt.ctf_grid_schedule(opt, aspect=16 / 9)
    assert sizes[0] == (1, 1)
    assert sizes[-1] == (17, 10)  # landscape: gx = long side
    assert sizes == [(1, 1), (6, 4), (12, 7), (17, 10)]
    sizes_p = pose_opt.ctf_grid_schedule(opt, aspect=9 / 16)
    assert sizes_p[-1] == (10, 17)


def test_full_pose_optimization_reduces_residuals():
    opt = _small_opt()
    true, cfg, data = make_scene(num_frames=4, pts_per_pair=24)
    rng = np.random.default_rng(7)

    # The scene's source depths are perfect; corrupt them with per-frame
    # scale errors that the solver's depth transforms must undo.
    frame_scale = rng.uniform(0.8, 1.25, 4).astype(np.float32)
    s0 = frame_scale[np.asarray(data.pair[:, 0])][:, None]
    s1 = frame_scale[np.asarray(data.pair[:, 1])][:, None]
    data_corrupt = data._replace(
        depth0=data.depth0 / jnp.asarray(s0),
        depth1=data.depth1 / jnp.asarray(s1),
    )
    inputs = PoseOptInputs(
        data=data_corrupt,
        median_depth=jnp.asarray(2.0 / frame_scale),
        aspect=1.0,
        num_frames=4,
    )

    params = pose_opt.run(opt, inputs, focal=jnp.full((4,), 0.5))

    final_cfg = SceneConfig(
        aspect=1.0,
        depth_spec=GridSpec(
            gx=params.depth_grid.shape[3], gy=params.depth_grid.shape[2]
        ),
        spatial_spec=GridSpec(),
        intr_opt=opt.intr_opt,
        fixed_vfocal=0.5,
    )
    r = residuals.static_scene_residuals(params, final_cfg, data_corrupt)
    rms = float(jnp.sqrt(jnp.mean(r * r)))
    assert rms < 0.02, f"joint optimization failed to converge: rms={rms}"
    assert bool(jnp.all(jnp.isfinite(params.pose)))
    assert bool(jnp.all(params.depth_grid > 0))


def test_warm_start_equivalent_to_cold_resolve():
    """Epoch-style alternation: warm-started re-solves must reach a final
    residual as good as cold reset + full coarse-to-fine re-solves
    (the reference resets every epoch, pose_optimization.py:195-212)."""
    opt = _small_opt()  # warm_start=True by default
    cold_opt = dataclasses.replace(opt, warm_start=False)
    true, cfg, data = make_scene(num_frames=4, pts_per_pair=24)
    rng = np.random.default_rng(3)
    frame_scale = rng.uniform(0.8, 1.25, 4).astype(np.float32)
    s0 = frame_scale[np.asarray(data.pair[:, 0])][:, None]
    s1 = frame_scale[np.asarray(data.pair[:, 1])][:, None]
    data_corrupt = data._replace(
        depth0=data.depth0 / jnp.asarray(s0),
        depth1=data.depth1 / jnp.asarray(s1),
    )
    inputs = PoseOptInputs(
        data=data_corrupt,
        median_depth=jnp.asarray(2.0 / frame_scale),
        aspect=1.0,
        num_frames=4,
    )

    def rms(params):
        final_cfg = SceneConfig(
            aspect=1.0,
            depth_spec=GridSpec(
                gx=params.depth_grid.shape[3], gy=params.depth_grid.shape[2]
            ),
            spatial_spec=GridSpec(),
            intr_opt=opt.intr_opt,
            fixed_vfocal=0.5,
        )
        r = residuals.static_scene_residuals(params, final_cfg, data_corrupt)
        return float(jnp.sqrt(jnp.mean(r * r)))

    # 3 epochs of alternation (inputs static here; the pipeline refreshes
    # depth between epochs, which only shrinks the warm-start delta)
    warm = cold = None
    for _ in range(3):
        warm = pose_opt.run(opt, inputs, initial=warm)
        cold = pose_opt.run(cold_opt, inputs, initial=cold)
    warm_rms, cold_rms = rms(warm), rms(cold)
    assert warm_rms < max(cold_rms * 1.1, cold_rms + 1e-4), (warm_rms, cold_rms)
    assert bool(jnp.all(warm.depth_grid > 0))


def test_scale_shift_value_transform():
    """Depths corrupted by per-frame scale AND shift: the ScaleShift value
    transform recovers consistency where Scale alone cannot
    (reference lib/ValueTransform.h:57-94)."""
    opt = dataclasses.replace(_small_opt(), value_xform="ScaleShift")
    scale_opt = _small_opt()
    true, cfg, data = make_scene(num_frames=4, pts_per_pair=24)
    rng = np.random.default_rng(11)
    frame_scale = rng.uniform(0.8, 1.25, 4).astype(np.float32)
    frame_shift = rng.uniform(-0.4, 0.4, 4).astype(np.float32)
    s0 = frame_scale[np.asarray(data.pair[:, 0])][:, None]
    s1 = frame_scale[np.asarray(data.pair[:, 1])][:, None]
    b0 = frame_shift[np.asarray(data.pair[:, 0])][:, None]
    b1 = frame_shift[np.asarray(data.pair[:, 1])][:, None]
    # corrupted source depth d' solves true = d' * s + b
    data_corrupt = data._replace(
        depth0=(data.depth0 - jnp.asarray(b0)) / jnp.asarray(s0),
        depth1=(data.depth1 - jnp.asarray(b1)) / jnp.asarray(s1),
    )
    inputs = PoseOptInputs(
        data=data_corrupt,
        median_depth=jnp.asarray((2.0 - frame_shift) / frame_scale),
        aspect=1.0,
        num_frames=4,
    )

    def final_rms(params):
        final_cfg = SceneConfig(
            aspect=1.0,
            depth_spec=GridSpec(
                gx=params.depth_grid.shape[3], gy=params.depth_grid.shape[2]
            ),
            spatial_spec=GridSpec(),
            intr_opt=opt.intr_opt,
            fixed_vfocal=0.5,
        )
        r = residuals.static_scene_residuals(params, final_cfg, data_corrupt)
        return float(jnp.sqrt(jnp.mean(r * r)))

    ss = pose_opt.run(opt, inputs, focal=jnp.full((4,), 0.5))
    assert ss.depth_shift is not None
    ss_rms = final_rms(ss)
    sc = pose_opt.run(scale_opt, inputs, focal=jnp.full((4,), 0.5))
    sc_rms = final_rms(sc)
    assert ss_rms < 0.05, ss_rms
    assert ss_rms < 0.7 * sc_rms, (ss_rms, sc_rms)


def test_warm_start_survives_depth_refresh():
    """The real alternation refreshes source depths between epochs: the
    fine-tuned network partially absorbs the previous epoch's correction
    while the warm initial still carries its stale depth_grid (a
    double-correction starting point the static-input equivalence test
    never exercised). Warm re-solves must still converge like cold ones."""
    opt = _small_opt()
    cold_opt = dataclasses.replace(opt, warm_start=False)
    true, cfg, data = make_scene(num_frames=4, pts_per_pair=24)
    rng = np.random.default_rng(3)
    frame_scale = rng.uniform(0.8, 1.25, 4).astype(np.float32)

    def scaled(fs):
        s0 = fs[np.asarray(data.pair[:, 0])][:, None]
        s1 = fs[np.asarray(data.pair[:, 1])][:, None]
        return data._replace(
            depth0=data.depth0 / jnp.asarray(s0),
            depth1=data.depth1 / jnp.asarray(s1),
        )

    def rms(params, d):
        final_cfg = SceneConfig(
            aspect=1.0,
            depth_spec=GridSpec(
                gx=params.depth_grid.shape[3], gy=params.depth_grid.shape[2]
            ),
            spatial_spec=GridSpec(),
            intr_opt=opt.intr_opt,
            fixed_vfocal=0.5,
        )
        r = residuals.static_scene_residuals(params, final_cfg, d)
        return float(jnp.sqrt(jnp.mean(r * r)))

    def alternate(o):
        cur_scale = frame_scale.copy()
        inputs = PoseOptInputs(
            data=scaled(cur_scale),
            median_depth=jnp.asarray(2.0 / cur_scale),
            aspect=1.0,
            num_frames=4,
        )
        params = None
        for _ in range(3):
            params = pose_opt.run(o, inputs, initial=params)
            # the "network" absorbs 70% of the solved per-frame correction
            g = np.asarray(params.depth_grid).reshape(4, -1).mean(1)
            cur_scale = cur_scale / (g ** 0.7)
            inputs = inputs._replace(
                data=scaled(cur_scale),
                median_depth=jnp.asarray(2.0 / cur_scale),
            )
        params = pose_opt.run(o, inputs, initial=params)
        return rms(params, inputs.data)

    warm_rms = alternate(opt)
    cold_rms = alternate(cold_opt)
    assert warm_rms < max(cold_rms * 1.5, 1e-4), (warm_rms, cold_rms)
