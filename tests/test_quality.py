"""Quality harness: the golden scene must separate good depth from bad, and
the pose/deformation solver must close most of the gap it is given."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robust_cvd_tpu import quality
from robust_cvd_tpu.camera import pose_params_to_camera, quat_to_matrix
from robust_cvd_tpu.ops import geometry


@pytest.fixture(scope="module")
def scene():
    return quality.golden_scene(num_frames=6, shape=(48, 64))


def _metric(scene, depth, ext=None, intr=None):
    res = quality.clip_photo_consistency(
        scene.images, depth,
        scene.extrinsics if ext is None else ext,
        scene.intrinsics if intr is None else intr,
        scene.pairs,
    )
    return float(res.l1)


def test_ground_truth_depth_near_zero(scene):
    gt = _metric(scene, scene.depth)
    assert gt < 5e-3, gt


def test_perturbed_depth_scores_worse(scene):
    gt = _metric(scene, scene.depth)
    bad = _metric(scene, scene.depth * 1.2)
    assert bad > 5 * max(gt, 1e-4), (gt, bad)


def test_valid_ratio_sane(scene):
    res = quality.clip_photo_consistency(
        scene.images, scene.depth, scene.extrinsics, scene.intrinsics,
        scene.pairs,
    )
    assert 0.8 < float(res.valid_ratio) <= 1.0


def test_rotating_scene_ground_truth_near_zero():
    """The yawed-camera golden scene (rotation + translation) must also
    score near-zero with GT depth + GT cameras — and visibly worse when
    the camera rotations are perturbed (cameras matter, not just depth)."""
    sc = quality.golden_scene(num_frames=6, shape=(48, 64), yaw_per_frame=0.02)
    gt = _metric(sc, sc.depth)
    assert gt < 5e-3, gt

    # perturb each camera's yaw INDEPENDENTLY (a shared extra rotation
    # nearly cancels in the pairwise relative poses — conjugation is a
    # second-order effect)
    N = int(sc.extrinsics.shape[0])
    dys = np.random.default_rng(3).uniform(0.015, 0.03, N) * np.where(
        np.arange(N) % 2 == 0, 1.0, -1.0
    )
    c, s = np.cos(dys), np.sin(dys)
    dR = np.zeros((N, 3, 3), np.float32)
    dR[:, 0, 0] = c; dR[:, 0, 2] = s
    dR[:, 1, 1] = 1.0
    dR[:, 2, 0] = -s; dR[:, 2, 2] = c
    R = jnp.einsum("nab,nbc->nac", sc.extrinsics[:, :, :3], jnp.asarray(dR))
    bad_ext = jnp.concatenate([R, sc.extrinsics[:, :, 3:]], axis=2)
    bad = _metric(sc, sc.depth, ext=bad_ext)
    assert bad > 5 * max(gt, 1e-4), (gt, bad)


@pytest.mark.parametrize("yaw", [0.0, 0.02])
def test_solver_recovers_photo_consistency(yaw):
    """Corrupt per-frame depth scales; the solver (normalize + CTF joint
    optimization from flow constraints) must bring warp photo-consistency
    most of the way back to the ground-truth level — the geometric core's
    end-to-end acceptance test. Parametrized over a pure-translation rig
    and a yawed (rotating) rig: the second requires the solver to recover
    camera ROTATIONS from the constraints, not just baselines."""
    scene = quality.golden_scene(num_frames=6, shape=(48, 64),
                                 yaw_per_frame=yaw)
    from robust_cvd_tpu.config import PoseOptParams
    from robust_cvd_tpu.solver import pose_opt
    from robust_cvd_tpu.solver import residuals as R
    from robust_cvd_tpu.solver.pose_opt import PoseOptInputs
    from robust_cvd_tpu.solver.residuals import ConstraintData

    N = scene.images.shape[0]
    H, W = scene.depth.shape[1:]
    aspect = W / H
    rng = np.random.default_rng(0)
    frame_scale = rng.uniform(0.7, 1.4, N).astype(np.float32)
    corrupted = scene.depth * jnp.asarray(1.0 / frame_scale)[:, None, None]

    # constraints: exact correspondences from the analytic scene, depths
    # sampled from the CORRUPTED stream (what the pipeline would see)
    pairs = scene.pairs
    pair = np.asarray(pairs, np.int32)
    P, C = len(pairs), 64
    xs = rng.uniform(3, W - 4, (P, C)).astype(np.float32)
    ys = rng.uniform(3, H - 4, (P, C)).astype(np.float32)

    def sample(img, x, y):
        return img[np.round(y).astype(int), np.round(x).astype(int)]

    depth_gt0 = np.stack([sample(np.asarray(scene.depth[i]), xs[p], ys[p])
                          for p, (i, _) in enumerate(pairs)])
    # project to frame j with GT cameras for exact loc1
    pix = np.stack([xs, ys], -1)
    pts = geometry.pixels_to_points(
        jnp.asarray(np.stack([np.asarray(scene.intrinsics[i]) for i, _ in pairs]))[:, None, :],
        jnp.asarray(depth_gt0), jnp.asarray(pix),
    )
    ext_i = jnp.asarray(np.stack([np.asarray(scene.extrinsics[i]) for i, _ in pairs]))
    ext_j = jnp.asarray(np.stack([np.asarray(scene.extrinsics[j]) for _, j in pairs]))
    pts_j = geometry.reproject_points(pts, ext_i[:, None], ext_j[:, None])
    intr_j = jnp.asarray(np.stack([np.asarray(scene.intrinsics[j]) for _, j in pairs]))
    loc1_px = np.asarray(geometry.project(pts_j, intr_j[:, None, :]))
    depth_gt1 = np.asarray(-pts_j[..., 2])

    # pixel -> NDC ([-1,1] x-major) as the solver expects
    def to_ndc(x, y):
        return np.stack([x / (W - 1) * 2 - 1, -(y / (H - 1) * 2 - 1)], -1)

    data = ConstraintData(
        pair=jnp.asarray(pair),
        loc0=jnp.asarray(to_ndc(xs, ys), jnp.float32),
        loc1=jnp.asarray(to_ndc(loc1_px[..., 0], loc1_px[..., 1]), jnp.float32),
        depth0=jnp.asarray(depth_gt0 / frame_scale[pair[:, 0], None]),
        depth1=jnp.asarray(depth_gt1 / frame_scale[pair[:, 1], None]),
        weight=jnp.ones((P, C), jnp.float32),
    )
    med = jnp.asarray(
        np.median(np.asarray(corrupted).reshape(N, -1), axis=1).astype(np.float32)
    )
    inputs = PoseOptInputs(data=data, median_depth=med, aspect=aspect, num_frames=N)
    opt = PoseOptParams(
        num_steps=3, ctf_long=5, ctf_short=3, lm_max_outer=12, lm_cg_iters=24,
        graduate_deformation_regularization=True, dynamic_constraints="None",
    )
    solved = pose_opt.run(opt, inputs)

    # corrected depth + solved cameras -> photo consistency
    from robust_cvd_tpu.solver.xforms import GridSpec
    from robust_cvd_tpu.solver import xforms

    gz, gy, gx = solved.depth_grid.shape[1:]
    scales = jax.vmap(
        lambda g, d: xforms.depth_param_map(g, GridSpec(gx=gx, gy=gy, gz=gz), (H, W), d)
    )(solved.depth_grid, corrupted)
    corrected = corrupted * scales

    cam = pose_params_to_camera(solved.pose, solved.focal, aspect)
    Rm = jax.vmap(quat_to_matrix)(cam.quaternion)
    ext = jnp.concatenate([Rm, cam.position[:, :, None]], axis=2)
    intr = geometry.intrinsics_px(cam.vfov, cam.hfov, (H, W))

    gt_err = _metric(scene, scene.depth)
    bad_err = _metric(scene, corrupted)
    solved_err = float(
        quality.clip_photo_consistency(
            scene.images, corrected, ext, intr, scene.pairs
        ).l1
    )
    assert bad_err > 3 * gt_err
    # the solver must close at least 60% of the photo-consistency gap
    assert solved_err < gt_err + 0.4 * (bad_err - gt_err), (
        gt_err, bad_err, solved_err,
    )


def test_dynamic_scene_masks_and_depth():
    """The dynamic golden scene: object pixels are marked non-static, the
    object is closer than the plane where visible, and it MOVES (masks
    differ across frames)."""
    sc = quality.golden_scene_dynamic(num_frames=4, shape=(48, 64))
    m = np.asarray(sc.static_mask)
    frac_dyn = (~m).mean(axis=(1, 2))
    assert (frac_dyn > 0.01).all() and (frac_dyn < 0.5).all(), frac_dyn
    assert (np.asarray(sc.depth)[~m] < 2.5).all()  # object closer than plane
    assert (m[0] != m[-1]).any()  # it moves
    # static pixels are exactly the base scene
    base = quality.golden_scene(num_frames=4, shape=(48, 64))
    np.testing.assert_allclose(
        np.asarray(sc.depth)[m], np.asarray(base.depth)[m], rtol=1e-6
    )


def _run_gate_isolated(fn_name: str, timeout: int = 1500) -> dict:
    """Run a quality-gate function in a FRESH python subprocess and return
    its dict. The dynamic gate's big scanned CPU solve programs crashed two
    consecutive full-suite runs inside XLA compilation (round 4:
    backend_compile; round 5: persistent-cache AOT deserialization) while
    always passing in isolation — a fresh process sidesteps whatever
    in-process compiler state accumulates, and if XLA ever does crash, the
    suite reports ONE failed test instead of dying at 73%."""
    import json
    import subprocess
    import sys

    code = (
        "import json\n"
        "from robust_cvd_tpu import quality\n"
        f"res = quality.{fn_name}(tiny=True)\n"
        "print('GATE_RESULT ' + json.dumps(res))\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # tunnel sitecustomize override
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, cwd=os.path.dirname(os.path.dirname(__file__)),
        env=env,
    )
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-2000:])
    for line in proc.stdout.splitlines():
        if line.startswith("GATE_RESULT "):
            return json.loads(line[len("GATE_RESULT "):])
    raise AssertionError(f"no GATE_RESULT in output: {proc.stdout[-2000:]}")


def test_dynamic_solver_gate_closes_gap():
    """The full dynamic machinery (dynamic-mask exclusion + adaptive
    deformation + triplet smoothness + deferred spatial opt) must close
    most of the photo-consistency gap AND recover most of the ground-truth
    spatial distortion (round-4 VERDICT #7)."""
    res = _run_gate_isolated("dynamic_solver_gate")
    # The per-frame observation distortion is real first-order noise the
    # joint solve cannot fully fit at the tiny caps (the static-only gate
    # closes 0.99; with distortion the tiny config measures ~0.71), so the
    # bar is "most of the gap", not near-all of it.
    assert res["quality_gap_closed_dynamic"] > 0.6, res
    assert res["spatial_warp_recovery"] > 0.6, res
    # interpretability floor (round-5 VERDICT #6a): the achievable floor —
    # GT depth + GT poses scored WITH the observation distortion left in —
    # must sit between the GT score and the corrupted score, and the solver
    # must close most of the ACHIEVABLE gap (bad - floor)
    assert (
        res["photo_consistency_gt_l1_dynamic"]
        < res["photo_consistency_floor_l1_dynamic"]
        < res["photo_consistency_corrupted_l1_dynamic"]
    ), res
    assert res["quality_gap_closed_dynamic_vs_floor"] > 0.85, res


def test_contaminated_constraints_need_exclusion():
    """Constraints sampled ON the moving object poison a static-scene model:
    with the production exclusion path (set_static_flags +
    prune_static_flag -> zero weights in flatten_pairs, reference
    lib/FlowConstraints.cpp:573-748) the solve must stay near the clean
    gate; with exclusion OFF it must degrade catastrophically (round-5
    VERDICT #6b)."""
    res = _run_gate_isolated("contaminated_constraint_gate")
    on = res["quality_gap_closed_contaminated"]
    off = res["quality_gap_closed_contaminated_no_exclusion"]
    assert on > 0.8, res  # graceful with exclusion (measured ~0.99 tiny)
    assert off < on - 0.3, res  # catastrophic without (measured ~0.16 tiny)
