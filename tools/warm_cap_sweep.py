"""Warm-solve cap retune evidence (the alternation's dominant pose cost:
10 of 11 solves per clip are warm re-solves at lm_warm_max_outer /
lm_warm_cg_iters).

Protocol mirrors FineTuner's alternation on the golden scene: one cold
CTF solve, then perturb the constraint source depths (as a training epoch
changing the network's depth would) and warm re-solve under swept caps,
plain vs exact-diag preconditioned; score golden-scene photo-consistency
recovery.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=. \
     python tools/warm_cap_sweep.py
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from robust_cvd_tpu import quality
from robust_cvd_tpu.camera import pose_params_to_camera, quat_to_matrix
from robust_cvd_tpu.config import PoseOptParams
from robust_cvd_tpu.ops import geometry
from robust_cvd_tpu.solver import pose_opt, xforms
from robust_cvd_tpu.solver.pose_opt import PoseOptInputs
from robust_cvd_tpu.solver.residuals import ConstraintData
from robust_cvd_tpu.solver.xforms import GridSpec

scene = quality.golden_scene(num_frames=6, shape=(48, 64))
N = 6
H, W = 48, 64
rng = np.random.default_rng(0)
frame_scale = rng.uniform(0.7, 1.4, N).astype(np.float32)
corrupted = scene.depth * jnp.asarray(1.0 / frame_scale)[:, None, None]

pairs = scene.pairs
pair = np.asarray(pairs, np.int32)
P, C = len(pairs), 64
xs = rng.uniform(3, W - 4, (P, C)).astype(np.float32)
ys = rng.uniform(3, H - 4, (P, C)).astype(np.float32)
depth_gt0 = np.stack([
    np.asarray(scene.depth[i])[np.round(ys[p]).astype(int),
                               np.round(xs[p]).astype(int)]
    for p, (i, _) in enumerate(pairs)])
pix = np.stack([xs, ys], -1)
intr_i = jnp.asarray(np.stack([np.asarray(scene.intrinsics[i]) for i, _ in pairs]))
pts = geometry.pixels_to_points(intr_i[:, None, :], jnp.asarray(depth_gt0), jnp.asarray(pix))
ext_i = jnp.asarray(np.stack([np.asarray(scene.extrinsics[i]) for i, _ in pairs]))
ext_j = jnp.asarray(np.stack([np.asarray(scene.extrinsics[j]) for _, j in pairs]))
pts_j = geometry.reproject_points(pts, ext_i[:, None], ext_j[:, None])
intr_j = jnp.asarray(np.stack([np.asarray(scene.intrinsics[j]) for _, j in pairs]))
loc1_px = np.asarray(geometry.project(pts_j, intr_j[:, None, :]))
depth_gt1 = np.asarray(-pts_j[..., 2])


def to_ndc(x, y):
    return np.stack([x / (W - 1) * 2 - 1, -(y / (H - 1) * 2 - 1)], -1)


def make_inputs(scale0, scale1):
    data = ConstraintData(
        pair=jnp.asarray(pair),
        loc0=jnp.asarray(to_ndc(xs, ys), jnp.float32),
        loc1=jnp.asarray(to_ndc(loc1_px[..., 0], loc1_px[..., 1]), jnp.float32),
        depth0=jnp.asarray(depth_gt0 / scale0[pair[:, 0], None]),
        depth1=jnp.asarray(depth_gt1 / scale1[pair[:, 1], None]),
        weight=jnp.ones((P, C), jnp.float32),
    )
    med = jnp.asarray(np.median(
        depth_gt0 / scale0[pair[:, 0], None]).astype(np.float32))
    return PoseOptInputs(
        data=data, median_depth=jnp.full((N,), float(med)),
        aspect=W / H, num_frames=N,
    )


def score(solved, depth_corr=None):
    depth_corr = corrupted if depth_corr is None else depth_corr
    gz, gy, gx = solved.depth_grid.shape[1:]
    scales = jax.vmap(
        lambda g, d: xforms.depth_param_map(
            g, GridSpec(gx=gx, gy=gy, gz=gz), (H, W), d)
    )(solved.depth_grid, depth_corr)
    corrected = depth_corr * scales
    cam = pose_params_to_camera(solved.pose, solved.focal, W / H)
    Rm = jax.vmap(quat_to_matrix)(cam.quaternion)
    ext = jnp.concatenate([Rm, cam.position[:, :, None]], axis=2)
    intr = geometry.intrinsics_px(cam.vfov, cam.hfov, (H, W))
    err = float(quality.clip_photo_consistency(
        scene.images, corrected, ext, intr, scene.pairs).l1)
    return err


gt_err = float(quality.clip_photo_consistency(
    scene.images, scene.depth, scene.extrinsics, scene.intrinsics,
    scene.pairs).l1)
bad_err = float(quality.clip_photo_consistency(
    scene.images, corrupted, scene.extrinsics, scene.intrinsics,
    scene.pairs).l1)

base = PoseOptParams(
    num_steps=2, ctf_long=3, ctf_short=2, lm_max_outer=6, lm_cg_iters=12,
    graduate_deformation_regularization=True,
)
inputs0 = make_inputs(frame_scale, frame_scale)
cold = pose_opt.run(base, inputs0)

# "epoch" drift: the network's depth shifts per frame by a few percent
drift = rng.uniform(0.93, 1.07, N).astype(np.float32)
inputs1 = make_inputs(frame_scale * drift, frame_scale * drift)
corrupted_drift = scene.depth * jnp.asarray(
    1.0 / (frame_scale * drift))[:, None, None]
bad_drift = float(quality.clip_photo_consistency(
    scene.images, corrupted_drift, scene.extrinsics, scene.intrinsics,
    scene.pairs).l1)

print(f"gt={gt_err:.5f} corrupted={bad_err:.5f}  "
      f"cold gap_closed={1 - (score(cold) - gt_err) / (bad_err - gt_err):.4f}")

for label, kw in [
    ("warm plain  cg32", dict(lm_warm_cg_iters=32)),
    ("warm plain  cg16", dict(lm_warm_cg_iters=16)),
    ("warm plain  cg8 ", dict(lm_warm_cg_iters=8)),
    ("warm exact  cg32", dict(lm_warm_cg_iters=32, lm_precond_exact=True)),
    ("warm exact  cg16", dict(lm_warm_cg_iters=16, lm_precond_exact=True)),
    ("warm exact  cg8 ", dict(lm_warm_cg_iters=8, lm_precond_exact=True)),
    ("warm exact  cg4 ", dict(lm_warm_cg_iters=4, lm_precond_exact=True)),
    # outer-iteration sweep at the cg16 default (round 4): the warm solve
    # is 10 of 11 solves per clip, so outer caps scale its cost linearly
    ("warm cg16 outer10", dict(lm_warm_cg_iters=16, lm_warm_max_outer=10)),
    ("warm cg16 outer8 ", dict(lm_warm_cg_iters=16, lm_warm_max_outer=8)),
    ("warm cg16 outer6 ", dict(lm_warm_cg_iters=16, lm_warm_max_outer=6)),
    ("warm cg16 outer4 ", dict(lm_warm_cg_iters=16, lm_warm_max_outer=4)),
    ("warm cg16 outer3 ", dict(lm_warm_cg_iters=16, lm_warm_max_outer=3)),
]:
    opt = dataclasses.replace(base, **kw)
    solved = pose_opt.run(opt, inputs1, initial=cold)  # warm path
    gap = 1 - (score(solved, corrupted_drift) - gt_err) / (bad_drift - gt_err)
    cg = opt.lm_warm_cg_iters
    cost = 2 * cg + 2 + (3 if opt.lm_precond_exact else 0)
    print(f"{label}: gap_closed={gap:.4f}  ~res-evals/outer={cost}"
          f"  outers={opt.lm_warm_max_outer}")
