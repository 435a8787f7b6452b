"""Does Jacobi PCG pay on the REAL pose problem's normal equations?

Builds the golden-scene constraint problem at the final CTF resolution,
forms the damped-normal-equation matvec exactly as lm._one_outer_step
does, and compares CG vs Hutchinson-Jacobi PCG iteration counts to the
same forcing tolerance, at several lambda values.
"""
import numpy as np
import jax
import jax.numpy as jnp

from robust_cvd_tpu import quality
from robust_cvd_tpu.config import PoseOptParams
from robust_cvd_tpu.ops import geometry
from robust_cvd_tpu.solver import lm, pose_opt
from robust_cvd_tpu.solver.pose_opt import PoseOptInputs
from robust_cvd_tpu.solver.residuals import ConstraintData, SolverParams

# golden scene constraints (same recipe as tests/test_quality.py)
scene = quality.golden_scene(num_frames=8, shape=(48, 64))
N = 8
H, W = 48, 64
rng = np.random.default_rng(0)
frame_scale = rng.uniform(0.7, 1.4, N).astype(np.float32)
pairs = scene.pairs
pair = np.asarray(pairs, np.int32)
P, C = len(pairs), 64
xs = rng.uniform(3, W - 4, (P, C)).astype(np.float32)
ys = rng.uniform(3, H - 4, (P, C)).astype(np.float32)

def sample(img, x, y):
    return img[np.round(y).astype(int), np.round(x).astype(int)]

depth_gt0 = np.stack([sample(np.asarray(scene.depth[i]), xs[p], ys[p])
                      for p, (i, _) in enumerate(pairs)])
pix = np.stack([xs, ys], -1)
pts = geometry.pixels_to_points(
    jnp.asarray(np.stack([np.asarray(scene.intrinsics[i]) for i, _ in pairs]))[:, None, :],
    jnp.asarray(depth_gt0), jnp.asarray(pix))
ext_i = jnp.asarray(np.stack([np.asarray(scene.extrinsics[i]) for i, _ in pairs]))
ext_j = jnp.asarray(np.stack([np.asarray(scene.extrinsics[j]) for _, j in pairs]))
pts_j = geometry.reproject_points(pts, ext_i[:, None], ext_j[:, None])
intr_j = jnp.asarray(np.stack([np.asarray(scene.intrinsics[j]) for _, j in pairs]))
loc1_px = np.asarray(geometry.project(pts_j, intr_j[:, None, :]))
depth_gt1 = np.asarray(-pts_j[..., 2])

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
corrupted_med = np.median(depth_gt0 / frame_scale[pair[:, 0], None])
inputs = PoseOptInputs(
    data=data, median_depth=jnp.full((N,), float(corrupted_med)),
    aspect=W / H, num_frames=N)
opt = PoseOptParams()

# params at a mid-CTF resolution (the expensive solves)
from robust_cvd_tpu.solver.xforms import init_spatial_grid

params = SolverParams(
    pose=jnp.zeros((N, 6)),
    focal=jnp.full((N,), pose_opt._v_focal(opt, inputs.aspect)),
    depth_grid=jnp.ones((N, 3, 9, 5)),
    spatial_grid=init_spatial_grid(N, 1, 1),
)
cfg = pose_opt._make_cfg(opt, inputs, params)
res_fn = pose_opt._stage_res_fn(cfg, opt, opt.deformation_regularization_initial,
                                False, False)
aux = pose_opt._aux(opt, inputs, False, cfg=cfg)
mask = lm.make_mask(params, fix_focal=True)

w = jnp.ones((1,), jnp.float32)

def res_w(p):
    return res_fn(p, w, aux)

r0, vjp_fn = jax.vjp(res_w, params)
g = lm._tmul(vjp_fn(r0)[0], mask)

for lam in (1e-3, 1e-1):
    def matvec(v, lam=lam):
        vm = lm._tmul(v, mask)
        Jv = jax.jvp(res_w, (params,), (vm,))[1]
        return lm._taxpy(lam, v, lm._tmul(vjp_fn(Jv)[0], mask))

    b = lm._tscale(-1.0, g)
    _, it_plain = lm._cg(matvec, b, iters=400, rtol=1e-2)
    d = lm._diag_estimate(matvec, params, jax.random.PRNGKey(17), probes=8)
    _, it_pcg = lm._cg(matvec, b, iters=400, rtol=1e-2,
                       minv=jax.tree.map(lambda x: 1.0 / x, d))
    print(f"lam={lam:g}: plain CG iters={int(it_plain)}  "
          f"Jacobi-PCG iters={int(it_pcg)} (+8 probe matvecs)")

# exact analytic diagonal (residuals.build_diag_fn — landed after the
# Hutchinson measurement above)
from robust_cvd_tpu.solver.residuals import build_diag_fn

diag_fn = build_diag_fn(cfg, opt, opt.deformation_regularization_initial,
                        False, False)
d_exact = diag_fn(params, w, aux)
for lam in (1e-3, 1e-1):
    def matvec(v, lam=lam):
        vm = lm._tmul(v, mask)
        Jv = jax.jvp(res_w, (params,), (vm,))[1]
        return lm._taxpy(lam, v, lm._tmul(vjp_fn(Jv)[0], mask))

    b = lm._tscale(-1.0, g)
    minv = jax.tree.map(lambda dd, m: 1.0 / (dd * m + lam), d_exact, mask)
    _, it_exact = lm._cg(matvec, b, iters=400, rtol=1e-2, minv=minv)
    print(f"lam={lam:g}: EXACT-diag Jacobi-PCG iters={int(it_exact)}")
