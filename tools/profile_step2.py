"""Round-4 step dissection: Adam variants + loss-stack subcomponents.

Timing gotchas (PERF.md): first readback disables dispatch cancellation;
first trial of each executable runs ~2x slow; >=3 trials, take min.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from robust_cvd_tpu.config import LossParams
from robust_cvd_tpu.models.midas import MidasNet, normalize_images
from robust_cvd_tpu.training import losses
from robust_cvd_tpu.training.fine_tune import (
    build_clip_data, make_train_step, pose_state_from_solver,
)
from robust_cvd_tpu.solver.residuals import SolverParams

H, W, N, B = 224, 384, 12, 2
rng = np.random.default_rng(0)
images = rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32)
depth = np.full((N, H, W), 2.0, np.float32)
flow_list, flows, masks = [], {}, {}
for i in range(N - 1):
    for (a, b) in ((i, i + 1), (i + 1, i)):
        flow_list.append((a, b, 1.0))
        flows[(a, b)] = rng.uniform(-1, 1, (H, W, 2)).astype(np.float32)
        masks[(a, b)] = np.ones((H, W), np.float32)
clip = build_clip_data(images, depth, flow_list, flows, masks, 0.2)
params_solver = SolverParams(
    pose=jnp.zeros((N, 6)),
    focal=jnp.full((N,), 0.5),
    depth_grid=jnp.ones((N, 1, 1, 1)),
    spatial_grid=jnp.zeros((N, 1, 1, 2)),
)
ps = pose_state_from_solver(params_solver, (H, W), aspect=W / H)

net = MidasNet()
variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
params, stats = variables["params"], variables["batch_stats"]
loss_opt = LossParams()
batch_ids = jnp.asarray([0, 1], jnp.int32)
print(f"param leaves: {len(jax.tree.leaves(params))}, "
      f"params: {sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M")


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:44s} {best*1e3:8.2f} ms", flush=True)
    return best


# ---- Adam variants -----------------------------------------------------
grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-6), params)

for label, opt in [
    ("adam tree (baseline)", optax.adam(1e-6)),
    ("adam flattened (optax.flatten)", optax.flatten(optax.adam(1e-6))),
]:
    st = opt.init(params)

    @jax.jit
    def upd(g, st, p, _opt=opt):
        u, st2 = _opt.update(g, st, p)
        return optax.apply_updates(p, u), st2

    timeit(label, upd, grads, st, params)

# donated variant: same flat adam but donate params+state buffers
opt_f = optax.flatten(optax.adam(1e-6))
st_f = opt_f.init(params)


@jax.jit
def upd_f(g, st, p):
    u, st2 = opt_f.update(g, st, p)
    return optax.apply_updates(p, u), st2


upd_don = jax.jit(upd_f.__wrapped__, donate_argnums=(1, 2))
p2 = jax.tree.map(jnp.array, params)
st2 = jax.tree.map(jnp.array, st_f)
# donation consumes buffers; time manually over fresh copies once warm
out = upd_don(grads, st2, p2)
jax.block_until_ready(out)
np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
p2, st2 = out[0], out[1]
best = 1e9
for _ in range(4):
    t0 = time.perf_counter()
    for _ in range(20):
        p2, st2 = upd_don(grads, st2, p2)
    jax.block_until_ready((p2, st2))
    np.asarray(jax.tree.leaves(p2)[0]).ravel()[:1]
    best = min(best, (time.perf_counter() - t0) / 20)
print(f"{'adam flattened + donated':44s} {best*1e3:8.2f} ms", flush=True)

# ---- loss subcomponents ------------------------------------------------
depth_in = jnp.ones((B, 2, H, W), jnp.float32) * 2.0
pair0 = clip.pair_idx[batch_ids]
meta = losses.LossMeta(
    extrinsics=ps.extrinsics[pair0], intrinsics=ps.intrinsics[pair0],
    flows=clip.flows[batch_ids], masks=clip.masks[batch_ids],
    warp=ps.warp[pair0],
)
imgs_b = clip.images[pair0]
dorig_b = clip.depth_orig[pair0]


def mk(fn):
    return jax.jit(fn)


timeit("consistency_loss fwd", mk(
    lambda d: losses.consistency_loss(d, meta, loss_opt)[0]), depth_in)
timeit("consistency_loss fwd+bwd", mk(
    lambda d: jax.grad(lambda x: losses.consistency_loss(x, meta, loss_opt)[0])(d)),
    depth_in)
timeit("contrast_loss fwd", mk(
    lambda d: losses.contrast_loss(dorig_b, d, loss_opt)), depth_in)
timeit("contrast_loss fwd+bwd", mk(
    lambda d: jax.grad(lambda x: losses.contrast_loss(dorig_b, x, loss_opt))(d)),
    depth_in)

# consistency sub-pieces
from robust_cvd_tpu.ops import geometry


def pieces(d):
    points, pixels = losses._points_and_pixels(d, meta.intrinsics, meta.warp)
    return points.sum() + pixels.sum()


timeit("  points_and_pixels fwd", mk(pieces), depth_in)


def reproj_only(d):
    o = LossParams(lambda_static_depth_ratio=0.0, lambda_contrast_loss=0.0)
    return losses.consistency_loss(d, meta, o)[0]


def ratio_only(d):
    o = LossParams(lambda_static_reprojection=0.0, lambda_contrast_loss=0.0)
    return losses.consistency_loss(d, meta, o)[0]


timeit("  reprojection term fwd", mk(reproj_only), depth_in)
timeit("  depth_ratio term fwd (has the gather)", mk(ratio_only), depth_in)
timeit("  depth_ratio term fwd+bwd", mk(
    lambda d: jax.grad(ratio_only)(d)), depth_in)


# raw gather cost: 4 maps of (H, W, 3) sampled at (H, W) positions
pts = jnp.ones((4, H, W, 3))
uv = jnp.asarray(rng.uniform(0, 200, (4, H, W, 2)), jnp.float32)
timeit("  raw grid_sample x4 (H,W,3) f32", mk(
    lambda p, u: jax.vmap(geometry.grid_sample)(p, u).sum()), pts, uv)
timeit("  raw grid_sample x4 (H,W,3) bf16", mk(
    lambda p, u: jax.vmap(geometry.grid_sample)(
        p.astype(jnp.bfloat16), u).sum()), pts, uv)

# ---- full step with flattened adam ------------------------------------
step_flat = make_train_step(net, loss_opt, opt_f, use_temporal=False)
opt_state_f = opt_f.init(params)


def full_flat(params, stats, opt_state):
    return step_flat(params, stats, opt_state, batch_ids, clip, ps, params)


timeit("full train step (flat adam)", full_flat, params, stats, opt_state_f,
       n=20)

opt_t = optax.adam(1e-6)
step_tree = make_train_step(net, loss_opt, opt_t, use_temporal=False)
opt_state_t = opt_t.init(params)


def full_tree(params, stats, opt_state):
    return step_tree(params, stats, opt_state, batch_ids, clip, ps, params)


timeit("full train step (tree adam, baseline)", full_tree, params, stats,
       opt_state_t, n=20)
