"""Dissect the fine-tune train step: forward, fwd+bwd, loss-only, full step.

Timing gotcha (memory: axon cancels unconsumed dispatches): every timed
region ends with a block_until_ready on a D2H-consumed value.
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
optimizer = optax.adam(1e-6)
opt_state = optimizer.init(params)
loss_opt = LossParams()
batch_ids = jnp.asarray([0, 1], jnp.int32)


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        # consume to host (axon cancels unconsumed dispatches)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:34s} {best*1e3:8.2f} ms")
    return best


# 1. forward only (B*K images through MiDaS)
@jax.jit
def fwd(params, stats, ids):
    pair = clip.pair_idx[ids]
    x = clip.images[pair].reshape(B * 2, H, W, 3)
    disp, _ = net.apply({"params": params, "batch_stats": stats},
                        normalize_images(x), train=True, mutable=["batch_stats"])
    return disp.sum()

timeit("forward (4 images)", fwd, params, stats, batch_ids)


# 2. fwd+bwd through net only (grad wrt params of disp.sum())
@jax.jit
def fwdbwd(params, stats, ids):
    def f(p):
        pair = clip.pair_idx[ids]
        x = clip.images[pair].reshape(B * 2, H, W, 3)
        disp, _ = net.apply({"params": p, "batch_stats": stats},
                            normalize_images(x), train=True, mutable=["batch_stats"])
        return disp.sum()
    return jax.grad(f)(params)

timeit("net fwd+bwd (no loss)", fwdbwd, params, stats, batch_ids)


# 3. loss only given depth (no net)
pair0 = clip.pair_idx[batch_ids]
depth_in = jnp.ones((B, 2, H, W), jnp.float32) * 2.0

@jax.jit
def loss_only(depth_in, ids):
    pair = clip.pair_idx[ids]
    meta = losses.LossMeta(
        extrinsics=ps.extrinsics[pair], intrinsics=ps.intrinsics[pair],
        flows=clip.flows[ids], masks=clip.masks[ids], warp=ps.warp[pair],
    )
    total, _ = losses.joint_loss(loss_opt, clip.images[pair],
                                 clip.depth_orig[pair], depth_in, meta)
    return total

timeit("joint_loss fwd (given depth)", loss_only, depth_in, batch_ids)


@jax.jit
def loss_grad(depth_in, ids):
    return jax.grad(lambda d: loss_only.__wrapped__(d, ids))(depth_in)

timeit("joint_loss fwd+bwd (wrt depth)", loss_grad, depth_in, batch_ids)


# 4. full train step
step = make_train_step(net, loss_opt, optimizer, use_temporal=False)
def full(params, stats, opt_state):
    return step(params, stats, opt_state, batch_ids, clip, ps, params)

timeit("full train step", full, params, stats, opt_state, n=20)


# 5. adam update alone
@jax.jit
def adam_only(params, opt_state):
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, st = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), st

timeit("adam update alone", adam_only, params, opt_state)
