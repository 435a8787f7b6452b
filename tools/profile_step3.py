"""Round-4 lever validation: z-only gather, MXU-forward sampling, Adam dtypes.

Run AFTER the losses.py z-only-slice change. Compares full-step wall-clock
and the 41-step loss trajectory (gather forward vs MXU bf16 forward).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from robust_cvd_tpu.config import LossParams
from robust_cvd_tpu.models.midas import MidasNet
from robust_cvd_tpu.ops import geometry
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


def timeit(name, fn, *args, n=20):
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
    print(f"{name:46s} {best*1e3:8.2f} ms", flush=True)
    return best


# raw sampling variants: 4 maps of (H, W, 1)
pts1 = jnp.ones((4, H, W, 1))
uv = jnp.asarray(rng.uniform(0, 200, (4, H, W, 2)), jnp.float32)
timeit("raw gather x4 (H,W,1) f32", jax.jit(
    lambda p, u: jax.vmap(geometry.grid_sample)(p, u).sum()), pts1, uv)
timeit("raw mxu fwd x4 (H,W,1)", jax.jit(
    lambda p, u: jax.vmap(geometry.grid_sample_mxu)(p, u).sum()), pts1, uv)
pts3 = jnp.ones((4, H, W, 3))
timeit("raw mxu fwd x4 (H,W,3)", jax.jit(
    lambda p, u: jax.vmap(geometry.grid_sample_mxu)(p, u).sum()), pts3, uv)

# correctness probe: mxu vs gather on real-ish data
probe_map = jnp.asarray(rng.uniform(0.5, 5.0, (H, W, 1)), jnp.float32)
probe_uv = jnp.asarray(rng.uniform(-5, 390, (H, W, 2)), jnp.float32)
a = np.asarray(geometry.grid_sample(probe_map, probe_uv))
b = np.asarray(geometry.grid_sample_mxu(probe_map, probe_uv))
err = np.abs(a - b) / np.maximum(np.abs(a), 1e-6)
print(f"mxu-vs-gather rel err: max {err.max():.2e} mean {err.mean():.2e}",
      flush=True)


def run_variant(label, sampler, opt):
    losses._GRID_SAMPLE = sampler
    step = make_train_step(net, loss_opt, opt, use_temporal=False)
    opt_state = opt.init(params)

    def full(p, s, o):
        return step(p, s, o, batch_ids, clip, ps, params)

    t = timeit(label, full, params, stats, opt_state)

    # 41-step trajectory from the same init
    p, s, o = params, stats, opt_state
    traj = []
    for i in range(41):
        p, s, o, loss, _ = step(p, s, o, batch_ids, clip, ps, params)
        traj.append(loss)
    traj = [float(x) for x in traj]
    return t, traj


t_g, traj_g = run_variant(
    "full step: z-only gather + tree adam", geometry.grid_sample_matmul,
    optax.adam(1e-6))
t_m, traj_m = run_variant(
    "full step: z-only MXU fwd + tree adam", geometry.grid_sample_mxu,
    optax.adam(1e-6))
t_b, traj_b = run_variant(
    "full step: z-only MXU fwd + adam mu_bf16", geometry.grid_sample_mxu,
    optax.adam(1e-6, mu_dtype=jnp.bfloat16))

print("trajectory (gather vs mxu): last5",
      [f"{a:.6f}/{b:.6f}" for a, b in zip(traj_g[-5:], traj_m[-5:])],
      flush=True)
dev = max(abs(a - b) / max(abs(a), 1e-9) for a, b in zip(traj_g, traj_m))
print(f"max rel trajectory deviation gather-vs-mxu: {dev:.3e}", flush=True)
dev_b = max(abs(a - b) / max(abs(a), 1e-9) for a, b in zip(traj_m, traj_b))
print(f"max rel trajectory deviation mu_bf16: {dev_b:.3e}", flush=True)
