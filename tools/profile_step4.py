"""Round-4 (cont.): full-step wall-clock with the matmul align-corners
resize in the MiDaS decoder (models/layers.py::resize_bilinear).

Baseline (tools/profile_step3.py, pre-resize): full step 49.5 ms of which
net fwd+bwd 39.8; tools/profile_net.py post-resize measured net fwd+bwd
26.7 ms. This times the PRODUCTION step (grid_sample_auto sampler, tree
adam) only — one compile, minutes not tens of minutes.

Respect PERF.md measurement rules: readback before timing, >=3 trials, min.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from robust_cvd_tpu.config import LossParams
from robust_cvd_tpu.models.midas import MidasNet
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

opt = optax.adam(1e-6)
step = make_train_step(net, loss_opt, opt, use_temporal=False)
opt_state = opt.init(params)


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
    print(f"{name:46s} {best*1e3:8.2f} ms", flush=True)
    return best


def full(p, s, o):
    return step(p, s, o, batch_ids, clip, ps, params)


timeit("full step (production: mxu sampler, tree adam)", full, params, stats,
       opt_state)
