"""Round-4 decision: exact-diag Jacobi PCG, measured by WALL-CLOCK on the
real 100-frame clip problem (bench.make_clip_problem), not residual-evals.

Times the COLD solve (normalize + 4-step CTF to 17x10) per config — the
warm path is already known not to benefit (tools/warm_cap_sweep.py) — plus
the exact-diag build alone at the final CTF resolution. Also reports
scale-recovery error so equal-quality claims are checked on THIS problem.

Timing rules (PERF.md): readback first, >=3 trials, min.
"""
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

import bench
from robust_cvd_tpu.config import PoseOptParams
from robust_cvd_tpu.solver import pose_opt

inputs, _ = bench.make_clip_problem()
N = inputs.num_frames
# the known corruption (same seed/recipe as make_clip_problem)
rng = np.random.default_rng(0)
_ = rng.uniform(-0.9, 0.9, (len(inputs.data.pair), 128, 2))
_ = rng.uniform(1.5, 4.0, (len(inputs.data.pair), 128))
frame_scale = rng.uniform(0.7, 1.4, N).astype(np.float32)

float(jnp.zeros(()).sum())  # first readback: disable dispatch cancellation


def recovery_err(params):
    """Relative error of recovered per-frame scale vs truth (global-gauge
    normalized)."""
    s = np.asarray(params.depth_grid).reshape(N, -1).mean(1)
    ratio = s / frame_scale
    return float(np.std(ratio) / np.mean(ratio))


def time_solve(label, opt):
    # compile + warm
    p = pose_opt.run(opt, inputs)
    jax.block_until_ready(p.pose)
    err = recovery_err(p)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        p = pose_opt.run(opt, inputs)
        jax.block_until_ready(p.pose)
        np.asarray(p.pose)[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} cold={best*1e3:8.1f} ms  scale-recovery-err={err:.5f}",
          flush=True)
    return best


base = PoseOptParams(lm_precond_exact=False, lm_cg_iters=64)
configs = [
    ("plain cg32", dataclasses.replace(base, lm_cg_iters=32)),
]
if __import__("os").environ.get("PRECOND_FULL"):
    configs = [
        ("plain cg64 (default)", base),
        ("exact cg64", dataclasses.replace(base, lm_precond_exact=True)),
        ("exact cg42", dataclasses.replace(base, lm_precond_exact=True, lm_cg_iters=42)),
        ("exact cg32", dataclasses.replace(base, lm_precond_exact=True, lm_cg_iters=32)),
        ("plain cg42", dataclasses.replace(base, lm_cg_iters=42)),
    ] + configs
if __import__("os").environ.get("PRECOND_BLOCKS"):
    # round-5 decision: pose-block-Jacobi (exact 6x6 frame blocks; measured
    # 22-37 CG iterations vs 62 diag / 163 plain on the real problem).
    # Current default (exact cg42) is the baseline to beat at equal
    # scale-recovery-err.
    exact = dataclasses.replace(base, lm_precond_exact=True)
    blocks = dataclasses.replace(exact, lm_precond_pose_blocks=True)
    configs = [
        ("exact cg42 (default)", dataclasses.replace(exact, lm_cg_iters=42)),
        ("exact cg32", dataclasses.replace(exact, lm_cg_iters=32)),
        ("block cg42", dataclasses.replace(blocks, lm_cg_iters=42)),
        ("block cg32", dataclasses.replace(blocks, lm_cg_iters=32)),
        ("block cg24", dataclasses.replace(blocks, lm_cg_iters=24)),
        ("block cg16", dataclasses.replace(blocks, lm_cg_iters=16)),
    ]
for label, opt in configs:
    time_solve(label, opt)

# diag build alone at the final CTF stage resolution
from robust_cvd_tpu.solver.pose_opt import (
    _make_cfg, _stage_diag_fn, _aux, ctf_grid_schedule,
)
from robust_cvd_tpu.solver import xforms
from robust_cvd_tpu.solver.residuals import SolverParams

opt = dataclasses.replace(base, lm_precond_exact=True)
gx, gy = ctf_grid_schedule(opt, inputs.aspect)[-1]
params = SolverParams(
    pose=jnp.zeros((N, 6)),
    focal=jnp.full((N,), 0.5),
    depth_grid=jnp.ones((N, 1, gy, gx)),
    spatial_grid=jnp.zeros((N, 1, 1, 2)),
)
cfg = _make_cfg(opt, inputs, params)
diag_fn = _stage_diag_fn(cfg, opt, 0.1, False, False)
aux = _aux(opt, inputs, False, cfg=cfg)
w = jnp.ones(inputs.data.weight.shape, jnp.float32)
f = jax.jit(lambda p: diag_fn(p, w, aux))
out = f(params)
jax.block_until_ready(out)
np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
best = 1e9
for _ in range(4):
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(params)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = min(best, (time.perf_counter() - t0) / 10)
print(f"{'diag build (final stage)':28s} {best*1e3:8.2f} ms/outer", flush=True)
