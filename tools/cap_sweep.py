"""Cap retune evidence: golden-scene recovery (bench quality-gate config)
across CG caps, plain vs exact-diag preconditioned. Residual-evaluation
count per outer ~ 2*cg_iters + 2 (+3 for the diag build) is the
wall-clock proxy."""
import dataclasses

import numpy as np
import jax.numpy as jnp

import bench  # reuse the quality-gate problem construction
from robust_cvd_tpu.config import PoseOptParams


def run_gate(opt_kwargs):
    detail = {}
    # quality_gate builds its own problem; patch its opt via a monkeypatched
    # PoseOptParams? Simpler: copy gate logic would be long — instead
    # monkeypatch the constructor default the gate uses.
    import robust_cvd_tpu.solver.pose_opt as po
    orig_run = po.run

    captured = {}

    def spy_run(opt, inputs, **kw):
        opt = dataclasses.replace(opt, **opt_kwargs)
        captured["opt"] = opt
        return orig_run(opt, inputs, **kw)

    po.run = spy_run
    try:
        bench.quality_gate(detail, tiny=True)
    finally:
        po.run = orig_run
    return detail["quality_gap_closed"], captured["opt"]


configs = [
    ("plain cg24", dict(lm_cg_iters=24)),
    ("plain cg12", dict(lm_cg_iters=12)),
    ("plain cg8 ", dict(lm_cg_iters=8)),
    ("exact cg24", dict(lm_cg_iters=24, lm_precond_exact=True)),
    ("exact cg12", dict(lm_cg_iters=12, lm_precond_exact=True)),
    ("exact cg8 ", dict(lm_cg_iters=8, lm_precond_exact=True)),
    ("exact cg6 ", dict(lm_cg_iters=6, lm_precond_exact=True)),
    # round-5 block-Jacobi candidates (pose 6x6 frame blocks)
    ("block cg24", dict(lm_cg_iters=24, lm_precond_exact=True,
                        lm_precond_pose_blocks=True)),
    ("block cg16", dict(lm_cg_iters=16, lm_precond_exact=True,
                        lm_precond_pose_blocks=True)),
    ("block cg12", dict(lm_cg_iters=12, lm_precond_exact=True,
                        lm_precond_pose_blocks=True)),
    ("block cg8 ", dict(lm_cg_iters=8, lm_precond_exact=True,
                        lm_precond_pose_blocks=True)),
]
for label, kw in configs:
    gap, opt = run_gate(kw)
    cost = 2 * opt.lm_cg_iters + 2 + (3 if opt.lm_precond_exact else 0)
    print(f"{label}: gap_closed={gap:.4f}  ~res-evals/outer={cost}")
