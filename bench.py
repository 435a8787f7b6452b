"""Benchmark harness — prints ONE JSON line with the headline metric.

Current benchmark: full joint pose/deformation optimization (normalize +
4-step coarse-to-fine LM) for a synthetic 100-frame 384p-equivalent clip
with hierarchical2 constraint density — BASELINE.md staged config 3/4.
The reference solves this with Ceres on 12 CPU threads (maxIterations=1000
x 4 steps); there is no published reference number (BASELINE.json
published: {}), so vs_baseline is null until a measured reference run
exists.
"""

import json
import time

import numpy as np


def make_clip_problem(num_frames=100, samples_per_pair=128, seed=0):
    import jax.numpy as jnp

    from robust_cvd_tpu.solver.pose_opt import PoseOptInputs
    from robust_cvd_tpu.solver.residuals import ConstraintData
    from robust_cvd_tpu.utils.frame_sampling import sample_pairs

    rng = np.random.default_rng(seed)
    pairs = sample_pairs(num_frames, ("hierarchical2",), two_way=True)
    P, C = len(pairs), samples_per_pair
    pair = np.asarray(pairs, np.int32)

    # Synthetic static scene: cameras on a slow arc, plane-ish depth field.
    positions = np.stack(
        [0.05 * np.arange(num_frames), np.zeros(num_frames), np.zeros(num_frames)],
        axis=-1,
    ).astype(np.float32)
    focal = 0.5
    loc0 = rng.uniform(-0.9, 0.9, (P, C, 2)).astype(np.float32)
    depth0 = rng.uniform(1.5, 4.0, (P, C)).astype(np.float32)

    # Exact reprojections -> consistent constraints.
    import jax

    from robust_cvd_tpu.solver import residuals as R

    pose = np.zeros((num_frames, 6), np.float32)
    pose[:, :3] = positions
    fx = np.full(P, focal * 16 / 9, np.float32)
    fy = np.full(P, focal, np.float32)
    p0 = jnp.concatenate([jnp.asarray(loc0), jnp.asarray(depth0)[..., None]], axis=-1)
    world = R.camera_to_world(p0, jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(pose)[pair[:, 0]])
    p1 = R.world_to_camera(world, jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(pose)[pair[:, 1]])
    p1 = np.asarray(jax.block_until_ready(p1))

    # Corrupt per-frame depth scales: the solver's work.
    frame_scale = rng.uniform(0.7, 1.4, num_frames).astype(np.float32)
    data = ConstraintData(
        pair=jnp.asarray(pair),
        loc0=jnp.asarray(loc0),
        loc1=jnp.asarray(p1[..., :2]),
        depth0=jnp.asarray(depth0 / frame_scale[pair[:, 0], None]),
        depth1=jnp.asarray(p1[..., 2] / frame_scale[pair[:, 1], None]),
        weight=jnp.ones((P, C), jnp.float32),
    )
    inputs = PoseOptInputs(
        data=data,
        median_depth=jnp.asarray(2.5 / frame_scale),
        aspect=16 / 9,
        num_frames=num_frames,
    )
    return inputs


def main():
    from robust_cvd_tpu.parallel.runtime import configure as _configure_jax
    _configure_jax()
    import jax
    import jax.numpy as jnp

    from robust_cvd_tpu.config import PoseOptParams
    from robust_cvd_tpu.solver import pose_opt

    num_frames = 100
    opt = PoseOptParams(graduate_deformation_regularization=True)
    inputs = make_clip_problem(num_frames=num_frames)

    # Warm-up (compile all CTF stages).
    params = pose_opt.run(opt, inputs, focal=jnp.full((num_frames,), 0.5))
    jax.block_until_ready(params.pose)

    t0 = time.perf_counter()
    params = pose_opt.run(opt, inputs, focal=jnp.full((num_frames,), 0.5))
    jax.block_until_ready(params.pose)
    elapsed = time.perf_counter() - t0

    sec_per_frame = elapsed / num_frames
    print(
        json.dumps(
            {
                "metric": "pose_opt_sec_per_frame",
                "value": round(sec_per_frame, 6),
                "unit": "s/frame",
                "vs_baseline": None,
                "detail": {
                    "num_frames": num_frames,
                    "constraints": int(inputs.data.weight.size),
                    "elapsed_s": round(elapsed, 4),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
