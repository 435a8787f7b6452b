"""Trainer mechanics test with a tiny stand-in depth network."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from robust_cvd_tpu.config import PipelineConfig, PoseOptParams
from robust_cvd_tpu.solver.pose_opt import PoseOptInputs
from robust_cvd_tpu.solver.residuals import ConstraintData, SolverParams
from robust_cvd_tpu.training import fine_tune
from robust_cvd_tpu.training.fine_tune import ClipData, FineTuner


class TinyDepthNet(nn.Module):
    """Minimal conv net with a BatchNorm so the batch_stats path is real."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(8, (3, 3), padding="SAME")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1))(y)
        # bounded positive disparity keeps 1/d gradients well-conditioned
        return nn.sigmoid(y[..., 0]) + 0.3


class TinyAdapter:
    align = 8
    learning_rate = 1e-3
    lambda_view_baseline = 1e-4

    def __init__(self):
        self.net = TinyDepthNet()
        variables = self.net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False
        )
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]


def make_tiny_setup(N=4, H=16, W=16):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32)
    depth = np.full((N, H, W), 2.0, np.float32)
    flow_list, flows, masks = [], {}, {}
    for i in range(N - 1):
        for (a, b) in ((i, i + 1), (i + 1, i)):
            flow_list.append((a, b, 1.0))
            flows[(a, b)] = np.zeros((H, W, 2), np.float32)
            masks[(a, b)] = np.ones((H, W), np.float32)
    clip = fine_tune.build_clip_data(images, depth, flow_list, flows, masks, 0.2)

    # constraints: zero-flow static scene, pair-blocked (P, C=3)
    pairs = []
    for i in range(N - 1):
        pairs += [(i, i + 1), (i + 1, i)]
    P, C = len(pairs), 3
    locs = np.tile(
        np.asarray([[-0.5, -0.5], [0.0, 0.3], [0.5, 0.1]], np.float32), (P, 1, 1)
    )
    data = ConstraintData(
        pair=jnp.asarray(np.asarray(pairs, np.int32)),
        loc0=jnp.asarray(locs),
        loc1=jnp.asarray(locs),
        depth0=jnp.full((P, C), 2.0),
        depth1=jnp.full((P, C), 2.0),
        weight=jnp.ones((P, C)),
    )
    inputs = PoseOptInputs(
        data=data, median_depth=jnp.full((N,), 2.0), aspect=1.0, num_frames=N
    )
    return clip, inputs


def test_fine_tuner_runs_and_improves():
    clip, inputs = make_tiny_setup()
    cfg = PipelineConfig(
        opt=PoseOptParams(
            num_steps=1, coarse_to_fine=False, lm_max_outer=5, lm_cg_iters=8
        ),
    )
    import dataclasses

    cfg = dataclasses.replace(
        cfg, ft=dataclasses.replace(cfg.ft, num_epochs=2, batch_size=2, pose_opt_freq=10)
    )
    tuner = FineTuner(cfg, TinyAdapter(), clip, inputs)
    history = tuner.run(num_epochs=2)
    assert len(history) == 2
    assert all(np.isfinite(h["loss"]) for h in history)
    depth = tuner.infer_depth()
    assert depth.shape == clip.images.shape[:3]
    assert bool(jnp.all(depth > 0))


def test_pose_state_from_solver_shapes():
    N, H, W = 3, 12, 16
    params = SolverParams(
        pose=jnp.zeros((N, 6)),
        focal=jnp.full((N,), 0.5),
        depth_grid=jnp.ones((N, 1, 4, 3)),
        spatial_grid=jnp.zeros((N, 2, 2, 2)),
    )
    ps = fine_tune.pose_state_from_solver(params, (H, W), aspect=W / H)
    assert ps.extrinsics.shape == (N, 3, 4)
    assert ps.intrinsics.shape == (N, 4)
    assert ps.scales.shape == (N, H, W)
    assert ps.warp.shape == (N, H, W, 2)
    np.testing.assert_allclose(np.asarray(ps.scales), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ps.warp), 0.0, atol=1e-6)
    # identity extrinsics
    np.testing.assert_allclose(
        np.asarray(ps.extrinsics[0, :, :3]), np.eye(3), atol=1e-6
    )


def test_eval_and_checkpoint(tmp_path):
    import dataclasses

    import jax

    clip, inputs = make_tiny_setup()
    cfg = PipelineConfig(
        opt=PoseOptParams(num_steps=1, coarse_to_fine=False, lm_max_outer=3, lm_cg_iters=4),
    )
    cfg = dataclasses.replace(
        cfg, ft=dataclasses.replace(cfg.ft, num_epochs=1, batch_size=2, pose_opt_freq=10)
    )
    tuner = FineTuner(cfg, TinyAdapter(), clip, inputs)
    tuner.optimize_poses()

    losses = tuner.eval_pair_losses()
    assert len(losses) == int(clip.pair_idx.shape[0])
    assert all(np.isfinite(e["loss"]) for e in losses)
    tuner.save_eval_json(str(tmp_path / "eval"), 0)
    assert (tmp_path / "eval" / "loss_0000.json").exists()

    tuner.save_checkpoint(str(tmp_path / "ckpt"), 0)
    orig = jax.tree.map(np.asarray, tuner.params)
    tuner.params = jax.tree.map(lambda x: x * 0, tuner.params)
    tuner.load_checkpoint(str(tmp_path / "ckpt"), 0)
    restored = jax.tree.map(np.asarray, tuner.params)
    chk = jax.tree.map(np.allclose, orig, restored)
    assert all(jax.tree.leaves(chk))
