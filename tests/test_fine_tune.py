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


def test_epoch_scan_matches_per_step_loop():
    """The fused-epoch scan (one device program) must reproduce the
    per-batch stepping loop exactly: same params, stats, opt state, losses —
    including the kept trailing partial batch."""
    import optax

    from robust_cvd_tpu.config import LossParams

    clip, _ = make_tiny_setup()
    adapter = TinyAdapter()
    loss_opt = LossParams()
    optimizer = optax.adam(1e-3)
    step = fine_tune.make_train_step(adapter.net, loss_opt, optimizer, False)
    epoch = fine_tune.make_epoch_fn(adapter.net, loss_opt, optimizer, False)

    N, H, W = clip.images.shape[:3]
    ps = fine_tune.pose_state_from_solver(
        SolverParams(
            pose=jnp.zeros((N, 6)),
            focal=jnp.full((N,), 0.5),
            depth_grid=jnp.ones((N, 1, 1, 1)),
            spatial_grid=jnp.zeros((N, 1, 1, 2)),
        ),
        (H, W),
        aspect=W / H,
    )

    P = int(clip.pair_idx.shape[0])
    B = 2
    order = np.random.default_rng(1).permutation(P)
    p0, bs0 = adapter.params, adapter.batch_stats
    os0 = optimizer.init(p0)

    # per-step loop (the reference-shaped loop)
    p_a, bs_a, os_a = p0, bs0, os0
    losses_a = []
    for s in range(0, P, B):
        ids = jnp.asarray(order[s : s + B], jnp.int32)
        p_a, bs_a, os_a, loss, _ = step(p_a, bs_a, os_a, ids, clip, ps, p0)
        losses_a.append(float(loss))

    # fused scan over the full batches + tail step
    S = P // B
    blocks = jnp.asarray(order[: S * B].reshape(S, B), jnp.int32)
    p_b, bs_b, os_b, losses_s, _ = epoch(p0, bs0, os0, blocks, clip, ps, p0)
    losses_b = [float(x) for x in np.asarray(losses_s)]
    if S * B < P:
        ids = jnp.asarray(order[S * B :], jnp.int32)
        p_b, bs_b, os_b, loss, _ = step(p_b, bs_b, os_b, ids, clip, ps, p0)
        losses_b.append(float(loss))

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(bs_a), jax.tree.leaves(bs_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_eval_all_matches_per_pair_eval():
    from robust_cvd_tpu.config import LossParams

    clip, _ = make_tiny_setup()
    adapter = TinyAdapter()
    loss_opt = LossParams()
    one = fine_tune.make_eval_step(adapter.net, loss_opt, False)
    allf = fine_tune.make_eval_all_fn(adapter.net, loss_opt, False)

    N, H, W = clip.images.shape[:3]
    ps = fine_tune.pose_state_from_solver(
        SolverParams(
            pose=jnp.zeros((N, 6)),
            focal=jnp.full((N,), 0.5),
            depth_grid=jnp.ones((N, 1, 1, 1)),
            spatial_grid=jnp.zeros((N, 1, 1, 2)),
        ),
        (H, W),
        aspect=W / H,
    )
    p0, bs0 = adapter.params, adapter.batch_stats
    losses_p, _ = allf(p0, bs0, clip, ps, p0)
    for pid in range(int(clip.pair_idx.shape[0])):
        loss, _ = one(p0, bs0, jnp.asarray([pid], jnp.int32), clip, ps, p0)
        np.testing.assert_allclose(float(loss), float(losses_p[pid]), rtol=1e-5)


def test_scene_flow_vis_artifacts(tmp_path):
    import dataclasses
    import os

    clip, inputs = make_tiny_setup()
    cfg = PipelineConfig(
        opt=PoseOptParams(
            num_steps=1, coarse_to_fine=False, lm_max_outer=3, lm_cg_iters=4
        ),
    )
    cfg = dataclasses.replace(
        cfg,
        ft=dataclasses.replace(
            cfg.ft, num_epochs=1, batch_size=2, save_scene_flow_vis=True,
            save_tensorboard=False,
        ),
    )
    tuner = FineTuner(cfg, TinyAdapter(), clip, inputs, out_dir=str(tmp_path))
    tuner.optimize_poses()
    tuner.validate(0, 0)
    eval_dir = tmp_path / "eval"
    vis = [f for f in os.listdir(eval_dir) if f.startswith("scene_flow_")]
    assert len(vis) == int(clip.pair_idx.shape[0])


def test_tensorboard_artifacts(tmp_path):
    """TB scalars + histograms + image grid produce event files."""
    import dataclasses
    import os

    clip, inputs = make_tiny_setup()
    cfg = PipelineConfig(
        opt=PoseOptParams(
            num_steps=1, coarse_to_fine=False, lm_max_outer=3, lm_cg_iters=4
        ),
    )
    cfg = dataclasses.replace(
        cfg,
        ft=dataclasses.replace(
            cfg.ft, num_epochs=1, batch_size=2, val_epoch_freq=-1,
            save_tensorboard=True, tensorboard_log_path=str(tmp_path / "tb"),
        ),
    )
    tuner = FineTuner(cfg, TinyAdapter(), clip, inputs)
    assert tuner.writer is not None
    tuner.run(num_epochs=1)
    tuner.writer.flush()
    events = [
        f for f in os.listdir(tmp_path / "tb") if "tfevents" in f
    ]
    assert events, "no tensorboard event files written"
    assert os.path.getsize(tmp_path / "tb" / events[0]) > 500


def test_epoch_fn_mesh_matches_single_device():
    """The mesh-data-parallel epoch (batch axis sharded over the data axis,
    params replicated, gradient reduction as XLA psum — the TPU-native form
    of the reference's DataParallel training, params.py:260-262) must
    reproduce the unsharded epoch on identical batch blocks, including the
    BatchNorm batch statistics (a global mean over the sharded batch)."""
    import optax

    from robust_cvd_tpu.config import LossParams
    from robust_cvd_tpu.parallel import mesh as pmesh

    clip, _ = make_tiny_setup(N=9)  # P = 16 pairs -> 2 blocks of 8
    adapter = TinyAdapter()
    loss_opt = LossParams()
    optimizer = optax.adam(1e-3)
    N, H, W = clip.images.shape[:3]
    ps = fine_tune.pose_state_from_solver(
        SolverParams(
            pose=jnp.zeros((N, 6)),
            focal=jnp.full((N,), 0.5),
            depth_grid=jnp.ones((N, 1, 1, 1)),
            spatial_grid=jnp.zeros((N, 1, 1, 2)),
        ),
        (H, W),
        aspect=W / H,
    )

    P = int(clip.pair_idx.shape[0])
    B = 8
    S = P // B
    order = np.random.default_rng(2).permutation(P)
    blocks = jnp.asarray(order[: S * B].reshape(S, B), jnp.int32)
    p0, bs0 = adapter.params, adapter.batch_stats
    os0 = optimizer.init(p0)

    epoch_1d = fine_tune.make_epoch_fn(adapter.net, loss_opt, optimizer, False)
    w_p, w_bs, _, w_losses, _ = epoch_1d(p0, bs0, os0, blocks, clip, ps, p0)

    mesh = pmesh.make_mesh(8)
    epoch_dp = fine_tune.make_epoch_fn(
        adapter.net, loss_opt, optimizer, False, mesh=mesh
    )
    g_p, g_bs, _, g_losses, _ = epoch_dp(
        pmesh.replicate(p0, mesh),
        pmesh.replicate(bs0, mesh),
        pmesh.replicate(os0, mesh),
        blocks,
        pmesh.replicate(clip, mesh),
        pmesh.replicate(ps, mesh),
        pmesh.replicate(p0, mesh),
    )

    np.testing.assert_allclose(
        np.asarray(w_losses), np.asarray(g_losses), rtol=1e-4, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(w_p), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    for a, b in zip(jax.tree.leaves(w_bs), jax.tree.leaves(g_bs)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_fine_tuner_runs_on_mesh():
    """FineTuner end-to-end with a mesh: DP epochs, sharded whole-clip
    depth refresh, SPMD pose re-solve — the placement-coherence regression
    test for the CLI crash where mesh-committed solver outputs mixed with
    single-device clip tensors (hidden resharding collectives)."""
    from robust_cvd_tpu.parallel import mesh as pmesh

    clip, inputs = make_tiny_setup(N=9)
    mesh = pmesh.make_mesh(8)
    inputs = pmesh.shard_pose_inputs(inputs, mesh)
    import dataclasses

    cfg = PipelineConfig(
        opt=PoseOptParams(
            num_steps=2, ctf_long=3, ctf_short=2, lm_max_outer=3,
            lm_cg_iters=6,
        ),
    )
    cfg = dataclasses.replace(
        cfg,
        ft=dataclasses.replace(
            cfg.ft,
            num_epochs=2,
            batch_size=1,  # -> 8 per sharded step, reference num-GPU scaling
            val_epoch_freq=-1,
            save_checkpoints=False,
        ),
    )
    tuner = FineTuner(cfg, TinyAdapter(), clip, inputs, mesh=mesh)
    history = tuner.run()
    assert len(history) == 2
    assert all(np.isfinite(h["loss"]) for h in history)
    depth = np.asarray(tuner.infer_depth())
    assert depth.shape == clip.images.shape[:3] and np.isfinite(depth).all()


def test_epoch_fn_mesh_matches_single_device_temporal():
    """DP-epoch equivalence through the TEMPORAL (K=6) path: scene-flow /
    smoothness losses gather per-anchor neighbor flows, and ClipData's
    optional temporal fields must survive the replicated in_shardings tree
    prefix. (The non-temporal variant is covered above.)"""
    import dataclasses

    import optax

    from robust_cvd_tpu.config import LossParams
    from robust_cvd_tpu.parallel import mesh as pmesh

    N, H, W = 9, 16, 16
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32)
    depth = np.full((N, H, W), 2.0, np.float32)
    flow_list, flows, masks = [], {}, {}
    for i in range(N - 1):
        for (a, b) in ((i, i + 1), (i + 1, i)):
            flow_list.append((a, b, 1.0))
            flows[(a, b)] = np.zeros((H, W, 2), np.float32)
            masks[(a, b)] = np.ones((H, W), np.float32)
    clip = fine_tune.build_clip_data(
        images, depth, flow_list, flows, masks, 0.2, use_temporal=True
    )

    adapter = TinyAdapter()
    loss_opt = dataclasses.replace(
        LossParams(),
        lambda_smooth_disparity=0.1,
        lambda_smooth_reprojection=1.0,
    )
    optimizer = optax.adam(1e-3)
    ps = fine_tune.pose_state_from_solver(
        SolverParams(
            pose=jnp.zeros((N, 6)),
            focal=jnp.full((N,), 0.5),
            depth_grid=jnp.ones((N, 1, 1, 1)),
            spatial_grid=jnp.zeros((N, 1, 1, 2)),
        ),
        (H, W),
        aspect=W / H,
    )

    P = int(clip.pair_idx.shape[0])
    B = 8
    blocks = jnp.asarray(
        np.random.default_rng(5).permutation(P)[: (P // B) * B].reshape(-1, B),
        jnp.int32,
    )
    p0, bs0 = adapter.params, adapter.batch_stats
    os0 = optimizer.init(p0)

    epoch_1d = fine_tune.make_epoch_fn(adapter.net, loss_opt, optimizer, True)
    w_p, _, _, w_losses, _ = epoch_1d(p0, bs0, os0, blocks, clip, ps, p0)

    mesh = pmesh.make_mesh(8)
    epoch_dp = fine_tune.make_epoch_fn(
        adapter.net, loss_opt, optimizer, True, mesh=mesh
    )
    g_p, _, _, g_losses, _ = epoch_dp(
        pmesh.replicate(p0, mesh),
        pmesh.replicate(bs0, mesh),
        pmesh.replicate(os0, mesh),
        blocks,
        pmesh.replicate(clip, mesh),
        pmesh.replicate(ps, mesh),
        pmesh.replicate(p0, mesh),
    )

    np.testing.assert_allclose(
        np.asarray(w_losses), np.asarray(g_losses), rtol=1e-4, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(w_p), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


# ---------------------------------------------------------------------------
# recon=colmap semantics (reference depth_fine_tuning.py:357-368, 494-511,
# 581-583) + print/display_freq TB gating (:546-551).
# ---------------------------------------------------------------------------


def _identity_pose_state(N, H, W):
    ext = np.tile(np.eye(3, 4, dtype=np.float32), (N, 1, 1))
    intr = np.tile(np.asarray([W, W, W / 2, H / 2], np.float32), (N, 1))
    return fine_tune.PoseState(
        extrinsics=jnp.asarray(ext),
        intrinsics=jnp.asarray(intr),
        scales=jnp.ones((N, H, W), jnp.float32),
        warp=jnp.zeros((N, H, W, 2), jnp.float32),
    )


def test_colmap_depth_scale_matches_numpy():
    rng = np.random.default_rng(3)
    B, K, H, W = 2, 2, 7, 9
    depth = rng.uniform(0.5, 4.0, (B, K, H, W)).astype(np.float32)
    ref = rng.uniform(0.1, 2.0, (B, K, H, W)).astype(np.float32)
    # poke some invalid reference pixels (inf/nan), incl. a whole-invalid map
    ref[0, 0, :2, :3] = np.inf
    ref[1, 1, 3, :] = np.nan
    ref[1, 0] = np.nan  # no valid pixels -> scale 1.0
    got = np.asarray(fine_tune.colmap_depth_scale(jnp.asarray(depth), jnp.asarray(ref)))
    for b in range(B):
        for k in range(K):
            valid = np.isfinite(ref[b, k])
            if not valid.any():
                assert got[b, k] == 1.0
                continue
            want = np.median((1.0 / depth[b, k])[valid] / ref[b, k][valid])
            np.testing.assert_allclose(got[b, k], want, rtol=1e-5)


def test_fine_tuner_colmap_mode_skips_solver():
    import dataclasses

    N, H, W = 4, 16, 16
    clip, inputs = make_tiny_setup(N, H, W)
    # reference disparity = half the (constant 2.0) initial depth's disparity
    ref_disp = np.full((N, H, W), 0.25, np.float32)
    clip = clip._replace(ref_disp=jnp.asarray(ref_disp))
    cfg = PipelineConfig(recon="colmap", scaling="depth")
    cfg = dataclasses.replace(
        cfg, ft=dataclasses.replace(cfg.ft, num_epochs=2, batch_size=2)
    )
    ps = _identity_pose_state(N, H, W)
    tuner = FineTuner(cfg, TinyAdapter(), clip, inputs, pose_state_override=ps)
    history = tuner.run(num_epochs=2)
    assert len(history) == 2
    assert all(np.isfinite(h["loss"]) for h in history)
    # the pose/deformation solver must never have run (reference gates every
    # optimize_poses call on recon == "i3d")
    assert tuner.solver_params is None


def test_colmap_mode_requires_override():
    import pytest

    clip, inputs = make_tiny_setup()
    cfg = PipelineConfig(recon="colmap")
    with pytest.raises(ValueError):
        FineTuner(cfg, TinyAdapter(), clip, inputs)


class _FakeWriter:
    def __init__(self):
        self.scalars = []
        self.hists = []
        self.images = []

    def add_scalar(self, tag, val, it):
        self.scalars.append((tag, it))

    def add_histogram(self, tag, arr, it):
        self.hists.append((tag, it))

    def add_image(self, tag, img, it, dataformats=None):
        self.images.append((tag, it))


def test_print_and_display_freq_gating():
    """--print_freq / --display_freq gate TB writes on the running pair
    counter exactly like reference depth_fine_tuning.py:546-551."""
    import dataclasses

    clip, inputs = make_tiny_setup()  # 3 one-way pairs
    cfg = PipelineConfig(
        opt=PoseOptParams(
            num_steps=1, coarse_to_fine=False, lm_max_outer=2, lm_cg_iters=4
        ),
    )
    cfg = dataclasses.replace(
        cfg,
        ft=dataclasses.replace(
            cfg.ft, num_epochs=2, batch_size=2, pose_opt_freq=10,
            print_freq=2, display_freq=3,
        ),
    )
    tuner = FineTuner(cfg, TinyAdapter(), clip, inputs)
    tuner.writer = _FakeWriter()
    tuner.run(num_epochs=2)
    # per-epoch iters: scan step of 2 + trailing 1 -> counter 2, 3, 5, 6
    loss_iters = [it for (tag, it) in tuner.writer.scalars if tag == "Train/loss"]
    assert loss_iters == [2, 6]  # multiples of print_freq=2 only
    hist_iters = sorted({it for (_, it) in tuner.writer.hists})
    assert hist_iters == [3, 6]  # multiples of display_freq=3 only
