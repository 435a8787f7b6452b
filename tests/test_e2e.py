"""End-to-end pipeline smoke test: synthetic clip, tiny random-weight models.

Exercises the full DatasetProcessor orchestration — downscale, initial
depth, flow (RAFT), masks, flow_list, constraints, pose optimization, and
the fine-tune loop — on a 4-frame synthetic clip. Models use random weights
(no checkpoints in this environment); this validates plumbing + shapes +
result-tree contract, not depth quality.
"""

import dataclasses
import json
import os
from os.path import join as pjoin

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from robust_cvd_tpu.config import FineTuneParams, PipelineConfig, PoseOptParams
from robust_cvd_tpu.io.frames import save_frames_txt
from robust_cvd_tpu.io.store import frame_name, save_png_color
from robust_cvd_tpu.models import raft
from robust_cvd_tpu.pipeline.process import DatasetProcessor


class TinyDepthNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(8, (3, 3), padding="SAME")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1))(y)
        return nn.sigmoid(y[..., 0]) + 0.3


class TinyDepthAdapter:
    align = 8
    learning_rate = 1e-4
    lambda_view_baseline = 1e-4

    def __init__(self):
        self.net = TinyDepthNet()
        v = self.net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        self.params = v["params"]
        self.batch_stats = v["batch_stats"]

    def estimate_depth(self, images):
        disp = self.net.apply(
            {"params": self.params, "batch_stats": self.batch_stats}, images
        )
        return 1.0 / (disp + 1e-7)


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("clip"))
    rng = np.random.default_rng(0)
    H, W = 48, 64
    bg = rng.uniform(0, 1, (H, W + 16, 3)).astype(np.float32)
    os.makedirs(pjoin(base, "color_full"))
    for i in range(4):
        save_png_color(
            pjoin(base, "color_full", frame_name(i, ".png")), bg[:, 2 * i : 2 * i + W]
        )
    save_frames_txt(pjoin(base, "frames.txt"), W, H, [i / 30 for i in range(4)])
    return base


def test_full_pipeline(clip_dir):
    raft_model = raft.RAFT(iters=2)
    rv = raft_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
    )
    cfg = PipelineConfig(
        path=clip_dir,
        size=32,
        align=8,
        model_type="tiny",
        min_mask_ratio=-1.0,  # random-weight flow gives sparse masks
        opt=PoseOptParams(
            num_steps=2, ctf_long=3, ctf_short=2,
            lm_max_outer=4, lm_cg_iters=8,
        ),
        ft=FineTuneParams(num_epochs=1, batch_size=2, pose_opt_freq=5),
    )
    import robust_cvd_tpu.pipeline.process as proc_mod

    old_max, old_align = proc_mod.FLOW_MAX_SIZE, proc_mod.FLOW_ALIGN
    proc_mod.FLOW_MAX_SIZE, proc_mod.FLOW_ALIGN = 64, 8
    try:
        proc = DatasetProcessor(
            cfg,
            models={"depth": TinyDepthAdapter(), "flow": (raft_model, rv)},
        )
        store = proc.process()
    finally:
        proc_mod.FLOW_MAX_SIZE, proc_mod.FLOW_ALIGN = old_max, old_align

    base = clip_dir
    # result-tree contract
    assert os.path.exists(pjoin(base, "color_down", "frame_000000.raw"))
    assert os.path.exists(pjoin(base, "depth_tiny", "depth", "frame_000000.raw"))
    assert os.path.exists(pjoin(base, "flow", "flow_000000_000001.raw"))
    assert os.path.exists(pjoin(base, "flow_mask", "mask_000000_000001.png"))
    flow_list = json.load(open(pjoin(base, "flow_list.json")))
    assert flow_list[0] == ["frame0", "frame1", "mask_ratio"]

    # the fine_tuned stream lives at the experiment-tag dir (reference
    # depth_fine_tuning.py:213-215, 363-365)
    from robust_cvd_tpu.utils.experiment import make_tag

    out_dir = proc.out_dir(store.num_frames)
    ft_dir = pjoin(out_dir, make_tag(cfg))
    fine = pjoin(ft_dir, "depth", "frame_000000.raw")
    assert os.path.exists(fine)
    from robust_cvd_tpu.io import raw

    disp = raw.load_raw_float32_image(fine)
    assert disp.shape == (24, 32)
    assert np.isfinite(disp).all() and (disp >= 0).all()

    # persistence surface: video.dat + flow_constraints.dat are written by a
    # real pipeline run and round-trip through our readers (reference
    # pose_optimization.py:240, lib/FlowConstraints.cpp:86-93)
    from robust_cvd_tpu.io.flow_constraints_dat import load_flow_constraints_dat
    from robust_cvd_tpu.io.video_dat import load_video_dat

    vd = load_video_dat(pjoin(base, "video.dat"))
    assert len(vd.pts) == store.num_frames
    names = [ds.name for ds in vd.depth_streams]
    assert names[0] == "depth_tiny" and "fine_tuned" in names
    sep, cpairs, _ = load_flow_constraints_dat(pjoin(base, "flow_constraints.dat"))
    assert sep == 10 and len(cpairs) > 0

    # stage timings were traced
    assert os.path.exists(pjoin(out_dir, "stage_timings.json"))


def test_fine_tune_artifact_surface(clip_dir):
    """Validation JSONs, checkpoints, intermediate depth streams, eval
    images, and the post filter all appear in the result tree
    (reference depth_fine_tuning.py:343, 415-432, 562-631)."""
    from robust_cvd_tpu.io.store import VideoStore
    from robust_cvd_tpu.utils.experiment import make_tag

    cfg = PipelineConfig(
        path=clip_dir,
        size=32,
        align=8,
        model_type="tiny",
        min_mask_ratio=-1.0,
        post_filter=True,
        opt=PoseOptParams(
            num_steps=2, ctf_long=3, ctf_short=2,
            lm_max_outer=4, lm_cg_iters=8,
        ),
        ft=FineTuneParams(
            num_epochs=1, batch_size=2, pose_opt_freq=1,
            val_epoch_freq=1, save_checkpoints=True, save_epoch_freq=1,
            save_intermediate_depth_streams_freq=1,
            save_depth_xform_maps=True, save_tensorboard=False,
        ),
    )
    proc = DatasetProcessor(cfg, models={"depth": TinyDepthAdapter()})
    store = VideoStore.open(clip_dir)
    depth = store.load_depth_stream("depth_tiny")
    proc.fine_tune(store, depth)

    ft_dir = pjoin(proc.out_dir(store.num_frames), make_tag(cfg))
    # eval: epoch-0 and final validation JSONs in the reference's naming
    assert os.path.exists(pjoin(ft_dir, "eval", "loss_e0000_iter000000.json"))
    finals = [
        n for n in os.listdir(pjoin(ft_dir, "eval"))
        if n.startswith("loss_e0001")
    ]
    assert finals, "final validation json missing"
    loss_dict = json.load(open(pjoin(ft_dir, "eval", "loss_e0000_iter000000.json")))
    assert "mean" in loss_dict and "loss" in loss_dict
    # eval depth images at the edge epochs + scale maps
    assert any(
        n.startswith("depth_000000_e0000") and n.endswith(".png")
        for n in os.listdir(pjoin(ft_dir, "eval"))
    )
    assert any(
        n.startswith("scale_000000_") and n.endswith(".raw")
        for n in os.listdir(pjoin(ft_dir, "eval"))
    )
    # checkpoints
    assert os.path.isdir(pjoin(ft_dir, "checkpoints", "0001"))
    # intermediate depth streams: e0000 + e0000_opt (pose_opt_freq=1)
    assert os.path.exists(pjoin(ft_dir, "depth_e0000", "depth", "frame_000000.raw"))
    assert os.path.exists(
        pjoin(ft_dir, "depth_e0000_opt", "depth", "frame_000000.raw")
    )
    # post filter output stream nested under the last stream's dir
    assert os.path.exists(
        pjoin(
            ft_dir, "depth_e0000_opt", "e0000_opt_filtered",
            "depth", "frame_000000.raw",
        )
    )
    # all streams registered in video.dat
    from robust_cvd_tpu.io.video_dat import load_video_dat

    names = [ds.name for ds in load_video_dat(pjoin(clip_dir, "video.dat")).depth_streams]
    for expect in ("depth_tiny", "e0000", "e0000_opt", "e0000_opt_filtered"):
        assert expect in names, names


def test_constraint_cache_reused(clip_dir):
    """Second PoseOptimizer construction must load the cache, not recompute
    (reference FlowConstraints.cpp:86-93)."""
    from robust_cvd_tpu.config import PipelineConfig, PoseOptParams
    from robust_cvd_tpu.io.store import VideoStore
    from robust_cvd_tpu.pipeline.pose import PoseOptimizer
    from robust_cvd_tpu.solver import constraints as C

    cfg = PipelineConfig(path=clip_dir, opt=PoseOptParams(dynamic_constraints="None"))
    store = VideoStore.open(clip_dir)
    pose1 = PoseOptimizer(cfg, store, "depth_tiny")

    computed = []
    orig = C.build_pair_constraints

    def spy(*a, **k):
        computed.append(1)
        return orig(*a, **k)

    C.build_pair_constraints = spy
    try:
        pose2 = PoseOptimizer(cfg, store, "depth_tiny")
    finally:
        C.build_pair_constraints = orig
    assert not computed, "constraints were recomputed despite a valid cache"
    for k in pose1.pairs:
        np.testing.assert_allclose(pose2.pairs[k].loc0, pose1.pairs[k].loc0)
        np.testing.assert_allclose(pose2.pairs[k].loc1, pose1.pairs[k].loc1)


def test_constraint_cache_corruption_recomputes(clip_dir):
    """A truncated/garbled flow_constraints.dat must be IGNORED (recompute
    + rewrite), not crash the pipeline (pipeline/pose.py fallback;
    reference would abort on a bad magic)."""
    from robust_cvd_tpu.config import PipelineConfig, PoseOptParams
    from robust_cvd_tpu.io.store import VideoStore
    from robust_cvd_tpu.pipeline.pose import PoseOptimizer

    cache = pjoin(clip_dir, "flow_constraints.dat")
    good = open(cache, "rb").read()
    try:
        # truncate mid-record
        with open(cache, "wb") as f:
            f.write(good[: len(good) // 2])
        cfg = PipelineConfig(
            path=clip_dir, opt=PoseOptParams(dynamic_constraints="None")
        )
        store = VideoStore.open(clip_dir)
        pose = PoseOptimizer(cfg, store, "depth_tiny")
        assert pose.pairs, "no constraints rebuilt after corrupted cache"
        # the rewritten cache must round-trip again
        from robust_cvd_tpu.io.flow_constraints_dat import (
            load_flow_constraints_dat,
        )

        ms, cpairs, _ = load_flow_constraints_dat(cache)
        assert ms == pose.MATCH_SEPARATION and len(cpairs) > 0

        # pure garbage (bad magic) must also fall back, not raise
        with open(cache, "wb") as f:
            f.write(b"\x00" * 64)
        pose3 = PoseOptimizer(cfg, store, "depth_tiny")
        assert pose3.pairs
    finally:
        with open(cache, "wb") as f:
            f.write(good)


def test_gt_pose_stream_import(tmp_path):
    """A depth_gt stream with poses.txt is registered before the estimated
    stream and seeds the solver's initial poses
    (reference pose_optimization.py:119-131)."""
    from robust_cvd_tpu.config import PipelineConfig, PoseOptParams
    from robust_cvd_tpu.io import raw
    from robust_cvd_tpu.io.store import VideoStore
    from robust_cvd_tpu.pipeline.pose import PoseOptimizer

    base = str(tmp_path)
    rng = np.random.default_rng(0)
    H, W, N = 24, 32, 3
    save_frames_txt(pjoin(base, "frames.txt"), W, H, [i / 30 for i in range(N)])
    store = VideoStore.open(base)
    store.color_down = rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32)
    depth = np.full((N, H, W), 2.0, np.float32)
    store.save_depth_stream("depth_tiny", depth)
    for i in range(N - 1):
        for (a, b) in ((i, i + 1), (i + 1, i)):
            store.save_flow(a, b, np.zeros((H, W, 2), np.float32))
            store.save_flow_mask(a, b, np.ones((H, W), bool))
    store.save_flow_list(
        [(a, b, 1.0) for i in range(N - 1) for (a, b) in ((i, i + 1), (i + 1, i))]
    )

    gt_dir = pjoin(base, "depth_gt")
    os.makedirs(pjoin(gt_dir, "depth"), exist_ok=True)
    for i in range(N):
        raw.save_raw_float32_image(
            pjoin(gt_dir, "depth", f"frame_{i:06d}.raw"), 1.0 / depth[i]
        )
    with open(pjoin(gt_dir, "poses.txt"), "w") as f:
        f.write(f"{N}\n")
        for i in range(N):
            f.write(f"{0.1 * i} 0 0  0 0 0 1  0.9 0.7\n")

    cfg = PipelineConfig(
        path=base, opt=PoseOptParams(dynamic_constraints="None")
    )
    pose = PoseOptimizer(cfg, store, "depth_tiny")
    assert pose.streams[0].name == "depth_gt"
    assert pose.streams[-1].name == "depth_tiny"
    assert pose.initial_camera is not None
    np.testing.assert_allclose(
        np.asarray(pose.initial_camera.position[:, 0]),
        0.1 * np.arange(N), atol=1e-6,
    )
    assert pose.enabled_frames.all()


def test_ransac_dynamic_constraints_pipeline(tmp_path):
    """`--opt.dynamic_constraints Ransac` must run through the pipeline
    wrapper end-to-end (reference pose_optimization.py:170-175): constraint
    build -> epipolar RANSAC static flags -> pose optimization."""
    from robust_cvd_tpu.config import PipelineConfig, PoseOptParams
    from robust_cvd_tpu.io.store import VideoStore
    from robust_cvd_tpu.pipeline.pose import PoseOptimizer

    base = str(tmp_path)
    rng = np.random.default_rng(3)
    H, W, N = 32, 48, 3
    save_frames_txt(pjoin(base, "frames.txt"), W, H, [i / 30 for i in range(N)])
    store = VideoStore.open(base)
    # textured frames so the corner detector yields plenty of candidates
    store.color_down = rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32)
    depth = np.full((N, H, W), 2.0, np.float32)
    store.save_depth_stream("depth_tiny", depth)
    # pure horizontal translation flow — a valid rigid epipolar geometry
    for i in range(N - 1):
        for (a, b), sgn in (((i, i + 1), 1.0), ((i + 1, i), -1.0)):
            flow = np.zeros((H, W, 2), np.float32)
            flow[..., 0] = 2.0 * sgn
            store.save_flow(a, b, flow)
            store.save_flow_mask(a, b, np.ones((H, W), bool))
    store.save_flow_list(
        [(a, b, 1.0) for i in range(N - 1) for (a, b) in ((i, i + 1), (i + 1, i))]
    )

    cfg = PipelineConfig(
        path=base,
        opt=PoseOptParams(
            dynamic_constraints="Ransac",
            num_steps=1, ctf_long=3, ctf_short=2,
            lm_max_outer=2, lm_cg_iters=4,
        ),
    )
    pose = PoseOptimizer(cfg, store, "depth_tiny")
    # flags were assigned (all-static for a consistent rigid motion, or the
    # degenerate-F fallback; either way the branch executed without error)
    for k in pose.pair_keys:
        assert pose.pairs[k].is_static.dtype == bool
        assert len(pose.pairs[k].is_static) == len(pose.pairs[k].loc0)
    params = pose.optimize_poses()
    assert params is not None


def test_pipeline_rerun_skips_completed_stages(clip_dir):
    """Resume contract (reference process.py stage caching: every stage
    checks its outputs on disk before computing): re-running the pipeline
    on a completed result tree must NOT recompute frames, initial depth,
    flow, masks, or constraints — only the fine-tune/pose stages rerun
    (the reference retrains on every invocation too). Asserted via mtimes."""
    base = clip_dir
    stable = [
        pjoin(base, "color_down", "frame_000000.raw"),
        pjoin(base, "depth_tiny", "depth", "frame_000000.raw"),
        pjoin(base, "flow", "flow_000000_000001.raw"),
        pjoin(base, "flow_mask", "mask_000000_000001.png"),
        pjoin(base, "dynamic_mask", "frame_000000.png"),
        pjoin(base, "flow_constraints.dat"),
    ]
    for p in stable:
        assert os.path.exists(p), f"prior pipeline run missing {p}"
    mtimes = {p: os.path.getmtime(p) for p in stable}

    raft_model = raft.RAFT(iters=2)
    rv = raft_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
    )
    cfg = PipelineConfig(
        path=base,
        size=32,
        align=8,
        model_type="tiny",
        min_mask_ratio=-1.0,
        opt=PoseOptParams(
            num_steps=2, ctf_long=3, ctf_short=2,
            lm_max_outer=4, lm_cg_iters=8,
        ),
        ft=FineTuneParams(num_epochs=1, batch_size=2, pose_opt_freq=5),
    )
    import robust_cvd_tpu.pipeline.process as proc_mod

    old_max, old_align = proc_mod.FLOW_MAX_SIZE, proc_mod.FLOW_ALIGN
    proc_mod.FLOW_MAX_SIZE, proc_mod.FLOW_ALIGN = 64, 8
    try:
        DatasetProcessor(
            cfg,
            models={"depth": TinyDepthAdapter(), "flow": (raft_model, rv)},
        ).process()
    finally:
        proc_mod.FLOW_MAX_SIZE, proc_mod.FLOW_ALIGN = old_max, old_align

    for p in stable:
        assert os.path.getmtime(p) == mtimes[p], f"stage recomputed {p}"
