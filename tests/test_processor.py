import numpy as np
import pytest

from robust_cvd_tpu.io.frames import save_frames_txt
from robust_cvd_tpu.io.store import VideoStore, frame_name, save_png_color
from robust_cvd_tpu.pipeline.processor import Op, Processor, ProcessorParams


@pytest.fixture()
def store(tmp_path):
    import os
    from os.path import join as pjoin

    base = str(tmp_path)
    rng = np.random.default_rng(0)
    H, W = 24, 32
    os.makedirs(pjoin(base, "color_full"))
    save_frames_txt(pjoin(base, "frames.txt"), W, H, [i / 30 for i in range(3)])
    s = VideoStore.open(base)
    s.color_down = rng.uniform(0, 1, (3, H, W, 3)).astype(np.float32)
    depth = np.full((3, H, W), 2.0, np.float32)
    depth += rng.normal(0, 0.05, depth.shape).astype(np.float32)
    s.save_depth_stream("depth_src", depth)
    for i in range(2):
        s.save_flow(i, i + 1, np.zeros((H, W, 2), np.float32))
        s.save_flow(i + 1, i, np.zeros((H, W, 2), np.float32))
        s.save_flow_mask(i, i + 1, np.ones((H, W), bool))
        s.save_flow_mask(i + 1, i, np.ones((H, W), bool))
    s.save_flow_list(
        [(i, j, 1.0) for a in range(2) for (i, j) in ((a, a + 1), (a + 1, a))]
    )
    return s


def _solver_opt():
    from robust_cvd_tpu.config import PoseOptParams

    return PoseOptParams(
        num_steps=2, ctf_long=3, ctf_short=2, lm_max_outer=2, lm_cg_iters=4,
        dynamic_constraints="None",
    )


def test_copy_op(store):
    proc = Processor(store)
    proc.process(ProcessorParams(op=Op.COPY, source_depth_stream="depth_src",
                                 depth_stream="depth_dst"))
    np.testing.assert_allclose(
        store.load_depth_stream("depth_dst"),
        store.load_depth_stream("depth_src"),
        rtol=1e-5,
    )


def test_clip_op(store):
    store.save_depth_stream(
        "depth_big", np.full((3, 24, 32), 2000.0, np.float32)
    )
    proc = Processor(store)
    proc.process(ProcessorParams(op=Op.CLIP_MAX_DEPTH, source_depth_stream="depth_big",
                                 depth_stream="depth_clipped", max_depth=100.0))
    assert store.load_depth_stream("depth_clipped").max() <= 100.0


def test_bilateral_op(store):
    proc = Processor(store)
    proc.process(ProcessorParams(op=Op.BILATERAL_FILTER, source_depth_stream="depth_src",
                                 depth_stream="depth_bf", spatial_radius=2))
    out = store.load_depth_stream("depth_bf")
    src = store.load_depth_stream("depth_src")
    assert np.abs(out - 2.0).mean() < np.abs(src - 2.0).mean()


def test_flow_guided_op(store):
    proc = Processor(store)
    proc.process(
        ProcessorParams(op=Op.FLOW_GUIDED_FILTER, source_depth_stream="depth_src",
                        depth_stream="depth_fgf", frame_radius=2)
    )
    out = store.load_depth_stream("depth_fgf")
    src = store.load_depth_stream("depth_src")
    assert np.abs(out - 2.0).mean() < np.abs(src - 2.0).mean()


def test_compute_tracks_op(store):
    proc = Processor(store)
    tt = proc.process(
        ProcessorParams(op=Op.COMPUTE_TRACKS, track_spawn_distance=6,
                        track_prune_distance=2, min_track_length=2)
    )
    assert tt.tracks


def test_reset_poses_op(store):
    proc = Processor(store)
    proc.process(ProcessorParams(op=Op.RESET_POSES))
    assert store.camera is not None
    np.testing.assert_allclose(np.asarray(store.camera.position), 0.0)


def test_compute_constraints_op(store):
    proc = Processor(store)
    pose = proc.process(
        ProcessorParams(
            op=Op.COMPUTE_CONSTRAINTS, source_depth_stream="depth_src",
            pose_optimizer=_solver_opt(),
        )
    )
    assert len(pose.pair_keys) == 4
    assert all(len(pose.pairs[k].loc0) > 0 for k in pose.pair_keys)


def test_reset_xform_ops(store):
    import jax.numpy as jnp

    proc = Processor(store)
    p = ProcessorParams(op=Op.RESET_DEPTH_XFORMS, source_depth_stream="depth_src",
                        pose_optimizer=_solver_opt())
    sp = proc.process(p)
    assert sp.depth_grid.shape[1:] == (1, 1, 1)
    assert float(jnp.abs(sp.depth_grid - 1.0).max()) == 0.0
    sp = proc.process(ProcessorParams(op=Op.RESET_SPATIAL_XFORMS,
                                      source_depth_stream="depth_src",
                                      pose_optimizer=_solver_opt()))
    assert sp.spatial_grid.shape[1:3] == (1, 1)
    assert float(jnp.abs(sp.spatial_grid).max()) == 0.0


def test_grid_xform_split_op(store):
    proc = Processor(store)
    proc.process(ProcessorParams(op=Op.RESET_DEPTH_XFORMS,
                                 source_depth_stream="depth_src",
                                 pose_optimizer=_solver_opt()))
    sp = proc.process(ProcessorParams(op=Op.GRID_XFORM_SPLIT, grid_size=(3, 2),
                                      source_depth_stream="depth_src",
                                      pose_optimizer=_solver_opt()))
    assert sp.depth_grid.shape[1:] == (1, 2, 3)
    # identity grid splits to identity
    np.testing.assert_allclose(np.asarray(sp.depth_grid), 1.0, rtol=1e-6)


def test_normalize_optimize_ops(store):
    proc = Processor(store)
    opt = _solver_opt()
    p = ProcessorParams(op=Op.NORMALIZE_DEPTH, source_depth_stream="depth_src",
                        pose_optimizer=opt)
    sp = proc.process(p)
    # scale-reg pins median source depth (2.0) to disparity 1 -> scale ~0.5
    assert abs(float(sp.depth_grid[0, 0, 0, 0]) - 0.5) < 0.1
    sp = proc.process(ProcessorParams(op=Op.OPTIMIZE_POSES,
                                      source_depth_stream="depth_src",
                                      pose_optimizer=opt))
    assert np.isfinite(np.asarray(sp.pose)).all()
    assert sp.depth_grid.shape[1:] == (1, 2, 3)  # coarse-to-fine split ran


def test_reset_normalize_optimize_op(store):
    proc = Processor(store)
    sp = proc.process(
        ProcessorParams(op=Op.RESET_NORMALIZE_OPTIMIZE,
                        source_depth_stream="depth_src",
                        pose_optimizer=_solver_opt())
    )
    assert np.isfinite(np.asarray(sp.pose)).all()
    assert store.camera is not None  # ResetPoses ran


def test_unsupported_op_raises(store):
    proc = Processor(store)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        proc.process(ProcessorParams(op=Op.NONE))
