"""Pipeline stage tests on a tiny synthetic clip (no model checkpoints)."""

import json
import os
from os.path import join as pjoin

import numpy as np
import pytest

from robust_cvd_tpu.io import raw
from robust_cvd_tpu.io.frames import save_frames_txt
from robust_cvd_tpu.io.store import VideoStore, frame_name, save_png_color
from robust_cvd_tpu.pipeline.flow import FlowStage, consistent_flow_masks, resize_flow
from robust_cvd_tpu.pipeline.video import VideoStage, resize_to_target


@pytest.fixture()
def clip_dir(tmp_path):
    """4-frame 64x48 clip of a translating pattern."""
    base = str(tmp_path)
    rng = np.random.default_rng(0)
    H, W = 48, 64
    bg = rng.uniform(0, 1, (H, W + 8, 3)).astype(np.float32)
    full = pjoin(base, "color_full")
    os.makedirs(full)
    for i in range(4):
        save_png_color(pjoin(full, frame_name(i, ".png")), bg[:, i * 2 : i * 2 + W])
    save_frames_txt(pjoin(base, "frames.txt"), W, H, [i / 30 for i in range(4)])
    return base


def test_video_stage_downscale(clip_dir):
    vs = VideoStage(clip_dir)
    meta = vs.extract_frames()
    assert meta.num_frames == 4 and meta.width == 64
    shape = vs.downscale_frames("color_down", 32, ".raw", align=8)
    assert shape == (24, 32)
    img = raw.load_raw_float32_image(
        pjoin(clip_dir, "color_down", frame_name(0, ".raw"))
    )
    assert img.shape == (24, 32, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0
    # idempotent: second call reuses existing outputs
    assert vs.downscale_frames("color_down", 32, ".raw", align=8) == (24, 32)


def test_resize_to_target_alignment():
    img = np.zeros((480, 640, 3), np.float32)
    out = resize_to_target(img, 384, align=32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert max(out.shape[:2]) == 384


def test_resize_to_target_clamps_degenerate_dim():
    # 64x32 input with align 64: round-half-even would emit height 0 (the
    # reference's image_io.py:36-44 rounding crashes cv2 here); we clamp to
    # the smallest aligned size instead.
    img = np.zeros((32, 64, 3), np.float32)
    out = resize_to_target(img, 1024, align=64)
    assert out.shape[:2] == (64, 64)


def test_store_depth_roundtrip(clip_dir):
    store = VideoStore.open(clip_dir)
    depth = np.random.default_rng(1).uniform(0.5, 5.0, (4, 24, 32)).astype(np.float32)
    store.save_depth_stream("depth_test", depth)
    store.depth_streams.clear()
    loaded = store.load_depth_stream("depth_test")
    np.testing.assert_allclose(loaded, depth, rtol=1e-5)
    # on disk: disparity
    disp = raw.load_raw_float32_image(
        pjoin(clip_dir, "depth_test", "depth", frame_name(0, ".raw"))
    )
    np.testing.assert_allclose(disp, 1.0 / depth[0], rtol=1e-5)


def test_flow_masks_and_stats(clip_dir):
    store = VideoStore.open(clip_dir)
    vs = VideoStage(clip_dir)
    vs.downscale_frames("color_down", 32, ".raw", align=8)
    H, W = 24, 32

    # consistent rigid translation flow: frame i -> i+1 shifted by 1 px
    # (the clip was synthesized by shifting a texture by 2 full-res px = 1 down px)
    for (i, j) in [(0, 1), (1, 0)]:
        sign = 1.0 if j > i else -1.0
        flow = np.zeros((H, W, 2), np.float32)
        flow[..., 0] = -sign  # content moves left as the window moves right
        store.save_flow(i, j, flow)

    stage = FlowStage(store)
    stage.compute_flow_masks([(0, 1)])
    m01 = store.load_flow_mask(0, 1)
    # interior pixels should be consistent
    assert m01[4:-4, 4:-4].mean() > 0.6
    entries = stage.compute_flow_pair_stats([(0, 1), (1, 0)])
    assert len(entries) == 2
    data = json.load(open(pjoin(clip_dir, "flow_list.json")))
    assert data[0] == ["frame0", "frame1", "mask_ratio"]
    assert data[1][0] == 0 and data[1][1] == 1


def test_resize_flow_rescales_vectors():
    flow = np.ones((8, 12, 2), np.float32)
    out = resize_flow(flow, (16, 24))
    np.testing.assert_allclose(out, 2.0, atol=1e-5)


def test_consistent_flow_masks_reject_mismatch():
    rng = np.random.default_rng(2)
    H, W = 16, 16
    c0 = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    c1 = np.roll(c0, 2, axis=1)
    good_flow = np.zeros((H, W, 2), np.float32)
    good_flow[..., 0] = 2.0
    back_flow = np.zeros((H, W, 2), np.float32)
    back_flow[..., 0] = -2.0
    m01, m10 = consistent_flow_masks(good_flow, back_flow, c0, c1)
    assert m01[:, 2:-2].mean() > 0.8
    bad_flow = np.full((H, W, 2), 5.0, np.float32)
    b01, _ = consistent_flow_masks(bad_flow, back_flow, c0, c1)
    assert b01.mean() < m01.mean()


def test_visualization_helpers():
    from robust_cvd_tpu.utils import visualization as viz

    depth = np.random.default_rng(0).uniform(1, 5, (12, 16)).astype(np.float32)
    img = viz.visualize_depth(depth)
    assert img.shape == (12, 16, 3) and img.dtype == np.uint8

    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 0] = 1.0
    fimg = viz.flow_to_image(flow)
    assert fimg.shape == (8, 8, 3) and fimg.dtype == np.uint8
    # uniform flow -> uniform color
    assert (fimg == fimg[0, 0]).all()
    # opposite directions get different colors
    f2 = -flow
    assert not (viz.flow_to_image(f2) == fimg).all()

    masked = viz.apply_mask(np.full((4, 4, 3), 200, np.uint8), np.zeros((4, 4)))
    assert masked.max() <= 60


def test_extract_container_pts_fake_av(monkeypatch):
    """Container pts come from the demuxer in decode order and are sorted
    into presentation order (reference video.py:62-84 sorts ffprobe's
    packet pts). PyAV is absent in this environment, so the module surface
    is faked."""
    import sys
    import types

    from robust_cvd_tpu.pipeline.video import extract_container_pts

    class _Pkt:
        def __init__(self, pts):
            self.pts = pts

    class _Container:
        class streams:
            video = [types.SimpleNamespace(time_base=1 / 1000)]

        def demux(self, stream):
            # decode order != presentation order (B-frames), one None pts
            return [_Pkt(0), _Pkt(66), _Pkt(33), _Pkt(None), _Pkt(132)]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_av = types.ModuleType("av")
    fake_av.open = lambda path: _Container()
    fake_av.AVError = OSError
    monkeypatch.setitem(sys.modules, "av", fake_av)

    pts = extract_container_pts("whatever.mp4")
    np.testing.assert_allclose(pts, [0.0, 0.033, 0.066, 0.132])


def test_irregular_pts_roundtrip(tmp_path):
    """Variable-frame-rate pts written to frames.txt are remapped to start
    at zero on load (reference Importer.cpp:197-238) and survive the
    video.dat container round-trip."""
    from robust_cvd_tpu.io.frames import load_frames_txt
    from robust_cvd_tpu.io import video_dat as vd

    base = str(tmp_path)
    irregular = [0.5, 0.533, 0.6, 0.72]  # VFR: uneven spacing, offset start
    save_frames_txt(pjoin(base, "frames.txt"), 32, 24, irregular)
    meta = load_frames_txt(pjoin(base, "frames.txt"))
    np.testing.assert_allclose(meta.pts, [0.0, 0.033, 0.1, 0.22], atol=1e-6)

    container = vd.VideoDat(
        pts=list(meta.pts),
        color_streams=[vd.ColorStreamInfo("full", "color_full", ".png", 21, 32, 24)],
        depth_streams=[],
        duration=meta.pts[-1],
        width=32,
        height=24,
    )
    path = pjoin(base, "video.dat")
    vd.save_video_dat(path, container)
    loaded = vd.load_video_dat(path)
    np.testing.assert_allclose(loaded.pts, meta.pts, atol=1e-6)

    # non-monotonic pts are rejected (Importer.cpp monotonicity rule)
    save_frames_txt(pjoin(base, "frames.txt"), 32, 24, [0.0, 0.2, 0.1])
    with pytest.raises(ValueError):
        load_frames_txt(pjoin(base, "frames.txt"))


def test_non_default_param_echo():
    """Only changed values are echoed (reference PRINT_PARAM_IF_NEQ,
    lib/core/ParamsBase.h:25-28), including nested --opt.* params."""
    from robust_cvd_tpu.config import PipelineConfig, PoseOptParams, non_default_params

    cfg = PipelineConfig(path="/x")
    assert non_default_params(cfg) == []

    cfg = PipelineConfig(path="/x", size=256, opt=PoseOptParams(num_steps=2))
    lines = non_default_params(cfg)
    assert any(l.startswith("size = 256") for l in lines)
    assert any(l.startswith("opt.num_steps = 2") for l in lines)
    assert len(lines) == 2


def test_store_info_lines(clip_dir):
    """Container summary (reference DepthVideo::printInfo,
    lib/DepthVideo.cpp:38-89): dims, frames, and per-stream entries."""
    store = VideoStore.open(clip_dir)
    lines = store.info_lines()
    text = "\n".join(lines)
    assert f"Frame count: {store.num_frames}" in text
    assert "Color streams:" in text and "full" in text
    assert "Depth streams:" in text

def test_consistent_flow_masks_batched_matches_per_pair():
    """The chunked TPU program must agree with the single-pair path
    (same traced function, batched) — and with a from-scratch numpy check
    of the forward-backward criterion on in-range pixels."""
    from robust_cvd_tpu.pipeline.flow import consistent_flow_masks_batched

    rng = np.random.default_rng(5)
    H, W, B = 12, 18, 3
    c0 = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    c1 = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    f01 = rng.uniform(-3, 3, (B, H, W, 2)).astype(np.float32)
    f10 = rng.uniform(-3, 3, (B, H, W, 2)).astype(np.float32)
    b01, b10 = consistent_flow_masks_batched(f01, f10, c0, c1)
    assert b01.shape == (B, H, W) and b01.dtype == bool
    for k in range(B):
        m01, m10 = consistent_flow_masks(f01[k], f10[k], c0[k], c1[k])
        np.testing.assert_array_equal(np.asarray(m01), b01[k])
        np.testing.assert_array_equal(np.asarray(m10), b10[k])


def test_flow_postproc_matches_host_path():
    """The fused device flow post-processing (H^-1 unwarp + resize to
    color_down) must match the host reference path (unwarp_flow +
    resize_flow) it replaced."""
    import jax.numpy as jnp

    from robust_cvd_tpu.ops import homography as hg
    from robust_cvd_tpu.pipeline.flow import _postproc_fn

    rng = np.random.default_rng(11)
    flows = rng.uniform(-3, 3, (2, 16, 24, 2)).astype(np.float32)
    Hs = np.stack([
        np.eye(3, dtype=np.float32),
        np.array([[1.02, 0.01, 0.5], [-0.01, 0.98, -0.3], [1e-4, -1e-4, 1.0]],
                 np.float32),
    ])
    got = np.asarray(
        _postproc_fn()(jnp.asarray(flows), jnp.asarray(Hs), (8, 12), True)
    )
    for k in range(2):
        want = resize_flow(hg.unwarp_flow(flows[k], Hs[k]), (8, 12))
        np.testing.assert_allclose(got[k], want, atol=1e-3)


def test_clip_masks_np_bitpacking_roundtrip():
    """clip_masks_np (device bit-pack + host unpack) equals the plain
    batched mask program, including non-multiple-of-8 widths."""
    import jax.numpy as jnp

    from robust_cvd_tpu.pipeline.flow import (
        clip_masks_np,
        consistent_flow_masks_batched,
    )

    rng = np.random.default_rng(11)
    N, H, W = 4, 20, 27  # W % 8 != 0 exercises the pad path
    colors = jnp.asarray(rng.uniform(0, 1, (N, H, W, 3)), jnp.float32)
    f01 = jnp.asarray(rng.uniform(-2, 2, (2, H, W, 2)), jnp.float32)
    f10 = -f01
    ii = jnp.asarray([0, 2], jnp.int32)
    jj = jnp.asarray([1, 3], jnp.int32)
    m01, m10 = clip_masks_np(colors, f01, f10, ii, jj, 1.0, 1.0)
    r01, r10 = consistent_flow_masks_batched(
        f01, f10, colors[ii], colors[jj], 1.0, 1.0
    )
    np.testing.assert_array_equal(m01, np.asarray(r01))
    np.testing.assert_array_equal(m10, np.asarray(r10))
    assert m01.dtype == bool and m01.shape == (2, H, W)


def test_flow_stage_mesh_matches_single_device(clip_dir, monkeypatch):
    """compute_flow + compute_flow_masks on the 8-device mesh (pair axis
    sharded, the reference's DataParallel flow path,
    optical_flow_homography.py:252) must reproduce the single-device
    stage: same flows (same per-pair programs, only the sharding differs)
    and the same consistency masks up to threshold-boundary pixels."""
    import shutil

    import jax
    import jax.numpy as jnp

    from robust_cvd_tpu.models import raft

    store = VideoStore.open(clip_dir)
    vs = VideoStage(clip_dir)
    vs.downscale_frames("color_down", 32, ".raw", align=8)
    # flow frames at 48x64: the homography detector's 1024-keypoint top-k
    # needs more pixels than the 24x32 down res has
    vs.downscale_frames("color_flow", 64, ".png", align=8)

    model = raft.RAFT(iters=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 48, 64, 3)), jnp.zeros((1, 48, 64, 3))
    )
    pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)]

    def run_stage():
        stage = FlowStage(store, raft_model=model, raft_variables=variables,
                          batch_size=2)
        stage.compute_flow(pairs)
        stage.compute_flow_masks(pairs)
        flows = {p: store.load_flow(*p) for p in pairs}
        masks = {p: store.load_flow_mask(*p) for p in pairs}
        return flows, masks

    def clear_outputs():
        for d in ("flow", "flow_mask"):
            shutil.rmtree(pjoin(clip_dir, d), ignore_errors=True)

    clear_outputs()
    real_devices = jax.devices()
    with monkeypatch.context() as m:
        m.setattr(jax, "devices", lambda backend=None: real_devices[:1])
        flows_1d, masks_1d = run_stage()

    clear_outputs()
    flows_dp, masks_dp = run_stage()

    for p in pairs:
        # bf16 through the recurrent GRU at a different batch tiling gives
        # ~0.02 px of noise; sharding bugs (wrong pair routing, pad rows
        # leaking) show up as whole-pixel errors
        np.testing.assert_allclose(
            flows_dp[p], flows_1d[p], atol=0.05,
            err_msg=f"flow mismatch for pair {p}",
        )
        # masks are thresholded booleans; allow boundary-pixel flips
        assert np.mean(masks_dp[p] != masks_1d[p]) < 0.02, (
            f"mask mismatch for pair {p}"
        )


def test_config_flag_semantics():
    """No flag parses and silently does nothing (round-4 VERDICT #5)."""
    import pytest

    from robust_cvd_tpu.config import parse_config
    from robust_cvd_tpu.solver.pose_opt import _lm_config

    # hd_depth parses in the reference but has no code path; reject loudly
    with pytest.raises(SystemExit):
        parse_config(["--recon", "hd_depth"])
    with pytest.raises(SystemExit):
        parse_config(["--scaling", "bogus"])
    cfg = parse_config(["--recon", "colmap", "--scaling", "extrinsics"])
    assert cfg.recon == "colmap" and cfg.scaling == "extrinsics"

    # --opt.max_iterations maps onto the LM outer-iteration cap
    cfg = parse_config(["--opt.max_iterations", "3"])
    assert _lm_config(cfg.opt).max_outer == 3
    cfg = parse_config([])
    assert _lm_config(cfg.opt).max_outer == cfg.opt.lm_max_outer

    # --opt.num_threads warns (captured) instead of silently parsing
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        parse_config(["--opt.num_threads", "4"])
    assert "num_threads" in buf.getvalue()


def test_stale_resolution_flow_recomputed(clip_dir):
    """A flow file at the wrong resolution (clip reprocessed with a new
    --size) must not satisfy flow-stage idempotency — trusting it crashes
    the mask stage downstream with an opaque concat error."""
    vs = VideoStage(clip_dir)
    vs.extract_frames()
    vs.downscale_frames("color_down", 32, ".raw", align=8)
    store = VideoStore.open(clip_dir)
    os.makedirs(pjoin(clip_dir, "flow"), exist_ok=True)
    # right resolution for (0, 1); stale (full-res) for (1, 0)
    dh, dw = store.load_color_down().shape[1:3]
    raw.save_raw_float32_image(
        pjoin(clip_dir, "flow", "flow_000000_000001.raw"),
        np.zeros((dh, dw, 2), np.float32),
    )
    raw.save_raw_float32_image(
        pjoin(clip_dir, "flow", "flow_000001_000000.raw"),
        np.zeros((48, 64, 2), np.float32),
    )
    stage = FlowStage(store, raft_model=None)
    # the stale pair is treated as missing -> RAFT required
    with pytest.raises(RuntimeError, match="RAFT model required"):
        stage.compute_flow([(0, 1), (1, 0)])
    # with only good files, idempotency holds and no model is needed
    stage.compute_flow([(0, 1)])
