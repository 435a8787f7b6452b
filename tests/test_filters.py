import jax.numpy as jnp
import numpy as np

from robust_cvd_tpu.ops import filters, geometry
from robust_cvd_tpu.ops.filters import FilterCameras


def make_static_scene(N=5, H=8, W=10, depth_val=2.0, noise=0.0, seed=0):
    """Static cameras at origin looking down -Z at a fronto-parallel plane.
    World points of pixel (x, y) are the unprojected plane points; zero flow
    links identical pixels across frames."""
    rng = np.random.default_rng(seed)
    fx = fy = 12.0
    intr = jnp.broadcast_to(
        jnp.asarray([fx, fy, (W - 1) / 2, (H - 1) / 2]), (N, 4)
    )
    depth = np.full((N, H, W), depth_val, np.float32)
    if noise:
        depth += rng.normal(0, noise, depth.shape).astype(np.float32)
    depth = jnp.asarray(depth)
    pts = geometry.depth_to_points(depth, intr)  # camera == world (identity)
    cams = FilterCameras(
        position=jnp.zeros((N, 3)),
        forward=jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (N, 3)),
        intrinsics=intr,
    )
    flows = jnp.zeros((N, H, W, 2))
    masks = jnp.ones((N, H, W), bool)
    return depth, pts, cams, flows, masks


def test_flow_guided_filter_denoises_static_scene():
    depth, pts, cams, flows, masks = make_static_scene(noise=0.05)
    out = filters.flow_guided_filter(
        depth, pts, cams, flows, masks, flows, masks, frame_radius=2
    )
    assert out.shape == depth.shape
    # temporal averaging reduces noise toward the plane depth
    err_in = float(jnp.abs(depth - 2.0).mean())
    err_out = float(jnp.abs(out - 2.0).mean())
    assert err_out < err_in * 0.8
    # interior values stay near the plane
    assert abs(float(out[2, 4, 5]) - 2.0) < 0.05


def test_flow_guided_filter_identity_on_clean_scene():
    depth, pts, cams, flows, masks = make_static_scene(noise=0.0)
    out = filters.flow_guided_filter(
        depth, pts, cams, flows, masks, flows, masks, frame_radius=2
    )
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-3)


def test_flow_guided_filter_median_mode():
    depth, pts, cams, flows, masks = make_static_scene(noise=0.0)
    out = filters.flow_guided_filter(
        depth, pts, cams, flows, masks, flows, masks, frame_radius=1, median=True
    )
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-3)


def test_flow_guided_filter_respects_masks():
    depth, pts, cams, flows, masks = make_static_scene(N=3)
    # corrupt frame 2's depth drastically; masks block chains into frame 2
    depth = depth.at[2].set(100.0)
    pts2 = geometry.depth_to_points(depth, cams.intrinsics)
    masks_block = masks.at[1].set(False)  # frame 1 cannot advance to frame 2
    out = filters.flow_guided_filter(
        depth, pts2, cams, flows, masks_block, flows, masks, frame_radius=2
    )
    # frame 0/1 output unaffected by frame 2's corruption... frame 1's
    # forward chain is blocked at its first step.
    assert abs(float(out[0, 4, 5]) - 2.0) < 0.1
    assert abs(float(out[1, 4, 5]) - 2.0) < 0.1


def test_bilateral_filter_smooths_but_keeps_edges():
    H, W = 12, 12
    depth = np.ones((1, H, W), np.float32)
    depth[:, :, 6:] = 3.0
    rng = np.random.default_rng(0)
    noisy = depth + rng.normal(0, 0.02, depth.shape).astype(np.float32)
    out = np.asarray(
        filters.bilateral_filter(jnp.asarray(noisy), spatial_radius=2, depth_sigma=0.3)
    )
    # noise reduced on flat areas
    assert np.abs(out[0, 3:9, 1:4] - 1.0).mean() < np.abs(
        noisy[0, 3:9, 1:4] - 1.0
    ).mean()
    # edge preserved: values on either side stay close to their plateau
    assert abs(out[0, 6, 4] - 1.0) < 0.15
    assert abs(out[0, 6, 8] - 3.0) < 0.15


def test_clip_max_depth():
    d = jnp.asarray([1.0, 2000.0])
    np.testing.assert_allclose(
        np.asarray(filters.clip_max_depth(d, 1000.0)), [1.0, 1000.0]
    )


def test_flow_guided_filter_far_connections():
    """Far pairs (outside the +-frame_radius window) contribute one
    single-hop sample with the same depth-ratio weights (reference
    Processor.cpp:414-426, 521-545); numpy oracle on frame 0."""
    N, H, W = 4, 8, 10
    fx = fy = 12.0
    intr = jnp.broadcast_to(
        jnp.asarray([fx, fy, (W - 1) / 2, (H - 1) / 2]), (N, 4)
    )
    depth = np.full((N, H, W), 2.0, np.float32)
    depth[3] = 3.0
    depth = jnp.asarray(depth)
    pts = geometry.depth_to_points(depth, intr)
    cams = FilterCameras(
        position=jnp.zeros((N, 3)),
        forward=jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (N, 3)),
        intrinsics=intr,
    )
    flows = jnp.zeros((N, H, W, 2))
    masks = jnp.ones((N, H, W), bool)

    base = filters.flow_guided_filter(
        depth, pts, cams, flows, masks, flows, masks, frame_radius=1
    )
    # one far pair: frame 0 -> frame 3 (|3-0| > radius 1), zero flow
    far = dict(
        far_flows=jnp.zeros((N, 1, H, W, 2)),
        far_masks=jnp.ones((N, 1, H, W), bool),
        far_tgt=jnp.zeros((N, 1), jnp.int32).at[0, 0].set(3),
        far_valid=jnp.zeros((N, 1), bool).at[0, 0].set(True),
    )
    out = filters.flow_guided_filter(
        depth, pts, cams, flows, masks, flows, masks, frame_radius=1, **far
    )

    # only frame 0 gains a sample
    np.testing.assert_allclose(np.asarray(out[1:]), np.asarray(base[1:]), atol=1e-6)
    assert not np.allclose(np.asarray(out[0]), np.asarray(base[0]))

    # numpy oracle for frame 0: samples {self 2.0, fwd-chain 2.0, far 3.0}
    w_near = np.exp(-3.0 * 1.0)
    w_far = np.exp(-3.0 * (3.0 / 2.0))
    expect = (2.0 * w_near * 2 + 3.0 * w_far) / (w_near * 2 + w_far)
    np.testing.assert_allclose(np.asarray(out[0]), expect, atol=1e-3)

    # a masked far pair contributes nothing
    far["far_masks"] = jnp.zeros((N, 1, H, W), bool)
    out_m = filters.flow_guided_filter(
        depth, pts, cams, flows, masks, flows, masks, frame_radius=1, **far
    )
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(base), atol=1e-6)


def test_processor_far_connections_pipeline(tmp_path):
    """ProcessorParams.far_connections is honored end-to-end through the
    store-backed filter path."""
    import os
    from os.path import join as pjoin

    from robust_cvd_tpu.io.frames import save_frames_txt
    from robust_cvd_tpu.io.store import VideoStore
    from robust_cvd_tpu.pipeline.processor import Processor, ProcessorParams

    base = str(tmp_path)
    N, H, W = 4, 8, 10
    save_frames_txt(pjoin(base, "frames.txt"), W, H, [i / 30 for i in range(N)])
    store = VideoStore.open(base)
    store.color_down = np.zeros((N, H, W, 3), np.float32)
    depth = np.full((N, H, W), 2.0, np.float32)
    depth[3] = 3.0
    store.save_depth_stream("d", depth)
    pairs = [(i, i + 1) for i in range(N - 1)] + [(i + 1, i) for i in range(N - 1)]
    pairs += [(0, 3), (3, 0)]
    for (a, b) in pairs:
        store.save_flow(a, b, np.zeros((H, W, 2), np.float32))
        store.save_flow_mask(a, b, np.ones((H, W), bool))
    store.save_flow_list([(a, b, 1.0) for (a, b) in pairs])

    proc = Processor(store)  # camera falls back to CameraState.default
    p = ProcessorParams(frame_radius=1, far_connections=False)
    base_out = np.asarray(proc.flow_guided_filter_array(jnp.asarray(depth), p))
    p_far = ProcessorParams(frame_radius=1, far_connections=True)
    far_out = np.asarray(proc.flow_guided_filter_array(jnp.asarray(depth), p_far))
    assert not np.allclose(far_out[0], base_out[0])
    np.testing.assert_allclose(far_out[1], base_out[1], atol=1e-6)
