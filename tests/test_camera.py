import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_cvd_tpu import camera
from robust_cvd_tpu.ops import geometry


def random_quat(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    if q[3] < 0:
        q = -q
    return jnp.asarray(q, jnp.float32)


@pytest.mark.parametrize("seed", range(5))
def test_quat_matrix_roundtrip(seed):
    q = random_quat(np.random.default_rng(seed))
    m = camera.quat_to_matrix(q)
    np.testing.assert_allclose(np.linalg.det(np.asarray(m)), 1.0, atol=1e-5)
    q2 = camera.matrix_to_quat(m)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


@pytest.mark.parametrize("seed", range(5))
def test_axis_angle_roundtrip(seed):
    rng = np.random.default_rng(seed)
    aa = jnp.asarray(rng.standard_normal(3) * 0.7, jnp.float32)
    m = camera.axis_angle_to_matrix(aa)
    aa2 = camera.matrix_to_axis_angle(m)
    np.testing.assert_allclose(np.asarray(aa2), np.asarray(aa), atol=2e-4)


def test_axis_angle_zero_safe():
    aa = jnp.zeros(3)
    m = camera.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-7)
    # gradient must be finite at zero
    g = jax.grad(lambda a: camera.rotate_point_axis_angle(a, jnp.ones(3)).sum())(aa)
    assert np.all(np.isfinite(np.asarray(g)))


def test_rotate_point_matches_matrix():
    rng = np.random.default_rng(0)
    aa = jnp.asarray(rng.standard_normal(3), jnp.float32)
    p = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    want = np.asarray(p) @ np.asarray(camera.axis_angle_to_matrix(aa)).T
    got = camera.rotate_point_axis_angle(aa, p)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_pose_param_roundtrip():
    cam = camera.CameraState.default(3, aspect=16 / 9)
    pose, focal = camera.camera_to_pose_params(cam)
    assert pose.shape == (3, 6)
    cam2 = camera.pose_params_to_camera(pose, focal, 16 / 9)
    np.testing.assert_allclose(np.asarray(cam2.vfov), np.asarray(cam.vfov), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cam2.quaternion), np.asarray(cam.quaternion), atol=1e-6
    )


def test_projection_roundtrip():
    H, W = 12, 16
    intr = geometry.intrinsics_px(jnp.array(0.8), jnp.array(1.0), (H, W))
    pix = geometry.pixel_grid((H, W))
    depth = jnp.full((H, W), 2.5)
    pts = geometry.pixels_to_points(intr, depth, pix)
    # camera faces -Z
    assert np.all(np.asarray(pts[..., 2]) < 0)
    back = geometry.project(pts, intr)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pix), atol=1e-4)


def test_reproject_identity():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
    ext = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    out = geometry.reproject_points(pts, ext, ext)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)


def test_reproject_translation():
    pts = jnp.array([[0.0, 0.0, -2.0]])
    ext_ref = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    t = jnp.array([[1.0], [0.0], [0.0]])
    ext_tgt = jnp.concatenate([jnp.eye(3), t], axis=1)
    out = geometry.reproject_points(pts, ext_ref, ext_tgt)
    np.testing.assert_allclose(np.asarray(out), [[-1.0, 0.0, -2.0]], atol=1e-6)


def test_grid_sample_border_and_identity():
    rng = np.random.default_rng(2)
    data = jnp.asarray(rng.standard_normal((6, 8, 3)), jnp.float32)
    pix = geometry.pixel_grid((6, 8))
    out = geometry.grid_sample(data, pix)
    np.testing.assert_allclose(np.asarray(out), np.asarray(data), atol=1e-6)
    # out-of-bounds clamps to border
    far = jnp.array([[-5.0, -5.0], [100.0, 100.0]])
    out2 = geometry.grid_sample(data, far)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(data[0, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out2[1]), np.asarray(data[-1, -1]), atol=1e-6)


def test_world_to_camera_matrix():
    cam = camera.CameraState.default(1, aspect=1.0)
    M = camera.world_to_camera_matrix(cam.position[0], cam.quaternion[0])
    np.testing.assert_allclose(np.asarray(M), np.eye(4), atol=1e-6)


def test_equirect_roundtrip():
    """project∘unproject == identity for the equirect crop; center pixel
    looks down the forward axis (reference DepthPhoto.h:62-92 semantics)."""
    H, W = 20, 32
    vfov, hfov = 0.9, 1.4
    pix = geometry.pixel_grid((H, W))
    rng = np.random.default_rng(3)
    dist = jnp.asarray(rng.uniform(1.0, 5.0, (H, W)), jnp.float32)
    pts = geometry.pixels_to_points_equirect(
        pix, dist, (H, W), vfov, hfov, center_lat=0.1, center_lon=-0.2
    )
    # radial distance preserved
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pts), axis=-1), np.asarray(dist), rtol=1e-5
    )
    back = geometry.project_equirect(
        pts, (H, W), vfov, hfov, center_lat=0.1, center_lon=-0.2
    )
    np.testing.assert_allclose(np.asarray(back), np.asarray(pix), atol=1e-3)
    # center pixel with centered crop -> forward (-z) ray
    ctr = geometry.pixels_to_points_equirect(
        jnp.array([(W - 1) / 2.0, (H - 1) / 2.0]), jnp.array(2.0),
        (H, W), vfov, hfov,
    )
    np.testing.assert_allclose(np.asarray(ctr), [0.0, 0.0, -2.0], atol=1e-6)


def test_cylindrical_roundtrip():
    H, W = 18, 40
    vfov, hfov = 0.8, 2.5
    pix = geometry.pixel_grid((H, W))
    rng = np.random.default_rng(4)
    dist = jnp.asarray(rng.uniform(1.0, 5.0, (H, W)), jnp.float32)
    pts = geometry.pixels_to_points_cylindrical(
        pix, dist, (H, W), vfov, hfov, center_lat=0.05, center_lon=0.3
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pts), axis=-1), np.asarray(dist), rtol=1e-5
    )
    back = geometry.project_cylindrical(
        pts, (H, W), vfov, hfov, center_lat=0.05, center_lon=0.3
    )
    np.testing.assert_allclose(np.asarray(back), np.asarray(pix), atol=1e-3)


def test_projection_dispatch_matches_perspective():
    """Code 0 (Perspective, the wire-format default io/video_dat.py:156)
    routes to the planar-depth path."""
    H, W = 12, 16
    vfov, hfov = 0.7, 0.9
    pix = geometry.pixel_grid((H, W))
    depth = jnp.full((H, W), 3.0)
    pts = geometry.pixels_to_points_proj(
        geometry.PROJECTION_PERSPECTIVE, pix, depth, (H, W), vfov, hfov
    )
    ref = geometry.pixels_to_points(
        geometry.intrinsics_px(jnp.asarray(vfov), jnp.asarray(hfov), (H, W)),
        depth, pix,
    )
    np.testing.assert_allclose(np.asarray(pts), np.asarray(ref), atol=1e-6)
    back = geometry.project_proj(
        geometry.PROJECTION_EQUIRECTANGULAR,
        geometry.pixels_to_points_proj(
            geometry.PROJECTION_EQUIRECTANGULAR, pix, depth, (H, W), vfov, hfov
        ),
        (H, W), vfov, hfov,
    )
    np.testing.assert_allclose(np.asarray(back), np.asarray(pix), atol=1e-3)


def test_grid_sample_custom_vjp_backwards_match_autodiff():
    """The segsum and matmul data-gradient lowerings must match autodiff's
    scatter-add backward: segsum exactly (same f32 taps, reordered sum),
    matmul to bf16 rounding of the two separable hat-weight factors."""
    rng = np.random.default_rng(7)
    H, W, C = 13, 17, 3
    data = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    uv = jnp.asarray(
        np.stack(
            [
                rng.uniform(-2.0, W + 1.0, (50,)),  # includes out-of-range
                rng.uniform(-2.0, H + 1.0, (50,)),
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    # exact integer coords exercise the degenerate single-tap case
    uv = jnp.concatenate([uv, jnp.array([[3.0, 4.0], [0.0, 0.0]])])
    ct = jnp.asarray(rng.standard_normal((uv.shape[0], C)), jnp.float32)

    def g_ref(d):
        return jnp.vdot(geometry.grid_sample(d, uv), ct)

    want = jax.grad(g_ref)(data)
    for fn, tol in (
        (geometry.grid_sample_segsum, 1e-6),
        (geometry.grid_sample_matmul, 2e-2),
    ):
        out = fn(data, uv)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(geometry.grid_sample(data, uv)), atol=1e-6
        )
        got = jax.grad(lambda d: jnp.vdot(fn(d, uv), ct))(data)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=tol)


def test_grid_sample_mxu_matches_gather():
    """grid_sample_mxu (both directions as separable MXU contractions) must
    reproduce the gather forward and the autodiff backward. On CPU the
    contraction runs in f32, so the forward is exact up to contraction
    reassociation (~1e-5); on TPU the bf16 operands add ~2e-3 relative
    rounding (accepted at the loss level via the bench quality gate)."""
    rng = np.random.default_rng(11)
    H, W, C = 13, 17, 2
    data = jnp.asarray(rng.uniform(0.5, 5.0, (H, W, C)), jnp.float32)
    uv = jnp.asarray(
        np.stack(
            [
                rng.uniform(-2.0, W + 1.0, (7, 9)),
                rng.uniform(-2.0, H + 1.0, (7, 9)),
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    want = geometry.grid_sample(data, uv)
    got = geometry.grid_sample_mxu(data, uv)
    assert got.shape == want.shape == (7, 9, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    ct = jnp.asarray(rng.standard_normal((7, 9, C)), jnp.float32)
    want_g = jax.grad(lambda d: jnp.vdot(geometry.grid_sample(d, uv), ct))(data)
    got_g = jax.grad(lambda d: jnp.vdot(geometry.grid_sample_mxu(d, uv), ct))(data)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g), atol=1e-4)

    # uv-gradient delegates to the gather autodiff: exact match
    want_u = jax.grad(
        lambda u: jnp.vdot(geometry.grid_sample(data, u), ct))(uv)
    got_u = jax.grad(
        lambda u: jnp.vdot(geometry.grid_sample_mxu(data, u), ct))(uv)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u), atol=1e-5)
