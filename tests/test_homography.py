import numpy as np
import pytest

from robust_cvd_tpu.ops import homography as H


def make_textured(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (h // 8, w // 8, 3))
    img = np.kron(base, np.ones((8, 8, 1)))  # blocky texture with corners
    return img.astype(np.float32)


def test_dlt_exact():
    rng = np.random.default_rng(0)
    H_true = np.array([[1.02, 0.01, 3.0], [-0.02, 0.98, -2.0], [1e-4, -1e-4, 1.0]])
    pts = rng.uniform(10, 100, (8, 2))
    proj = H._apply_h(H_true[None], pts[None])[0]
    H_est = H._dlt(pts, proj)
    np.testing.assert_allclose(H_est / H_est[2, 2], H_true / H_true[2, 2], atol=1e-4)


def test_ransac_rejects_outliers():
    rng = np.random.default_rng(1)
    H_true = np.array([[1.0, 0.0, 5.0], [0.0, 1.0, -3.0], [0.0, 0.0, 1.0]])
    pts = rng.uniform(0, 100, (60, 2))
    proj = H._apply_h(H_true[None], pts[None])[0]
    proj[:15] += rng.uniform(20, 50, (15, 2))  # 25% outliers
    H_est = H.find_homography_ransac(pts, proj, thresh=2.0)
    assert H_est is not None
    np.testing.assert_allclose(H_est / H_est[2, 2], H_true, atol=0.1)


def test_register_pair_translation():
    img1 = make_textured()
    shift = 6
    img2 = np.roll(img1, shift, axis=1)  # frame2 content moved right
    H_BA, reg = H.register_pair(img1, img2)
    # H_BA maps frame2 coords to frame1 coords: x1 = x2 - shift
    est_tx = H_BA[0, 2] / H_BA[2, 2]
    assert est_tx == pytest.approx(-shift, abs=1.0)
    # registered image matches frame1 away from the wrap border
    err = np.abs(reg[:, 16:-16] - img1[:, 16:-16]).mean()
    assert err < 0.05


def test_unwarp_flow_identity():
    flow = np.random.default_rng(2).normal(0, 1, (16, 20, 2)).astype(np.float32)
    out = H.unwarp_flow(flow, np.eye(3))
    np.testing.assert_allclose(out, flow, atol=1e-4)


def test_unwarp_flow_translation():
    # registered-frame flow zero + H_BA translation t means the true flow
    # is the inverse translation everywhere
    flow = np.zeros((12, 16, 2), np.float32)
    H_BA = np.array([[1.0, 0, 2.0], [0, 1.0, -1.0], [0, 0, 1.0]])
    out = H.unwarp_flow(flow, H_BA)
    np.testing.assert_allclose(out[..., 0], -2.0, atol=1e-4)
    np.testing.assert_allclose(out[..., 1], 1.0, atol=1e-4)


def test_dlt4_matches_true_homography():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    H_true = np.array([[1.05, 0.02, 4.0], [-0.01, 0.97, -2.5], [2e-4, -1e-4, 1.0]])
    # well-spread quads (random 4-tuples can be near-collinear, which an
    # exact fit legitimately amplifies — RANSAC scores those at ~0 inliers)
    corners = np.array([[20, 20], [180, 25], [175, 150], [25, 160]], np.float32)
    pts = (corners[None, None] + rng.uniform(-10, 10, (5, 7, 4, 2))).astype(
        np.float32
    )  # batched quads
    proj = H._apply_h(H_true[None, None], pts)
    H_est = np.asarray(H._dlt4(jnp.asarray(pts), jnp.asarray(proj.astype(np.float32))))
    H_est = H_est / H_est[..., 2:3, 2:3]
    np.testing.assert_allclose(
        np.broadcast_to(H_true, H_est.shape), H_est, atol=2e-2
    )


def test_dlt4_degenerate_is_harmless():
    """Collinear/duplicate points must not crash — RANSAC just scores the
    garbage hypothesis at zero inliers."""
    import jax.numpy as jnp

    pts = np.zeros((1, 4, 2), np.float32)  # fully degenerate quad
    out = np.asarray(H._dlt4(jnp.asarray(pts), jnp.asarray(pts)))
    assert out.shape == (1, 3, 3)  # NaN/Inf allowed, shape intact


def test_onehot_patch_extraction_matches_gather():
    """The TPU one-hot-contraction window extraction must reproduce the
    gather path (one-hot selectors are exact; only the image values pass
    through bf16)."""
    import jax.numpy as jnp

    from robust_cvd_tpu.ops.homography import _extract_patches_onehot

    rng = np.random.default_rng(4)
    B, H, W, K, r = 2, 20, 26, 5, 3
    size = 2 * r + 1
    gray = rng.uniform(0, 1, (B, H, W)).astype(np.float32)
    pad = np.pad(gray, ((0, 0), (r, r), (r, r)), mode="edge")
    xi = rng.integers(0, W, (B, K)).astype(np.int32)
    yi = rng.integers(0, H, (B, K)).astype(np.int32)

    got = np.asarray(
        _extract_patches_onehot(jnp.asarray(pad), jnp.asarray(xi),
                                jnp.asarray(yi), size)
    )
    want = np.stack([
        np.stack([
            pad[b, yi[b, k]: yi[b, k] + size,
                xi[b, k]: xi[b, k] + size].reshape(-1)
            for k in range(K)
        ])
        for b in range(B)
    ])
    np.testing.assert_allclose(got, want, atol=6e-3)  # bf16 image rounding
