import jax.numpy as jnp
import numpy as np
import pytest

from robust_cvd_tpu.config import LossParams
from robust_cvd_tpu.ops import geometry
from robust_cvd_tpu.training import losses
from robust_cvd_tpu.training.losses import LossMeta


def make_pair_batch(B=1, H=8, W=12, depth=2.0, translate_x=0.0):
    """A consistent static scene: both frames see a fronto-parallel plane at
    `depth`; camera 1 is translated by translate_x along +X. Flow is the true
    induced flow, so all consistency losses should be ~0."""
    fx = fy = 20.0
    intr = jnp.broadcast_to(
        jnp.asarray([fx, fy, (W - 1) / 2, (H - 1) / 2], jnp.float32), (B, 2, 4)
    )
    ext0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    t1 = jnp.asarray([[translate_x], [0.0], [0.0]])
    ext1 = jnp.concatenate([jnp.eye(3), t1], axis=1)
    ext = jnp.broadcast_to(jnp.stack([ext0, ext1]), (B, 2, 3, 4))

    depths = jnp.full((B, 2, H, W), depth, jnp.float32)

    # Flow induced by translating camera: pixel shift = -fx * tx / Z... sign:
    # camera at +x sees the plane shifted; compute via the geometry module so
    # the test stays convention-agnostic.
    pix = geometry.pixel_grid((H, W))
    pts0 = geometry.pixels_to_points(intr[0, 0], depths[0, 0], pix)
    pts_in_1 = geometry.reproject_points(pts0, ext[0, 0], ext[0, 1])
    pix_in_1 = geometry.project(pts_in_1, intr[0, 1])
    flow01 = pix_in_1 - pix
    flow10 = -flow01  # symmetric for pure translation + constant depth
    flows = jnp.broadcast_to(jnp.stack([flow01, flow10]), (B, 2, H, W, 2))
    masks = jnp.ones((B, 2, H, W), jnp.float32)
    meta = LossMeta(extrinsics=ext, intrinsics=intr, flows=flows, masks=masks)
    return depths, meta


def test_consistency_zero_for_consistent_scene():
    opt = LossParams()
    depths, meta = make_pair_batch(translate_x=0.1)
    loss, parts = losses.consistency_loss(depths, meta, opt)
    assert float(loss) < 1e-3, dict((k, float(v)) for k, v in parts.items())


def test_consistency_positive_for_inconsistent_depth():
    opt = LossParams()
    depths, meta = make_pair_batch(translate_x=0.1)
    bad = depths.at[:, 1].mul(1.5)  # second frame's depth off by 50%
    loss, _ = losses.consistency_loss(bad, meta, opt)
    assert float(loss) > 0.01


def test_scene_flow_static_zero():
    opt = LossParams(lambda_scene_flow_static=1.0)
    depths, meta = make_pair_batch(translate_x=0.05)
    loss, parts = losses.scene_flow_loss(depths, meta, opt)
    # small boundary contribution from border-clamped sampling at image edges
    assert float(loss) < 6e-3
    bad = depths.at[:, 1].mul(1.5)
    loss_bad, _ = losses.scene_flow_loss(bad, meta, opt)
    assert float(loss_bad) > 2 * float(loss)


def test_smooth_scene_flow_cancellation():
    # N=6 layout; static scene, zero camera motion -> fw/bw scene flow are
    # both zero -> smoothness loss 0.
    opt = LossParams(lambda_smooth_reprojection=1.0, lambda_smooth_disparity=1.0)
    B, H, W = 1, 8, 12
    depths, meta = make_pair_batch(B=B, H=H, W=W)
    depths6 = jnp.broadcast_to(depths[:, :1], (B, 6, H, W))
    ext6 = jnp.broadcast_to(meta.extrinsics[:, :1], (B, 6, 3, 4))
    intr6 = jnp.broadcast_to(meta.intrinsics[:, :1], (B, 6, 4))
    meta6 = LossMeta(
        extrinsics=ext6,
        intrinsics=intr6,
        flows=jnp.zeros((B, 2, H, W, 2)),
        masks=jnp.ones((B, 2, H, W)),
        flows_n=jnp.zeros((B, 4, H, W, 2)),
        masks_n=jnp.ones((B, 4, H, W)),
        valid_n=jnp.ones((B, 2)),
    )
    loss, parts = losses.scene_flow_loss(depths6, meta6, opt)
    assert float(loss) < 1e-4


def test_disparity_smooth():
    opt = LossParams(lambda_disparity_smooth=1.0)
    B, N, H, W = 1, 2, 6, 6
    images = jnp.zeros((B, N, H, W, 3))
    flat = jnp.full((B, N, H, W), 2.0)
    loss_flat, _ = losses.disparity_smooth_loss(images, flat, opt)
    assert float(loss_flat) < 1e-7
    bumpy = flat.at[:, :, 3, 3].set(5.0)
    loss_bumpy, _ = losses.disparity_smooth_loss(images, bumpy, opt)
    assert float(loss_bumpy) > float(loss_flat)


def test_contrast_loss_preserves_edges():
    opt = LossParams()
    B, N, H, W = 1, 1, 6, 6
    orig = jnp.ones((B, N, H, W))
    orig = orig.at[..., :, 3:].set(2.0)  # strong vertical edge
    flat_pred = jnp.ones((B, N, H, W))  # edge removed -> penalized
    kept_pred = orig
    l_flat = float(losses.contrast_loss(orig, flat_pred, opt))
    l_kept = float(losses.contrast_loss(orig, kept_pred, opt))
    # The reference objective is (thresh - ratio_pred)^2 at original-edge
    # pixels (loss/contrast_loss.py:56-67): it pulls edge ratios toward the
    # threshold, so a STRONG kept edge (ratio 2.0) costs more than a
    # flattened one (ratio 1.0). We replicate that behavior exactly.
    assert l_flat == pytest.approx(((1.05 - 1.0) ** 2) * 6, rel=1e-3)
    assert l_kept == pytest.approx(((1.05 - 2.0) ** 2) * 6, rel=1e-3)


def test_parameter_loss():
    opt = LossParams(lambda_parameter=2.0)
    p0 = {"w": jnp.ones(3), "b": jnp.zeros(2)}
    p1 = {"w": jnp.ones(3) * 2, "b": jnp.zeros(2)}
    loss = losses.parameter_loss(p1, p0, opt)
    np.testing.assert_allclose(float(loss), 2.0 * 3.0, rtol=1e-6)


def test_barron_special_cases():
    x = jnp.asarray([0.5, -1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(losses.barron_loss(x, 2.0, 1.0)), 0.5 * np.square(np.asarray(x)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(losses.barron_loss(x, 0.0, 1.0)),
        np.log1p(0.5 * np.square(np.asarray(x))),
        rtol=1e-3,  # f32 log1p on accelerator backends
    )
    # smooth_l1 (alpha=1) ~ pseudo-huber: close to 0.5x^2 near 0, ~|x| far
    big = float(losses.barron_loss(jnp.asarray(10.0), 1.0, 1.0))
    assert 8.0 < big < 11.0


def test_joint_loss_defaults():
    opt = LossParams()  # static_depth_ratio=100, static_reproj=1, contrast=1
    depths, meta = make_pair_batch(translate_x=0.1)
    images = jnp.zeros(depths.shape + (3,))
    total, parts = losses.joint_loss(opt, images, depths, depths, meta)
    assert np.isfinite(float(total))
    assert "reproj" in parts and "depth_ratio" in parts
    assert float(total) < 1e-3  # consistent scene, depth_orig == depth
