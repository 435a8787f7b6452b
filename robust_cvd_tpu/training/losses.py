"""Test-time fine-tuning losses (pure JAX, channels-last).

Behavioral parity with the reference loss stack (reference loss/*.py):
  - ConsistencyLoss: pairwise static geometry — reprojection (pixel L2),
    disparity difference x focal, log depth-ratio x lambda, each robustified
    and flow-mask weighted (loss/consistency_loss.py:28-239).
  - SceneFlowLoss: static 3D scene-flow norm + temporal smoothness via
    forward+backward scene-flow cancellation (loss/scene_flow_loss.py:31-413).
  - DisparitySmoothLoss: edge-aware spatial smoothness
    (loss/disparity_smooth_loss.py:15-57).
  - ContrastLoss: preserve depth edges where the ORIGINAL depth had ratio >
    threshold (loss/contrast_loss.py:8-79).
  - ParameterLoss: L1 drift from initial network weights
    (loss/parameter_loss.py:8-19).
  - Robust distances: l1 / Barron general loss family
    (loss/distance.py:17-34, loss/general.py).

Everything is a pure function of (depths, metadata) so the whole JointLoss
fuses into the jitted train step. Deviation from the reference: bilinear
sampling uses exact pixel coordinates (align_corners=True semantics); the
reference's `sample` wrapper has a ~0.5 px systematic offset from mixing a
(W-1)-normalized grid with align_corners=False grid_sample
(utils/geometry.py:238-245). We are self-consistent on both sides of every
comparison, so the loss landscape matches up to that sub-pixel shift.

Data layout (batch of pair samples; N = 2, or 6 with temporal smoothness —
order [ref, tgt, ref-1, ref+1, tgt-1, tgt+1], reference
loaders/video_dataset.py:223-256):
  depths        (B, N, H, W)
  images        (B, N, H, W, 3)
  extrinsics    (B, N, 3, 4)
  intrinsics    (B, N, 4)   pixel units (fx, fy, cx, cy)
  warp          (B, N, H, W, 2)  NDC spatial-transform displacement
  flows         (B, 2, H, W, 2)  ref->tgt and tgt->ref, pixels
  masks         (B, 2, H, W)     flow-consistency masks
  flows_n       (B, 4, H, W, 2)  ref->ref-1, ref->ref+1, tgt->tgt-1, tgt->tgt+1
  masks_n       (B, 4, H, W)
  valid_n       (B, 2)           triplet validity at sequence ends
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LossParams
from ..ops import geometry


class LossMeta(NamedTuple):
    extrinsics: jnp.ndarray
    intrinsics: jnp.ndarray
    flows: jnp.ndarray
    masks: jnp.ndarray
    warp: Optional[jnp.ndarray] = None
    flows_n: Optional[jnp.ndarray] = None
    masks_n: Optional[jnp.ndarray] = None
    valid_n: Optional[jnp.ndarray] = None


# ---------------------------------------------------------------------------
# Robust distances (reference loss/distance.py + loss/general.py).
# ---------------------------------------------------------------------------


def barron_loss(x, alpha: float, scale: float, eps: float = 1e-6):
    """Barron's general robust loss rho(x, alpha, c) with static alpha."""
    sq = jnp.square(x / scale)
    if alpha == 2.0:
        return 0.5 * sq
    if alpha == 0.0:
        return jnp.log1p(0.5 * sq)
    if alpha == -jnp.inf:
        return 1.0 - jnp.exp(-0.5 * sq)
    b = abs(alpha - 2.0) + eps
    d = alpha + eps if alpha >= 0 else alpha - eps
    return (b / d) * (jnp.power(sq / b + 1.0, 0.5 * d) - 1.0)


def make_distance(kind: str, opt: LossParams):
    scale = opt.distance_scale
    if kind == "l1":
        return lambda x: jnp.abs(x / scale)
    if kind == "l2":
        return lambda x: barron_loss(x, 2.0, scale)
    if kind == "smooth_l1":
        return lambda x: barron_loss(x, 1.0, scale)
    if kind == "cauchy":
        return lambda x: barron_loss(x, 0.0, scale)
    if kind == "general":
        return lambda x: barron_loss(x, opt.distance_alpha, scale)
    raise ValueError(kind)


def weighted_mean(x, w, eps: float = 1e-6):
    """Per-batch weighted mean (reference utils/loss.py:62-80). x, w: (B, ...)."""
    B = x.shape[0]
    wsum = jnp.maximum(w.reshape(B, -1).sum(axis=1), eps)
    return (x * w).reshape(B, -1).sum(axis=1) / wsum


# Sampling primitive used by the loss stack. `grid_sample`,
# `grid_sample_segsum`, `grid_sample_matmul`, and `grid_sample_mxu` are the
# same function with different lowerings (ops/geometry.py); the choice here
# is a measured decision on the FULL train step (PERF.md), not a
# microbenchmark. History at 224x384 batch 2 on a v5e:
#   - round 3: separable-matmul data-gradient (scatter rewritten as one MXU
#     contraction over 2-hot hat-weight factors): 70.1 vs 88.2 ms/step
#     against XLA's native scatter; segsum (argsort) lost at 233.9.
#   - round 4: the gather FORWARD was the remaining loss-stack cost (13.2 of
#     14.6 ms; TPU per-element gathers run ~0.3 G taps/s). grid_sample_mxu
#     runs the forward as the same separable contraction: 64.1 ->
#     49.5 ms/step. Sampled values carry bf16 rounding (~2e-3 relative,
#     f32-accumulated); the golden-scene quality gate is the acceptance
#     criterion (bench.py, PERF.md round 4).
# On CPU (tests, no MXU, 1 core) the dense contraction is the WORSE trade
# and bf16 dots are unsupported anyway: geometry.grid_sample_auto gates on
# the backend.
_GRID_SAMPLE = geometry.grid_sample_auto


def _sample_chw(data, uv):
    """Sample (H, W, C) maps at pixel coords (H, W, 2), batched over leading
    dims via vmap (border clamped)."""
    return jax.vmap(_GRID_SAMPLE)(data, uv)


def _points_and_pixels(depths, intrinsics, warp):
    """Depths (B, N, H, W) -> camera points (B, N, H, W, 3) and (possibly
    warped) pixel grid (B, N, H, W, 2) (reference consistency_loss.py:213-237)."""
    B, N, H, W = depths.shape
    pixels = geometry.pixel_grid((H, W))
    pixels = jnp.broadcast_to(pixels, (B, N, H, W, 2))
    if warp is not None:
        scale = jnp.asarray([W / 2.0, H / 2.0], depths.dtype)
        pixels = pixels + warp * scale
    points = geometry.pixels_to_points(
        intrinsics[..., None, None, :], depths, pixels
    )
    return points, pixels


# ---------------------------------------------------------------------------
# Consistency loss.
# ---------------------------------------------------------------------------


def consistency_loss(
    depths, meta: LossMeta, opt: LossParams
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    dist = make_distance(opt.distance_type_static, opt)
    points, pixels = _points_and_pixels(depths, meta.intrinsics, meta.warp)

    reproj_losses, disp_losses, ratio_losses = [], [], []
    for k in (0, 1):
        o = 1 - k
        pts_ref = points[:, k]
        pts_tgt_frame = points[:, o]
        pix_ref = pixels[:, k]
        flow = meta.flows[:, k]
        mask = meta.masks[:, k]
        ext_ref = meta.extrinsics[:, k]
        ext_tgt = meta.extrinsics[:, o]
        intr_tgt = meta.intrinsics[:, o]
        intr_ref = meta.intrinsics[:, k]

        pts_in_tgt = geometry.reproject_points(
            pts_ref, ext_ref[:, None, None], ext_tgt[:, None, None]
        )
        matched = pix_ref + flow

        if opt.lambda_static_reprojection > 0:
            pix_tgt = geometry.project(pts_in_tgt, intr_tgt[:, None, None])
            d = jnp.linalg.norm(pix_tgt - matched, axis=-1)
            reproj_losses.append(weighted_mean(dist(d), mask))

        if opt.lambda_static_disparity > 0 or opt.lambda_static_depth_ratio > 0:
            # Only the z channel of the warped target points is ever used
            # below, so sample the (H, W, 1) depth slice instead of the full
            # (H, W, 3) point map — the bilinear gather is the dominant cost
            # of the whole loss stack on TPU (PERF.md round 4: 13.2 of
            # 14.6 ms) and scales linearly in channels.
            warped_tgt_z = _sample_chw(pts_tgt_frame[..., 2:], matched)[..., 0]

        if opt.lambda_static_disparity > 0:
            f = jnp.mean(intr_ref[:, :2], axis=1)
            disp_diff = 1.0 / pts_in_tgt[..., 2] - 1.0 / warped_tgt_z
            disp_losses.append(f * weighted_mean(dist(disp_diff), mask))

        if opt.lambda_static_depth_ratio > 0:
            d_w = jnp.abs(warped_tgt_z)
            d_t = jnp.abs(pts_in_tgt[..., 2])
            ratio = opt.lambda_static_depth_ratio * jnp.log(
                jnp.minimum(d_w, d_t) / jnp.maximum(jnp.maximum(d_w, d_t), 1e-12)
            )
            ratio_losses.append(weighted_mean(dist(ratio), mask))

    batch_losses = {}
    total = 0.0
    if opt.lambda_static_reprojection > 0:
        r = opt.lambda_static_reprojection * jnp.mean(
            jnp.stack(reproj_losses, -1), -1
        )
        batch_losses["reproj"] = r
        total = total + r
    if opt.lambda_static_disparity > 0:
        d = opt.lambda_static_disparity * jnp.mean(jnp.stack(disp_losses, -1), -1)
        batch_losses["disp"] = d
        total = total + d
    if opt.lambda_static_depth_ratio > 0:
        dr = jnp.mean(jnp.stack(ratio_losses, -1), -1)
        batch_losses["depth_ratio"] = dr
        total = total + dr
    return jnp.mean(total), batch_losses


# ---------------------------------------------------------------------------
# Scene-flow loss (static + temporal smoothness).
# ---------------------------------------------------------------------------


def scene_flow_loss(
    depths, meta: LossMeta, opt: LossParams
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    dist_static = make_distance(opt.distance_type_static, opt)
    dist_smooth = make_distance(opt.distance_type_smooth, opt)
    points, pixels = _points_and_pixels(depths, meta.intrinsics, meta.warp)

    def to_world(pts, ext):
        return geometry.points_cam_to_world(pts, ext[:, None, None])

    batch_losses = {}
    total = 0.0

    if opt.lambda_scene_flow_static > 0:
        static_losses = []
        for k in (0, 1):
            o = 1 - k
            world_ref = to_world(points[:, k], meta.extrinsics[:, k])
            matched = pixels[:, k] + meta.flows[:, k]
            pts_trg = _sample_chw(points[:, o], matched)
            world_trg = to_world(pts_trg, meta.extrinsics[:, o])
            sf = world_ref - world_trg
            d = jnp.linalg.norm(sf, axis=-1)
            w = meta.masks[:, k] * jnp.abs(1.0 / points[:, k][..., 2])
            static_losses.append(weighted_mean(dist_static(d), w))
        s = opt.lambda_scene_flow_static * jnp.mean(jnp.stack(static_losses, -1), -1)
        batch_losses["static"] = s
        total = total + s

    use_smooth = (
        opt.lambda_smooth_disparity > 0
        or opt.lambda_smooth_reprojection > 0
        or opt.lambda_smooth_depth_ratio > 0
    )
    if use_smooth:
        reproj_l, disp_l, ratio_l = [], [], []
        for k in (0, 1):
            bw, fw = 2 + 2 * k, 3 + 2 * k  # neighbor slots in N axis
            ext_ref = meta.extrinsics[:, k]
            intr_ref = meta.intrinsics[:, k]
            world_ref = to_world(points[:, k], ext_ref)
            nbw, nfw = 2 * k, 2 * k + 1  # slots in flows_n axis

            matched_bw = pixels[:, k] + meta.flows_n[:, nbw]
            matched_fw = pixels[:, k] + meta.flows_n[:, nfw]
            pts_bw = _sample_chw(points[:, bw], matched_bw)
            pts_fw = _sample_chw(points[:, fw], matched_fw)
            world_bw = to_world(pts_bw, meta.extrinsics[:, bw])
            world_fw = to_world(pts_fw, meta.extrinsics[:, fw])

            residual = (world_fw - world_ref) + (world_bw - world_ref)
            world_s = world_ref + residual
            pts_s = geometry.world_to_points_cam(world_s, ext_ref[:, None, None])

            valid = meta.valid_n[:, k][:, None, None]
            mask = valid * meta.masks_n[:, nbw] * meta.masks_n[:, nfw]

            if opt.lambda_smooth_reprojection > 0:
                pix_s = geometry.project(pts_s, intr_ref[:, None, None])
                d = jnp.linalg.norm(pix_s - pixels[:, k], axis=-1)
                reproj_l.append(weighted_mean(dist_smooth(d), mask))
            if opt.lambda_smooth_disparity > 0:
                f = jnp.mean(intr_ref[:, :2], axis=1)
                dd = 1.0 / pts_s[..., 2] - 1.0 / points[:, k][..., 2]
                disp_l.append(f * weighted_mean(dist_smooth(dd), mask))
            if opt.lambda_smooth_depth_ratio > 0:
                d0 = jnp.abs(points[:, k][..., 2])
                d1 = jnp.abs(pts_s[..., 2])
                ratio = opt.lambda_smooth_depth_ratio * jnp.log(
                    jnp.minimum(d0, d1) / jnp.maximum(jnp.maximum(d0, d1), 1e-12)
                )
                ratio_l.append(weighted_mean(dist_smooth(ratio), mask))

        if opt.lambda_smooth_reprojection > 0:
            r = opt.lambda_smooth_reprojection * jnp.mean(jnp.stack(reproj_l, -1), -1)
            batch_losses["smooth_reproj"] = r
            total = total + r
        if opt.lambda_smooth_disparity > 0:
            d = opt.lambda_smooth_disparity * jnp.mean(jnp.stack(disp_l, -1), -1)
            batch_losses["smooth_disparity"] = d
            total = total + d
        if opt.lambda_smooth_depth_ratio > 0:
            dr = jnp.mean(jnp.stack(ratio_l, -1), -1)
            batch_losses["smooth_depth_ratio"] = dr
            total = total + dr

    return jnp.mean(total) if batch_losses else jnp.asarray(0.0), batch_losses


# ---------------------------------------------------------------------------
# Spatial smoothness + contrast + parameter losses.
# ---------------------------------------------------------------------------


def disparity_smooth_loss(images, depths, opt: LossParams):
    """(reference loss/disparity_smooth_loss.py:15-57).
    images (B, N, H, W, 3); depths (B, N, H, W)."""
    disp = 1.0 / depths
    gdx = jnp.abs(disp[..., :, :-1] - disp[..., :, 1:])
    gdy = jnp.abs(disp[..., :-1, :] - disp[..., 1:, :])
    gix = jnp.mean(jnp.abs(images[..., :, :-1, :] - images[..., :, 1:, :]), -1)
    giy = jnp.mean(jnp.abs(images[..., :-1, :, :] - images[..., 1:, :, :]), -1)
    gdx = gdx * jnp.exp(-gix / opt.sigma_color_grad)
    gdy = gdy * jnp.exp(-giy / opt.sigma_color_grad)
    B = depths.shape[0]
    per_batch = gdx.reshape(B, -1).mean(1) + gdy.reshape(B, -1).mean(1)
    per_batch = per_batch * opt.lambda_disparity_smooth
    return jnp.mean(per_batch), {"disparity_smooth": per_batch}


def contrast_loss(depths_orig, depths, opt: LossParams):
    """(reference loss/contrast_loss.py:8-79). Shapes (B, N, H, W)."""
    B, N, H, W = depths.shape
    x_orig = depths_orig.reshape(-1, H, W)
    x_pred = depths.reshape(-1, H, W)

    def ratios(x):
        eps = 1e-10
        right = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]
        bottom = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
        rh = jnp.maximum(right, x) / (jnp.minimum(right, x) + eps)
        rv = jnp.maximum(bottom, x) / (jnp.minimum(bottom, x) + eps)
        rh = rh.at[:, :, -1].set(0.0)
        rv = rv.at[:, -1, :].set(0.0)
        return rh, rv

    rh_p, rv_p = ratios(x_pred)
    rh_o, rv_o = ratios(x_orig)
    thresh = opt.lambda_contrast_thresh
    edge_h = rh_o > thresh
    edge_v = rv_o > thresh
    lh = jnp.maximum(jnp.square(thresh - rh_p), 0.0) * edge_h
    lv = jnp.maximum(jnp.square(thresh - rv_p), 0.0) * edge_v
    n = x_pred.shape[0]
    loss = lh.sum() / n + lv.sum() / n
    return opt.lambda_contrast_loss * loss


def parameter_loss(params, params_init, opt: LossParams):
    """L1 drift from the initial weights (reference loss/parameter_loss.py)."""
    diffs = jax.tree.map(lambda p, q: jnp.sum(jnp.abs(p - q)), params, params_init)
    total = jax.tree.reduce(lambda a, b: a + b, diffs, jnp.asarray(0.0))
    return opt.lambda_parameter * total


# ---------------------------------------------------------------------------
# Joint loss.
# ---------------------------------------------------------------------------


def joint_loss(
    opt: LossParams,
    images,
    depths_orig,
    depths,
    meta: LossMeta,
    params=None,
    params_init=None,
):
    """Sum of enabled losses (reference loss/joint_loss.py:18-103)."""
    total = jnp.asarray(0.0)
    batch_losses: Dict[str, jnp.ndarray] = {}

    if opt.lambda_parameter > 0:
        p = parameter_loss(params, params_init, opt)
        total = total + p
        batch_losses["parameter_loss"] = p[None]

    if (
        opt.lambda_static_disparity > 0
        or opt.lambda_static_reprojection > 0
        or opt.lambda_static_depth_ratio > 0
    ):
        c, bl = consistency_loss(depths, meta, opt)
        total = total + c
        batch_losses.update(bl)

    if (
        opt.lambda_scene_flow_static > 0
        or opt.lambda_smooth_reprojection > 0
        or opt.lambda_smooth_disparity > 0
        or opt.lambda_smooth_depth_ratio > 0
    ):
        s, bl = scene_flow_loss(depths, meta, opt)
        total = total + s
        batch_losses.update(bl)

    if opt.lambda_disparity_smooth > 0:
        d, bl = disparity_smooth_loss(images, depths, opt)
        total = total + d
        batch_losses.update(bl)

    if opt.lambda_contrast_loss > 0:
        c = contrast_loss(depths_orig, depths, opt)
        total = total + c
        batch_losses["contrast"] = c[None]

    return total, batch_losses
