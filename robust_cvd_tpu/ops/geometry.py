"""Differentiable projection geometry (pure JAX).

Behavioral parity with reference utils/geometry.py (torch) under the same
conventions: pixel (x, y) with top-left origin; camera looks down -Z; the v
axis is flipped between pixels and camera space; principal point = intrinsics
(cx, cy); intrinsics are (fx, fy, cx, cy) in pixels.

Layout note: the reference uses channels-first (B, C, H, W); we use
channels-LAST (..., H, W, C) throughout — the natural layout for TPU convs
and vectorized math. All functions broadcast over arbitrary leading batch
dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def pixel_grid(shape) -> jnp.ndarray:
    """(H, W, 2) grid of pixel centers (x, y), x in [0, W-1], y in [0, H-1]."""
    H, W = shape
    x = jnp.arange(W, dtype=jnp.float32)
    y = jnp.arange(H, dtype=jnp.float32)
    X, Y = jnp.meshgrid(x, y)
    return jnp.stack([X, Y], axis=-1)


def pixels_to_rays(pixels: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) + intrinsics (..., 4) -> rays (..., 3) with z = -1.

    Matches reference utils/geometry.py:38-61: u = (x - cx)/fx, v = -(y - cy)/fy.
    """
    f = intrinsics[..., 0:2]
    c = intrinsics[..., 2:4]
    uv = (pixels - c) / f
    u = uv[..., 0]
    v = -uv[..., 1]
    return jnp.stack([u, v, -jnp.ones_like(u)], axis=-1)


def project(points: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Camera-space points (..., 3) -> pixels (..., 2).

    Matches reference utils/geometry.py:64-83.
    """
    rays = points[..., :2] / -points[..., 2:3]
    f = intrinsics[..., 0:2]
    c = intrinsics[..., 2:4]
    uv = rays * f
    return jnp.stack([uv[..., 0] + c[..., 0], -uv[..., 1] + c[..., 1]], axis=-1)


def pixels_to_points(
    intrinsics: jnp.ndarray, depths: jnp.ndarray, pixels: jnp.ndarray
) -> jnp.ndarray:
    """Pixels (..., 2) + depth (...,) -> camera-space points (..., 3)."""
    rays = pixels_to_rays(pixels, intrinsics)
    return rays * depths[..., None]


def points_cam_to_world(points: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Camera points (..., 3) with extrinsics (..., 3, 4) [R|t] -> world."""
    R = extrinsics[..., :3]
    t = extrinsics[..., 3]
    return jnp.einsum("...ij,...j->...i", R, points, precision=_HI) + t


def world_to_points_cam(points: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    """World points (..., 3) with extrinsics (..., 3, 4) [R|t] -> camera."""
    R = extrinsics[..., :3]
    t = extrinsics[..., 3]
    return jnp.einsum("...ji,...j->...i", R, points - t, precision=_HI)


def reproject_points(
    points_cam_ref: jnp.ndarray,
    extrinsics_ref: jnp.ndarray,
    extrinsics_tgt: jnp.ndarray,
) -> jnp.ndarray:
    """Reference-camera points -> target-camera points (both (..., 3, 4))."""
    world = points_cam_to_world(points_cam_ref, extrinsics_ref)
    return world_to_points_cam(world, extrinsics_tgt)


def depth_to_points(depths: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Depth maps (..., H, W) + intrinsics (..., 4) -> points (..., H, W, 3)."""
    H, W = depths.shape[-2:]
    pixels = pixel_grid((H, W))
    return pixels_to_points(intrinsics[..., None, None, :], depths, pixels)


def grid_sample(data: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample `data` (H, W, C) at pixel coords `uv` (..., 2).

    Border padding: coordinates are clamped to the valid rectangle, matching
    torch.nn.functional.grid_sample(..., padding_mode='border',
    align_corners=True semantics through the reference's `sample` wrapper
    (utils/geometry.py:238-245) which maps pixel coords to [-1, 1] by
    dividing by (W-1, H-1).
    """
    H, W, _ = data.shape
    x = jnp.clip(uv[..., 0], 0.0, W - 1.0)
    y = jnp.clip(uv[..., 1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    rx = (x - x0)[..., None]
    ry = (y - y0)[..., None]
    # NOTE: 2D advanced indexing deliberately. A flattened linear-index
    # jnp.take formulation wins a standalone microbenchmark of the sampling
    # gradient (~30%) but LOSES ~16% on the full fused train step — the
    # composed program fuses the 2D gather with its surrounding elementwise
    # ops better. Trust the end-to-end bench, not the microbenchmark.
    g00 = data[y0, x0]
    g01 = data[y0, x0 + 1]
    g10 = data[y0 + 1, x0]
    g11 = data[y0 + 1, x0 + 1]
    top = g00 * (1 - rx) + g01 * rx
    bot = g10 * (1 - rx) + g11 * rx
    return top * (1 - ry) + bot * ry


@jax.custom_vjp
def grid_sample_segsum(data: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """`grid_sample` with a sorted segment-sum data-gradient.

    Forward is identical to `grid_sample`. The backward w.r.t. `data` is a
    scatter-add of 4 bilinear taps per sample; this VJP instead sorts the
    4n flat indices and reduces with `segment_sum(indices_are_sorted=True)`.
    The uv-gradient is delegated to autodiff of the gather-only forward
    (no scatter there), keeping it bit-identical to `grid_sample`'s.

    MEASURED AND REJECTED as the training default (PERF.md): on the full
    fine-tune step at 224x384 the sort costs more than XLA's scatter
    (233.9 vs 170.7 ms/step single-dispatch) — kept for workloads with
    few samples into large maps, where the scatter is the worse trade.
    """
    return grid_sample(data, uv)


def _gs_segsum_fwd(data, uv):
    return grid_sample(data, uv), (data, uv)


def _gs_segsum_bwd(res, ct):
    data, uv = res
    H, W, C = data.shape
    _, pull = jax.vjp(lambda u: grid_sample(data, u), uv)
    (d_uv,) = pull(ct)

    x = jnp.clip(uv[..., 0], 0.0, W - 1.0)
    y = jnp.clip(uv[..., 1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    rx = (x - x0).reshape(-1)[:, None]
    ry = (y - y0).reshape(-1)[:, None]
    base = (y0 * W + x0).reshape(-1)
    ctf = ct.reshape(-1, C)
    idx = jnp.concatenate([base, base + 1, base + W, base + W + 1])
    vals = jnp.concatenate([
        ctf * (1 - rx) * (1 - ry),
        ctf * rx * (1 - ry),
        ctf * (1 - rx) * ry,
        ctf * rx * ry,
    ])
    order = jnp.argsort(idx)
    d_flat = jax.ops.segment_sum(
        vals[order], idx[order], num_segments=H * W, indices_are_sorted=True
    )
    return d_flat.reshape(H, W, C).astype(data.dtype), d_uv


grid_sample_segsum.defvjp(_gs_segsum_fwd, _gs_segsum_bwd)


@jax.custom_vjp
def grid_sample_matmul(data: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """`grid_sample` with an MXU-matmul data-gradient (no scatter, no sort).

    Forward is identical to `grid_sample`. The backward w.r.t. `data`
    exploits the separability of the bilinear kernel: each sample's 4-tap
    scatter footprint is the outer product of a 2-hot row-weight vector
    R_i ∈ R^H (hat function `max(0, 1-|h-y_i|)` on the clamped y) and a
    2-hot column-weight vector C_i ∈ R^W, so

        dM[h, w, c] = sum_i R[i, h] * C[i, w] * ct[i, c]
                    = einsum('ih,iwc->hwc', R, C[:, :, None] * ct[:, None, :])

    — one dot_general on the MXU in bf16 with f32 accumulation, instead of
    a 4n-tap scatter-add. Same trick as the separable Mask R-CNN paste
    (models/mask_rcnn.py, PERF.md). The hat weights reproduce the forward's
    tap placement exactly (clamp to [0, W-1], floor clipped to W-2): the
    only deviation from autodiff is bf16 rounding of the two weight
    factors (~0.4% relative per tap, f32 accumulated).

    The uv-gradient is delegated to autodiff of the gather-only forward;
    in the loss stack uv = pixel_grid + flow carries no parameter
    dependence, so XLA dead-code-eliminates that branch entirely.
    """
    return grid_sample(data, uv)


def _gs_matmul_fwd(data, uv):
    return grid_sample(data, uv), (data, uv)


def _gs_matmul_bwd(res, ct):
    data, uv = res
    H, W, C = data.shape
    _, pull = jax.vjp(lambda u: grid_sample(data, u), uv)
    (d_uv,) = pull(ct)

    x = jnp.clip(uv[..., 0], 0.0, W - 1.0).reshape(-1)
    y = jnp.clip(uv[..., 1], 0.0, H - 1.0).reshape(-1)
    hs = jnp.arange(H, dtype=y.dtype)
    ws = jnp.arange(W, dtype=x.dtype)
    R = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - hs[None, :]))
    Cw = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - ws[None, :]))
    ctf = ct.reshape(-1, C)
    Z = Cw[:, :, None] * ctf[:, None, :]
    # bf16 operands on the MXU (f32 accumulate); CPU's dot thunk can't do
    # mixed bf16->f32, so tests fall back to a plain f32 contraction there.
    mm = jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") else jnp.float32
    dM = jnp.einsum(
        "ih,iwc->hwc",
        R.astype(mm),
        Z.astype(mm),
        preferred_element_type=jnp.float32,
    )
    return dM.astype(data.dtype), d_uv


grid_sample_matmul.defvjp(_gs_matmul_fwd, _gs_matmul_bwd)


def _hat_weights(uv, H, W, dtype):
    """2-hot bilinear hat-weight factors R (n, H), Cw (n, W) for flattened
    sample coords; exactly the forward's tap placement (clamp + border)."""
    x = jnp.clip(uv[..., 0], 0.0, W - 1.0).reshape(-1)
    y = jnp.clip(uv[..., 1], 0.0, H - 1.0).reshape(-1)
    hs = jnp.arange(H, dtype=y.dtype)
    ws = jnp.arange(W, dtype=x.dtype)
    R = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - hs[None, :]))
    Cw = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - ws[None, :]))
    return R.astype(dtype), Cw.astype(dtype)


def _mm_dtype():
    # bf16 operands on the MXU (f32 accumulate); CPU's dot thunk can't do
    # mixed bf16->f32, so tests fall back to a plain f32 contraction there.
    return jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") else jnp.float32


@jax.custom_vjp
def grid_sample_mxu(data: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """`grid_sample` with BOTH directions as separable MXU contractions.

    TPU gathers with per-element indices run at well under 1 G taps/s (the
    measured 4-map loss-stack gather at 224x384 is 13.2 ms — PERF.md round
    4); the bilinear kernel's separability turns the gather into two dense
    contractions instead:

        out[i, c] = sum_{h,w} R[i, h] * Cw[i, w] * M[h, w, c]
                  = einsum('iw,(ih,hwc->iwc)->ic')

    at H x redundant FLOPs — the standard MXU trade (same as the separable
    Mask R-CNN paste and the matmul scatter-VJP). Operands are bf16 with
    f32 accumulation ON TPU: sampled values carry ~2^-8 relative rounding,
    so use this where bf16 data precision is acceptable (the training loss
    stack; NOT byte-exact mask pastes). The data-gradient is the same
    einsum transposed (`grid_sample_matmul`'s backward); the uv-gradient
    delegates to autodiff of the gather forward (DCE'd when uv carries no
    parameter dependence, as in the loss where uv = grid + flow).
    """
    H, W, C = data.shape
    mm = _mm_dtype()
    R, Cw = _hat_weights(uv, H, W, mm)
    T = jnp.einsum(
        "ih,hwc->iwc", R, data.astype(mm), preferred_element_type=jnp.float32
    )
    out = jnp.einsum(
        "iw,iwc->ic", Cw.astype(jnp.float32), T, preferred_element_type=jnp.float32
    )
    return out.reshape(uv.shape[:-1] + (C,)).astype(data.dtype)


def _gs_mxu_fwd(data, uv):
    return grid_sample_mxu(data, uv), (data, uv)


def _gs_mxu_bwd(res, ct):
    return _gs_matmul_bwd(res, ct)


grid_sample_mxu.defvjp(_gs_mxu_fwd, _gs_mxu_bwd)


def grid_sample_auto(data: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Backend-gated sampling: the separable MXU contraction on TPU (where
    per-element gathers run ~0.3 G taps/s and the contraction wins by >4x —
    PERF.md round 4), the exact gather forward + matmul backward on CPU
    (1 core, no MXU, and the bf16 dot is unsupported). Sampled values carry
    ~2^-8 relative rounding on TPU — use where bf16 data precision is
    acceptable (loss stacks, image pre-warps feeding bf16 networks), not
    for byte-exact outputs."""
    if jax.default_backend() in ("tpu", "axon"):
        return grid_sample_mxu(data, uv)
    return grid_sample_matmul(data, uv)


def warping_field(
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    depths: jnp.ndarray,
    extrinsics_tgt: jnp.ndarray,
    intrinsics_tgt: jnp.ndarray,
) -> jnp.ndarray:
    """Pixel coords in the target frame for every reference pixel.

    depths (..., H, W); extrinsics (..., 3, 4); intrinsics (..., 4).
    Returns (..., H, W, 2). Sampling the target frame at these coordinates
    reconstructs the reference frame (reference utils/geometry.py:214-235).
    """
    points_cam = depth_to_points(depths, intrinsics)
    points_tgt = reproject_points(
        points_cam,
        extrinsics[..., None, None, :, :],
        extrinsics_tgt[..., None, None, :, :],
    )
    return project(points_tgt, intrinsics_tgt[..., None, None, :])


def intrinsics_px(vfov: jnp.ndarray, hfov: jnp.ndarray, shape) -> jnp.ndarray:
    """FOV angles -> pixel-unit (fx, fy, cx, cy), principal point at center.

    Matches the conversion used when pulling intrinsics into the fine-tuning
    loop (reference loaders/video_dataset.py update_poses).
    """
    H, W = shape
    fx = W / 2.0 / jnp.tan(hfov / 2.0)
    fy = H / 2.0 / jnp.tan(vfov / 2.0)
    cx = jnp.full_like(fx, (W - 1) / 2.0)
    cy = jnp.full_like(fy, (H - 1) / 2.0)
    return jnp.stack([fx, fy, cx, cy], axis=-1)


# ---------------------------------------------------------------------------
# Non-perspective projections.
#
# The reference's DepthPhoto carries Equirectangular and Cylindrical in its
# Intrinsics enum and documents the lat-lon crop semantics
# (lib/DepthPhoto.h:62-92: angular extents from vFov/hFov, centered at
# centerLat/centerLon) but only ever builds the Perspective matrix
# (lib/DepthPhoto.cpp:167). These are the corresponding compute paths.
#
# Conventions (shared with the perspective path): camera looks down -z, +y
# up, +x right; longitude is positive toward +x, latitude positive toward
# +y; lon = lat = 0 is the forward axis. Depth for these projections is the
# RADIAL distance along the viewing ray (for perspective it is the planar
# -z), the natural choice for panoramic geometry.
# ---------------------------------------------------------------------------


def _latlon_to_dir(lon: jnp.ndarray, lat: jnp.ndarray) -> jnp.ndarray:
    """(lon, lat) angles -> unit direction; (0, 0) -> (0, 0, -1)."""
    cl = jnp.cos(lat)
    return jnp.stack([cl * jnp.sin(lon), jnp.sin(lat), -cl * jnp.cos(lon)], axis=-1)


def pixels_to_points_equirect(
    pixels: jnp.ndarray, dist: jnp.ndarray, shape, vfov, hfov,
    center_lat=0.0, center_lon=0.0,
) -> jnp.ndarray:
    """Equirectangular crop: pixel x/y linear in lon/lat across hFov/vFov,
    centered at (centerLon, centerLat); `dist` is radial distance."""
    H, W = shape
    lon = center_lon + (pixels[..., 0] - (W - 1) / 2.0) * (hfov / W)
    lat = center_lat - (pixels[..., 1] - (H - 1) / 2.0) * (vfov / H)
    return _latlon_to_dir(lon, lat) * dist[..., None]


def project_equirect(
    points: jnp.ndarray, shape, vfov, hfov, center_lat=0.0, center_lon=0.0
) -> jnp.ndarray:
    """Camera-space points -> equirect pixel (x, y); inverse of
    `pixels_to_points_equirect` up to the radial distance."""
    H, W = shape
    lon = jnp.arctan2(points[..., 0], -points[..., 2])
    lat = jnp.arctan2(
        points[..., 1], jnp.hypot(points[..., 0], points[..., 2])
    )
    x = (lon - center_lon) * (W / hfov) + (W - 1) / 2.0
    y = (center_lat - lat) * (H / vfov) + (H - 1) / 2.0
    return jnp.stack([x, y], axis=-1)


def pixels_to_points_cylindrical(
    pixels: jnp.ndarray, dist: jnp.ndarray, shape, vfov, hfov,
    center_lat=0.0, center_lon=0.0,
) -> jnp.ndarray:
    """Cylindrical crop: x linear in lon; y linear in height on the unit
    cylinder (h spans 2*tan(vFov/2), offset tan(centerLat)); `dist` is
    radial distance along the (normalized) viewing ray."""
    H, W = shape
    lon = center_lon + (pixels[..., 0] - (W - 1) / 2.0) * (hfov / W)
    h = jnp.tan(center_lat) - (pixels[..., 1] - (H - 1) / 2.0) * (
        2.0 * jnp.tan(vfov / 2.0) / H
    )
    d = jnp.stack([jnp.sin(lon), h, -jnp.cos(lon)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d * dist[..., None]


def project_cylindrical(
    points: jnp.ndarray, shape, vfov, hfov, center_lat=0.0, center_lon=0.0
) -> jnp.ndarray:
    """Camera-space points -> cylindrical pixel (x, y)."""
    H, W = shape
    lon = jnp.arctan2(points[..., 0], -points[..., 2])
    r = jnp.hypot(points[..., 0], points[..., 2])
    h = points[..., 1] / r
    x = (lon - center_lon) * (W / hfov) + (W - 1) / 2.0
    y = (jnp.tan(center_lat) - h) * (H / (2.0 * jnp.tan(vfov / 2.0))) + (
        H - 1
    ) / 2.0
    return jnp.stack([x, y], axis=-1)


# io.video_dat.FrameIntrinsics.projection codes (reference
# lib/DepthPhoto.h:68-73 enum order).
PROJECTION_PERSPECTIVE = 0
PROJECTION_EQUIRECTANGULAR = 1
PROJECTION_CYLINDRICAL = 2


def pixels_to_points_proj(
    projection: int, pixels, depth, shape, vfov, hfov,
    center_lat=0.0, center_lon=0.0,
):
    """Projection-dispatching unprojection. `projection` is static (a wire
    -format code); depth is planar -z for Perspective and radial otherwise."""
    if projection == PROJECTION_EQUIRECTANGULAR:
        return pixels_to_points_equirect(
            pixels, depth, shape, vfov, hfov, center_lat, center_lon
        )
    if projection == PROJECTION_CYLINDRICAL:
        return pixels_to_points_cylindrical(
            pixels, depth, shape, vfov, hfov, center_lat, center_lon
        )
    return pixels_to_points(intrinsics_px(vfov, hfov, shape), depth, pixels)


def project_proj(
    projection: int, points, shape, vfov, hfov, center_lat=0.0, center_lon=0.0
):
    """Projection-dispatching camera-space -> pixel projection."""
    if projection == PROJECTION_EQUIRECTANGULAR:
        return project_equirect(points, shape, vfov, hfov, center_lat, center_lon)
    if projection == PROJECTION_CYLINDRICAL:
        return project_cylindrical(points, shape, vfov, hfov, center_lat, center_lon)
    return project(points, intrinsics_px(vfov, hfov, shape))
