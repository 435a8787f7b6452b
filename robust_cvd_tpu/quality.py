"""Quality harness: warp photo-consistency + synthetic golden scenes.

The driver's north-star quality metric (BASELINE.md) is warp
photo-consistency error: how well frame i's colors are reproduced by
warping frame j through frame i's depth map and the camera poses. The
reference never computes this number (it ships no tests/benchmarks); it is
the natural acceptance metric for temporally consistent depth — perfectly
consistent depth + poses reproduce neighboring frames exactly on static
lambertian scenes.

`golden_scene` renders an analytic slanted-plane scene (smooth procedural
texture, exact ray-plane depth) where ground-truth depth must score
near-zero error, perturbed depth must score worse, and the pose/deformation
solver must recover most of the gap. All functions are pure JAX and jit
into a handful of fused programs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .ops import geometry


class PhotoConsistency(NamedTuple):
    l1: jnp.ndarray  # mean absolute color error over valid pixels
    rmse: jnp.ndarray
    valid_ratio: jnp.ndarray  # fraction of pixels that land in-bounds


def pair_photo_consistency(
    image_i: jnp.ndarray,  # (H, W, C)
    image_j: jnp.ndarray,
    depth_i: jnp.ndarray,  # (H, W)
    ext_i: jnp.ndarray,  # (3, 4) camera-to-world
    ext_j: jnp.ndarray,
    intr_i: jnp.ndarray,  # (4,) px (fx, fy, cx, cy)
    intr_j: jnp.ndarray,
    mask_i: Optional[jnp.ndarray] = None,  # (H, W) weight in [0, 1]
) -> PhotoConsistency:
    """Warp frame j into frame i through depth_i; masked photometric error."""
    H, W = depth_i.shape
    uv = geometry.warping_field(ext_i, intr_i, depth_i, ext_j, intr_j)
    warped = geometry.grid_sample(image_j, uv)
    inb = (
        (uv[..., 0] >= 0.0)
        & (uv[..., 0] <= W - 1.0)
        & (uv[..., 1] >= 0.0)
        & (uv[..., 1] <= H - 1.0)
    ).astype(jnp.float32)
    w = inb if mask_i is None else inb * mask_i
    diff = jnp.abs(warped - image_i).mean(axis=-1)
    sq = ((warped - image_i) ** 2).mean(axis=-1)
    denom = jnp.maximum(w.sum(), 1.0)
    l1 = (diff * w).sum() / denom
    rmse = jnp.sqrt((sq * w).sum() / denom)
    return PhotoConsistency(l1=l1, rmse=rmse, valid_ratio=w.mean())


def clip_photo_consistency(
    images: jnp.ndarray,  # (N, H, W, C)
    depth: jnp.ndarray,  # (N, H, W)
    extrinsics: jnp.ndarray,  # (N, 3, 4)
    intrinsics: jnp.ndarray,  # (N, 4)
    pairs: Sequence[Tuple[int, int]],
    masks: Optional[jnp.ndarray] = None,  # (P, H, W)
) -> PhotoConsistency:
    """Mean photo-consistency over frame pairs (vmapped, one fused program)."""
    idx = jnp.asarray(np.asarray(pairs, np.int32))

    def one(pair, mask):
        i, j = pair[0], pair[1]
        return pair_photo_consistency(
            images[i], images[j], depth[i],
            extrinsics[i], extrinsics[j], intrinsics[i], intrinsics[j],
            mask,
        )

    if masks is None:
        res = jax.vmap(lambda p: one(p, None))(idx)
    else:
        res = jax.vmap(one)(idx, jnp.asarray(masks))
    return PhotoConsistency(
        l1=res.l1.mean(), rmse=res.rmse.mean(), valid_ratio=res.valid_ratio.mean()
    )


# ---------------------------------------------------------------------------
# Golden scene: slanted textured plane, translating camera, analytic depth.
# ---------------------------------------------------------------------------


class GoldenScene(NamedTuple):
    images: jnp.ndarray  # (N, H, W, 3)
    depth: jnp.ndarray  # (N, H, W) ground truth
    extrinsics: jnp.ndarray  # (N, 3, 4)
    intrinsics: jnp.ndarray  # (N, 4)
    pairs: list


def _texture(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Smooth procedural RGB texture (C∞, so resampling error is tiny)."""
    r = 0.5 + 0.25 * jnp.sin(3.1 * x) * jnp.cos(2.3 * y) + 0.15 * jnp.sin(7.7 * (x + y))
    g = 0.5 + 0.25 * jnp.cos(2.1 * x + 1.0) * jnp.sin(3.7 * y) + 0.15 * jnp.cos(5.3 * (x - y))
    b = 0.5 + 0.25 * jnp.sin(4.3 * x * 0.7 + 2.0) * jnp.sin(2.9 * y + 1.0)
    return jnp.stack([r, g, b], axis=-1)


def golden_scene(
    num_frames: int = 8,
    shape: Tuple[int, int] = (96, 128),
    focal: float = 0.5,  # tan(vfov/2)
    plane_depth: float = 3.0,
    slant: Tuple[float, float] = (0.15, 0.1),
    baseline: float = 0.08,
    yaw_per_frame: float = 0.0,
) -> GoldenScene:
    """Cameras at (i*baseline, 0, 0), yawed by i*yaw_per_frame about +Y
    (identity rotation by default), looking down -Z;
    plane z_w = -(plane_depth + a x_w + b y_w). Per-pixel ray-plane
    intersection gives exact depth (camera-frame z distance, invariant to
    the yaw since the ray is unit-in-z in the camera frame); images sample
    the analytic texture at the world hit point."""
    H, W = shape
    a, b = slant
    aspect = W / H
    vfov = 2.0 * np.arctan(focal)
    hfov = 2.0 * np.arctan(focal * aspect)
    intr = geometry.intrinsics_px(
        jnp.full((num_frames,), vfov, jnp.float32),
        jnp.full((num_frames,), hfov, jnp.float32),
        shape,
    )
    positions = jnp.stack(
        [
            jnp.arange(num_frames, dtype=jnp.float32) * baseline,
            jnp.zeros(num_frames),
            jnp.zeros(num_frames),
        ],
        axis=-1,
    )
    yaw = jnp.arange(num_frames, dtype=jnp.float32) * yaw_per_frame
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero, one = jnp.zeros_like(yaw), jnp.ones_like(yaw)
    rot = jnp.stack(
        [
            jnp.stack([c, zero, s], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-s, zero, c], -1),
        ],
        axis=-2,
    )  # (N, 3, 3) camera-to-world yaw about +Y
    ext = jnp.concatenate([rot, positions[:, :, None]], axis=2)

    pix = geometry.pixel_grid(shape)

    def render(rot_i, pos, intr_i):
        rays = geometry.pixels_to_rays(pix, intr_i)  # (H, W, 3) cam, z = -1
        d = jnp.einsum("ab,hwb->hwa", rot_i, rays)  # world directions
        # plane: z_w + plane_depth + a x_w + b y_w = 0, solve along p + t d
        denom = d[..., 2] + a * d[..., 0] + b * d[..., 1]
        denom = jnp.where(jnp.abs(denom) < 1e-3,
                          jnp.where(denom < 0, -1e-3, 1e-3), denom)
        t = -(pos[2] + plane_depth + a * pos[0] + b * pos[1]) / denom
        hit = pos[None, None] + t[..., None] * d
        return _texture(hit[..., 0], hit[..., 1]), t

    images, depth = jax.vmap(render)(rot, positions, intr)
    pairs = [(i, i + 1) for i in range(num_frames - 1)] + [
        (i, i + 2) for i in range(num_frames - 2)
    ]
    return GoldenScene(
        images=images, depth=depth, extrinsics=ext, intrinsics=intr, pairs=pairs
    )
