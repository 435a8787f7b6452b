"""Depth-map and image-warp transforms as tensorized spline grids (pure JAX).

TPU-native re-design of the reference transform hierarchy
(lib/DepthMapTransform.{h,cpp}, lib/ValueTransform.h):

  - The reference represents each frame's transform as a heap object holding
    Ceres parameter blocks, and builds per-observation "functors" that gather
    the 1/2/4/8/16 surrounding grid handles + interpolation weights.
  - Here a whole clip's transforms are ONE array: depth grids are
    (N, gz, gy, gx) multiplicative scale handles (the `Scale` value
    transform), spatial warps are (N, gy, gx, 2) NDC displacement handles.
    "Functors" become precomputed (indices, weights) tensors; evaluation is
    a batched gather + weighted sum, differentiable through the grid params
    (XLA turns the backward pass into scatter-adds).

Domain conventions (parity with reference lib/DepthMapTransform.cpp:739-948):
  - Grid handles span the full NDC square: grid coord = (ndc + 1) * (g - 1) / 2,
    clamped into [0, g-1). NDC y is +1 at the image top.
  - The depth-wise axis (gz > 1) is indexed by source DISPARITY, linearly
    between [1/depth_max, 1/depth_min].
  - Cubic interpolation = Catmull-Rom (cubicSpline, .cpp:671-678) with border
    taps clamped (weights accumulate onto the clamped handle).
  - Depth-grid deformation cost: per grid edge, (a - b) / min(|a|, |b|)
    (.cpp:631-667). Spatial deformation cost: the handle values themselves
    (L2 pull toward zero warp, .cpp:59-70).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class GridSpec(NamedTuple):
    """Static description of a grid transform (shapes are compile-time)."""

    gx: int = 1
    gy: int = 1
    gz: int = 1
    cubic: bool = False
    # Disparity domain for the depth-wise axis (only used when gz > 1).
    disp_min: float = 0.0
    disp_max: float = 0.0

    @property
    def spatial(self) -> bool:
        return self.gx > 1 or self.gy > 1

    @property
    def depthwise(self) -> bool:
        return self.gz > 1

    @property
    def num_handles(self) -> int:
        return self.gx * self.gy * self.gz


def init_depth_grid(num_frames: int, spec: GridSpec) -> jnp.ndarray:
    """Scale handles initialized to 1 (identity transform)."""
    return jnp.ones((num_frames, spec.gz, spec.gy, spec.gx), jnp.float32)


def init_spatial_grid(num_frames: int, gy: int, gx: int) -> jnp.ndarray:
    """Warp handles initialized to 0 (identity warp)."""
    return jnp.zeros((num_frames, gy, gx, 2), jnp.float32)


# ---------------------------------------------------------------------------
# Interpolation weights. These depend only on sample locations and SOURCE
# depth — both constant during a solve — so they are precomputed once per
# solver stage, exactly like the reference precomputes functor weights.
# ---------------------------------------------------------------------------


def _axis_coord(v, g: int):
    """NDC coordinate -> (integer cell, fractional offset) on a g-handle axis."""
    scaled = jnp.clip((v + 1.0) * (g - 1) / 2.0, 0.0, np.nextafter(g - 1, 0.0))
    idx = jnp.clip(scaled.astype(jnp.int32), 0, max(g - 2, 0))
    return idx, scaled - idx


def _depth_axis_coord(src_depth, spec: GridSpec):
    interval = (spec.disp_max - spec.disp_min) / (spec.gz - 1)
    disp = 1.0 / jnp.maximum(src_depth, 1e-12)
    scaled = jnp.clip(
        (disp - spec.disp_min) / interval, 0.0, np.nextafter(spec.gz - 1, 0.0)
    )
    idx = jnp.clip(scaled.astype(jnp.int32), 0, max(spec.gz - 2, 0))
    return idx, scaled - idx


def _catmull_rom(t):
    """Cubic Hermite spline weights for the 4 taps around a cell
    (reference lib/DepthMapTransform.cpp:671-678)."""
    t2 = t * t
    t3 = t2 * t
    return jnp.stack(
        [
            -0.5 * t3 + t2 - 0.5 * t,
            1.5 * t3 - 2.5 * t2 + 1.0,
            -1.5 * t3 + 2.0 * t2 + 0.5 * t,
            0.5 * t3 - 0.5 * t2,
        ],
        axis=-1,
    )


def _linear_taps(idx, rel, g: int):
    """2-tap linear interpolation (indices (..., 2), weights (..., 2))."""
    taps = jnp.stack([idx, jnp.minimum(idx + 1, g - 1)], axis=-1)
    w = jnp.stack([1.0 - rel, rel], axis=-1)
    return taps, w


def _cubic_taps(idx, rel, g: int):
    """4-tap Catmull-Rom with border clamping (duplicated indices simply
    receive their weights twice in the weighted sum, matching the
    reference's accumulate-into-clamped-handle behavior)."""
    offs = jnp.arange(-1, 3)
    taps = jnp.clip(idx[..., None] + offs, 0, g - 1)
    w = _catmull_rom(rel)
    return taps, w


def grid_gather(
    spec: GridSpec,
    loc_ndc: jnp.ndarray,
    src_depth: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute flat handle indices + weights for sample locations.

    loc_ndc: (..., 2) NDC coordinates; src_depth: (...,) required if gz > 1.
    Returns (idx (..., K) int32 into the flattened (gz*gy*gx) grid,
             w (..., K) float32), where K = prod of taps per active axis.
    """
    tap = _cubic_taps if spec.cubic else _linear_taps

    if spec.spatial:
        ix, rx = _axis_coord(loc_ndc[..., 0], spec.gx)
        iy, ry = _axis_coord(loc_ndc[..., 1], spec.gy)
        tx, wx = tap(ix, rx, spec.gx)
        ty, wy = tap(iy, ry, spec.gy)
    else:
        tx = jnp.zeros(loc_ndc.shape[:-1] + (1,), jnp.int32)
        wx = jnp.ones(loc_ndc.shape[:-1] + (1,), jnp.float32)
        ty, wy = tx, wx

    if spec.depthwise:
        assert src_depth is not None
        iz, rz = _depth_axis_coord(src_depth, spec)
        tz, wz = tap(iz, rz, spec.gz)
    else:
        tz = jnp.zeros(tx.shape[:-1] + (1,), jnp.int32)
        wz = jnp.ones(wx.shape[:-1] + (1,), jnp.float32)

    # Outer product of per-axis taps -> flat index / weight lists.
    idx = (
        tz[..., :, None, None] * (spec.gy * spec.gx)
        + ty[..., None, :, None] * spec.gx
        + tx[..., None, None, :]
    )
    w = wz[..., :, None, None] * wy[..., None, :, None] * wx[..., None, None, :]
    K = idx.shape[-1] * idx.shape[-2] * idx.shape[-3]
    return idx.reshape(idx.shape[:-3] + (K,)), w.reshape(w.shape[:-3] + (K,))


# ---------------------------------------------------------------------------
# Evaluation.
# ---------------------------------------------------------------------------


def eval_depth_scale(
    grid: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Interpolated scale factor at precomputed taps.

    grid: (gz, gy, gx) one frame's handles; idx/w: (..., K).
    Transformed depth = src_depth * eval_depth_scale(...).
    """
    flat = grid.reshape(-1)
    return jnp.sum(flat[idx] * w, axis=-1)


def eval_spatial_warp(
    grid: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Interpolated NDC displacement (..., 2) at precomputed taps.

    grid: (gy, gx, 2) one frame's handles; idx/w: (..., K) (gz must be 1).
    """
    flat = grid.reshape(-1, 2)
    return jnp.sum(flat[idx] * w[..., None], axis=-2)


def depth_param_map(grid: jnp.ndarray, spec: GridSpec, shape, src_depth=None):
    """Rasterize per-pixel scale factors for a frame
    (parity with reference GridDepthXform::paramMap, .cpp:950-994).

    grid: (gz, gy, gx); shape: (H, W); src_depth: (H, W) if depthwise.
    """
    H, W = shape
    x = -1.0 + jnp.arange(W, dtype=jnp.float32) * (2.0 / (W - 1.0))
    y = 1.0 - jnp.arange(H, dtype=jnp.float32) * (2.0 / (H - 1.0))
    X, Y = jnp.meshgrid(x, y)
    loc = jnp.stack([X, Y], axis=-1)
    idx, w = grid_gather(spec, loc, src_depth)
    return eval_depth_scale(grid, idx, w)


def spatial_warp_map(grid: jnp.ndarray, cubic: bool, shape):
    """Rasterize the NDC warp field (H, W, 2) for a frame
    (parity with reference SpatialXform::warp, .cpp:428-456)."""
    gy, gx = grid.shape[:2]
    spec = GridSpec(gx=gx, gy=gy, gz=1, cubic=cubic)
    H, W = shape
    x = -1.0 + jnp.arange(W, dtype=jnp.float32) * (2.0 / (W - 1.0))
    y = 1.0 - jnp.arange(H, dtype=jnp.float32) * (2.0 / (H - 1.0))
    X, Y = jnp.meshgrid(x, y)
    loc = jnp.stack([X, Y], axis=-1)
    idx, w = grid_gather(spec, loc)
    return eval_spatial_warp(grid, idx, w)


def apply_depth_grid(
    grid: jnp.ndarray, spec: GridSpec, depth: jnp.ndarray
) -> jnp.ndarray:
    """Transform a full depth map (H, W) by a frame's grid."""
    scale = depth_param_map(grid, spec, depth.shape, depth)
    return depth * scale


# ---------------------------------------------------------------------------
# Deformation (smoothness) residuals.
# ---------------------------------------------------------------------------


def depth_deform_residuals(grid: jnp.ndarray) -> jnp.ndarray:
    """Relative differences along all grid edges, flattened.

    grid: (..., gz, gy, gx). Residual per edge: (a - b) / min(|a|, |b|)
    (reference computeGridDeformationCost, .cpp:631-667). Returns (..., E).
    """

    def rel(a, b):
        scale = jnp.minimum(jnp.abs(a), jnp.abs(b))
        return (a - b) / jnp.maximum(scale, 1e-12)

    parts = []
    if grid.shape[-1] > 1:
        parts.append(rel(grid[..., :, :, 1:], grid[..., :, :, :-1]))
    if grid.shape[-2] > 1:
        parts.append(rel(grid[..., :, 1:, :], grid[..., :, :-1, :]))
    if grid.shape[-3] > 1:
        parts.append(rel(grid[..., 1:, :, :], grid[..., :-1, :, :]))
    if not parts:
        return jnp.zeros(grid.shape[:-3] + (0,), grid.dtype)
    batch = grid.shape[:-3]
    return jnp.concatenate([p.reshape(batch + (-1,)) for p in parts], axis=-1)


def adaptive_deform_weights(
    dynamic_mask: "np.ndarray",
    spec: GridSpec,
    base_weight: float,
    adaptive_weight: float,
) -> jnp.ndarray:
    """Per-edge deformation-cost multipliers from dynamic masks
    (reference AdaptiveDeformationCost, lib/PoseOptimizer.cpp:559-656):
    each grid handle accumulates bilinear mass from dynamic (mask < 127 —
    white is static) vs static pixels; handle weight = dyn / (dyn + static);
    an x/y edge is scaled by base + max(w_a, w_b) * adaptive, a z edge by
    base + w * adaptive. Edge order matches depth_deform_residuals
    (x-edges, then y-edges, then z-edges).

    dynamic_mask: (N, h, w) uint8/bool. Returns (N, E) float32.
    """
    mask = np.asarray(dynamic_mask)
    if mask.dtype != bool:
        mask = mask >= 127  # True = static
    N, dh, dw = mask.shape
    gx, gy, gz = spec.gx, spec.gy, spec.gz

    ys = np.arange(dh) * (gy - 1) / dh if gy > 1 else np.zeros(dh)
    xs = np.arange(dw) * (gx - 1) / dw if gx > 1 else np.zeros(dw)
    iy = np.minimum(ys.astype(int), max(gy - 2, 0))
    ix = np.minimum(xs.astype(int), max(gx - 2, 0))
    ry = (ys - iy)[:, None]
    rx = (xs - ix)[None, :]

    IY = np.broadcast_to(iy[:, None], (dh, dw))
    IX = np.broadcast_to(ix[None, :], (dh, dw))
    corners = [
        (IY, IX, (1 - rx) * (1 - ry)),
        (IY, np.minimum(IX + 1, gx - 1), rx * (1 - ry)),
        (np.minimum(IY + 1, gy - 1), IX, (1 - rx) * ry),
        (np.minimum(IY + 1, gy - 1), np.minimum(IX + 1, gx - 1), rx * ry),
    ]

    out = np.empty((N, 0), np.float32)
    weights = np.zeros((N, gy, gx), np.float64)
    for n in range(N):
        dyn = np.zeros((gy, gx))
        sta = np.zeros((gy, gx))
        is_static = mask[n]
        for (cy, cx, w) in corners:
            wm = np.broadcast_to(w, (dh, dw))
            flat = cy.ravel() * gx + cx.ravel()
            np.add.at(sta.ravel(), flat[is_static.ravel()], wm.ravel()[is_static.ravel()])
            np.add.at(dyn.ravel(), flat[~is_static.ravel()], wm.ravel()[~is_static.ravel()])
        weights[n] = dyn / np.maximum(dyn + sta, 1e-12)

    parts = []
    w3 = np.broadcast_to(weights[:, None], (N, gz, gy, gx))
    if gx > 1:
        ew = base_weight + np.maximum(w3[..., 1:], w3[..., :-1]) * adaptive_weight
        parts.append(ew.reshape(N, -1))
    if gy > 1:
        ew = base_weight + np.maximum(w3[:, :, 1:], w3[:, :, :-1]) * adaptive_weight
        parts.append(ew.reshape(N, -1))
    if gz > 1:
        ew = base_weight + w3[:, 1:] * adaptive_weight
        parts.append(ew.reshape(N, -1))
    if parts:
        out = np.concatenate(parts, axis=1).astype(np.float32)
    return jnp.asarray(out)


def shift_deform_residuals(grid: jnp.ndarray) -> jnp.ndarray:
    """Absolute differences along all grid edges for ScaleShift's additive
    handles. The reference's relative-difference deformation cost
    (.cpp:631-667) is ill-conditioned around the shift handles' zero
    initialization, and the reference pipeline never exercises grid
    ScaleShift transforms — absolute differences are the well-conditioned
    equivalent smoothness prior."""
    parts = []
    if grid.shape[-1] > 1:
        parts.append(grid[..., :, :, 1:] - grid[..., :, :, :-1])
    if grid.shape[-2] > 1:
        parts.append(grid[..., :, 1:, :] - grid[..., :, :-1, :])
    if grid.shape[-3] > 1:
        parts.append(grid[..., 1:, :, :] - grid[..., :-1, :, :])
    if not parts:
        return jnp.zeros(grid.shape[:-3] + (0,), grid.dtype)
    batch = grid.shape[:-3]
    return jnp.concatenate([p.reshape(batch + (-1,)) for p in parts], axis=-1)


def spatial_deform_residuals(grid: jnp.ndarray) -> jnp.ndarray:
    """Spatial deformation cost = the warp handles themselves
    (reference paramsToResiduals, .cpp:59-70). grid: (..., gy, gx, 2)."""
    return grid.reshape(grid.shape[:-3] + (-1,))


# ---------------------------------------------------------------------------
# Coarse-to-fine grid subdivision.
# ---------------------------------------------------------------------------


def split_grid(grid: jnp.ndarray, new_spec: GridSpec) -> jnp.ndarray:
    """Resample depth-grid handles onto a finer grid (bilinear), preserving
    the represented transform at the new handle locations
    (parity with reference Processor::gridXformSplit, Processor.cpp:888-985).

    grid: (N, gz, gy, gx) -> (N, gz', gy', gx').
    """
    N, gz, gy, gx = grid.shape

    def axis_positions(old_g, new_g):
        if new_g == 1:
            return np.zeros(1), np.zeros(1, np.int32)
        # New handles span the same domain; old coordinate of new handle i:
        pos = np.arange(new_g) * (old_g - 1) / (new_g - 1) if old_g > 1 else np.zeros(new_g)
        idx = np.clip(pos.astype(np.int32), 0, max(old_g - 2, 0))
        rel = pos - idx
        return rel, idx

    def interp_axis(arr, axis, old_g, new_g):
        if old_g == new_g:
            return arr
        rel, idx = axis_positions(old_g, new_g)
        a0 = jnp.take(arr, idx, axis=axis)
        a1 = jnp.take(arr, np.minimum(idx + 1, old_g - 1), axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = new_g
        r = jnp.asarray(rel, arr.dtype).reshape(shape)
        return a0 * (1 - r) + a1 * r

    out = interp_axis(grid, 3, gx, new_spec.gx)
    out = interp_axis(out, 2, gy, new_spec.gy)
    out = interp_axis(out, 1, gz, new_spec.gz)
    return out
