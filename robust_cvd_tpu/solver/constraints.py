"""Flow-constraint construction: dense flow -> sparse solver constraints.

Behavioral parity with reference lib/FlowConstraints.cpp, re-partitioned for
TPU: the dense per-pixel work (corner response, candidate predicates) is a
batched JAX program over whole frame/pair stacks; only the inherently
sequential greedy disk-suppression sampling runs on the host (native C++
helper, robust_cvd_tpu/native).

Data flow per pair (i, j) (reference .cpp:401-465):
  1. corner strength = min eigenvalue of the 3x3-blocked structure tensor of
     the grayscale frame (cv::cornerMinEigenVal with Sobel-3 derivatives).
  2. candidates = pixels passing the flow consistency mask whose flow target
     lands in-bounds (and, when a `min_dynamic_distance` >= 0 is configured,
     whose endpoints are far enough from dynamic objects).
  3. sort by corner strength, greedily keep subject to a
     `match_separation`-px disk separation.
  4. store locations normalized to [0,1] x [0,inv_aspect].

Triplets (i-1, i, i+1) chain backward+forward flow from the center frame
(reference .cpp:467-550). The static flag is recomputed from dynamic-mask
distance transforms (reference .cpp:573-660); `prune_static_flag`
contaminates disk neighborhoods of dynamic constraints (reference
.cpp:662-748).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from .residuals import ConstraintData, TripletData


class PairConstraints(NamedTuple):
    """Per-pair sparse correspondences in normalized [0,1]x[0,inv_aspect]."""

    loc0: np.ndarray  # (C, 2)
    loc1: np.ndarray  # (C, 2)
    is_static: np.ndarray  # (C,) bool


class TripletConstraints(NamedTuple):
    loc: np.ndarray  # (C, 3, 2)
    is_static: np.ndarray  # (C,) bool


# ---------------------------------------------------------------------------
# Corner response (dense, batched, TPU-resident).
# ---------------------------------------------------------------------------


@jax.jit
def corner_min_eigenval(gray: jnp.ndarray) -> jnp.ndarray:
    """Min eigenvalue of the structure tensor, batched over frames.

    gray: (N, H, W) float32. Matches cv::cornerMinEigenVal(blockSize=3,
    Sobel ksize=3) up to a constant scale (only the ordering matters — the
    values are used as sampling priorities).
    """
    # Sobel-3 derivatives with reflect-101 borders (OpenCV default).
    pad = jnp.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="reflect")

    def conv3(img, kern):
        out = jnp.zeros_like(gray)
        for dy in range(3):
            for dx in range(3):
                k = kern[dy, dx]
                if k != 0.0:
                    out = out + k * pad[:, dy : dy + gray.shape[1], dx : dx + gray.shape[2]]
        return out

    sobel_x = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    sobel_y = sobel_x.T
    dx = conv3(gray, sobel_x)
    dy = conv3(gray, sobel_y)

    # 3x3 box sum of the products (blockSize = 3), reflect borders.
    def box3(img):
        p = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="reflect")
        out = jnp.zeros_like(img)
        for oy in range(3):
            for ox in range(3):
                out = out + p[:, oy : oy + img.shape[1], ox : ox + img.shape[2]]
        return out

    a = box3(dx * dx)
    b = box3(dx * dy)
    c = box3(dy * dy)
    # min eigenvalue of [[a, b], [b, c]]
    return 0.5 * ((a + c) - jnp.sqrt((a - c) ** 2 + 4.0 * b * b))


def rgb_to_gray(color: np.ndarray) -> np.ndarray:
    """(..., 3) RGB in [0,1] -> grayscale, ITU-R BT.601 (OpenCV weights)."""
    return (
        0.299 * color[..., 0] + 0.587 * color[..., 1] + 0.114 * color[..., 2]
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# Per-pair / per-triplet extraction (host; candidates precomputed in numpy).
# ---------------------------------------------------------------------------


def build_pair_constraints(
    corner: np.ndarray,
    flow: np.ndarray,
    mask: np.ndarray,
    inv_aspect: float,
    match_separation: int = 10,
    use_native: bool = True,
) -> PairConstraints:
    """One pair's constraints (reference lib/FlowConstraints.cpp:401-465).

    corner: (H, W) corner strength of frame i; flow: (H, W, 2) i->j flow in
    pixels; mask: (H, W) bool flow-consistency mask.
    """
    h, w = corner.shape
    fused = (
        native.build_pair_candidates(corner, flow, mask, match_separation)
        if use_native
        else None
    )
    if fused is not None:
        xy, f1 = fused
        scale = np.array([1.0 / w, inv_aspect / h], np.float32)
        return PairConstraints(
            loc0=xy.astype(np.float32) * scale,
            loc1=f1 * scale,
            is_static=np.ones(len(xy), bool),
        )
    ys, xs = np.nonzero(mask)
    fx1 = xs + flow[ys, xs, 0]
    fy1 = ys + flow[ys, xs, 1]
    ix1 = (fx1 + 0.5).astype(np.int32)
    iy1 = (fy1 + 0.5).astype(np.int32)
    inb = (ix1 >= 0) & (ix1 < w) & (iy1 >= 0) & (iy1 < h)
    xs, ys, fx1, fy1 = xs[inb], ys[inb], fx1[inb], fy1[inb]

    order = np.argsort(-corner[ys, xs], kind="stable")
    xs, ys, fx1, fy1 = xs[order], ys[order], fx1[order], fy1[order]

    keep = native.greedy_sample(xs, ys, w, h, match_separation)
    xs, ys, fx1, fy1 = xs[keep], ys[keep], fx1[keep], fy1[keep]

    scale = np.array([1.0 / w, inv_aspect / h], np.float32)
    loc0 = np.stack([xs, ys], axis=-1).astype(np.float32) * scale
    loc1 = np.stack([fx1, fy1], axis=-1).astype(np.float32) * scale
    return PairConstraints(
        loc0=loc0, loc1=loc1, is_static=np.ones(len(loc0), bool)
    )


def build_triplet_constraints(
    corner: np.ndarray,
    flow10: np.ndarray,
    mask10: np.ndarray,
    flow12: np.ndarray,
    mask12: np.ndarray,
    inv_aspect: float,
    match_separation: int = 10,
    use_native: bool = True,
) -> TripletConstraints:
    """One triplet's constraints, chained backward + forward from the center
    frame (reference lib/FlowConstraints.cpp:467-550).

    Note: the reference indexes the corner-response priority at the backward
    flow target's x within the center row (`cornerPtr[ix0]`, .cpp:540) — an
    apparent indexing slip; we use the center pixel itself, which is what
    the greedy suppression keys on anyway."""
    h, w = corner.shape
    fused = (
        native.build_triplet_candidates(
            corner, flow10, mask10, flow12, mask12, match_separation
        )
        if use_native
        else None
    )
    if fused is not None:
        xy, f0, f2 = fused
        scale = np.array([1.0 / w, inv_aspect / h], np.float32)
        loc = np.stack(
            [f0, xy.astype(np.float32), f2], axis=1
        ) * scale
        return TripletConstraints(
            loc=loc.astype(np.float32), is_static=np.ones(len(xy), bool)
        )
    ys, xs = np.nonzero(mask10 & mask12)
    fx0 = xs + flow10[ys, xs, 0]
    fy0 = ys + flow10[ys, xs, 1]
    fx2 = xs + flow12[ys, xs, 0]
    fy2 = ys + flow12[ys, xs, 1]
    inb = (
        ((fx0 + 0.5).astype(np.int32) >= 0)
        & ((fx0 + 0.5).astype(np.int32) < w)
        & ((fy0 + 0.5).astype(np.int32) >= 0)
        & ((fy0 + 0.5).astype(np.int32) < h)
        & ((fx2 + 0.5).astype(np.int32) >= 0)
        & ((fx2 + 0.5).astype(np.int32) < w)
        & ((fy2 + 0.5).astype(np.int32) >= 0)
        & ((fy2 + 0.5).astype(np.int32) < h)
    )
    xs, ys = xs[inb], ys[inb]
    fx0, fy0, fx2, fy2 = fx0[inb], fy0[inb], fx2[inb], fy2[inb]

    order = np.argsort(-corner[ys, xs], kind="stable")
    xs, ys = xs[order], ys[order]
    fx0, fy0, fx2, fy2 = fx0[order], fy0[order], fx2[order], fy2[order]

    keep = native.greedy_sample(xs, ys, w, h, match_separation)
    xs, ys = xs[keep], ys[keep]
    fx0, fy0, fx2, fy2 = fx0[keep], fy0[keep], fx2[keep], fy2[keep]

    scale = np.array([1.0 / w, inv_aspect / h], np.float32)
    loc = np.stack(
        [
            np.stack([fx0, fy0], -1),
            np.stack([xs, ys], -1).astype(np.float64),
            np.stack([fx2, fy2], -1),
        ],
        axis=1,
    ).astype(np.float32) * scale
    return TripletConstraints(loc=loc, is_static=np.ones(len(xs), bool))


# ---------------------------------------------------------------------------
# Static flags from dynamic masks.
# ---------------------------------------------------------------------------


def dynamic_distance(dynamic_mask: np.ndarray | None, shape) -> np.ndarray:
    """Euclidean distance to the nearest dynamic pixel.

    dynamic_mask: (H, W) uint8/bool where WHITE (>=127 / True) = static
    (reference inverts masks when generating them). None -> all static.
    """
    if dynamic_mask is None:
        return np.full(shape, np.finfo(np.float32).max, np.float32)
    from scipy import ndimage

    static = np.asarray(dynamic_mask)
    if static.dtype != bool:
        static = static >= 127
    # distance from each pixel to the nearest zero (= dynamic) pixel
    return ndimage.distance_transform_edt(static).astype(np.float32)


def set_static_flags(
    pair_keys: List[Tuple[int, int]],
    pairs: Dict[Tuple[int, int], PairConstraints],
    triplet_keys: List[int],
    triplets: Dict[int, TripletConstraints],
    dyn_dist: np.ndarray | None,
    min_dynamic_distance: float = 8.0,
) -> None:
    """Recompute isStatic from dynamic-mask distances, in place
    (reference lib/FlowConstraints.cpp:573-660). dyn_dist: (N, H, W) stack of
    distance transforms at the dynamic-mask resolution, or None (all static).

    Location convention: multiplying BOTH normalized coordinates by the mask
    width recovers pixel coordinates (x*w, y*w) — because y is stored
    pre-multiplied by inv_aspect (reference .cpp:617-623)."""
    if dyn_dist is None:
        for pc in pairs.values():
            pc.is_static[:] = True
        for tc in triplets.values():
            tc.is_static[:] = True
        return

    w = dyn_dist.shape[2]
    masks = dyn_dist > min_dynamic_distance

    def lookup(mask, loc):
        x = np.clip((loc[:, 0] * w).astype(np.int32), 0, mask.shape[1] - 1)
        y = np.clip((loc[:, 1] * w).astype(np.int32), 0, mask.shape[0] - 1)
        return mask[y, x]

    for (i, j) in pair_keys:
        pc = pairs[(i, j)]
        pc.is_static[:] = lookup(masks[i], pc.loc0) & lookup(masks[j], pc.loc1)

    for t in triplet_keys:
        tc = triplets[t]
        tc.is_static[:] = (
            lookup(masks[t - 1], tc.loc[:, 0])
            & lookup(masks[t], tc.loc[:, 1])
            & lookup(masks[t + 1], tc.loc[:, 2])
        )


def prune_static_flag(
    num_frames: int,
    pair_keys: List[Tuple[int, int]],
    pairs: Dict[Tuple[int, int], PairConstraints],
    triplet_keys: List[int],
    triplets: Dict[int, TripletConstraints],
    shape: Tuple[int, int],
    distance: int,
) -> None:
    """Contaminate neighborhoods of dynamic constraints, in place
    (reference lib/FlowConstraints.cpp:662-748)."""
    h, w = shape
    frame_masks = np.zeros((num_frames, h, w), bool)
    for (i, j), pc in pairs.items():
        dyn = ~pc.is_static
        if not dyn.any():
            continue
        for frame, loc in ((i, pc.loc0[dyn]), (j, pc.loc1[dyn])):
            xs = np.clip((loc[:, 0] * w).astype(np.int32), 0, w - 1)
            ys = np.clip((loc[:, 1] * w).astype(np.int32), 0, h - 1)
            frame_masks[frame] |= native.stamp_disks(xs, ys, w, h, distance)

    def hit(frame, loc):
        x = np.clip((loc[:, 0] * w).astype(np.int32), 0, w - 1)
        y = np.clip((loc[:, 1] * w).astype(np.int32), 0, h - 1)
        return frame_masks[frame][y, x]

    for (i, j) in pair_keys:
        pc = pairs[(i, j)]
        pc.is_static[hit(i, pc.loc0) | hit(j, pc.loc1)] = False

    for t in triplet_keys:
        tc = triplets[t]
        bad = hit(t - 1, tc.loc[:, 0]) | hit(t, tc.loc[:, 1]) | hit(t + 1, tc.loc[:, 2])
        tc.is_static[bad] = False


# ---------------------------------------------------------------------------
# Flattening to solver tensors.
# ---------------------------------------------------------------------------


def _sample_source_depth(depth: np.ndarray, loc: np.ndarray, inv_aspect: float):
    """Nearest-pixel source depth at normalized loc
    (reference Observation ctor, lib/PoseOptimizer.cpp:113-115)."""
    h, w = depth.shape
    x = np.clip((loc[:, 0] * w).astype(np.int32), 0, w - 1)
    y = np.clip((loc[:, 1] / inv_aspect * h).astype(np.int32), 0, h - 1)
    return depth[y, x]


def loc_to_ndc(loc: np.ndarray, inv_aspect: float) -> np.ndarray:
    """[0,1]x[0,inv_aspect] -> NDC [-1,1]^2, y up
    (reference Observation ctor, lib/PoseOptimizer.cpp:105-106)."""
    return np.stack(
        [-1.0 + 2.0 * loc[:, 0], 1.0 - 2.0 * loc[:, 1] / inv_aspect], axis=-1
    ).astype(np.float32)


def flatten_pairs(
    pair_keys: List[Tuple[int, int]],
    pairs: Dict[Tuple[int, int], PairConstraints],
    source_depth: np.ndarray,
    inv_aspect: float,
    pad_to: int | None = None,
) -> ConstraintData:
    """All pairs -> pair-blocked (P, C) ConstraintData with NDC locations,
    sampled source depths, and weights (0 for padding / dynamic /
    invalid-depth constraints — the reference skips those at problem build,
    lib/PoseOptimizer.cpp:1177-1193). Each pair is padded to the max
    per-pair count (or `pad_to`)."""
    keys = [k for k in pair_keys if len(pairs[k].loc0) > 0]
    if not keys:
        raise RuntimeError(
            "no usable flow constraints: every sampled pair's consistency "
            "mask is empty. The optical flow is too inconsistent to drive "
            "pose optimization — check flow quality (flow_mask/ coverage, "
            "flow_list.json mask ratios) and the RAFT checkpoint."
        )
    P = len(keys)
    C = pad_to or max(len(pairs[k].loc0) for k in keys)
    C = ((C + 127) // 128) * 128  # lane-width padding: TPU tiles want 128

    pair = np.zeros((P, 2), np.int32)
    l0 = np.zeros((P, C, 2), np.float32)
    l1 = np.zeros((P, C, 2), np.float32)
    d0 = np.ones((P, C), np.float32)
    d1 = np.ones((P, C), np.float32)
    wgt = np.zeros((P, C), np.float32)

    for p, (i, j) in enumerate(keys):
        pc = pairs[(i, j)]
        n = min(len(pc.loc0), C)
        dep0 = _sample_source_depth(source_depth[i], pc.loc0[:n], inv_aspect)
        dep1 = _sample_source_depth(source_depth[j], pc.loc1[:n], inv_aspect)
        valid = (
            pc.is_static[:n]
            & np.isfinite(dep0)
            & (dep0 > 0)
            & np.isfinite(dep1)
            & (dep1 > 0)
        )
        pair[p] = (i, j)
        l0[p, :n] = loc_to_ndc(pc.loc0[:n], inv_aspect)
        l1[p, :n] = loc_to_ndc(pc.loc1[:n], inv_aspect)
        d0[p, :n] = np.where(valid, dep0, 1.0)
        d1[p, :n] = np.where(valid, dep1, 1.0)
        wgt[p, :n] = valid.astype(np.float32)

    return ConstraintData(
        pair=jnp.asarray(pair),
        loc0=jnp.asarray(l0),
        loc1=jnp.asarray(l1),
        depth0=jnp.asarray(d0),
        depth1=jnp.asarray(d1),
        weight=jnp.asarray(wgt),
    )


def flatten_triplets(
    triplet_keys: List[int],
    triplets: Dict[int, TripletConstraints],
    source_depth: np.ndarray,
    inv_aspect: float,
    smooth_static_weight: float,
    smooth_dynamic_weight: float,
    pad_to: int | None = None,
) -> TripletData | None:
    keys = [t for t in triplet_keys if len(triplets[t].loc) > 0]
    if not keys:
        return None
    T = len(keys)
    C = pad_to or max(len(triplets[t].loc) for t in keys)
    C = ((C + 127) // 128) * 128  # lane-width padding

    frame = np.zeros((T,), np.int32)
    locs = np.zeros((T, C, 3, 2), np.float32)
    deps = np.ones((T, C, 3), np.float32)
    wgts = np.zeros((T, C), np.float32)

    for p, t in enumerate(keys):
        tc = triplets[t]
        n = min(len(tc.loc), C)
        dep = np.stack(
            [
                _sample_source_depth(source_depth[t - 1], tc.loc[:n, 0], inv_aspect),
                _sample_source_depth(source_depth[t], tc.loc[:n, 1], inv_aspect),
                _sample_source_depth(source_depth[t + 1], tc.loc[:n, 2], inv_aspect),
            ],
            axis=1,
        )
        valid = np.all(np.isfinite(dep) & (dep > 0), axis=1)
        w = np.where(tc.is_static[:n], smooth_static_weight, smooth_dynamic_weight)
        frame[p] = t
        locs[p, :n] = np.stack(
            [loc_to_ndc(tc.loc[:n, k], inv_aspect) for k in range(3)], axis=1
        )
        deps[p, :n] = np.where(valid[:, None], dep, 1.0)
        wgts[p, :n] = np.where(valid, w, 0.0)

    return TripletData(
        frame=jnp.asarray(frame),
        loc=jnp.asarray(locs),
        depth=jnp.asarray(deps),
        weight=jnp.asarray(wgts),
    )
