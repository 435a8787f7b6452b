"""Depth-map filters (pure JAX, batched over frames).

TPU re-design of the reference DepthVideoProcessor filters
(lib/Processor.cpp):

  - flow_guided_filter (.cpp:315-590): for each pixel, track it through
    forward/backward flow chains within +-frame_radius, sample each visited
    frame's depth map, express every sample as z-depth in the REFERENCE
    camera (project to world, dot with the reference forward axis), weight
    by exp(-3 * depth_ratio), and output the weighted mean (or weighted
    median). The reference loops pixels on the CPU; here the flow-chain
    advection is a batched scan over frame offsets — one (N, H, W) tensor
    program per chain direction.

  - bilateral_filter (.cpp:183-313): spatio-temporal bilateral filter over a
    (2*frame_radius+1) temporal x (2*spatial_radius+1)^2 spatial window with
    gaussian depth-range weights (and optional color-range weights).

  - clip_max_depth (.cpp:592-619): clamp depth to max_depth.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import geometry


class FilterCameras(NamedTuple):
    """Per-frame camera data needed to express samples in a common frame.

    position: (N, 3); forward: (N, 3) camera forward (-Z axis in world);
    intrinsics: (N, 4) pixel (fx, fy, cx, cy)."""

    position: jnp.ndarray
    forward: jnp.ndarray
    intrinsics: jnp.ndarray


def flow_guided_filter(
    depth: jnp.ndarray,
    world_points: jnp.ndarray,
    cams: FilterCameras,
    flows_fwd: jnp.ndarray,
    masks_fwd: jnp.ndarray,
    flows_bwd: jnp.ndarray,
    masks_bwd: jnp.ndarray,
    frame_radius: int = 4,
    median: bool = False,
    far_flows: Optional[jnp.ndarray] = None,
    far_masks: Optional[jnp.ndarray] = None,
    far_tgt: Optional[jnp.ndarray] = None,
    far_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flow-guided spatio-temporal depth filter (spatial_radius = 0, the
    pipeline default — reference Processor.h:66, pose_optimization.py:292).

    depth:        (N, H, W) transformed depth maps
    world_points: (N, H, W, 3) world-space positions of every pixel
    flows_fwd:    (N, H, W, 2) flow i -> i+1 (last frame unused)
    masks_fwd:    (N, H, W)    bool
    flows_bwd:    (N, H, W, 2) flow i -> i-1 (first frame unused)
    masks_bwd:    (N, H, W)    bool

    Far connections (reference Processor.cpp:414-426, 521-545, enabled by
    Params.farConnections): non-consecutive flow pairs (i, fi) with fi
    outside the +-frame_radius window contribute one single-hop sample each,
    with the same depth-ratio weights. Padded per-frame tensors:

    far_flows: (N, F, H, W, 2) flow i -> far_tgt[i, f]
    far_masks: (N, F, H, W)    bool
    far_tgt:   (N, F) int32 target frame per slot
    far_valid: (N, F) bool — slot occupancy (pair counts differ per frame)

    Divergence note: when a far pair's mask rejects a pixel, the reference
    `break`s out of its far loop, dropping the REMAINING far pairs for that
    pixel in directory-iteration (i.e. unspecified) order; we evaluate each
    far pair independently — the deterministic superset of any reference
    ordering.

    Returns filtered (N, H, W).
    """
    N, H, W = depth.shape
    K = 2 * frame_radius + 1
    pix = geometry.pixel_grid((H, W))  # (H, W, 2)

    # z-depth of frame j's pixels as seen from reference frame i lives on
    # frame j's grid; we compute it lazily by sampling world_points.
    ref_pos = cams.position  # (N, 3)
    ref_fwd = cams.forward  # (N, 3)

    def zdepth_of(sampled_world, ref_i):
        return jnp.einsum(
            "...c,c->...", sampled_world - ref_pos[ref_i], ref_fwd[ref_i]
        )

    def chain(direction):
        """Track all pixels of all frames through `direction` (+1 fwd/-1 bwd)
        up to frame_radius steps; emit per-step (depth sample, valid)."""
        flows = flows_fwd if direction > 0 else flows_bwd
        masks = masks_fwd if direction > 0 else masks_bwd

        def step(carry, k):
            loc, valid = carry  # (N, H, W, 2), (N, H, W)
            # current frame at chain step k: i + direction*k, we track from
            # source frame i; the flow to apply lives on frame i+direction*k.
            src_frame = jnp.arange(N) + direction * k
            src_frame_c = jnp.clip(src_frame, 0, N - 1)

            def per_frame(fidx, l):
                f = flows[fidx]
                m = masks[fidx]
                ix = jnp.clip(jnp.round(l[..., 0]).astype(jnp.int32), 0, W - 1)
                iy = jnp.clip(jnp.round(l[..., 1]).astype(jnp.int32), 0, H - 1)
                ok = m[iy, ix] > 0
                fl = f[iy, ix]
                return l + fl, ok

            new_loc, ok = jax.vmap(per_frame)(src_frame_c, loc)
            tgt = src_frame + direction
            in_seq = (tgt >= 0) & (tgt < N)
            inb = (
                (new_loc[..., 0] >= -0.5)
                & (new_loc[..., 0] < W - 0.5)
                & (new_loc[..., 1] >= -0.5)
                & (new_loc[..., 1] < H - 0.5)
            )
            valid = valid & ok & inb & in_seq[:, None, None]

            # sample the target frame's world points at the tracked location
            tgt_c = jnp.clip(tgt, 0, N - 1)

            def sample_frame(fidx, l):
                return geometry.grid_sample(world_points[fidx], l)

            w_pts = jax.vmap(sample_frame)(tgt_c, new_loc)  # (N, H, W, 3)
            z = jax.vmap(zdepth_of)(w_pts, jnp.arange(N))
            return (new_loc, valid), (z, valid)

        loc0 = jnp.broadcast_to(pix, (N, H, W, 2))
        valid0 = jnp.ones((N, H, W), bool)
        _, (zs, vs) = jax.lax.scan(
            step, (loc0, valid0), jnp.arange(frame_radius)
        )
        return zs, vs  # (frame_radius, N, H, W)

    z_fwd, v_fwd = chain(+1)
    z_bwd, v_bwd = chain(-1)

    # the pixel's own sample (always valid)
    ref_z = jax.vmap(zdepth_of)(world_points, jnp.arange(N))

    zs = jnp.concatenate([ref_z[None], z_fwd, z_bwd], axis=0)  # (K, N, H, W)
    vs = jnp.concatenate(
        [jnp.ones((1, N, H, W), bool), v_fwd, v_bwd], axis=0
    ).astype(depth.dtype)

    if far_flows is not None and far_flows.shape[1] > 0:
        F = far_flows.shape[1]
        # single hop from the integer pixel grid: the mask/flow are read at
        # the pixel itself (the reference's int(x+0.5) rounding is exact on
        # the untracked start location, Processor.cpp:523-535)
        new_loc = pix[None, None] + far_flows  # (N, F, H, W, 2)
        inb = (
            (new_loc[..., 0] >= -0.5)
            & (new_loc[..., 0] < W - 0.5)
            & (new_loc[..., 1] >= -0.5)
            & (new_loc[..., 1] < H - 0.5)
        )
        ok = (far_masks > 0) & inb & far_valid[:, :, None, None]

        tgt_c = jnp.clip(far_tgt, 0, N - 1)  # (N, F)

        def sample_far(fidx, l):
            return geometry.grid_sample(world_points[fidx], l)

        w_pts = jax.vmap(jax.vmap(sample_far))(tgt_c, new_loc)  # (N,F,H,W,3)
        z_far = jax.vmap(zdepth_of, in_axes=(0, 0))(
            w_pts, jnp.arange(N)
        )  # (N, F, H, W)
        zs = jnp.concatenate([zs, z_far.transpose(1, 0, 2, 3)], axis=0)
        vs = jnp.concatenate(
            [vs, ok.transpose(1, 0, 2, 3).astype(depth.dtype)], axis=0
        )

    ratio = jnp.maximum(zs, ref_z[None]) / jnp.maximum(
        jnp.minimum(zs, ref_z[None]), 1e-12
    )
    wgt = jnp.exp(-ratio * 3.0) * vs

    if median:
        order = jnp.argsort(zs, axis=0)
        z_sorted = jnp.take_along_axis(zs, order, axis=0)
        w_sorted = jnp.take_along_axis(wgt, order, axis=0)
        cum = jnp.cumsum(w_sorted, axis=0)
        half = cum[-1] / 2.0
        pick = jnp.argmax(cum >= half[None], axis=0)
        return jnp.take_along_axis(z_sorted, pick[None], axis=0)[0]

    wsum = jnp.sum(wgt, axis=0)
    return jnp.where(wsum > 0, jnp.sum(zs * wgt, axis=0) / jnp.maximum(wsum, 1e-12), 0.0)


def bilateral_filter(
    depth: jnp.ndarray,
    spatial_radius: int = 2,
    frame_radius: int = 0,
    depth_sigma: float = 0.3,
    color: Optional[jnp.ndarray] = None,
    color_sigma: float = 0.0,
    median: bool = False,
) -> jnp.ndarray:
    """Spatio-temporal bilateral depth filter
    (reference Processor.cpp:183-313). depth: (N, H, W)."""
    N, H, W = depth.shape
    taps = []
    weights = []
    inv_2ds2 = 1.0 / (2.0 * depth_sigma * depth_sigma)
    use_color = color is not None and color_sigma > 0
    inv_2cs2 = 1.0 / (2.0 * color_sigma * color_sigma) if use_color else 0.0

    for dt in range(-frame_radius, frame_radius + 1):
        shifted_t = jnp.roll(depth, -dt, axis=0)
        valid_t = jnp.ones((N, 1, 1))
        if dt != 0:
            idx = jnp.arange(N) + dt
            valid_t = ((idx >= 0) & (idx < N)).astype(depth.dtype)[:, None, None]
        for dy in range(-spatial_radius, spatial_radius + 1):
            for dx in range(-spatial_radius, spatial_radius + 1):
                s = jnp.roll(shifted_t, (-dy, -dx), axis=(1, 2))
                w = jnp.exp(-jnp.square(s - depth) * inv_2ds2) * valid_t
                if use_color:
                    c = jnp.roll(jnp.roll(color, -dt, axis=0), (-dy, -dx), axis=(1, 2))
                    cd = jnp.sum(jnp.square(c - color), axis=-1)
                    w = w * jnp.exp(-cd * inv_2cs2)
                # zero out wrapped borders
                ym = jnp.zeros((H,), depth.dtype).at[max(0, -dy) : H - max(0, dy)].set(1.0)
                xm = jnp.zeros((W,), depth.dtype).at[max(0, -dx) : W - max(0, dx)].set(1.0)
                w = w * ym[None, :, None] * xm[None, None, :]
                taps.append(s)
                weights.append(w)

    zs = jnp.stack(taps)
    ws = jnp.stack(weights)
    if median:
        order = jnp.argsort(zs, axis=0)
        z_sorted = jnp.take_along_axis(zs, order, axis=0)
        w_sorted = jnp.take_along_axis(ws, order, axis=0)
        cum = jnp.cumsum(w_sorted, axis=0)
        half = cum[-1] / 2.0
        pick = jnp.argmax(cum >= half[None], axis=0)
        return jnp.take_along_axis(z_sorted, pick[None], axis=0)[0]
    return jnp.sum(zs * ws, axis=0) / jnp.maximum(jnp.sum(ws, axis=0), 1e-12)


def clip_max_depth(depth: jnp.ndarray, max_depth: float = 1000.0) -> jnp.ndarray:
    """(reference Processor.cpp:592-619)."""
    return jnp.minimum(depth, max_depth)
