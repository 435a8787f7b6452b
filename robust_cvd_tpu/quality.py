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


# ---------------------------------------------------------------------------
# Dynamic golden scene: static slanted plane + a translating textured
# object, with per-frame dynamic masks — exercises the machinery the static
# scene cannot: dynamic-constraint exclusion, AdaptiveDeformationCost
# weights, scene-flow triplet smoothness, and spatial-warp recovery
# (reference cost families lib/PoseOptimizer.cpp:321-423, 536-656, 874-887).
# ---------------------------------------------------------------------------


class DynamicGoldenScene(NamedTuple):
    images: jnp.ndarray  # (N, H, W, 3)
    depth: jnp.ndarray  # (N, H, W) ground truth (object depth where visible)
    extrinsics: jnp.ndarray  # (N, 3, 4)
    intrinsics: jnp.ndarray  # (N, 4)
    pairs: list
    static_mask: jnp.ndarray  # (N, H, W) bool, True = static (white=static)


def golden_scene_dynamic(
    num_frames: int = 8,
    shape: Tuple[int, int] = (96, 128),
    focal: float = 0.5,
    plane_depth: float = 3.0,
    slant: Tuple[float, float] = (0.15, 0.1),
    baseline: float = 0.08,
    obj_depth: float = 1.8,
    obj_half: Tuple[float, float] = (0.28, 0.22),
    obj_vel: float = 0.12,
) -> DynamicGoldenScene:
    """The `golden_scene` rig plus a fronto-parallel textured square at
    world plane z = -obj_depth whose center translates +x by obj_vel per
    frame (a rigid moving object). The object's texture moves WITH it, the
    background plane is the static scene; static_mask is False exactly on
    object pixels."""
    base = golden_scene(
        num_frames=num_frames, shape=shape, focal=focal,
        plane_depth=plane_depth, slant=slant, baseline=baseline,
    )
    H, W = shape
    pix = geometry.pixel_grid(shape)
    hw, hh = obj_half
    # object center starts left of the camera path's center and crosses it
    cx0 = -0.15
    cy = 0.05

    def render_obj(ext_i, intr_i, fidx):
        pos = ext_i[:, 3]
        rot_i = ext_i[:, :3]
        rays = geometry.pixels_to_rays(pix, intr_i)
        d = jnp.einsum("ab,hwb->hwa", rot_i, rays)
        dz = jnp.where(jnp.abs(d[..., 2]) < 1e-6, -1e-6, d[..., 2])
        t_o = -(pos[2] + obj_depth) / dz
        hit = pos[None, None] + t_o[..., None] * d
        cx = cx0 + fidx * obj_vel
        inside = (
            (jnp.abs(hit[..., 0] - cx) < hw)
            & (jnp.abs(hit[..., 1] - cy) < hh)
            & (t_o > 0.0)
        )
        tex = _texture((hit[..., 0] - cx) * 6.0 + 9.0, hit[..., 1] * 6.0 + 4.0)
        return inside, t_o, tex

    fidx = jnp.arange(num_frames, dtype=jnp.float32)
    inside, t_o, tex = jax.vmap(render_obj)(base.extrinsics, base.intrinsics, fidx)
    # the object occludes the plane where it is closer
    occ = inside & (t_o < base.depth)
    depth = jnp.where(occ, t_o, base.depth)
    images = jnp.where(occ[..., None], tex, base.images)
    return DynamicGoldenScene(
        images=images,
        depth=depth,
        extrinsics=base.extrinsics,
        intrinsics=base.intrinsics,
        pairs=base.pairs,
        static_mask=~occ,
    )


def dynamic_solver_gate(tiny: bool = False, rng_seed: int = 0) -> dict:
    """End-to-end gate for the DYNAMIC solver machinery: a moving textured
    object (dynamic mask -> constraint exclusion + AdaptiveDeformationCost),
    scene-flow triplet smoothness over consecutive frames, and a nonzero
    ground-truth spatial distortion that the deferred bicubic spatial
    optimization must recover (reference lib/PoseOptimizer.cpp:321-423
    SceneFlowSmoothnessLoss, :536-656 AdaptiveDeformationCost, :874-887
    deferredSpatialOpt).

    Corruption: per-frame depth scales + a smooth bilinear NDC warp applied
    to every constraint observation (like lens distortion). The solver runs
    with adaptive deformation, triplet smoothness, and deferred spatial opt;
    scored by photo-consistency over STATIC pixels (gap closed vs the
    ground-truth floor) plus direct spatial-warp recovery.
    """
    from .camera import pose_params_to_camera, quat_to_matrix
    from .config import PoseOptParams
    from .solver import pose_opt, xforms
    from .solver.pose_opt import PoseOptInputs
    from .solver.residuals import ConstraintData, TripletData
    from .solver.xforms import GridSpec

    scene = golden_scene_dynamic(
        num_frames=6 if tiny else 8, shape=(48, 64) if tiny else (96, 128)
    )
    N = int(scene.images.shape[0])
    H, W = scene.depth.shape[1:]
    aspect = W / H
    rng = np.random.default_rng(rng_seed)
    frame_scale = rng.uniform(0.7, 1.4, N).astype(np.float32)
    corrupted = scene.depth * jnp.asarray(1.0 / frame_scale)[:, None, None]
    static = np.asarray(scene.static_mask)

    # ground-truth distortion: PER-FRAME bilinear NDC displacement from 4
    # corner handles (~1 px). Per-frame matters for identifiability: a
    # distortion field SHARED by all frames shifts both endpoints of every
    # pair constraint by nearly the same world offset and cancels in the
    # residuals to first order (it is a near-gauge direction — measured:
    # the solver correctly leaves it alone). Per-frame fields produce
    # first-order pairwise inconsistencies, which is exactly what the
    # reference's per-frame SpatialXforms model (rolling-shutter-like
    # image-space error, lib/DepthMapTransform.h:291-359).
    # unit corner fields; the JOINT gate uses a mild amplitude (the
    # distortion is real first-order noise on every observation there —
    # too strong and no solver could fit it), the dedicated warp-recovery
    # solve below uses a strong one (distortion is its ONLY corruption)
    corners = rng.uniform(-1.0, 1.0, (N, 2, 2, 2)).astype(np.float32)
    JOINT_AMP, WARP_AMP = 0.006, 0.02

    def distort(loc, frames, amp):
        """loc (..., 2) NDC + frame indices broadcastable to loc.shape[:-1]
        -> (loc + amp * w_frame(loc), amp * w_frame(loc)), bilinear in
        (x, y)."""
        u = (loc[..., 0] + 1.0) / 2.0
        v = (1.0 - loc[..., 1]) / 2.0  # NDC y is up; corners row 0 = top
        cf = corners[frames] * amp  # (..., 2, 2, 2)
        w = (
            cf[..., 0, 0, :] * ((1 - u) * (1 - v))[..., None]
            + cf[..., 0, 1, :] * (u * (1 - v))[..., None]
            + cf[..., 1, 0, :] * ((1 - u) * v)[..., None]
            + cf[..., 1, 1, :] * (u * v)[..., None]
        )
        return loc + w, w

    def to_ndc(x, y):
        return np.stack(
            [x / (W - 1) * 2 - 1, -(y / (H - 1) * 2 - 1)], -1
        ).astype(np.float32)

    def sample_static_px(count, frames, margin=2):
        """Pixel coords static (with margin) in every frame of `frames`."""
        ok_mask = np.ones((H, W), bool)
        for f in frames:
            m = static[f]
            # erode by `margin` via min-filter
            for _ in range(margin):
                m = (
                    m[:-2, 1:-1] & m[2:, 1:-1] & m[1:-1, :-2] & m[1:-1, 2:]
                    & m[1:-1, 1:-1]
                )
                m = np.pad(m, 1, constant_values=False)
            ok_mask &= m
        ys, xs = np.nonzero(
            ok_mask[3 : H - 3, 3 : W - 3]
        )
        idx = rng.choice(len(ys), size=count, replace=len(ys) < count)
        return xs[idx] + 3.0, ys[idx] + 3.0

    def gt_project(f_from, f_to, x, y):
        """GT reprojection of pixels (x, y) in f_from into f_to; returns
        (pix_to (C, 2), depth_from (C,), depth_to (C,))."""
        d0 = np.asarray(scene.depth[f_from])[
            np.round(y).astype(int), np.round(x).astype(int)
        ]
        pix = jnp.asarray(np.stack([x, y], -1), jnp.float32)
        pts = geometry.pixels_to_points(
            scene.intrinsics[f_from][None, :], jnp.asarray(d0), pix
        )
        pts_j = geometry.reproject_points(
            pts, scene.extrinsics[f_from][None], scene.extrinsics[f_to][None]
        )
        pix_j = np.asarray(geometry.project(pts_j, scene.intrinsics[f_to][None, :]))
        return pix_j, d0, np.asarray(-pts_j[..., 2])

    # ---- pair constraints (static, distorted observations) ---------------
    pairs = scene.pairs
    pair = np.asarray(pairs, np.int32)
    P, C = len(pairs), 32 if tiny else 64
    loc0 = np.zeros((P, C, 2), np.float32)
    loc1 = np.zeros((P, C, 2), np.float32)
    depth0 = np.zeros((P, C), np.float32)
    depth1 = np.zeros((P, C), np.float32)
    for p, (i, j) in enumerate(pairs):
        xs, ys = sample_static_px(C, (i, j))
        pix_j, d0, d1 = gt_project(i, j, xs, ys)
        loc0[p] = to_ndc(xs, ys)
        loc1[p] = to_ndc(pix_j[:, 0], pix_j[:, 1])
        depth0[p] = d0 / frame_scale[i]
        depth1[p] = d1 / frame_scale[j]
    loc0_d, _ = distort(loc0, pair[:, 0][:, None], JOINT_AMP)
    loc1_d, _ = distort(loc1, pair[:, 1][:, None], JOINT_AMP)
    data = ConstraintData(
        pair=jnp.asarray(pair),
        loc0=jnp.asarray(loc0_d),
        loc1=jnp.asarray(loc1_d),
        depth0=jnp.asarray(depth0),
        depth1=jnp.asarray(depth1),
        weight=jnp.ones((P, C), jnp.float32),
    )

    # ---- triplet constraints (scene-flow smoothness) ----------------------
    centers = list(range(1, N - 1))
    T, Ct = len(centers), 24 if tiny else 48
    tloc = np.zeros((T, Ct, 3, 2), np.float32)
    tdepth = np.zeros((T, Ct, 3), np.float32)
    for t, f in enumerate(centers):
        xs, ys = sample_static_px(Ct, (f - 1, f, f + 1))
        pix_b, d_c, d_b = gt_project(f, f - 1, xs, ys)
        pix_f, _, d_f = gt_project(f, f + 1, xs, ys)
        tloc[t, :, 0] = to_ndc(pix_b[:, 0], pix_b[:, 1])
        tloc[t, :, 1] = to_ndc(xs, ys)
        tloc[t, :, 2] = to_ndc(pix_f[:, 0], pix_f[:, 1])
        tdepth[t, :, 0] = d_b / frame_scale[f - 1]
        tdepth[t, :, 1] = d_c / frame_scale[f]
        tdepth[t, :, 2] = d_f / frame_scale[f + 1]
    cent = np.asarray(centers, np.int32)
    tframes = np.stack([cent - 1, cent, cent + 1], axis=-1)  # (T, 3)
    tloc_d, _ = distort(tloc, tframes[:, None, :], JOINT_AMP)
    triplets = TripletData(
        frame=jnp.asarray(np.asarray(centers, np.int32)),
        loc=jnp.asarray(tloc_d),
        depth=jnp.asarray(tdepth),
        weight=jnp.ones((T, Ct), jnp.float32),
    )

    med = jnp.asarray(
        np.median(np.asarray(corrupted).reshape(N, -1), 1).astype(np.float32)
    )
    inputs = PoseOptInputs(
        data=data,
        median_depth=med,
        aspect=aspect,
        num_frames=N,
        triplets=triplets,
        dynamic_mask=(static * 255).astype(np.uint8),  # white = static
    )
    opt = PoseOptParams(
        num_steps=2 if tiny else 3,
        ctf_long=3 if tiny else 5,
        ctf_short=2 if tiny else 3,
        lm_max_outer=6 if tiny else 12,
        lm_cg_iters=12 if tiny else 24,
        graduate_deformation_regularization=True,
        smooth_static_weight=0.5,
        adaptive_deformation_cost=1.0,
        deferred_spatial_opt=True,
        dso_long=4,
        dso_short=3,
    )
    solved = pose_opt.run(opt, inputs)

    gz, gy, gx = solved.depth_grid.shape[1:]
    scales = jax.vmap(
        lambda g, d: xforms.depth_param_map(
            g, GridSpec(gx=gx, gy=gy, gz=gz), (H, W), d
        )
    )(solved.depth_grid, corrupted)
    corrected = corrupted * scales
    cam = pose_params_to_camera(solved.pose, solved.focal, aspect)
    Rm = jax.vmap(quat_to_matrix)(cam.quaternion)
    ext = jnp.concatenate([Rm, cam.position[:, :, None]], axis=2)
    intr = geometry.intrinsics_px(cam.vfov, cam.hfov, (H, W))

    # eval masks: static in i AND (GT-warped) static in j
    masks = []
    for (i, j) in pairs:
        uv = geometry.warping_field(
            scene.extrinsics[i], scene.intrinsics[i], scene.depth[i],
            scene.extrinsics[j], scene.intrinsics[j],
        )
        sj = geometry.grid_sample(
            jnp.asarray(static[j], jnp.float32)[..., None], uv
        )[..., 0]
        masks.append(jnp.asarray(static[i], jnp.float32) * (sj > 0.99))
    masks = jnp.stack(masks)

    def m(depth, e=None, i=None):
        return float(
            clip_photo_consistency(
                scene.images, depth,
                scene.extrinsics if e is None else e,
                scene.intrinsics if i is None else i,
                scene.pairs, masks=masks,
            ).l1
        )

    gt, bad = m(scene.depth), m(corrupted)
    solved_err = m(corrected, ext, intr)

    # ---- irreducible floor: GT depth + GT poses WITH the JOINT_AMP
    # distortion left in. The solver only ever sees distorted observations;
    # a solution that reproduces them EXACTLY still warps pixel p of frame i
    # to q + w_j(q) - w_i(p) instead of q (the relative distortion is
    # first-order observation noise it cannot remove). Scoring that warp
    # with GT depth/poses gives the achievable floor, so the gap the solver
    # can actually close is (bad - floor), not (bad - gt).
    def floor_pair(i, j):
        uv = geometry.warping_field(
            scene.extrinsics[i], scene.intrinsics[i], scene.depth[i],
            scene.extrinsics[j], scene.intrinsics[j],
        )  # (H, W, 2) pixel coords in frame j
        # NDC of the source pixels (frame i) and of the warped points (j)
        src_ndc = jnp.asarray(pix_ndc_grid)
        uv_ndc = jnp.stack(
            [uv[..., 0] / (W - 1) * 2 - 1, -(uv[..., 1] / (H - 1) * 2 - 1)],
            axis=-1,
        )
        _, w_i = distort(src_ndc, np.full((H, W), i), JOINT_AMP)
        _, w_j = distort(uv_ndc, np.full((H, W), j), JOINT_AMP)
        dw = w_j - w_i  # NDC displacement the fitted warp carries
        duv = jnp.stack(
            [dw[..., 0] * (W - 1) / 2, -dw[..., 1] * (H - 1) / 2], axis=-1
        )
        uv2 = uv + duv
        warped = geometry.grid_sample(scene.images[j], uv2)
        inb = (
            (uv2[..., 0] >= 0.0) & (uv2[..., 0] <= W - 1.0)
            & (uv2[..., 1] >= 0.0) & (uv2[..., 1] <= H - 1.0)
        ).astype(jnp.float32)
        return warped, inb

    pix_ndc_grid = np.stack(
        np.meshgrid(np.linspace(-1, 1, W), np.linspace(1, -1, H)), axis=-1
    ).astype(np.float32)
    floor_terms = []
    for k, (i, j) in enumerate(pairs):
        warped, inb = floor_pair(i, j)
        wgt = inb * masks[k]
        diff = jnp.abs(warped - scene.images[i]).mean(axis=-1)
        floor_terms.append((diff * wgt).sum() / jnp.maximum(wgt.sum(), 1.0))
    floor = float(jnp.stack(floor_terms).mean())

    # ---- dedicated spatial-warp recovery solve ----------------------------
    # In the JOINT solve above, per-frame depth grids can absorb a shared
    # image distortion on a smooth scene (the corrections are
    # observationally near-equivalent), so warp recovery is gated by a
    # separate identifiable solve: ground-truth poses and depths, the
    # distortion is the ONLY corruption, poses/depth transforms FIXED —
    # the deferred bicubic spatial stage must learn ≈ -w (the reference's
    # deferredSpatialOpt solves exactly this sub-problem as its final step,
    # lib/PoseOptimizer.cpp:874-887).
    from .solver.pose_opt import _solve_step  # package-internal harness use
    from .solver.residuals import SolverParams

    depth0_gt = depth0 * frame_scale[pair[:, 0], None]
    depth1_gt = depth1 * frame_scale[pair[:, 1], None]
    loc0_w, _ = distort(loc0, pair[:, 0][:, None], WARP_AMP)
    loc1_w, _ = distort(loc1, pair[:, 1][:, None], WARP_AMP)
    data_w = data._replace(
        loc0=jnp.asarray(loc0_w), loc1=jnp.asarray(loc1_w),
        depth0=jnp.asarray(depth0_gt), depth1=jnp.asarray(depth1_gt)
    )
    med_gt = jnp.asarray(
        np.median(np.asarray(scene.depth).reshape(N, -1), 1).astype(np.float32)
    )
    inputs_w = PoseOptInputs(
        data=data_w, median_depth=med_gt, aspect=aspect, num_frames=N
    )
    pose_gt = np.zeros((N, 6), np.float32)
    pose_gt[:, :3] = np.asarray(scene.extrinsics[:, :, 3])
    dso_rows, dso_cols = (3, 4) if aspect >= 1.0 else (4, 3)
    # solver focal = tan(vfov / 2); intrinsics_px has fy = H/2 / tan(vfov/2)
    vfocal = float(H / 2.0 / np.asarray(scene.intrinsics[0, 1]))
    params_w = SolverParams(
        pose=jnp.asarray(pose_gt),
        focal=jnp.full((N,), vfocal, jnp.float32),
        depth_grid=jnp.ones((N, 1, 1, 1), jnp.float32),
        spatial_grid=xforms.init_spatial_grid(N, dso_rows, dso_cols),
    )
    opt_w = PoseOptParams(
        fix_poses=True,
        fix_depth_transforms=True,
        lm_max_outer=8 if tiny else 15,
        lm_cg_iters=16 if tiny else 32,
    )
    solved_w = _solve_step(
        opt_w, inputs_w, params_w,
        depth_deform_weight=opt_w.deformation_regularization_final,
        spatial_cubic=True,
    )

    pix_ndc = np.stack(
        np.meshgrid(
            np.linspace(-1, 1, W), np.linspace(1, -1, H)
        ),
        axis=-1,
    ).astype(np.float32)
    _, w_gt = distort(
        np.broadcast_to(pix_ndc, (N, H, W, 2)),
        np.arange(N)[:, None, None],
        WARP_AMP,
    )  # (N, H, W, 2)
    warp_maps = np.asarray(
        jax.vmap(
            lambda g: xforms.spatial_warp_map(g, cubic=True, shape=(H, W))
        )(solved_w.spatial_grid)
    )
    # a frame-shared warp component is a gauge direction (cancels in the
    # pairwise residuals), so compare the frame-centered fields
    target = -w_gt
    target_c = target - target.mean(axis=0, keepdims=True)
    solved_c = warp_maps - warp_maps.mean(axis=0, keepdims=True)
    resid = float(np.mean(np.abs(solved_c - target_c)))
    w_mag = float(np.mean(np.abs(target_c)))
    return {
        "photo_consistency_gt_l1_dynamic": round(gt, 6),
        "photo_consistency_corrupted_l1_dynamic": round(bad, 6),
        "photo_consistency_solved_l1_dynamic": round(solved_err, 6),
        "photo_consistency_floor_l1_dynamic": round(floor, 6),
        "quality_gap_closed_dynamic": round(
            float(1.0 - (solved_err - gt) / max(bad - gt, 1e-9)), 4
        ),
        "quality_gap_closed_dynamic_vs_floor": round(
            float(1.0 - max(solved_err - floor, 0.0) / max(bad - floor, 1e-9)),
            4,
        ),
        "spatial_warp_recovery": round(1.0 - resid / max(w_mag, 1e-9), 4),
    }


def contaminated_constraint_gate(tiny: bool = False, rng_seed: int = 0) -> dict:
    """End-to-end gate for DYNAMIC-CONSTRAINT EXCLUSION: constraints are
    deliberately sampled ON the moving object (tracking its texture, the way
    real optical flow would), then fed through the production exclusion path
    — `set_static_flags` from dynamic-mask distance transforms +
    `prune_static_flag` contamination stamping + zero-weighting in
    `flatten_pairs` (reference lib/FlowConstraints.cpp:573-748,
    PoseOptimizer.cpp:1177-1193) — and the same solve runs once more with
    exclusion OFF. A camera-pose model cannot explain object motion, so the
    OFF solve must close meaningfully less of the photo-consistency gap than
    the ON solve; the ON solve must stay close to the uncontaminated gate.
    """
    from .camera import pose_params_to_camera, quat_to_matrix
    from .config import PoseOptParams
    from .solver import constraints as C
    from .solver import pose_opt, xforms
    from .solver.pose_opt import PoseOptInputs
    from .solver.xforms import GridSpec

    scene = golden_scene_dynamic(
        num_frames=6 if tiny else 8, shape=(48, 64) if tiny else (96, 128)
    )
    N = int(scene.images.shape[0])
    H, W = scene.depth.shape[1:]
    aspect = W / H
    inv_aspect = H / W
    obj_vel = 0.12  # golden_scene_dynamic default, world units / frame
    rng = np.random.default_rng(rng_seed)
    frame_scale = rng.uniform(0.7, 1.4, N).astype(np.float32)
    corrupted_np = np.asarray(
        scene.depth * jnp.asarray(1.0 / frame_scale)[:, None, None]
    )
    static = np.asarray(scene.static_mask)
    ext_np = np.asarray(scene.extrinsics)
    intr_np = np.asarray(scene.intrinsics)
    depth_np = np.asarray(scene.depth)

    def project(f_to, pts_w):
        """World points -> (pixels (C, 2), cam depth (C,)) in frame f_to
        (rotations are identity in this rig)."""
        cam = pts_w - ext_np[f_to][:, 3]
        pts = jnp.asarray(cam, jnp.float32)
        pix = np.asarray(
            geometry.project(pts, scene.intrinsics[f_to][None, :])
        )
        return pix, -cam[:, 2]

    def hit_points(f, xs, ys):
        """World hit points + depth for pixels (xs, ys) of frame f using
        the rendered (GT) depth — on the object this is the object hit."""
        d = depth_np[f, np.round(ys).astype(int), np.round(xs).astype(int)]
        pix = jnp.asarray(np.stack([xs, ys], -1), jnp.float32)
        pts = geometry.pixels_to_points(
            scene.intrinsics[f][None, :], jnp.asarray(d), pix
        )
        # camera -> world (identity rotation)
        return np.asarray(pts) + ext_np[f][:, 3], d

    def sample_px(f, count, on_object):
        mask = ~static[f] if on_object else static[f]
        ys, xs = np.nonzero(mask[3 : H - 3, 3 : W - 3])
        if len(ys) == 0:
            return np.zeros(0), np.zeros(0)
        idx = rng.choice(len(ys), size=count, replace=len(ys) < count)
        return (xs[idx] + 3).astype(np.float64), (ys[idx] + 3).astype(np.float64)

    # ---- build PairConstraints with a contaminated fraction ---------------
    C_per = 32 if tiny else 64
    n_dyn = C_per // 4  # 25% of samples track the moving object
    pair_keys = list(scene.pairs)
    pair_dict = {}
    for (i, j) in pair_keys:
        # static samples: GT reprojection of background pixels
        xs, ys = sample_px(i, C_per - n_dyn, on_object=False)
        pts_w, _d0 = hit_points(i, xs, ys)
        pix_j, _dj = project(j, pts_w)
        # dynamic samples: the observed flow TRACKS the object's texture
        xo, yo = sample_px(i, n_dyn, on_object=True)
        pts_o, _do = hit_points(i, xo, yo)
        pts_o_moved = pts_o + np.array([obj_vel * (j - i), 0.0, 0.0])
        pix_oj, _doj = project(j, pts_o_moved)
        loc0_px = np.concatenate(
            [np.stack([xs, ys], -1), np.stack([xo, yo], -1)]
        )
        loc1_px = np.concatenate([pix_j, pix_oj])
        ok = (
            (loc1_px[:, 0] >= 0) & (loc1_px[:, 0] <= W - 1)
            & (loc1_px[:, 1] >= 0) & (loc1_px[:, 1] <= H - 1)
        )
        # normalized [0,1]x[0,inv_aspect]: both coords divided by W
        pair_dict[(i, j)] = C.PairConstraints(
            loc0=(loc0_px[ok] / W).astype(np.float32),
            loc1=(loc1_px[ok] / W).astype(np.float32),
            is_static=np.ones(int(ok.sum()), bool),
        )

    med = jnp.asarray(
        np.median(corrupted_np.reshape(N, -1), 1).astype(np.float32)
    )
    opt = PoseOptParams(
        num_steps=2 if tiny else 3,
        ctf_long=3 if tiny else 5,
        ctf_short=2 if tiny else 3,
        lm_max_outer=6 if tiny else 12,
        lm_cg_iters=12 if tiny else 24,
        graduate_deformation_regularization=True,
    )

    # eval masks: static in i AND (GT-warped) static in j — same scoring as
    # dynamic_solver_gate
    masks = []
    for (i, j) in pair_keys:
        uv = geometry.warping_field(
            scene.extrinsics[i], scene.intrinsics[i], scene.depth[i],
            scene.extrinsics[j], scene.intrinsics[j],
        )
        sj = geometry.grid_sample(
            jnp.asarray(static[j], jnp.float32)[..., None], uv
        )[..., 0]
        masks.append(jnp.asarray(static[i], jnp.float32) * (sj > 0.99))
    masks = jnp.stack(masks)

    def score(depth, e=None, i=None):
        return float(
            clip_photo_consistency(
                scene.images, depth,
                scene.extrinsics if e is None else e,
                scene.intrinsics if i is None else i,
                pair_keys, masks=masks,
            ).l1
        )

    def solve(exclude: bool) -> float:
        pd = {
            k: C.PairConstraints(
                loc0=pc.loc0.copy(), loc1=pc.loc1.copy(),
                is_static=pc.is_static.copy(),
            )
            for k, pc in pair_dict.items()
        }
        if exclude:
            dyn_dist = np.stack(
                [
                    C.dynamic_distance((static[f] * 255).astype(np.uint8),
                                       (H, W))
                    for f in range(N)
                ]
            )
            C.set_static_flags(pair_keys, pd, [], {}, dyn_dist,
                               min_dynamic_distance=4.0)
            C.prune_static_flag(N, pair_keys, pd, [], {}, (H, W), distance=4)
        data = C.flatten_pairs(pair_keys, pd, corrupted_np, inv_aspect)
        inputs = PoseOptInputs(
            data=data, median_depth=med, aspect=aspect, num_frames=N,
        )
        solved = pose_opt.run(opt, inputs)
        gz, gy, gx = solved.depth_grid.shape[1:]
        scales = jax.vmap(
            lambda g, d: xforms.depth_param_map(
                g, GridSpec(gx=gx, gy=gy, gz=gz), (H, W), d
            )
        )(solved.depth_grid, jnp.asarray(corrupted_np))
        cam = pose_params_to_camera(solved.pose, solved.focal, aspect)
        Rm = jax.vmap(quat_to_matrix)(cam.quaternion)
        ext = jnp.concatenate([Rm, cam.position[:, :, None]], axis=2)
        intr = geometry.intrinsics_px(cam.vfov, cam.hfov, (H, W))
        return score(jnp.asarray(corrupted_np) * scales, ext, intr)

    gt, bad = score(scene.depth), score(jnp.asarray(corrupted_np))
    err_on = solve(exclude=True)
    err_off = solve(exclude=False)
    gap = max(bad - gt, 1e-9)
    return {
        "quality_gap_closed_contaminated": round(
            float(1.0 - (err_on - gt) / gap), 4
        ),
        "quality_gap_closed_contaminated_no_exclusion": round(
            float(1.0 - (err_off - gt) / gap), 4
        ),
    }
