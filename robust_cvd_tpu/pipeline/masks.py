"""Dynamic-object mask generation.

The reference uses Detectron2 Mask R-CNN (dynamic_mask_generation.py:
person/vehicle/animal classes, conf 0.5, dilate 5 px, INVERTED so white =
static). No pretrained segmentation weights exist in this environment, so
the default generator is geometric **motion segmentation**: pixels whose
optical flow violates the dominant rigid epipolar geometry (RANSAC
fundamental matrix per consecutive pair, Sampson distance threshold) are
dynamic. Mask R-CNN-style semantic masks are consumed from `dynamic_mask/`
when an external producer supplies them.

Output contract matches the reference: `dynamic_mask/frame_%06d.png`,
uint8, WHITE (255) = static, dynamic regions dilated by `dilate` px.
"""

from __future__ import annotations

import os
from os.path import join as pjoin
from typing import Optional

import numpy as np

from ..io.store import VideoStore, frame_name, save_png_gray
from ..ops.epipolar import find_fundamental_ransac, sampson_distance


def motion_segmentation_mask(
    flow: np.ndarray,
    sample_stride: int = 4,
    epipolar_thresh: float = 2.0,
    dynamic_thresh: float = 4.0,
) -> Optional[np.ndarray]:
    """Dynamic mask (bool, True = DYNAMIC) from one dense flow field.

    Model selection between a homography H and a fundamental matrix F fit to
    subsampled correspondences (the rigid background dominates): low-parallax
    scenes are DEGENERATE for F (a 7-dof F can 'explain' almost any motion,
    including independently moving objects), so H is preferred unless F has
    decisively more inliers (an Occam/GRIC-style rule). Pixels far from the
    winning rigid model are dynamic."""
    from ..ops.homography import _apply_h, find_homography_ransac

    h, w = flow.shape[:2]
    ys, xs = np.mgrid[0:h:sample_stride, 0:w:sample_stride]
    p0 = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64)
    p1 = p0 + flow[ys.ravel(), xs.ravel()].astype(np.float64)

    gy, gx = np.mgrid[0:h, 0:w]
    q0 = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float64)
    q1 = q0 + flow.reshape(-1, 2).astype(np.float64)

    H = find_homography_ransac(p0, p1, thresh=epipolar_thresh)
    F = find_fundamental_ransac(p0, p1, thresh=epipolar_thresh)

    def inliers_h():
        d = np.linalg.norm(_apply_h(H[None], p0[None])[0] - p1, axis=-1)
        return (d < epipolar_thresh).sum()

    def inliers_f():
        d = sampson_distance(F[None], p0[None], p1[None])[0]
        return (d < epipolar_thresh).sum()

    use_h = H is not None and (F is None or inliers_h() >= 0.9 * inliers_f())
    if use_h:
        d = np.linalg.norm(_apply_h(H[None], q0[None])[0] - q1, axis=-1)
    elif F is not None:
        d = sampson_distance(F[None], q0[None], q1[None])[0]
    else:
        return None
    return d.reshape(h, w) > dynamic_thresh


def _dilate(mask: np.ndarray, radius: int) -> np.ndarray:
    from scipy import ndimage

    if radius <= 0:
        return mask
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    disk = (xx * xx + yy * yy) <= radius * radius
    return ndimage.binary_dilation(mask, structure=disk)


def compute_dynamic_masks(
    store: VideoStore,
    dilate: int = 5,
    epipolar_thresh: float = 2.0,
    dynamic_thresh: float = 4.0,
) -> bool:
    """Generate `dynamic_mask/` for the whole clip from consecutive flow.

    Idempotent (skips existing frames, like every stage). A frame's mask
    combines the forward and backward consecutive flows when available.
    Returns False when no flow is available to segment from."""
    out_dir = pjoin(store.base_dir, "dynamic_mask")
    n = store.num_frames
    wrote_any = False
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n):
        out = pjoin(out_dir, frame_name(i, ".png"))
        if os.path.exists(out):
            wrote_any = True
            continue
        dyn = None
        for j in (i + 1, i - 1):
            if not (0 <= j < n):
                continue
            try:
                flow = store.load_flow(i, j)
            except FileNotFoundError:
                continue
            m = motion_segmentation_mask(
                flow, epipolar_thresh=epipolar_thresh, dynamic_thresh=dynamic_thresh
            )
            if m is not None:
                dyn = m if dyn is None else (dyn | m)
        if dyn is None:
            dyn = np.zeros(store.load_color_down().shape[1:3], bool)
        dyn = _dilate(dyn, dilate)
        # invert: white = static (reference dynamic_mask_generation.py:156-182)
        save_png_gray(out, (~dyn).astype(np.uint8) * 255)
        wrote_any = True
    return wrote_any


def compute_dynamic_masks_rcnn(
    store: VideoStore, weights_path: str, dilate: int = 5,
    score_thresh: float = 0.5, test_size: int = 800, max_size: int = 1333,
    stats: dict | None = None,
) -> bool:
    """Semantic dynamic masks with the Flax Mask R-CNN
    (reference dynamic_mask_generation.py:107-239: person/vehicle/animal
    union, dilate, invert so white = static). Weights come from a
    detectron2 `mask_rcnn_R_50_FPN` checkpoint pickle.

    Test-time resolution matches the reference's detectron2 config: frames
    come from color_full and are resized so the shortest edge is
    `test_size` (cap `max_size` on the longest — ResizeShortestEdge
    defaults the converted weights were trained with); pasted masks are
    downsampled to the result-tree contract resolution (color_down dims).
    The whole clip runs through ONE jitted program per frame shape."""
    import jax
    import jax.numpy as jnp

    from ..models.mask_rcnn import MaskRCNN, dynamic_mask_from_detections
    from ..models.torch_port import convert_mask_rcnn_r50fpn, load_detectron2_pkl

    import time

    if stats is None:
        stats = {}
    t0 = time.perf_counter()
    sd = load_detectron2_pkl(weights_path)
    params = convert_mask_rcnn_r50fpn(sd)
    net = MaskRCNN()
    stats["load_convert_s"] = time.perf_counter() - t0

    # Commit the weights ONCE. They are jit ARGUMENTS (closure constants
    # would bloat the lowered program past the remote-compile body limit),
    # and a host-numpy argument tree re-uploads ~170 MB on EVERY dispatch
    # (measured 4.3 s/dispatch vs 60 ms compute).
    t0 = time.perf_counter()
    params = jax.device_put(params)
    jax.block_until_ready(params)
    stats["weights_h2d_s"] = time.perf_counter() - t0

    down = store.load_color_down()  # (N, h, w, 3) in [0, 1]
    n, h, w = down.shape[:3]
    try:
        images = store.load_color_full()  # the reference's input resolution
    except (FileNotFoundError, ValueError):
        images = down
    hf, wf = images.shape[1:3]

    # detectron2 ResizeShortestEdge(test_size, max_size)
    scale = test_size / min(hf, wf)
    if scale * max(hf, wf) > max_size:
        scale = max_size / max(hf, wf)
    th, tw = int(round(hf * scale)), int(round(wf * scale))
    ph = -(-th // 32) * 32
    pw = -(-tw // 32) * 32

    def frame_body(variables, img):
        net_in = jax.image.resize(img, (th, tw, 3), "bilinear")
        x = jnp.zeros((1, ph, pw, 3), jnp.float32)
        x = x.at[0, :th, :tw].set(net_in)
        det = net.apply(variables, x)
        m = dynamic_mask_from_detections(det, (ph, pw), score_thresh)[:th, :tw]
        # contract resolution: the result tree stores masks at color_down
        # dims (consumed by the constraint builder's distance transform)
        m_small = jax.image.resize(m.astype(jnp.float32), (h, w), "bilinear")
        return m_small > 0.25

    out_dir = pjoin(store.base_dir, "dynamic_mask")
    os.makedirs(out_dir, exist_ok=True)
    missing = [
        i for i in range(n)
        if not os.path.exists(pjoin(out_dir, frame_name(i, ".png")))
    ]
    wrote_any = len(missing) < n  # frames already on disk count

    from ..parallel import mesh as pmesh

    mesh = pmesh.pipeline_mesh()
    if mesh is not None and len(missing) >= mesh.size:
        # Frame axis sharded over the mesh (the reference parallelizes
        # detectron2 inference across GPUs, dynamic_mask_generation.py
        # launches one worker per GPU); one frame per device per chunk
        # bounds the vmapped activation memory. Clips with fewer missing
        # frames than devices use the single-device loop (pad waste).
        n_dev = mesh.size

        def apply_fn(variables, imgs):
            return jax.vmap(lambda im: frame_body(variables, im))(imgs)

        dp = pmesh.data_parallel_fn(apply_fn, mesh)
        v_rep = pmesh.replicate({"params": params}, mesh)
        b_sh = pmesh.batch_sharded(mesh)
        for s in range(0, len(missing), n_dev):
            t0 = time.perf_counter()
            chunk = missing[s : s + n_dev]
            idx = chunk + [chunk[-1]] * (n_dev - len(chunk))
            x = jax.device_put(jnp.asarray(images[idx]), b_sh)
            dyns = np.asarray(dp(v_rep, x))
            for k, i in enumerate(chunk):
                dyn = _dilate(dyns[k], dilate)
                save_png_gray(
                    pjoin(out_dir, frame_name(i, ".png")),
                    (~dyn).astype(np.uint8) * 255,
                )
                wrote_any = True
            key = "first_dispatch_s" if s == 0 else "steady_infer_s"
            stats[key] = stats.get(key, 0.0) + time.perf_counter() - t0
        return wrote_any

    # Two frames per dispatch: the NMS / ROI fori_loops are serial
    # latency-bound (1000 tiny sequential steps), so vmapping a second
    # frame through the same program is nearly free, and the ~6 ms tunnel
    # dispatch overhead amortizes (measured 43 -> ~31 ms/frame, PERF.md
    # round 4). Larger batches trade against backbone activation memory at
    # 800px.
    FB = 2
    # params as an explicit jit argument (not a closure constant): keeps
    # the ~170 MB weight tree out of the lowered program so the remote
    # compile request stays small and the persistent cache stays hot
    two_frames = jax.jit(
        lambda p, imgs: jax.vmap(lambda im: frame_body({"params": p}, im))(imgs)
    )
    for s in range(0, len(missing), FB):
        t0 = time.perf_counter()
        chunk = missing[s : s + FB]
        idx = chunk + [chunk[-1]] * (FB - len(chunk))
        dyns = np.asarray(two_frames(params, jnp.asarray(images[idx])))
        for k, i in enumerate(chunk):
            dyn = _dilate(dyns[k], dilate)
            save_png_gray(
                pjoin(out_dir, frame_name(i, ".png")),
                (~dyn).astype(np.uint8) * 255,
            )
            wrote_any = True
        # first dispatch pays compile/executable-load + weight H2D; the
        # rest is steady state (PERF.md bench<->CLI reconciliation)
        key = "first_dispatch_s" if s == 0 else "steady_infer_s"
        stats[key] = stats.get(key, 0.0) + time.perf_counter() - t0
    return wrote_any
