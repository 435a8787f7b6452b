"""Homography pre-registration for optical flow.

Functional equivalent of the reference's SURF + BruteForce-KNN + Lowe ratio
+ RANSAC findHomography pre-alignment (reference
optical_flow_homography.py:67-173): large camera rotations are factored out
by a global homography so RAFT only has to explain the residual motion;
the computed flow is un-warped through H^-1 afterwards (reference
:204-227).

cv2.xfeatures2d is unavailable here; keypoints come from the same
min-eigenvalue corner detector the constraint builder uses, descriptors are
normalized image patches (matching runs as one MXU matmul), and the
homography is a vectorized DLT-RANSAC.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .. import native
from ..solver.constraints import corner_min_eigenval, rgb_to_gray
from . import geometry

_HI = jax.lax.Precision.HIGHEST


def detect_keypoints(
    gray: np.ndarray, max_keypoints: int = 1024, separation: int = 8
) -> np.ndarray:
    """Corner keypoints, strongest-first with disk separation -> (K, 2) xy."""
    resp = np.array(corner_min_eigenval(jnp.asarray(gray[None])))[0]
    h, w = gray.shape
    border = 8
    resp[:border] = resp[-border:] = 0
    resp[:, :border] = resp[:, -border:] = 0
    ys, xs = np.nonzero(resp > 0)
    order = np.argsort(-resp[ys, xs], kind="stable")
    xs, ys = xs[order], ys[order]
    keep = native.greedy_sample(xs, ys, w, h, separation)
    xs, ys = xs[keep][:max_keypoints], ys[keep][:max_keypoints]
    return np.stack([xs, ys], axis=-1).astype(np.float32)


def patch_descriptors(gray: np.ndarray, kps: np.ndarray, radius: int = 7) -> np.ndarray:
    """Zero-mean, unit-norm grayscale patches -> (K, (2r+1)^2)."""
    h, w = gray.shape
    size = 2 * radius + 1
    pad = np.pad(gray, radius, mode="edge")
    out = np.empty((len(kps), size * size), np.float32)
    for k, (x, y) in enumerate(kps.astype(int)):
        patch = pad[y : y + size, x : x + size].reshape(-1)
        patch = patch - patch.mean()
        n = np.linalg.norm(patch)
        out[k] = patch / n if n > 1e-8 else patch
    return out


def match_ratio(descA: np.ndarray, descB: np.ndarray, ratio: float = 0.75):
    """Brute-force nearest neighbors with Lowe's ratio test (reference
    :80-92). Unit-norm descriptors: L2 distance ordering == dot ordering."""
    if len(descA) < 2 or len(descB) < 2:
        return np.zeros((0, 2), np.int32)
    sim = descA @ descB.T  # (KA, KB)
    # two largest similarities per row
    idx1 = np.argmax(sim, axis=1)
    s1 = sim[np.arange(len(descA)), idx1]
    sim[np.arange(len(descA)), idx1] = -np.inf
    s2 = np.max(sim, axis=1)
    d1 = np.sqrt(np.maximum(2.0 - 2.0 * s1, 0.0))
    d2 = np.sqrt(np.maximum(2.0 - 2.0 * s2, 0.0))
    good = d1 < ratio * d2
    return np.stack([np.nonzero(good)[0], idx1[good]], axis=-1).astype(np.int32)


def _dlt(ptsA: np.ndarray, ptsB: np.ndarray) -> np.ndarray:
    """Direct linear transform: H mapping A -> B from >= 4 correspondences.
    Batched over a leading hypothesis axis: (..., 4+, 2) -> (..., 3, 3)."""
    x, y = ptsA[..., 0], ptsA[..., 1]
    u, v = ptsB[..., 0], ptsB[..., 1]
    zeros = np.zeros_like(x)
    ones = np.ones_like(x)
    rows1 = np.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y, -u], -1)
    rows2 = np.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y, -v], -1)
    A = np.concatenate([rows1, rows2], axis=-2)  # (..., 2n, 9)
    _, _, vt = np.linalg.svd(A)
    h = vt[..., -1, :]
    H = h.reshape(h.shape[:-1] + (3, 3))
    return H / np.where(np.abs(H[..., 2:3, 2:3]) > 1e-12, H[..., 2:3, 2:3], 1.0)


def _apply_h(H: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """(..., 3, 3) x (..., K, 2) -> (..., K, 2)."""
    ones = np.ones(pts.shape[:-1] + (1,), pts.dtype)
    ph = np.concatenate([pts, ones], axis=-1)
    out = np.einsum("...ij,...kj->...ki", H, ph)
    return out[..., :2] / np.where(np.abs(out[..., 2:]) > 1e-12, out[..., 2:], 1e-12)


def find_homography_ransac(
    ptsA: np.ndarray,
    ptsB: np.ndarray,
    thresh: float = 4.0,
    iters: int = 256,
    seed: int = 0,
) -> Optional[np.ndarray]:
    """Vectorized RANSAC homography A -> B (all hypotheses evaluated as one
    batched SVD + one batched reprojection — reference cv2.findHomography)."""
    n = len(ptsA)
    if n < 4:
        return None
    rng = np.random.default_rng(seed)
    sel = rng.integers(0, n, (iters, 4))
    Hs = _dlt(ptsA[sel], ptsB[sel])  # (S, 3, 3)
    proj = _apply_h(Hs, np.broadcast_to(ptsA, (iters, n, 2)))
    err = np.linalg.norm(proj - ptsB[None], axis=-1)
    inliers = err < thresh
    counts = inliers.sum(axis=1)
    best = int(np.argmax(counts))
    if counts[best] < 4:
        return None
    # refit on the best hypothesis' inliers
    mask = inliers[best]
    H = _dlt(ptsA[mask], ptsB[mask])
    if not np.all(np.isfinite(H)):
        return None
    return H.astype(np.float32)


def warp_perspective(image: jnp.ndarray, H: np.ndarray, out_hw=None) -> jnp.ndarray:
    """Inverse-warp `image` (H, W, C) by homography H (maps src -> dst):
    dst(p) = src(H^-1 p) — cv2.warpPerspective semantics."""
    h, w = out_hw or image.shape[:2]
    Hinv = np.linalg.inv(H)
    pix = np.asarray(geometry.pixel_grid((h, w)))  # (h, w, 2)
    src = _apply_h(Hinv[None], pix.reshape(1, -1, 2))[0].reshape(h, w, 2)
    return geometry.grid_sample(image, jnp.asarray(src))


def register_pair(
    img1: np.ndarray, img2: np.ndarray, max_keypoints: int = 1024
) -> Tuple[np.ndarray, np.ndarray]:
    """Compute H_BA (frame2 -> frame1 coords) and frame2 registered into
    frame1's frame (reference getimage, :139-173). Falls back to identity
    on degenerate matches (reference :151-163).

    Thin single-pair wrapper over the batched TPU path."""
    Hs, regs = register_pairs(img1[None], img2[None])
    return np.asarray(Hs[0]), np.asarray(regs[0])


# ---------------------------------------------------------------------------
# Batched TPU registration: detection (NMS + top-k), patch descriptors
# (vectorized gather), matching (one MXU matmul), DLT-RANSAC (batched
# 9x9 eigendecompositions) — ONE jitted program for a whole pair chunk.
# The host pipeline above (greedy corner sampling + numpy RANSAC) costs
# ~750 ms/pair on this 1-core host; the batched program amortizes to
# milliseconds/pair on the TPU.
# ---------------------------------------------------------------------------

_PATCH_RADIUS = 7
_RANSAC_ITERS = 256
_RANSAC_THRESH = 4.0
_LOWE_RATIO = 0.75


def _nms_topk(resp: jnp.ndarray, k: int, border: int = 8):
    """(B, H, W) corner response -> strongest-first keypoints after 3x3
    non-max suppression. Returns xs, ys (B, K) float32 and valid (B, K)."""
    B, H, W = resp.shape
    pooled = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
    )
    resp = jnp.where(resp >= pooled, resp, 0.0)
    ys_i = jnp.arange(H)[None, :, None]
    xs_i = jnp.arange(W)[None, None, :]
    inb = (
        (ys_i >= border) & (ys_i < H - border)
        & (xs_i >= border) & (xs_i < W - border)
    )
    resp = jnp.where(inb, resp, 0.0)
    vals, idx = jax.lax.top_k(resp.reshape(B, -1), k)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    return xs, ys, vals > 1e-8


def _extract_patches_onehot(pad: jnp.ndarray, xi: jnp.ndarray,
                            yi: jnp.ndarray, size: int) -> jnp.ndarray:
    """Window extraction as two one-hot contractions (B, Hp, Wp) +
    top-left integer corners (B, K) -> (B, K, size*size). Selectors are
    exact {0,1}; bf16 rounds only the image values, f32-accumulated."""
    B, Hp, Wp = pad.shape
    K = xi.shape[1]
    offs = jnp.arange(size, dtype=jnp.int32)
    rows = (yi[:, :, None] + offs[None, None, :]).reshape(B, K * size)
    R = (
        rows[..., None] == jnp.arange(Hp, dtype=jnp.int32)
    ).astype(jnp.bfloat16)
    T = jnp.einsum(
        "bkh,bhw->bkw", R, pad.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(B, K, size, Wp)
    cols = xi[:, :, None] + offs[None, None, :]  # (B, K, size)
    C = (
        cols[..., None] == jnp.arange(Wp, dtype=jnp.int32)
    ).astype(jnp.bfloat16)
    return jnp.einsum(
        "bkiw,bkjw->bkij", T.astype(jnp.bfloat16), C,
        preferred_element_type=jnp.float32,
    ).reshape(B, K, size * size)


def _patch_descriptors_b(gray: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray):
    """(B, H, W) + keypoints (B, K) -> unit-norm patch descriptors
    (B, K, (2r+1)^2).

    On TPU the 15x15 windows are extracted as two one-hot contractions
    (row-selector matmul, then per-keypoint column contraction) instead of
    (2r+1)^2 scalar gathers per keypoint — the same gather-vs-MXU trade as
    grid_sample_mxu (PERF.md round 4: TPU per-element gathers run
    ~0.3 G taps/s). One-hot selectors are exact {0,1}; bf16 rounds only the
    image values (~2^-8 relative), which the zero-mean unit-norm
    normalization makes irrelevant to match ordering. CPU keeps the exact
    gather path."""
    r = _PATCH_RADIUS
    size = 2 * r + 1
    pad = jnp.pad(gray, ((0, 0), (r, r), (r, r)), mode="edge")
    yi = ys.astype(jnp.int32)  # top-left row in padded coords (+r-r cancels)
    xi = xs.astype(jnp.int32)

    if jax.default_backend() in ("tpu", "axon"):
        patches = _extract_patches_onehot(pad, xi, yi, size)
    else:
        dy, dx = jnp.meshgrid(jnp.arange(size), jnp.arange(size), indexing="ij")
        offs_y = dy.reshape(-1)[None, None, :]  # (1, 1, P)
        offs_x = dx.reshape(-1)[None, None, :]
        yy = yi[:, :, None] + offs_y  # (B, K, P)
        xx = xi[:, :, None] + offs_x

        def gather(g, y, x):
            return g[y, x]

        patches = jax.vmap(gather)(pad, yy, xx)  # (B, K, P)

    patches = patches - patches.mean(axis=-1, keepdims=True)
    n = jnp.linalg.norm(patches, axis=-1, keepdims=True)
    return patches / jnp.maximum(n, 1e-8)


def _norm_pts(pts: jnp.ndarray, w: jnp.ndarray):
    """Hartley normalization: weighted shift to centroid + scale to RMS
    sqrt(2). pts (..., K, 2), w (..., K) -> (normalized pts, T (..., 3, 3))."""
    wsum = jnp.maximum(w.sum(-1, keepdims=True), 1e-6)
    mean = (pts * w[..., None]).sum(-2, keepdims=True) / wsum[..., None]
    centered = pts - mean
    rms = jnp.sqrt(
        ((centered**2).sum(-1) * w).sum(-1, keepdims=True) / wsum
    )
    s = jnp.sqrt(2.0) / jnp.maximum(rms, 1e-6)  # (..., 1)
    pn = centered * s[..., None]
    z = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.concatenate([s, z, -s * mean[..., 0, 0:1]], -1),
            jnp.concatenate([z, s, -s * mean[..., 0, 1:2]], -1),
            jnp.concatenate([z, z, one], -1),
        ],
        axis=-2,
    )
    return pn, T


def _dlt_weighted(ptsA: jnp.ndarray, ptsB: jnp.ndarray, w: jnp.ndarray):
    """Weighted DLT via the smallest eigenvector of AᵀA (9x9 eigh — TPU
    friendly), with Hartley-normalized coordinates for f32 stability.
    ptsA/ptsB (..., K, 2), w (..., K) -> H (..., 3, 3) mapping A -> B."""
    pa, Ta = _norm_pts(ptsA, w)
    pb, Tb = _norm_pts(ptsB, w)
    x, y = pa[..., 0], pa[..., 1]
    u, v = pb[..., 0], pb[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    r1 = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y, -v], -1)
    A = jnp.concatenate([r1, r2], axis=-2) * jnp.concatenate(
        [w, w], axis=-1
    )[..., None]
    M = jnp.einsum("...ki,...kj->...ij", A, A, precision=_HI)
    _, vecs = jnp.linalg.eigh(M)
    h = vecs[..., :, 0]  # smallest eigenvalue's eigenvector
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    # denormalize: H = Tb^-1 Hn Ta
    H = jnp.linalg.solve(Tb, Hn @ Ta)
    scale = H[..., 2:3, 2:3]
    return H / jnp.where(jnp.abs(scale) > 1e-12, scale, 1.0)


def _dlt4(ptsA: jnp.ndarray, ptsB: jnp.ndarray) -> jnp.ndarray:
    """Exact 4-point homography via an 8x8 linear solve with h33 = 1
    (Hartley-normalized for f32 conditioning). 6x cheaper than the 9x9
    eigendecomposition — for RANSAC *hypotheses* the h33=0 degeneracy is
    irrelevant: a near-singular system yields a garbage H that simply
    scores zero inliers. ptsA/ptsB (..., 4, 2) -> H (..., 3, 3) A -> B."""
    w = jnp.ones(ptsA.shape[:-1], ptsA.dtype)
    pa, Ta = _norm_pts(ptsA, w)
    pb, Tb = _norm_pts(ptsB, w)
    x, y = pa[..., 0], pa[..., 1]
    u, v = pb[..., 0], pb[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    r1 = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y, -v], -1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 8, 9)
    h8 = jnp.linalg.solve(A[..., :8], -A[..., 8:9])[..., 0]  # A8 h8 = -a9
    h = jnp.concatenate([h8, jnp.ones(h8.shape[:-1] + (1,), h8.dtype)], -1)
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.solve(Tb, Hn @ Ta)
    scale = H[..., 2:3, 2:3]
    return H / jnp.where(jnp.abs(scale) > 1e-12, scale, 1.0)


def _apply_h_j(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    ph = jnp.concatenate([pts, ones], axis=-1)
    out = jnp.einsum("...ij,...kj->...ki", H, ph, precision=_HI)
    z = out[..., 2:]
    return out[..., :2] / jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)


def _register_batch(im1: jnp.ndarray, im2: jnp.ndarray, sel: jnp.ndarray,
                    max_keypoints: int):
    """(B, H, W, 3) x2 + hypothesis index table (S, 4) ->
    (H_BA (B, 3, 3), registered im2 (B, H, W, 3))."""
    B, H, W, _ = im1.shape
    g1 = (
        0.299 * im1[..., 0] + 0.587 * im1[..., 1] + 0.114 * im1[..., 2]
    )
    g2 = (
        0.299 * im2[..., 0] + 0.587 * im2[..., 1] + 0.114 * im2[..., 2]
    )
    resp1 = corner_min_eigenval(g1)
    resp2 = corner_min_eigenval(g2)
    x1, y1, v1 = _nms_topk(resp1, max_keypoints)
    x2, y2, v2 = _nms_topk(resp2, max_keypoints)
    d1 = _patch_descriptors_b(g1, x1, y1)
    d2 = _patch_descriptors_b(g2, x2, y2)

    # Lowe-ratio matching B (frame2) -> A (frame1): one MXU matmul.
    # bf16 inputs / f32 accumulation: descriptors are unit-norm so the
    # ~3e-3 rounding only perturbs matches already sitting on the Lowe
    # ratio boundary — noise RANSAC absorbs; f32 here is 6x MXU cost.
    # (Unlike ops/geometry.py's backward this is NOT backend-gated: the
    # mixed bf16->f32 dot works on the CPU backend used by the tests —
    # tests/test_pipeline.py::test_flow_stage_mesh_matches_single_device
    # drives register_pairs on the virtual CPU mesh.)
    sim = jnp.einsum(
        "bkd,bld->bkl",
        d2.astype(jnp.bfloat16),
        d1.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (B, K2, K1)
    sim = jnp.where(v1[:, None, :], sim, -jnp.inf)
    top2, idx2 = jax.lax.top_k(sim, 2)
    best = idx2[..., 0]  # (B, K)
    dd1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * top2[..., 0], 0.0))
    dd2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * top2[..., 1], 0.0))
    good = (dd1 < _LOWE_RATIO * dd2) & v2
    w = good.astype(jnp.float32)  # (B, K)

    ptsA = jnp.stack([x2, y2], -1)  # frame2 keypoints (B, K, 2)
    ptsB = jnp.take_along_axis(
        jnp.stack([x1, y1], -1), best[..., None], axis=1
    )  # matched frame1 points

    # RANSAC: S fixed hypothesis quadruples, all solved at once
    selA = ptsA[:, sel]  # (B, S, 4, 2)
    selB = ptsB[:, sel]
    selw = w[:, sel]  # (B, S, 4)
    hyp_ok = jnp.all(selw > 0, axis=-1)  # (B, S)
    Hs = _dlt4(selA, selB)  # (B, S, 3, 3)
    proj = _apply_h_j(Hs, ptsA[:, None])  # (B, S, K, 2)
    err = jnp.linalg.norm(proj - ptsB[:, None], axis=-1)
    inl = (err < _RANSAC_THRESH) & (w[:, None] > 0)  # (B, S, K)
    counts = jnp.where(hyp_ok, inl.sum(-1), -1)
    best_hyp = jnp.argmax(counts, axis=1)  # (B,)
    best_inl = jnp.take_along_axis(
        inl, best_hyp[:, None, None], axis=1
    )[:, 0].astype(jnp.float32)  # (B, K)

    # weighted refit on the winning inlier set
    H_fit = _dlt_weighted(ptsA, ptsB, best_inl)
    n_inl = best_inl.sum(-1)
    ok = (n_inl >= 8) & jnp.all(jnp.isfinite(H_fit), axis=(-2, -1))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    H_BA = jnp.where(ok[:, None, None], H_fit, eye)

    # inverse-warp im2 through H_BA (cv2.warpPerspective semantics). The
    # registered frame feeds the (bf16) RAFT net, so the backend-gated
    # MXU sampling's ~2^-8 value rounding is immaterial — and the gather
    # was 4.4 of the 12 ms/pair program (PERF.md round 4).
    Hinv = jnp.linalg.inv(H_BA)
    pix = geometry.pixel_grid((H, W)).reshape(-1, 2)
    src = _apply_h_j(Hinv[:, None], pix[None, None])[:, 0].reshape(B, H, W, 2)
    reg = jax.vmap(geometry.grid_sample_auto)(im2, src)
    return H_BA, reg


_register_jit = jax.jit(_register_batch, static_argnums=(3,))


def _hypothesis_table(max_keypoints: int, seed: int = 0) -> np.ndarray:
    """4 distinct indices per hypothesis, drawn from the strongest-first
    keypoint prefix (keypoints are top-k ordered, so low indices are the
    most reliable; sampling the full range would make most hypotheses hit
    invalid slots on lightly-textured frames)."""
    rng = np.random.default_rng(seed)
    pool = min(max_keypoints, 96)
    order = np.argsort(rng.random((_RANSAC_ITERS, pool)), axis=1)
    return order[:, :4].astype(np.int32)


def register_pairs(
    im1: np.ndarray, im2: np.ndarray, max_keypoints: int = 1024
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched pre-registration: frames2 -> frames1 homographies + the
    registered frames, as one fused TPU program. (B, H, W, 3) each."""
    sel = jnp.asarray(_hypothesis_table(max_keypoints))
    return _register_jit(
        jnp.asarray(im1, jnp.float32), jnp.asarray(im2, jnp.float32), sel,
        max_keypoints,
    )


def unwarp_flow(flow_reg: np.ndarray, H_BA: np.ndarray) -> np.ndarray:
    """Flow computed against the registered frame2 -> true frame1->frame2
    flow through H_BA^-1 (reference :204-227)."""
    h, w = flow_reg.shape[:2]
    pix = np.asarray(geometry.pixel_grid((h, w)))
    matched = pix + flow_reg
    unwarped = _apply_h(np.linalg.inv(H_BA)[None], matched.reshape(1, -1, 2))[0]
    return (unwarped.reshape(h, w, 2) - pix).astype(np.float32)
