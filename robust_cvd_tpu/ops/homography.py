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
    on degenerate matches (reference :151-163)."""
    identity = np.eye(3, dtype=np.float32)
    g1 = rgb_to_gray(img1)
    g2 = rgb_to_gray(img2)
    kps1 = detect_keypoints(g1, max_keypoints)
    kps2 = detect_keypoints(g2, max_keypoints)
    if len(kps1) < 8 or len(kps2) < 8:
        return identity, img2
    d1 = patch_descriptors(g1, kps1)
    d2 = patch_descriptors(g2, kps2)
    matches = match_ratio(d2, d1)  # B -> A
    if len(matches) <= 4:
        return identity, img2
    H_BA = find_homography_ransac(kps2[matches[:, 0]], kps1[matches[:, 1]])
    if H_BA is None or not np.all(np.isfinite(np.linalg.inv(H_BA))):
        return identity, img2
    reg = np.asarray(warp_perspective(jnp.asarray(img2), H_BA))
    return H_BA, reg


def unwarp_flow(flow_reg: np.ndarray, H_BA: np.ndarray) -> np.ndarray:
    """Flow computed against the registered frame2 -> true frame1->frame2
    flow through H_BA^-1 (reference :204-227)."""
    h, w = flow_reg.shape[:2]
    pix = np.asarray(geometry.pixel_grid((h, w)))
    matched = pix + flow_reg
    unwarped = _apply_h(np.linalg.inv(H_BA)[None], matched.reshape(1, -1, 2))[0]
    return (unwarped.reshape(h, w, 2) - pix).astype(np.float32)
