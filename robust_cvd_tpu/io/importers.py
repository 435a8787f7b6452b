"""Importers: ground-truth poses, COLMAP reconstructions, track CSVs.

Functional equivalents of reference lib/Importer.cpp (importPoses:439-478,
importColmapRecon:290-389, importTracks:480-533, loadScale:240-288). The
reference imports into the C++ DepthVideo; here importers return plain
arrays/CameraState that plug into the tensorized pipeline.
"""

from __future__ import annotations

import csv
import os
from os.path import join as pjoin
from typing import List, Optional, Tuple

import numpy as np

from ..camera import CameraState


def import_poses(path, num_frames: int) -> Tuple[CameraState, np.ndarray]:
    """`poses.txt`: count, then per frame
    `x y z qx qy qz qw hFov vFov` whitespace-separated
    (reference Importer.cpp:439-478). Returns (CameraState, enabled (N,))."""
    import jax.numpy as jnp

    with open(path) as f:
        tokens = f.read().split()
    n = int(tokens[0])
    if n > num_frames:
        raise ValueError("poses file has more frames than the video")
    vals = np.asarray(tokens[1 : 1 + 9 * n], np.float32).reshape(n, 9)

    position = np.zeros((num_frames, 3), np.float32)
    quat = np.tile(np.asarray([0, 0, 0, 1], np.float32), (num_frames, 1))
    hfov = np.zeros(num_frames, np.float32)
    vfov = np.zeros(num_frames, np.float32)
    enabled = np.zeros(num_frames, bool)
    position[:n] = vals[:, 0:3]
    quat[:n] = vals[:, 3:7]
    hfov[:n] = vals[:, 7]
    vfov[:n] = vals[:, 8]
    enabled[:n] = True
    cam = CameraState(
        position=jnp.asarray(position),
        quaternion=jnp.asarray(quat),
        vfov=jnp.asarray(vfov),
        hfov=jnp.asarray(hfov),
    )
    return cam, enabled


def load_scale(base_dir: str) -> float:
    """Mean column-1 value of `scales.csv` (reference Importer.cpp:240-288)."""
    path = pjoin(base_dir, "scales.csv")
    if not os.path.exists(path):
        return 1.0
    vals = []
    with open(path) as f:
        for row in csv.reader(f):
            if len(row) >= 2:
                try:
                    vals.append(float(row[1]))
                except ValueError:
                    continue
    return float(np.mean(vals)) if vals else 1.0


def import_colmap_recon(
    base_dir: str,
    colmap_file: str,
    depth_dir: str,
    num_frames: int,
) -> Tuple[CameraState, np.ndarray]:
    """COLMAP `metadata.npz` with `extrinsics` (M, 3, 4) world-to-camera f64
    row-major and `intrinsics` (M, 4) f64, frame indices inferred from the
    depth files present (reference Importer.cpp:290-389). Camera positions
    are scaled by `scales.csv`'s mean scale. Returns (CameraState,
    enabled (N,)) with non-reconstructed frames disabled."""
    import jax
    import jax.numpy as jnp

    from ..camera import matrix_to_quat

    frame_indices = sorted(
        int(name[6:12])
        for name in os.listdir(depth_dir)
        if name.startswith("frame_") and len(name) >= 12
    )
    scale = load_scale(base_dir)

    meta = np.load(colmap_file)
    extr = np.asarray(meta["extrinsics"], np.float64)  # (M, 3, 4) [R|t] w2c
    intr = np.asarray(meta["intrinsics"], np.float64)  # (M, 4) fx fy cx cy px
    if extr.shape[0] != len(frame_indices):
        raise ValueError("metadata.npz frame count != depth files present")

    position = np.zeros((num_frames, 3), np.float32)
    quat = np.tile(np.asarray([0, 0, 0, 1], np.float32), (num_frames, 1))
    vfov = np.full(num_frames, 0.7, np.float32)
    hfov = np.full(num_frames, 0.7, np.float32)
    enabled = np.zeros(num_frames, bool)

    for k, idx in enumerate(frame_indices):
        R = extr[k, :, :3]
        t = extr[k, :, 3]
        # world-to-camera -> camera-to-world
        c2w_R = R.T
        pos = -R.T @ t
        # COLMAP convention: camera looks down +Z with y down; ours is -Z,
        # y up — flip the Y and Z axes of the rotation.
        flip = np.diag([1.0, -1.0, -1.0])
        c2w_R = c2w_R @ flip
        q = np.asarray(matrix_to_quat(jnp.asarray(c2w_R, jnp.float32)))
        position[idx] = pos * scale
        quat[idx] = q
        fx, fy, cx, cy = intr[k]
        # pixel focal -> fov given principal point ~ center: W ~ 2*cx, H ~ 2*cy
        hfov[idx] = 2.0 * np.arctan(max(cx, 1e-6) / max(fx, 1e-6))
        vfov[idx] = 2.0 * np.arctan(max(cy, 1e-6) / max(fy, 1e-6))
        enabled[idx] = True

    cam = CameraState(
        position=jnp.asarray(position),
        quaternion=jnp.asarray(quat),
        vfov=jnp.asarray(vfov),
        hfov=jnp.asarray(hfov),
    )
    return cam, enabled


def import_colmap_depth(src_dir: str, dst_dir: str, base_dir: str) -> None:
    """Rescale COLMAP raw depth maps by the calibration scale
    (reference Importer.cpp:391-437)."""
    from . import raw

    scale = load_scale(base_dir)
    os.makedirs(dst_dir, exist_ok=True)
    for name in sorted(os.listdir(src_dir)):
        if not name.endswith(".raw"):
            continue
        depth = raw.load_raw_float32_image(pjoin(src_dir, name))
        raw.save_raw_float32_image(pjoin(dst_dir, name), depth * scale)


def import_tracks(path) -> List[List[Tuple[int, float, float]]]:
    """Track CSV: one track per line as `frame,x,y` triplets
    (reference Importer.cpp:480-533). Returns a list of tracks, each a list
    of (frame, x, y) observations."""
    tracks = []
    with open(path) as f:
        for row in csv.reader(f):
            row = [c for c in row if c.strip() != ""]
            if not row:
                continue
            obs = []
            for k in range(0, len(row) - 2, 3):
                obs.append((int(row[k]), float(row[k + 1]), float(row[k + 2])))
            if obs:
                tracks.append(obs)
    return tracks
