"""COLMAP model IO: binary/text roundtrip, npz conversion feeding the
importer, and sparse-depth scale calibration."""

import os
from os.path import join as pjoin

import numpy as np
import pytest

from robust_cvd_tpu.io import colmap as C


def _tiny_model(n_images=3, n_points=40, seed=0):
    rng = np.random.default_rng(seed)
    cam = C.ColmapCamera(1, "PINHOLE", 64, 48,
                         np.asarray([70.0, 72.0, 32.0, 24.0]))
    points = {}
    for pid in range(n_points):
        points[pid] = C.ColmapPoint3D(
            pid,
            rng.uniform(-1, 1, 3) + np.asarray([0, 0, 4.0]),
            rng.integers(0, 255, 3).astype(np.uint8),
            float(rng.uniform(0, 1)),
            np.asarray([1], np.int64),
            np.asarray([pid], np.int64),
        )
    images = {}
    for iid in range(1, n_images + 1):
        # camera at x = 0.1 * iid looking down +z (identity rotation)
        tvec = np.asarray([-0.1 * iid, 0.0, 0.0])
        qvec = np.asarray([1.0, 0.0, 0.0, 0.0])
        xys, ids = [], []
        R = np.eye(3)
        for pid, p in points.items():
            c = R @ p.xyz + tvec
            if c[2] <= 0:
                continue
            x = 70.0 * c[0] / c[2] + 32.0
            y = 72.0 * c[1] / c[2] + 24.0
            if 0 <= x < 64 and 0 <= y < 48:
                xys.append([x, y])
                ids.append(pid)
        images[iid] = C.ColmapImage(
            iid, qvec, tvec, 1, f"frame_{iid - 1:06d}.png",
            np.asarray(xys, float), np.asarray(ids, np.int64),
        )
    return {1: cam}, images, points


def test_binary_roundtrip(tmp_path):
    cams, images, points = _tiny_model()
    d = str(tmp_path)
    C.write_cameras_binary(cams, pjoin(d, "cameras.bin"))
    C.write_images_binary(images, pjoin(d, "images.bin"))
    C.write_points3d_binary(points, pjoin(d, "points3D.bin"))
    rc, ri, rp = C.read_model(d)
    assert rc[1].model == "PINHOLE" and rc[1].width == 64
    np.testing.assert_allclose(rc[1].params, cams[1].params)
    for iid in images:
        np.testing.assert_allclose(ri[iid].qvec, images[iid].qvec)
        np.testing.assert_allclose(ri[iid].tvec, images[iid].tvec)
        assert ri[iid].name == images[iid].name
        np.testing.assert_allclose(ri[iid].xys, images[iid].xys)
        np.testing.assert_array_equal(ri[iid].point3d_ids, images[iid].point3d_ids)
    for pid in points:
        np.testing.assert_allclose(rp[pid].xyz, points[pid].xyz)
        np.testing.assert_array_equal(rp[pid].image_ids, points[pid].image_ids)


def test_text_reader(tmp_path):
    d = str(tmp_path)
    with open(pjoin(d, "cameras.txt"), "w") as f:
        f.write("# comment\n1 SIMPLE_PINHOLE 32 24 30.0 16.0 12.0\n")
    with open(pjoin(d, "images.txt"), "w") as f:
        f.write("# comment\n")
        f.write("1 1 0 0 0 0.5 0 2 1 frame_000000.png\n")
        f.write("3.0 4.0 7 10.0 12.0 -1\n")
    with open(pjoin(d, "points3D.txt"), "w") as f:
        f.write("7 1.0 2.0 3.0 10 20 30 0.5 1 0\n")
    cams, images, points = C.read_model(d)
    assert cams[1].fx_fy_cx_cy == (30.0, 30.0, 16.0, 12.0)
    im = images[1]
    np.testing.assert_allclose(im.tvec, [0.5, 0, 2])
    assert im.point3d_ids.tolist() == [7, -1]
    np.testing.assert_allclose(points[7].xyz, [1, 2, 3])


def test_model_to_npz_feeds_importer(tmp_path):
    cams, images, points = _tiny_model()
    model_dir = str(tmp_path / "sparse")
    os.makedirs(model_dir)
    C.write_cameras_binary(cams, pjoin(model_dir, "cameras.bin"))
    C.write_images_binary(images, pjoin(model_dir, "images.bin"))
    C.write_points3d_binary(points, pjoin(model_dir, "points3D.bin"))

    out = C.model_to_npz(model_dir, str(tmp_path / "metadata.npz"))
    assert out["extrinsics"].shape == (3, 3, 4)
    np.testing.assert_allclose(out["intrinsics"][0], [70, 72, 32, 24])

    # the produced npz round-trips through the existing importer
    from robust_cvd_tpu.io.importers import import_colmap_recon

    depth_dir = str(tmp_path / "depth")
    os.makedirs(depth_dir)
    for i in range(3):
        open(pjoin(depth_dir, f"frame_{i:06d}.raw"), "wb").close()
    cam_state, enabled = import_colmap_recon(
        str(tmp_path), str(tmp_path / "metadata.npz"), depth_dir, num_frames=4
    )
    assert enabled.tolist() == [True, True, True, False]
    # COLMAP w2c t = -R @ c -> camera centers at x = 0.1 * iid
    np.testing.assert_allclose(
        np.asarray(cam_state.position[:3, 0]), [0.1, 0.2, 0.3], atol=1e-6
    )


def test_sparse_depth_scales_recovers_known_scale(tmp_path):
    cams, images, points = _tiny_model()
    model_dir = str(tmp_path)
    C.write_cameras_binary(cams, pjoin(model_dir, "cameras.bin"))
    C.write_images_binary(images, pjoin(model_dir, "images.bin"))
    C.write_points3d_binary(points, pjoin(model_dir, "points3D.bin"))

    # our depth = colmap depth / 2 everywhere -> scale must be ~2
    h, w = 48, 64
    depth = np.zeros((3, h, w), np.float32)
    for k, iid in enumerate(sorted(images, key=lambda i: images[i].name)):
        im = images[iid]
        xys, z = C.sparse_depths(im, points)
        xs = np.clip((xys[:, 0] / 64 * w).astype(int), 0, w - 1)
        ys = np.clip((xys[:, 1] / 48 * h).astype(int), 0, h - 1)
        depth[k][:] = np.median(z) / 2.0
        depth[k, ys, xs] = z / 2.0
    scales = C.sparse_depth_scales(model_dir, depth)
    np.testing.assert_allclose(scales, 2.0, rtol=1e-5)

    p = C.write_scales_csv(str(tmp_path), scales)
    from robust_cvd_tpu.io.importers import load_scale

    np.testing.assert_allclose(load_scale(str(tmp_path)), 2.0, rtol=1e-5)
    assert os.path.basename(p) == "scales.csv"


def test_cli_conversion(tmp_path):
    """The module's CLI surface: model dir -> npz + scales.csv."""
    import subprocess
    import sys

    from robust_cvd_tpu.io import raw

    cams, images, points = _tiny_model()
    model_dir = str(tmp_path / "sparse")
    os.makedirs(model_dir)
    C.write_cameras_binary(cams, pjoin(model_dir, "cameras.bin"))
    C.write_images_binary(images, pjoin(model_dir, "images.bin"))
    C.write_points3d_binary(points, pjoin(model_dir, "points3D.bin"))

    depth_dir = str(tmp_path / "depth")
    os.makedirs(depth_dir)
    h, w = 48, 64
    for k, iid in enumerate(sorted(images, key=lambda i: images[i].name)):
        xys, z = C.sparse_depths(images[iid], points)
        depth = np.full((h, w), float(np.median(z)) / 2.0, np.float32)
        xs = np.clip((xys[:, 0] / 64 * w).astype(int), 0, w - 1)
        ys = np.clip((xys[:, 1] / 48 * h).astype(int), 0, h - 1)
        depth[ys, xs] = z / 2.0
        raw.save_raw_float32_image(
            pjoin(depth_dir, f"frame_{k:06d}.raw"), raw.depth_to_disparity(depth)
        )

    out_npz = str(tmp_path / "metadata.npz")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "robust_cvd_tpu.io.colmap", model_dir, out_npz,
         "--depth-stream", depth_dir],
        capture_output=True, text=True, env=env, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr
    assert os.path.exists(out_npz)
    meta = np.load(out_npz)
    assert meta["extrinsics"].shape == (3, 3, 4)
    from robust_cvd_tpu.io.importers import load_scale

    np.testing.assert_allclose(load_scale(str(tmp_path)), 2.0, rtol=1e-4)


def test_images_binary_byte_layout(tmp_path):
    """Byte-level golden fixture: point2D records are x:f64 y:f64 id:i64
    ('ddq' — COLMAP's native layout, reference utils/load_colmap.py:422-425).
    A reader that parses the id as f64 would see garbage here because the
    id below (2^40 + 3) is not exactly representable by reinterpretation."""
    import struct

    path = str(tmp_path / "images.bin")
    big_id = (1 << 40) + 3
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 1))                 # num images
        f.write(struct.pack("<i", 5))                 # image id
        f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
        f.write(struct.pack("<3d", 0.5, -0.25, 2.0))
        f.write(struct.pack("<i", 1))                 # camera id
        f.write(b"frame_000000.png\x00")
        f.write(struct.pack("<Q", 2))                 # num point2Ds
        f.write(struct.pack("<ddq", 3.5, 4.5, big_id))
        f.write(struct.pack("<ddq", 7.0, 8.0, -1))    # -1 == invalid id

    images = C.read_images_binary(path)
    im = images[5]
    np.testing.assert_allclose(im.xys, [[3.5, 4.5], [7.0, 8.0]])
    assert im.point3d_ids.tolist() == [big_id, -1]

    # and the writer reproduces the exact bytes
    out = str(tmp_path / "rt.bin")
    C.write_images_binary(images, out)
    assert open(out, "rb").read() == open(path, "rb").read()
