"""Native batched raw IO engine vs the python reference implementation."""

import os
from os.path import join as pjoin

import numpy as np

from robust_cvd_tpu import native
from robust_cvd_tpu.io import raw


def test_read_raw_batch_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((5, 12, 17, 3)).astype(np.float32)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"frame_{i:06d}.raw")
        raw.save_raw_float32_image(p, imgs[i])
        paths.append(p)

    got = native.read_raw_batch(paths, 12, 17, 3, np.float32)
    if got is None:  # toolchain missing: fallback path is the python loop
        return
    np.testing.assert_array_equal(got, imgs)


def test_write_raw_batch_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((4, 9, 7)).astype(np.float32)
    paths = [str(tmp_path / f"d_{i}.raw") for i in range(4)]
    if not native.write_raw_batch(paths, imgs):
        return
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(raw.load_raw_float32_image(p), imgs[i])
    assert native.read_raw_header(paths[0]) == (9, 7, raw.cv_type(np.float32, 1))


def test_read_raw_batch_detects_corruption(tmp_path):
    imgs = np.zeros((2, 4, 4), np.float32)
    paths = [str(tmp_path / f"x_{i}.raw") for i in range(2)]
    for i, p in enumerate(paths):
        raw.save_raw_float32_image(p, imgs[i])
    # truncate the second file
    with open(paths[1], "r+b") as f:
        f.truncate(24)
    if native.read_raw_batch(paths[:1], 4, 4, 1) is None:
        return
    import pytest

    with pytest.raises(IOError):
        native.read_raw_batch(paths, 4, 4, 1)


def test_store_batch_load_uses_native(tmp_path):
    from robust_cvd_tpu.io.frames import save_frames_txt
    from robust_cvd_tpu.io.store import VideoStore, frame_name

    base = str(tmp_path)
    h, w = 10, 14
    os.makedirs(pjoin(base, "color_full"))
    os.makedirs(pjoin(base, "color_down"))
    save_frames_txt(pjoin(base, "frames.txt"), w, h, [0.0, 1 / 30, 2 / 30])
    rng = np.random.default_rng(2)
    color = rng.uniform(0, 1, (3, h, w, 3)).astype(np.float32)
    for i in range(3):
        raw.save_raw_float32_image(
            pjoin(base, "color_down", frame_name(i, ".raw")), color[i]
        )
    store = VideoStore.open(base)
    np.testing.assert_array_equal(store.load_color_down(), color)

    depth = rng.uniform(1, 5, (3, h, w)).astype(np.float32)
    store.save_depth_stream("depth_test", depth)
    store2 = VideoStore.open(base)
    np.testing.assert_allclose(
        store2.load_depth_stream("depth_test"), depth, rtol=1e-5
    )
