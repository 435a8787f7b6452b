import struct

import numpy as np
import pytest

from robust_cvd_tpu.io import raw


def test_roundtrip_2d(tmp_path):
    img = np.random.rand(7, 5).astype(np.float32)
    p = tmp_path / "a.raw"
    raw.save_raw_image(p, img)
    out = raw.load_raw_image(p)
    np.testing.assert_array_equal(out, img)


def test_roundtrip_3d(tmp_path):
    img = np.random.rand(4, 6, 3).astype(np.float32)
    p = tmp_path / "b.raw"
    raw.save_raw_image(p, img)
    out = raw.load_raw_image(p)
    np.testing.assert_array_equal(out, img)


def test_roundtrip_uint8(tmp_path):
    img = (np.random.rand(4, 6, 3) * 255).astype(np.uint8)
    p = tmp_path / "c.raw"
    raw.save_raw_image(p, img)
    out = raw.load_raw_image(p)
    np.testing.assert_array_equal(out, img)


def test_byte_layout_matches_reference_contract(tmp_path):
    """Header is [rows:i32][cols:i32][cv_type:i32][pixel_size:u64] LE, then
    row-major data — the layout written by reference utils/image_io.py:136-173
    and lib/core/CvUtil.cpp:25-42."""
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = tmp_path / "d.raw"
    raw.save_raw_image(p, img)
    blob = p.read_bytes()
    h, w, cvt, pix = struct.unpack("<iiiQ", blob[:20])
    assert (h, w) == (3, 4)
    assert cvt == 5  # CV_32FC1
    assert pix == 4
    data = np.frombuffer(blob[20:], dtype=np.float32)
    np.testing.assert_array_equal(data.reshape(3, 4), img)

    img3 = np.zeros((2, 2, 3), np.float32)
    p3 = tmp_path / "e.raw"
    raw.save_raw_image(p3, img3)
    _, _, cvt3, pix3 = struct.unpack("<iiiQ", p3.read_bytes()[:20])
    assert cvt3 == 21  # CV_32FC3
    assert pix3 == 12


def test_reference_loader_compatibility(tmp_path):
    """Cross-check against the reference's own python reader logic."""
    img = np.random.rand(5, 9, 2).astype(np.float32)
    p = tmp_path / "f.raw"
    raw.save_raw_image(p, img)

    with open(p, "rb") as f:
        h = struct.unpack("i", f.read(4))[0]
        w = struct.unpack("i", f.read(4))[0]
        cv_type = struct.unpack("i", f.read(4))[0]
        pixel_size = struct.unpack("Q", f.read(8))[0]
        d = ((cv_type - 5) >> 3) + 1
        assert d == pixel_size // 4
        data = np.frombuffer(f.read(), dtype=np.float32)
        result = data.reshape(h, w) if d == 1 else data.reshape(h, w, d)
    np.testing.assert_array_equal(result, img)


def test_disparity_conversion():
    depth = np.array([2.0, 0.0, -1.0, np.inf, np.nan, 0.5], np.float32)
    disp = raw.depth_to_disparity(depth)
    np.testing.assert_allclose(disp, [0.5, 0, 0, 0, 0, 2.0])
    back = raw.disparity_to_depth(disp)
    np.testing.assert_allclose(back, [2.0, 0, 0, 0, 0, 0.5])


def test_bad_pixel_size_rejected(tmp_path):
    p = tmp_path / "bad.raw"
    p.write_bytes(struct.pack("<iiiQ", 1, 1, 5, 8) + b"\x00" * 8)
    with pytest.raises(ValueError):
        raw.load_raw_image(p)


def test_exif_orientation_honored(tmp_path):
    """PNG/JPEG loads honor EXIF orientation tag 274 like the reference
    (utils/image_io.py:64-84): 6 -> 270deg, 8 -> 90deg, 3 -> 180deg."""
    import numpy as np
    from PIL import Image

    from robust_cvd_tpu.io.store import load_png_color, load_png_gray

    # asymmetric 2x3 image: distinct corner pixel
    arr = np.zeros((2, 3, 3), np.uint8)
    arr[0, 0] = (255, 0, 0)
    base = Image.fromarray(arr, "RGB")

    def save_with_orientation(path, orient):
        ex = Image.Exif()
        ex[274] = orient
        base.save(path, exif=ex)

    p = tmp_path / "o1.png"
    save_with_orientation(p, 1)
    got = load_png_color(str(p))
    assert got.shape[:2] == (2, 3)
    assert got[0, 0, 0] == 1.0

    # orientation 6 (rotate 270 CCW): top-left -> (W-1, 0) in the new image
    p = tmp_path / "o6.png"
    save_with_orientation(p, 6)
    got = load_png_color(str(p))
    assert got.shape[:2] == (3, 2)
    assert got[0, 1, 0] == 1.0

    # orientation 8 (rotate 90 CCW): top-left -> bottom-left
    p = tmp_path / "o8.png"
    save_with_orientation(p, 8)
    got = load_png_color(str(p))
    assert got.shape[:2] == (3, 2)
    assert got[2, 0, 0] == 1.0

    # orientation 3 (180): top-left -> bottom-right; gray loader too
    p = tmp_path / "o3.png"
    save_with_orientation(p, 3)
    got = load_png_color(str(p))
    assert got.shape[:2] == (2, 3)
    assert got[1, 2, 0] == 1.0
    gray = load_png_gray(str(p))
    assert gray.shape == (2, 3)
    assert gray[1, 2] > 0
