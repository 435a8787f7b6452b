import struct

import numpy as np
import pytest

from robust_cvd_tpu.io import flow_constraints_dat as fcdat
from robust_cvd_tpu.io import video_dat as vd
from robust_cvd_tpu.io.video_dat import (
    ColorStreamInfo,
    DepthFrameInfo,
    DepthStreamInfo,
    VideoDat,
    XformDesc,
)


def test_xform_desc_strings():
    assert XformDesc(type="Depth", depth_type="Identity").to_string() == "Identity()"
    assert (
        XformDesc(type="Depth", depth_type="Global", value_xform="Scale").to_string()
        == "Global(Scale)"
    )
    g = XformDesc(
        type="Depth", depth_type="Grid", value_xform="Scale",
        cubic=False, grid_size=(6, 4, 1),
    )
    assert g.to_string() == "Grid(Scale, Linear, 6, 4, 1)"
    assert XformDesc.parse(g.to_string()).to_string() == g.to_string()
    s = XformDesc(type="Spatial", spatial_type="BicubicGrid", grid_size=(4, 3, 0))
    assert s.to_string() == "BicubicGrid(4, 3)"
    assert XformDesc.parse("Identity", "Spatial").spatial_type == "Identity"
    assert XformDesc.parse("Identity()").depth_type == "Identity"
    # bilateral grid with depth range
    b = XformDesc(
        type="Depth", depth_type="Grid", value_xform="Scale", cubic=True,
        grid_size=(2, 2, 3), depth_min_max=(0.5, 10.0),
    )
    p = XformDesc.parse(b.to_string())
    assert p.grid_size == (2, 2, 3) and p.cubic and p.depth_min_max == (0.5, 10.0)


def test_num_params():
    assert XformDesc(type="Depth", depth_type="Identity").num_params() == 0
    assert XformDesc(type="Depth", depth_type="Global", value_xform="Scale").num_params() == 1
    assert (
        XformDesc(type="Depth", depth_type="Grid", value_xform="Scale",
                  grid_size=(17, 10, 1)).num_params() == 170
    )
    assert XformDesc(type="Spatial", spatial_type="Identity").num_params() == 0
    assert XformDesc(type="Spatial", spatial_type="VerticalLinear").num_params() == 4
    assert XformDesc(type="Spatial", spatial_type="CornersBilinear").num_params() == 8
    assert (
        XformDesc(type="Spatial", spatial_type="BicubicGrid", grid_size=(4, 3, 0)).num_params()
        == 24
    )


def make_video_dat(n=3):
    ddesc = XformDesc(type="Depth", depth_type="Grid", value_xform="Scale",
                      grid_size=(3, 2, 1))
    sdesc = XformDesc(type="Spatial", spatial_type="Identity")
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n):
        frames.append(
            DepthFrameInfo(
                vfov=0.8, hfov=1.2,
                position=(0.1 * i, 0.0, 0.2),
                quaternion=(0.0, 0.0, 0.0, 1.0),
                enabled=(i != 1),
                depth_params=rng.uniform(0.5, 2.0, 6),
                spatial_params=np.zeros(0),
            )
        )
    return VideoDat(
        pts=[i / 30 for i in range(n)],
        color_streams=[
            ColorStreamInfo("full", "color_full", ".png", 21, 640, 480),
            ColorStreamInfo("down", "color_down", ".raw", 21, 384, 288),
        ],
        depth_streams=[
            DepthStreamInfo("depth_midas2", "depth_midas2", ddesc, sdesc, 384, 288, frames)
        ],
        duration=n / 30,
        width=640,
        height=480,
    )


def test_video_dat_roundtrip(tmp_path):
    v = make_video_dat()
    p = tmp_path / "video.dat"
    vd.save_video_dat(p, v)
    out = vd.load_video_dat(p)
    assert out.pts == pytest.approx(v.pts)
    assert [c.name for c in out.color_streams] == ["full", "down"]
    assert out.color_streams[0].cv_type == 21
    ds = out.depth_streams[0]
    assert ds.depth_desc.to_string() == "Grid(Scale, Linear, 3, 2, 1)"
    assert ds.spatial_desc.to_string() == "Identity"
    assert ds.frames[1].enabled is False
    np.testing.assert_allclose(
        ds.frames[0].depth_params, v.depth_streams[0].frames[0].depth_params
    )
    assert out.width == 640 and out.height == 480


def test_video_dat_header_bytes(tmp_path):
    """Lock the header byte layout (reference lib/DepthVideo.cpp:304-314)."""
    v = make_video_dat(2)
    p = tmp_path / "video.dat"
    vd.save_video_dat(p, v)
    blob = p.read_bytes()
    magic, ff, dp, n = struct.unpack_from("<IIIi", blob)
    assert magic == 0xDEADBEEF and ff == 13 and dp == 3 and n == 2
    pts = struct.unpack_from("<ff", blob, 16)
    assert pts == pytest.approx((0.0, 1 / 30))
    # trailing magic
    assert struct.unpack_from("<I", blob, len(blob) - 4)[0] == 0xDEADBEEF
    # first string: [len:u64]['full']
    (slen,) = struct.unpack_from("<Q", blob, 24 + 4)  # after numColorStreams
    assert slen == 4 and blob[36:40] == b"full"


def test_flow_constraints_dat_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pairs = {
        (0, 1): rng.uniform(0, 1, (5, 2, 2)).astype(np.float32),
        (1, 2): rng.uniform(0, 1, (3, 2, 2)).astype(np.float32),
    }
    triplets = {1: rng.uniform(0, 1, (4, 3, 2)).astype(np.float32)}
    p = tmp_path / "flow_constraints.dat"
    fcdat.save_flow_constraints_dat(p, 10, pairs, triplets)
    sep, p2, t2 = fcdat.load_flow_constraints_dat(p)
    assert sep == 10
    np.testing.assert_allclose(p2[(0, 1)], pairs[(0, 1)])
    np.testing.assert_allclose(t2[1], triplets[1])
    blob = p.read_bytes()
    magic, ver, msep = struct.unpack_from("<IIi", blob)
    assert magic == 0xDEADBEEF and ver == 3 and msep == 10
