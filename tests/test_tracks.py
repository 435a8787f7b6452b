import numpy as np

from robust_cvd_tpu.io import importers
from robust_cvd_tpu.solver import tracks as T


def make_inputs(N=6, h=24, w=32, shift=1.0):
    rng = np.random.default_rng(0)
    corner = rng.random((N, h, w)).astype(np.float32)
    flows = {}
    masks = {}
    for i in range(N - 1):
        f = np.zeros((h, w, 2), np.float32)
        f[..., 0] = shift
        flows[i] = f
        masks[i] = np.ones((h, w), bool)
    return corner, flows, masks, h / w


def test_tracks_follow_flow():
    corner, flows, masks, inv_aspect = make_inputs()
    tt = T.compute_tracks(
        corner, flows, masks, inv_aspect,
        spawn_distance=6, prune_distance=2, min_track_length=3,
    )
    assert tt.tracks, "no tracks created"
    # every surviving track advances by +shift px in x per frame
    w = 32
    for t in tt.tracks.values():
        assert t.length >= 3
        xs = [x * w for (x, y) in t.locs]
        for a, b in zip(xs, xs[1:]):
            assert abs((b - a) - 1.0) < 0.51  # rounding tolerance


def test_short_tracks_pruned():
    corner, flows, masks, inv_aspect = make_inputs(N=3)
    tt = T.compute_tracks(
        corner, flows, masks, inv_aspect,
        spawn_distance=6, prune_distance=2, min_track_length=4,
    )
    # only 3 frames: max track length 3 < 4 -> everything pruned
    assert not tt.tracks


def test_track_csv_roundtrip(tmp_path):
    corner, flows, masks, inv_aspect = make_inputs()
    tt = T.compute_tracks(
        corner, flows, masks, inv_aspect,
        spawn_distance=8, prune_distance=2, min_track_length=3,
    )
    p = tmp_path / "tracks.csv"
    tt.save_csv(p)
    loaded = importers.import_tracks(p)
    assert len(loaded) == len(tt.tracks)
    first = loaded[0]
    assert all(isinstance(f, int) for (f, x, y) in first)


def test_track_binary_roundtrip(tmp_path):
    corner, flows, masks, inv_aspect = make_inputs()
    tt = T.compute_tracks(
        corner, flows, masks, inv_aspect,
        spawn_distance=8, prune_distance=2, min_track_length=3,
    )
    assert tt.tracks
    # punch a hole so an invalid (nullptr) slot is exercised
    victim = sorted(tt.tracks)[0]
    tt.delete_track(victim)
    p = tmp_path / "tracks.dat"
    tt.save_binary(p)
    loaded = T.TrackTable.load_binary(p)
    assert loaded.num_tracks() == tt.num_tracks()
    assert set(loaded.tracks) == set(tt.tracks)
    for tid, t in tt.tracks.items():
        lt = loaded.tracks[tid]
        assert lt.first_frame == t.first_frame
        np.testing.assert_allclose(np.asarray(lt.locs), np.asarray(t.locs), rtol=1e-6)
    assert loaded.frames == tt.frames


def test_track_binary_layout(tmp_path):
    """Byte-level check of the reference wire format
    (core/TrackTable-impl.h:571-602): one valid track, one invalid slot."""
    import struct

    tt = T.TrackTable()
    tt.add_frame(); tt.add_frame(); tt.add_frame()
    tid = tt.create_track(1, (0.25, 0.5))
    tt.add_obs(tid, 2, (0.375, 0.625))
    tt.create_track(0, (0.0, 0.0))
    tt.delete_track(tid + 1)  # slot 1 -> invalid
    p = tmp_path / "tracks.dat"
    tt.save_binary(p)
    expected = (
        struct.pack("<Q", 2)
        + struct.pack("<?", True) + struct.pack("<QQ", 1, 2)
        + struct.pack("<4f", 0.25, 0.5, 0.375, 0.625)
        + struct.pack("<?", False)
        + struct.pack("<QQ", 0, 3)
    )
    assert p.read_bytes() == expected


def test_import_poses(tmp_path):
    p = tmp_path / "poses.txt"
    p.write_text("2\n0 0 0  0 0 0 1  1.2 0.8\n1 0 0  0 0 0 1  1.2 0.8\n")
    cam, enabled = importers.import_poses(p, num_frames=3)
    assert enabled.tolist() == [True, True, False]
    np.testing.assert_allclose(np.asarray(cam.position[1]), [1, 0, 0])
    np.testing.assert_allclose(float(cam.hfov[0]), 1.2)


def test_load_scale(tmp_path):
    (tmp_path / "scales.csv").write_text("0,2.0\n1,4.0\n")
    assert importers.load_scale(str(tmp_path)) == 3.0
    assert importers.load_scale("/nonexistent") == 1.0
