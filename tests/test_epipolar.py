import numpy as np
import pytest

from robust_cvd_tpu.ops import epipolar as ep
from robust_cvd_tpu.solver.constraints import PairConstraints


def make_rigid_scene(n=100, seed=0):
    """3D points seen by two cameras; returns pixel correspondences + F."""
    rng = np.random.default_rng(seed)
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    R = np.eye(3)
    t = np.array([0.5, 0.05, 0.0])
    pts3 = rng.uniform([-1, -1, 3], [1, 1, 6], (n, 3))

    def proj(P, R, t):
        c = (R @ P.T).T + t
        uv = (K @ c.T).T
        return uv[:, :2] / uv[:, 2:]

    p0 = proj(pts3, np.eye(3), np.zeros(3))
    p1 = proj(pts3, R, t)
    E = ep.essential_from_poses(R, t)
    F = ep.fundamental_from_essential(E, K, K)
    return p0, p1, F


def test_sampson_zero_for_rigid():
    p0, p1, F = make_rigid_scene()
    d = ep.sampson_distance(F[None], p0[None], p1[None])[0]
    assert d.max() < 1e-6


def test_eight_point_recovers_geometry():
    p0, p1, F_true = make_rigid_scene(40)
    F = ep._eight_point(p0, p1)
    d = ep.sampson_distance(F[None], p0[None], p1[None])[0]
    assert d.max() < 0.1


def test_ransac_flags_dynamic_points():
    p0, p1, _ = make_rigid_scene(120, seed=1)
    # make 20 points "dynamic": displace their second view
    p1_dyn = p1.copy()
    # displace PERPENDICULAR to the (near-horizontal) epipolar lines: motion
    # along an epipolar line is geometrically undetectable
    p1_dyn[:20, 1] += np.random.default_rng(2).uniform(8, 15, 20)
    F = ep.find_fundamental_ransac(p0, p1_dyn, thresh=2.0)
    assert F is not None
    d = ep.sampson_distance(F[None], p0[None], p1_dyn[None])[0]
    assert (d[:20] > 2.0).mean() > 0.8  # dynamic detected
    assert (d[20:] < 2.0).mean() > 0.9  # static kept


def test_set_static_flags_from_ransac():
    p0, p1, _ = make_rigid_scene(120, seed=3)
    p1_dyn = p1.copy()
    p1_dyn[:15, 1] += 20.0
    w = 128
    pc = PairConstraints(
        loc0=(p0 / w).astype(np.float32),
        loc1=(p1_dyn / w).astype(np.float32),
        is_static=np.ones(120, bool),
    )
    pairs = {(0, 1): pc}
    ep.set_static_flags_from_ransac([(0, 1)], pairs, (96, 128), 96 / 128)
    assert (~pc.is_static[:15]).mean() > 0.8
    assert pc.is_static[15:].mean() > 0.9
