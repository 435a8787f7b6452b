import numpy as np
import jax.numpy as jnp

from robust_cvd_tpu import native
from robust_cvd_tpu.solver import constraints as C


def test_native_greedy_separation():
    # Candidates in priority order; second one is within radius of first.
    xs = np.array([10, 12, 30], np.int32)
    ys = np.array([10, 10, 10], np.int32)
    keep = native.greedy_sample(xs, ys, 64, 64, radius=5)
    assert keep.tolist() == [True, False, True]


def test_native_greedy_matches_python_fallback():
    rng = np.random.default_rng(0)
    n = 300
    xs = rng.integers(0, 50, n).astype(np.int32)
    ys = rng.integers(0, 40, n).astype(np.int32)
    a = native.greedy_sample(xs, ys, 50, 40, 4)
    lib, native._lib = native._lib, None
    bf, native._build_failed = native._build_failed, True
    try:
        b = native.greedy_sample(xs, ys, 50, 40, 4)
    finally:
        native._lib, native._build_failed = lib, bf
    np.testing.assert_array_equal(a, b)


def test_stamp_disks():
    m = native.stamp_disks(np.array([5], np.int32), np.array([5], np.int32), 11, 11, 2)
    assert m[5, 5] and m[5, 7] and m[7, 5]
    assert not m[5, 8] and not m[8, 8]


def test_corner_response_prefers_corners():
    img = np.zeros((1, 32, 32), np.float32)
    img[0, 16:, 16:] = 1.0  # a corner at (16,16)
    resp = np.asarray(C.corner_min_eigenval(jnp.asarray(img)))[0]
    cy, cx = np.unravel_index(np.argmax(resp), resp.shape)
    assert abs(cx - 16) <= 2 and abs(cy - 16) <= 2
    # flat regions have ~zero response
    assert resp[4, 4] < 1e-3
    # edges (not corners) have small min-eigenvalue relative to the corner
    assert resp[4, 16] < resp[cy, cx] * 0.5


def test_build_pair_constraints_roundtrip():
    h, w = 24, 32
    inv_aspect = h / w
    rng = np.random.default_rng(1)
    corner = rng.random((h, w)).astype(np.float32)
    flow = np.full((h, w, 2), 1.5, np.float32)
    mask = np.ones((h, w), bool)
    pc = C.build_pair_constraints(corner, flow, mask, inv_aspect, match_separation=4)
    assert len(pc.loc0) > 0
    # normalized ranges
    assert pc.loc0[:, 0].max() <= 1.0 and pc.loc0[:, 1].max() <= inv_aspect + 1e-6
    # displacement = flow in normalized units
    d = pc.loc1 - pc.loc0
    np.testing.assert_allclose(d[:, 0], 1.5 / w, atol=1e-6)
    np.testing.assert_allclose(d[:, 1], 1.5 * inv_aspect / h, atol=1e-6)
    # separation respected (in pixels)
    px = np.round(pc.loc0 * [w, w]).astype(int)
    for a in range(len(px)):
        for b in range(a + 1, len(px)):
            assert ((px[a] - px[b]) ** 2).sum() > 16


def test_static_flags_and_flatten():
    h, w = 16, 16
    inv_aspect = 1.0
    pairs = {
        (0, 1): C.PairConstraints(
            loc0=np.array([[0.25, 0.25], [0.8, 0.8]], np.float32),
            loc1=np.array([[0.3, 0.25], [0.85, 0.8]], np.float32),
            is_static=np.ones(2, bool),
        )
    }
    # dynamic object in the lower-right quadrant of both frames
    dyn_mask = np.full((2, h, w), 255, np.uint8)
    dyn_mask[:, 10:, 10:] = 0
    dyn_dist = np.stack(
        [C.dynamic_distance(dyn_mask[i], (h, w)) for i in range(2)]
    )
    C.set_static_flags([(0, 1)], pairs, [], {}, dyn_dist, min_dynamic_distance=2.0)
    assert pairs[(0, 1)].is_static.tolist() == [True, False]

    depth = np.full((2, h, w), 2.0, np.float32)
    data = C.flatten_pairs([(0, 1)], pairs, depth, inv_aspect)
    # padded to the TPU lane width (128 samples per pair)
    assert data.pair.shape == (1, 2) and data.loc0.shape == (1, 128, 2)
    np.testing.assert_allclose(np.asarray(data.weight[0, :3]), [1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(data.depth0[0, :2]), [2.0, 1.0])  # masked -> placeholder
    # NDC conversion
    np.testing.assert_allclose(np.asarray(data.loc0[0, 0]), [-0.5, 0.5], atol=1e-6)


def test_prune_static_flag():
    pairs = {
        (0, 1): C.PairConstraints(
            loc0=np.array([[0.2, 0.2], [0.25, 0.2], [0.8, 0.8]], np.float32),
            loc1=np.array([[0.2, 0.2], [0.25, 0.2], [0.8, 0.8]], np.float32),
            is_static=np.array([False, True, True]),
        )
    }
    C.prune_static_flag(2, [(0, 1)], pairs, [], {}, (20, 20), distance=3)
    # the second constraint is within 3px of the dynamic first one
    assert pairs[(0, 1)].is_static.tolist() == [False, False, True]


def test_fused_native_pair_builder_matches_numpy():
    """The one-call native candidate builder (filter + stable sort + greedy)
    must reproduce the numpy reference path exactly."""
    from robust_cvd_tpu import native
    from robust_cvd_tpu.solver import constraints as C

    if native._load() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    h, w = 48, 64
    # negatives exercise the radix sort's sign handling (cornerMinEigenVal
    # can go slightly negative numerically); ties exercise stability
    corner = rng.uniform(-0.2, 1, (h, w)).astype(np.float32)
    corner[(corner > 0.5) & (corner < 0.6)] = 0.55
    corner[0, :4] = 0.0
    # signed zeros are a TIE under np.argsort (IEEE -0.0 == +0.0: original
    # order kept) and NaN sorts LAST — the native radix transform must
    # reproduce both, not just ordinary sign handling
    corner[1, :6] = np.array([0.0, -0.0, 0.0, -0.0, -0.0, 0.0], np.float32)
    corner[2, :2] = np.nan
    flow = rng.uniform(-6, 6, (h, w, 2)).astype(np.float32)
    mask = rng.uniform(0, 1, (h, w)) > 0.3
    mask[1, :6] = True
    mask[2, :2] = True
    a = C.build_pair_constraints(corner, flow, mask, 0.75, 5, use_native=True)
    b = C.build_pair_constraints(corner, flow, mask, 0.75, 5, use_native=False)
    np.testing.assert_array_equal(a.loc0, b.loc0)
    np.testing.assert_array_equal(a.loc1, b.loc1)
    assert len(a.loc0) > 10


def test_fused_native_triplet_builder_matches_numpy():
    from robust_cvd_tpu import native
    from robust_cvd_tpu.solver import constraints as C

    if native._load() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(8)
    h, w = 48, 64
    corner = rng.uniform(0, 1, (h, w)).astype(np.float32)
    flow10 = rng.uniform(-5, 5, (h, w, 2)).astype(np.float32)
    flow12 = rng.uniform(-5, 5, (h, w, 2)).astype(np.float32)
    mask10 = rng.uniform(0, 1, (h, w)) > 0.25
    mask12 = rng.uniform(0, 1, (h, w)) > 0.25
    a = C.build_triplet_constraints(
        corner, flow10, mask10, flow12, mask12, 0.75, 5, use_native=True
    )
    b = C.build_triplet_constraints(
        corner, flow10, mask10, flow12, mask12, 0.75, 5, use_native=False
    )
    np.testing.assert_array_equal(a.loc, b.loc)
    assert len(a.loc) > 10
