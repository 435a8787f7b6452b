import jax.numpy as jnp
import numpy as np
import pytest

from robust_cvd_tpu.solver import xforms
from robust_cvd_tpu.solver.xforms import GridSpec


def test_identity_grid_eval():
    spec = GridSpec(gx=4, gy=3)
    grid = xforms.init_depth_grid(1, spec)[0]
    loc = jnp.array([[0.3, -0.2], [-1.0, 1.0], [0.99, 0.0]])
    idx, w = xforms.grid_gather(spec, loc)
    scale = xforms.eval_depth_scale(grid, idx, w)
    np.testing.assert_allclose(np.asarray(scale), 1.0, atol=1e-6)
    # weights always sum to 1
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-6)


def test_bilinear_matches_manual():
    rng = np.random.default_rng(0)
    gy, gx = 3, 5
    spec = GridSpec(gx=gx, gy=gy)
    grid = jnp.asarray(rng.uniform(0.5, 2.0, (1, gy, gx)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-1, 1, (20, 2)), jnp.float32)
    idx, w = xforms.grid_gather(spec, loc)
    got = np.asarray(xforms.eval_depth_scale(grid, idx, w))

    g = np.asarray(grid[0])
    want = []
    for x, y in np.asarray(loc):
        sx = np.clip((x + 1) * (gx - 1) / 2, 0, np.nextafter(gx - 1, 0))
        sy = np.clip((y + 1) * (gy - 1) / 2, 0, np.nextafter(gy - 1, 0))
        ix, iy = int(sx), int(sy)
        rx, ry = sx - ix, sy - iy
        want.append(
            g[iy, ix] * (1 - rx) * (1 - ry)
            + g[iy, ix + 1] * rx * (1 - ry)
            + g[iy + 1, ix] * (1 - rx) * ry
            + g[iy + 1, ix + 1] * rx * ry
        )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_handles_hit_exactly():
    rng = np.random.default_rng(1)
    gy, gx = 4, 6
    spec = GridSpec(gx=gx, gy=gy)
    grid = jnp.asarray(rng.uniform(0.5, 2.0, (1, gy, gx)), jnp.float32)
    for r in range(gy):
        for c in range(gx):
            loc = jnp.array([[-1 + 2 * c / (gx - 1), -1 + 2 * r / (gy - 1)]])
            idx, w = xforms.grid_gather(spec, loc)
            val = float(xforms.eval_depth_scale(grid, idx, w)[0])
            assert val == pytest.approx(float(grid[0, r, c]), abs=1e-5)


def test_cubic_partition_of_unity():
    spec = GridSpec(gx=5, gy=4, cubic=True)
    grid = xforms.init_depth_grid(1, spec)[0]
    rng = np.random.default_rng(2)
    loc = jnp.asarray(rng.uniform(-1, 1, (50, 2)), jnp.float32)
    idx, w = xforms.grid_gather(spec, loc)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
    scale = xforms.eval_depth_scale(grid, idx, w)
    np.testing.assert_allclose(np.asarray(scale), 1.0, atol=1e-5)


def test_depthwise_axis():
    # 1D depth-wise grid over disparity in [0.1, 1.0] (depth 1..10)
    spec = GridSpec(gz=3, disp_min=0.1, disp_max=1.0)
    grid = jnp.asarray([2.0, 3.0, 5.0], jnp.float32).reshape(3, 1, 1)
    loc = jnp.zeros((3, 2))
    # depth 10 -> disp 0.1 -> handle 0; depth 1 -> disp 1.0 -> handle 2
    # disp 0.55 (depth 1/0.55) -> midpoint -> 3.0
    depth = jnp.array([10.0, 1.0, 1.0 / 0.55])
    idx, w = xforms.grid_gather(spec, loc, depth)
    scale = np.asarray(xforms.eval_depth_scale(grid, idx, w))
    np.testing.assert_allclose(scale, [2.0, 5.0, 3.0], atol=1e-4)


def test_spatial_warp_zero_and_corners():
    grid = xforms.init_spatial_grid(1, 2, 2)[0]
    warp = xforms.spatial_warp_map(grid, cubic=False, shape=(4, 6))
    np.testing.assert_allclose(np.asarray(warp), 0.0, atol=1e-7)

    # corner handles: NDC (x=-1,y=-1) handle is grid[0, 0]
    g = grid.at[0, 0].set(jnp.array([0.5, -0.25]))
    warp = xforms.spatial_warp_map(g, cubic=False, shape=(3, 3))
    # bottom-left image pixel: NDC y=-1 at the LAST row (y = 1 - 2*r/(H-1))
    np.testing.assert_allclose(np.asarray(warp[2, 0]), [0.5, -0.25], atol=1e-6)
    np.testing.assert_allclose(np.asarray(warp[0, 2]), [0.0, 0.0], atol=1e-6)


def test_depth_deform_residuals():
    grid = jnp.array([[[1.0, 2.0], [4.0, 1.0]]])[None]  # (1, 1, 2, 2)
    r = np.asarray(xforms.depth_deform_residuals(grid))[0]
    # x-edges: (2-1)/1, (1-4)/1 ; y-edges: (4-1)/1, (1-2)/1
    assert sorted(r.tolist()) == sorted([1.0, -3.0, 3.0, -1.0])


def test_spatial_deform_residuals():
    grid = xforms.init_spatial_grid(2, 3, 3) + 0.5
    r = xforms.spatial_deform_residuals(grid)
    assert r.shape == (2, 18)
    np.testing.assert_allclose(np.asarray(r), 0.5)


def test_split_grid_preserves_linear_field():
    # A grid whose handles form a linear ramp must be exactly representable
    # after subdivision.
    gy, gx = 3, 4
    ramp = np.linspace(1.0, 2.0, gx)[None, :] * np.linspace(1.0, 1.5, gy)[:, None]
    grid = jnp.asarray(ramp, jnp.float32)[None, None]  # (1, 1, gy, gx)
    out = xforms.split_grid(grid, GridSpec(gx=7, gy=5))
    assert out.shape == (1, 1, 5, 7)
    # corners preserved
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), ramp[0, 0], atol=1e-6)
    np.testing.assert_allclose(float(out[0, 0, -1, -1]), ramp[-1, -1], atol=1e-6)
    # new handle 1 sits at old x-position 0.5 -> average of old handles 0, 1
    np.testing.assert_allclose(
        float(out[0, 0, 0, 1]), (ramp[0, 0] + ramp[0, 1]) / 2, atol=1e-6
    )
    # new handle 2 sits exactly on old handle 1
    np.testing.assert_allclose(float(out[0, 0, 0, 2]), ramp[0, 1], atol=1e-6)


def test_split_identity_stays_identity():
    grid = xforms.init_depth_grid(2, GridSpec(gx=1, gy=1, gz=1))
    out = xforms.split_grid(grid, GridSpec(gx=5, gy=3, gz=1))
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_apply_depth_grid():
    spec = GridSpec(gx=2, gy=2)
    grid = jnp.array([[[2.0, 2.0], [2.0, 2.0]]])
    depth = jnp.ones((4, 4)) * 3.0
    out = xforms.apply_depth_grid(grid[0].reshape(1, 2, 2), spec, depth)
    np.testing.assert_allclose(np.asarray(out), 6.0, atol=1e-6)


def test_adaptive_deform_weights():
    import numpy as onp

    # dynamic object fills the left half of a 8x12 mask (white=static)
    mask = onp.full((1, 8, 12), 255, onp.uint8)
    mask[:, :, :6] = 0
    spec = GridSpec(gx=3, gy=2, gz=1)
    w = xforms.adaptive_deform_weights(mask, spec, base_weight=0.0, adaptive_weight=2.0)
    E = (3 - 1) * 2 * 1 + 3 * (2 - 1) * 1  # x-edges + y-edges
    assert w.shape == (1, E)
    w = onp.asarray(w).reshape(-1)
    # x-edges come first: edge between handles (col0,col1) spans the dynamic
    # half -> large weight; edge (col1,col2) is mostly static -> small
    x_edges = w[:4].reshape(2, 2)
    assert x_edges[0, 0] > x_edges[0, 1]
    assert x_edges[0, 0] > 1.0  # dynamic fraction near 1 * adaptive 2
    assert w.min() >= 0.0 and w.max() <= 2.0
