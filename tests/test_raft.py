import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_cvd_tpu.models import raft


def test_corr_pyramid_matches_manual():
    rng = np.random.default_rng(0)
    B, H, W, D = 1, 4, 6, 8
    f1 = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
    pyr = raft.build_corr_pyramid(f1, f2, num_levels=2)
    assert pyr[0].shape == (B, H, W, H, W)
    assert pyr[1].shape == (B, H, W, H // 2, W // 2)
    want = np.einsum(
        "xd,yd->xy",
        np.asarray(f1).reshape(H * W, D),
        np.asarray(f2).reshape(H * W, D),
    ).reshape(H, W, H, W) / np.sqrt(D)
    np.testing.assert_allclose(np.asarray(pyr[0][0]), want, atol=1e-4)


def test_lookup_corr_center_tap():
    # Correlation volume that is 1 at matching locations, 0 elsewhere:
    # the center tap of the lookup at zero flow must be 1.
    B, H, W = 1, 4, 4
    eye = np.eye(H * W, dtype=np.float32).reshape(1, H, W, H, W)
    pyr = [jnp.asarray(eye)]
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coords = jnp.asarray(
        np.stack([xs, ys], -1)[None].astype(np.float32)
    )
    out = np.asarray(raft.lookup_corr(pyr, coords, radius=1))
    K = 9
    assert out.shape == (B, H, W, K)
    center = out[0, :, :, K // 2]
    np.testing.assert_allclose(center, 1.0, atol=1e-5)
    # off-center taps at interior pixels are 0
    assert abs(out[0, 1, 1, 0]) < 1e-5


def test_convex_upsampling_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    B, h, w = 1, 3, 4
    flow = rng.standard_normal((B, h, w, 2)).astype(np.float32)
    mask = rng.standard_normal((B, h, w, 576)).astype(np.float32)

    got = np.asarray(raft.upsample_flow_convex(jnp.asarray(flow), jnp.asarray(mask)))

    # reference raft.py:49-60 (torch oracle)
    tflow = torch.tensor(flow).permute(0, 3, 1, 2)
    # torch mask layout: (N, 64*9, H, W) -> view(N, 1, 9, 8, 8, H, W).
    # our layout: (B, h, w, 576) with 576 = 9*8*8 in C-order -> move to torch
    tmask = torch.tensor(mask).permute(0, 3, 1, 2)
    m = tmask.view(B, 1, 9, 8, 8, h, w)
    m = torch.softmax(m, dim=2)
    up_flow = F.unfold(8 * tflow, [3, 3], padding=1)
    up_flow = up_flow.view(B, 2, 9, 1, 1, h, w)
    up = torch.sum(m * up_flow, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3).reshape(B, 2, 8 * h, 8 * w)
    want = up.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(got, want, atol=1e-4)


def test_encoder_stride8():
    enc = raft.BasicEncoder(output_dim=32, norm="instance")
    x = jnp.zeros((1, 32, 48, 3))
    v = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(v, x)
    assert y.shape == (1, 4, 6, 32)


def test_raft_tiny_end_to_end():
    model = raft.RAFT(iters=2)
    H, W = 32, 32
    rng = np.random.default_rng(2)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.float32)
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), im1, im2)
    flow = model.apply(variables, im1, im2)
    assert flow.shape == (1, H, W, 2)
    assert bool(jnp.all(jnp.isfinite(flow)))


def test_instance_norm_zero_mean_unit_var():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)) * 5 + 3, jnp.float32)
    y = raft.instance_norm(x)
    m = np.asarray(jnp.mean(y, axis=(1, 2)))
    v = np.asarray(jnp.var(y, axis=(1, 2)))
    np.testing.assert_allclose(m, 0.0, atol=1e-5)
    np.testing.assert_allclose(v, 1.0, atol=1e-3)
