"""RAFT evaluation harness: metric math, format readers, batched driver."""

import numpy as np
import jax.numpy as jnp

from robust_cvd_tpu.models import raft_eval as E


def test_flow_metrics_exact():
    gt = np.zeros((1, 8, 10, 2), np.float32)
    gt[..., 0] = 4.0  # magnitude 4 everywhere
    pred = gt.copy()
    pred[0, :4] += 2.0  # half the pixels have EPE sqrt(8) ~ 2.83
    m = E.flow_metrics(jnp.asarray(pred), jnp.asarray(gt))
    np.testing.assert_allclose(float(m["epe"][0]), np.sqrt(8.0) / 2, rtol=1e-5)
    np.testing.assert_allclose(float(m["1px"][0]), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(m["3px"][0]), 1.0, rtol=1e-6)
    # outliers: epe 2.83 < 3 -> no outliers
    np.testing.assert_allclose(float(m["fl_all"][0]), 0.0, atol=1e-6)


def test_flow_metrics_valid_mask():
    gt = np.zeros((1, 4, 4, 2), np.float32)
    pred = gt.copy()
    pred[0, 0] = 10.0  # bad row
    valid = np.ones((1, 4, 4), np.float32)
    valid[0, 0] = 0.0  # ... masked out
    m = E.flow_metrics(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(valid))
    np.testing.assert_allclose(float(m["epe"][0]), 0.0, atol=1e-6)


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(0).standard_normal((6, 9, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    with open(p, "wb") as f:
        f.write(np.float32(202021.25).tobytes())
        f.write(np.int32(9).tobytes())
        f.write(np.int32(6).tobytes())
        f.write(flow.tobytes())
    np.testing.assert_array_equal(E.read_flo(p), flow)


def test_kitti_flow_decode():
    rng = np.random.default_rng(1)
    flow = rng.uniform(-10, 10, (5, 7, 2)).astype(np.float32)
    valid = (rng.uniform(0, 1, (5, 7)) > 0.3).astype(np.uint16)
    enc = np.zeros((5, 7, 3), np.uint16)
    enc[..., :2] = np.round(flow * 64.0 + 2 ** 15).astype(np.uint16)
    enc[..., 2] = valid
    got_flow, got_valid = E.decode_kitti_flow(enc)
    np.testing.assert_allclose(got_flow, flow, atol=1.0 / 64)
    np.testing.assert_array_equal(got_valid, valid.astype(np.float32))


def test_evaluate_pairs_with_identity_fn():
    """Driver math: a flow_fn returning the GT gives EPE 0; a constant
    offset gives that offset."""
    rng = np.random.default_rng(2)
    gts = [rng.uniform(-3, 3, (16, 24, 2)).astype(np.float32) for _ in range(5)]
    store = {}

    def fake_flow_fn(im1, im2):
        # recover gt from the image encoding below
        return im1[..., :2]

    samples = [
        (np.concatenate([g, np.zeros((16, 24, 1), np.float32)], -1),
         np.zeros((16, 24, 3), np.float32), g, None)
        for g in gts
    ]
    m = E.evaluate_pairs(fake_flow_fn, samples, batch=2)
    np.testing.assert_allclose(m["epe"], 0.0, atol=1e-6)

    samples2 = [
        (np.concatenate([g + 2.0, np.zeros((16, 24, 1), np.float32)], -1),
         np.zeros((16, 24, 3), np.float32), g, None)
        for g in gts
    ]
    m2 = E.evaluate_pairs(fake_flow_fn, samples2, batch=2)
    np.testing.assert_allclose(m2["epe"], np.sqrt(8.0), rtol=1e-5)


def test_pad_to_multiple():
    x = jnp.zeros((1, 13, 21, 3))
    p, (ph, pw) = E.pad_to_multiple(x, 8)
    assert p.shape == (1, 16, 24, 3) and (ph, pw) == (3, 3)


def test_make_flow_fn_tiny_raft():
    from robust_cvd_tpu.models.raft import RAFT
    import jax

    raft = RAFT(iters=2, corr_radius=2)
    im = jnp.zeros((1, 40, 48, 3))
    v = raft.init(jax.random.PRNGKey(0), im, im)
    fn = E.make_flow_fn(raft, v, iters=2)
    out = fn(jnp.zeros((1, 37, 45, 3)), jnp.zeros((1, 37, 45, 3)))
    assert out.shape == (1, 37, 45, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_evaluate_pairs_pixel_level_aggregation():
    """Upstream-exact aggregation over samples with different valid-pixel
    counts (reference raft/evaluate.py validate_kitti): epe is the mean
    over IMAGES of per-image means, fl_all is PIXEL-level over all valid
    pixels."""
    from robust_cvd_tpu.models.raft_eval import evaluate_pairs

    H, W = 8, 8
    gt = np.zeros((H, W, 2), np.float32)
    im = np.zeros((H, W, 3), np.float32)

    def flow_fn(im1, im2):
        # constant error of 1 px in x for every pixel of every sample
        return jnp.ones((im1.shape[0], H, W, 2)) * jnp.asarray([1.0, 0.0])

    # sample A: all pixels valid; sample B: ONE valid pixel
    va = np.ones((H, W), np.float32)
    vb = np.zeros((H, W), np.float32)
    vb[0, 0] = 1.0
    out = evaluate_pairs(flow_fn, [(im, im, gt, va), (im, im, gt, vb)], batch=1)
    # pixel-level: all valid pixels have epe sqrt(2)... no — error (1,0) -> epe 1
    np.testing.assert_allclose(out["epe"], 1.0, atol=1e-6)

    def flow_fn2(im1, im2):
        # 10px error everywhere (outlier); fl_all differs per aggregation:
        # per-sample mean would be (1 + 1)/2 = 1 either way, so scale one
        # sample's error to 0 instead
        return jnp.zeros((im1.shape[0], H, W, 2))

    gt_b = np.zeros((H, W, 2), np.float32)
    gt_b[..., 0] = 10.0  # pred 0 -> epe 10 (outlier) on sample B only
    out = evaluate_pairs(
        flow_fn2, [(im, im, gt, va), (im, im, gt_b, vb)], batch=1
    )
    # 64 valid good pixels + 1 valid outlier pixel -> 1/65, not (0+1)/2
    np.testing.assert_allclose(out["fl_all"], 1.0 / 65.0, atol=1e-6)
    # epe is IMAGE-level (upstream epe_list of per-image means): sample A
    # epe 0, sample B per-image epe 10 -> (0 + 10)/2, not 10/65
    np.testing.assert_allclose(out["epe"], 5.0, atol=1e-6)
