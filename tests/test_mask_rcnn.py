"""Mask R-CNN: box math + NMS + ROIAlign oracles, static-shape forward,
and the detectron2-layout weight conversion at real shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_cvd_tpu.models import mask_rcnn as M


def test_decode_boxes_roundtrip():
    rng = np.random.default_rng(0)
    anchors = rng.uniform(10, 80, (16, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(5, 40, (16, 2))
    boxes = rng.uniform(5, 90, (16, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, (16, 2))

    # forward-encode (the inverse transform), then decode must round-trip
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    bw = boxes[:, 2] - boxes[:, 0]
    bh = boxes[:, 3] - boxes[:, 1]
    bcx = boxes[:, 0] + 0.5 * bw
    bcy = boxes[:, 1] + 0.5 * bh
    wx, wy, ww, wh = M.BBOX_REG_WEIGHTS
    deltas = np.stack(
        [
            wx * (bcx - acx) / aw,
            wy * (bcy - acy) / ah,
            ww * np.log(bw / aw),
            wh * np.log(bh / ah),
        ],
        axis=-1,
    )
    out = np.asarray(
        M.decode_boxes(
            jnp.asarray(anchors), jnp.asarray(deltas), weights=M.BBOX_REG_WEIGHTS
        )
    )
    np.testing.assert_allclose(out, boxes, rtol=1e-4, atol=1e-3)


def _nms_oracle(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = np.zeros(len(boxes), bool)
    taken = []
    for i in order:
        ok = True
        for j in taken:
            a, b = boxes[i], boxes[j]
            x0, y0 = max(a[0], b[0]), max(a[1], b[1])
            x1, y1 = min(a[2], b[2]), min(a[3], b[3])
            inter = max(x1 - x0, 0) * max(y1 - y0, 0)
            area = (
                (a[2] - a[0]) * (a[3] - a[1])
                + (b[2] - b[0]) * (b[3] - b[1])
                - inter
            )
            if inter / max(area, 1e-9) > thresh:
                ok = False
                break
        if ok:
            keep[i] = True
            taken.append(i)
    return keep


def test_nms_matches_greedy_oracle():
    rng = np.random.default_rng(1)
    boxes = rng.uniform(0, 80, (64, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(4, 30, (64, 2))
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    keep = np.asarray(M.nms_keep(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    oracle = _nms_oracle(boxes, scores, 0.5)
    np.testing.assert_array_equal(keep, oracle)


def test_nms_suppression_chain_resurrection():
    """A pure suppression chain (each box overlaps only its neighbors,
    scores descending) is the worst case for the fixed-point iteration:
    greedy keeps the even-indexed boxes because every odd box is
    suppressed, which RESURRECTS the box after it."""
    n = 64
    boxes = np.stack(
        [
            np.arange(n) * 6.0,
            np.zeros(n),
            np.arange(n) * 6.0 + 10.0,
            np.full(n, 10.0),
        ],
        axis=-1,
    ).astype(np.float32)  # neighbors overlap 4/16 = IoU 0.25
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    keep = np.asarray(M.nms_keep(jnp.asarray(boxes), jnp.asarray(scores), 0.2))
    np.testing.assert_array_equal(keep, np.arange(n) % 2 == 0)
    np.testing.assert_array_equal(keep, _nms_oracle(boxes, scores, 0.2))


def test_nms_dense_with_valid_matches_oracle():
    rng = np.random.default_rng(7)
    n = 500
    boxes = rng.uniform(0, 60, (n, 4)).astype(np.float32)  # dense overlaps
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(8, 40, (n, 2))
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.3
    keep = np.asarray(
        M.nms_keep(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5,
            valid=jnp.asarray(valid),
        )
    )
    oracle = _nms_oracle(boxes[valid], scores[valid], 0.5)
    full = np.zeros(n, bool)
    full[np.flatnonzero(valid)] = oracle
    np.testing.assert_array_equal(keep, full)


def _roi_align_oracle(feat, box, out, stride, sampling=2):
    """Scalar-loop ROIAlignV2 (aligned=True) reference."""
    h, w, c = feat.shape

    def bil(y, x):
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        fy, fx = y - y0, x - x0
        acc = np.zeros(c)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xx < w:
                    acc += wy * wx * feat[yy, xx]
        return acc

    x0, y0, x1, y1 = [v / stride - 0.5 for v in box]
    bw, bh = max(x1 - x0, 1e-6), max(y1 - y0, 1e-6)
    n = out * sampling
    res = np.zeros((out, out, c))
    for by in range(out):
        for bx in range(out):
            acc = np.zeros(c)
            for sy in range(sampling):
                for sx in range(sampling):
                    gy = (by * sampling + sy + 0.5) / n
                    gx = (bx * sampling + sx + 0.5) / n
                    acc += bil(y0 + gy * bh, x0 + gx * bw)
            res[by, bx] = acc / (sampling * sampling)
    return res


def test_roi_align_matches_oracle():
    rng = np.random.default_rng(2)
    feat = rng.standard_normal((16, 20, 3)).astype(np.float32)
    boxes = np.asarray(
        [[8.0, 4.0, 40.0, 28.0], [0.0, 0.0, 80.0, 64.0]], np.float32
    )
    got = np.asarray(
        M.roi_align_level(jnp.asarray(feat), jnp.asarray(boxes), 7, 4.0)
    )
    for i in range(2):
        want = _roi_align_oracle(feat, boxes[i], 7, 4.0)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)


def test_deconv_matches_torch():
    """flax ConvTranspose + the converter's (2,3,0,1) mapping must equal
    torch ConvTranspose2d (the mask head upsampler)."""
    import torch

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 6, 5, 4)).astype(np.float32)  # NHWC
    tconv = torch.nn.ConvTranspose2d(4, 3, 2, stride=2)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)

    import flax.linen as nn

    mod = nn.ConvTranspose(
        3, (2, 2), strides=(2, 2), transpose_kernel=True, padding="VALID"
    )
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    bias = tconv.bias.detach().numpy()
    got = np.asarray(
        mod.apply({"params": {"kernel": kernel, "bias": bias}}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_paste_masks_covers_box():
    masks = jnp.ones((2, 28, 28))
    boxes = jnp.asarray([[4.0, 6.0, 20.0, 18.0], [0.0, 0.0, 8.0, 8.0]])
    out = np.asarray(M.paste_masks(masks, boxes, (32, 40)))
    assert out[0, 12, 12] and not out[0, 2, 2]
    assert out[1, 4, 4] and not out[1, 20, 30]
    # interior of box 0 fully covered
    assert out[0, 8:16, 6:18].all()


def test_level_assignment():
    boxes = jnp.asarray(
        [
            [0, 0, 56, 56],     # sqrt(area)=56  -> level 2
            [0, 0, 224, 224],   # 224 -> level 4
            [0, 0, 448, 448],   # 448 -> level 5
            [0, 0, 1000, 1000], # clamped to 5
        ],
        jnp.float32,
    )
    np.testing.assert_array_equal(
        np.asarray(M.assign_levels(boxes)), [2, 4, 5, 5]
    )


@pytest.fixture(scope="module")
def tiny_forward():
    net = M.MaskRCNN()
    img = jnp.asarray(
        np.random.default_rng(4).uniform(0, 1, (1, 64, 64, 3)), jnp.float32
    )
    variables = net.init(jax.random.PRNGKey(0), img)
    det = net.apply(variables, img)
    return det


def test_forward_static_shapes(tiny_forward):
    det = tiny_forward
    assert det["boxes"].shape == (M.MAX_DETECTIONS, 4)
    assert det["scores"].shape == (M.MAX_DETECTIONS,)
    assert det["classes"].shape == (M.MAX_DETECTIONS,)
    assert det["masks"].shape == (M.MAX_DETECTIONS, 28, 28)
    assert np.all(np.isfinite(np.asarray(det["boxes"])))
    assert np.all(np.asarray(det["scores"]) >= 0)


def test_dynamic_mask_from_detections(tiny_forward):
    out = M.dynamic_mask_from_detections(tiny_forward, (64, 64))
    assert out.shape == (64, 64) and out.dtype == jnp.bool_


def _detectron2_layout_state(rng):
    """Random state dict with the real mask_rcnn_R_50_FPN key layout/shapes."""
    sd = {}

    def conv(key, co, ci, k):
        sd[key + ".weight"] = rng.standard_normal((co, ci, k, k)).astype(
            np.float32
        ) * 0.01
        sd[key + ".bias"] = rng.standard_normal(co).astype(np.float32) * 0.01

    def conv_bn(key, co, ci, k):
        sd[key + ".weight"] = rng.standard_normal((co, ci, k, k)).astype(
            np.float32
        ) * 0.01
        for suffix, val in (
            ("norm.weight", np.ones(co)),
            ("norm.bias", np.zeros(co)),
            ("norm.running_mean", np.zeros(co)),
            ("norm.running_var", np.ones(co)),
        ):
            sd[f"{key}.{suffix}"] = val.astype(np.float32)

    def fc(key, co, ci):
        sd[key + ".weight"] = rng.standard_normal((co, ci)).astype(np.float32) * 0.01
        sd[key + ".bias"] = np.zeros(co, np.float32)

    bb = "backbone.bottom_up"
    conv_bn(f"{bb}.stem.conv1", 64, 3, 7)
    cin = 64
    for stage, blocks, planes in (
        (2, 3, 64), (3, 4, 128), (4, 6, 256), (5, 3, 512),
    ):
        for b in range(blocks):
            src = f"{bb}.res{stage}.{b}"
            conv_bn(f"{src}.conv1", planes, cin if b == 0 else planes * 4, 1)
            conv_bn(f"{src}.conv2", planes, planes, 3)
            conv_bn(f"{src}.conv3", planes * 4, planes, 1)
            if b == 0:
                conv_bn(f"{src}.shortcut", planes * 4, cin, 1)
        cin = planes * 4
    for lvl, c in zip((2, 3, 4, 5), (256, 512, 1024, 2048)):
        conv(f"backbone.fpn_lateral{lvl}", 256, c, 1)
        conv(f"backbone.fpn_output{lvl}", 256, 256, 3)
    conv("proposal_generator.rpn_head.conv", 256, 256, 3)
    conv("proposal_generator.rpn_head.objectness_logits", 3, 256, 1)
    conv("proposal_generator.rpn_head.anchor_deltas", 12, 256, 1)
    fc("roi_heads.box_head.fc1", 1024, 256 * 49)
    fc("roi_heads.box_head.fc2", 1024, 1024)
    fc("roi_heads.box_predictor.cls_score", 81, 1024)
    fc("roi_heads.box_predictor.bbox_pred", 320, 1024)
    for i in range(1, 5):
        conv(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
    sd["roi_heads.mask_head.deconv.weight"] = rng.standard_normal(
        (256, 256, 2, 2)
    ).astype(np.float32) * 0.01
    sd["roi_heads.mask_head.deconv.bias"] = np.zeros(256, np.float32)
    conv("roi_heads.mask_head.predictor", 80, 256, 1)
    return sd


def test_convert_mask_rcnn_real_shapes():
    """Real-layout conversion + forward (catches key-mapping / transpose
    errors the tiny tests miss, VERDICT weak #4 pattern)."""
    from robust_cvd_tpu.models.torch_port import convert_mask_rcnn_r50fpn

    rng = np.random.default_rng(5)
    sd = _detectron2_layout_state(rng)
    params = convert_mask_rcnn_r50fpn(sd)

    net = M.MaskRCNN()
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    ref = net.init(jax.random.PRNGKey(0), img)["params"]

    # converted tree must match the module's own structure/shapes exactly
    flat_ref = jax.tree_util.tree_flatten_with_path(ref)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(params)[0]
    paths_ref = {jax.tree_util.keystr(p): v.shape for p, v in flat_ref}
    paths_got = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_got}
    assert paths_ref == paths_got

    det = net.apply({"params": params}, img)
    assert np.all(np.isfinite(np.asarray(det["boxes"])))


def test_fc1_reorder_is_consistent():
    """fc1's (C,7,7)->(7,7,C) re-ordering: a torch matmul on a torch-flattened
    tensor must equal the flax Dense on the NHWC-flattened tensor."""
    rng = np.random.default_rng(6)
    c, h, w = 5, 7, 7
    feat = rng.standard_normal((c, h, w)).astype(np.float32)
    wt = rng.standard_normal((11, c * h * w)).astype(np.float32)
    want = wt @ feat.reshape(-1)

    flax_in = feat.transpose(1, 2, 0).reshape(-1)  # NHWC flatten
    kernel = wt.reshape(11, c, h, w).transpose(2, 3, 1, 0).reshape(h * w * c, 11)
    got = flax_in @ kernel
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_roi_align_fpn_atlas_matches_per_level():
    """The single-pass atlas ROIAlign must equal computing ROIAlign on each
    box's assigned level map directly (the pre-atlas formulation)."""
    rng = np.random.default_rng(9)
    H0, W0 = 64, 96  # stride-4 level dims
    feats = [
        jnp.asarray(
            rng.standard_normal((1, H0 // 2**i, W0 // 2**i, 5)), jnp.float32
        )
        for i in range(5)  # P2..P6 (fpn passes 5; roi uses first 4)
    ]
    # boxes spanning all 4 assignment levels (areas ~32^2 .. 500^2), plus
    # edge-hangers exercising the zero-pad border
    boxes = np.asarray(
        [
            [4, 4, 36, 36],        # small -> P2
            [0, 0, 100, 100],      # -> P3
            [-8, -8, 200, 220],    # hangs out, -> P4
            [0, 0, 380, 250],      # large -> P5
            [360, 240, 383, 255],  # corner sliver -> P2
        ],
        np.float32,
    )
    got = np.asarray(M.roi_align_fpn(feats, jnp.asarray(boxes), 7))
    lvl = np.asarray(M.assign_levels(jnp.asarray(boxes)))
    for i, box in enumerate(boxes):
        li = int(lvl[i]) - 2
        want = np.asarray(
            M.roi_align_level(
                feats[li][0], jnp.asarray(box[None]), 7, 4.0 * 2**li
            )
        )[0]
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)
