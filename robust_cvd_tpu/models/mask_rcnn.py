"""Mask R-CNN R50-FPN in Flax (NHWC, TPU-native, inference).

The reference generates dynamic-object masks with Detectron2's
`COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x` model
(reference dynamic_mask_generation.py:34-41, 107-239; utils/predictor.py).
This is a from-scratch re-implementation of that architecture designed for
XLA/TPU rather than a port of detectron2's dynamic-shape CUDA pipeline:

  - every stage has STATIC shapes: fixed top-k proposal counts, NMS as a
    fixed-trip greedy suppression loop (`lax.fori_loop`) over a dense IoU
    matrix, fixed `max_detections` outputs with validity scores,
  - ROIAlign is ONE vectorized gather pass over a vertically-stacked
    FPN-level atlas (each box samples at its assigned level's row origin
    with its level's stride) — no dynamic per-box loops, no per-level
    redundancy,
  - mask pasting resamples every detection's 28x28 mask over the full
    image grid in one vectorized op (no per-box dynamic crops),
  - compute path in bfloat16 (frozen BatchNorm is a folded affine), box
    math in float32.

Weights come from the detectron2 checkpoint (a pickle of numpy arrays) via
`models/torch_port.py::convert_mask_rcnn_r50fpn`; with no checkpoint in the
environment the pipeline falls back to geometric motion segmentation
(pipeline/masks.py).
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# COCO "dynamic object" categories: person + vehicle + animal
# (reference dynamic_mask_generation.py:41).
DYNAMIC_OBJECT_CATEGORIES = tuple(range(0, 8)) + tuple(range(13, 23))

# Detectron2 R50-FPN defaults (configs/mask_rcnn_R_50_FPN_3x.yaml lineage).
PIXEL_MEAN_BGR = (103.530, 116.280, 123.675)
ANCHOR_SIZES = (32, 64, 128, 256, 512)  # one size per level P2..P6
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
RPN_PRE_NMS_TOPK = 1000  # test-time, per level
RPN_POST_NMS_TOPK = 1000  # test-time, across levels
RPN_NMS_THRESH = 0.7
ROI_SCORE_THRESH = 0.5  # reference confidence_threshold
ROI_NMS_THRESH = 0.5
MAX_DETECTIONS = 100
BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)  # ROI head; RPN uses (1,1,1,1)
SCALE_CLAMP = math.log(1000.0 / 16)


class FrozenBN(nn.Module):
    """Detectron2's FrozenBatchNorm: a per-channel affine with the running
    statistics folded in by the weight converter."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class Bottleneck(nn.Module):
    """ResNet-50 bottleneck (groups=1) with FrozenBN."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(FrozenBN(name="bn1")(y))
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.relu(FrozenBN(name="bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBN(name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = FrozenBN(name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet50FPN(nn.Module):
    """ResNet-50 backbone + FPN returning {P2..P6} at 256 channels."""

    layers: Sequence[int] = (3, 4, 6, 3)
    fpn_channels: int = 256
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem_conv1")(x)
        y = nn.relu(FrozenBN(name="stem_bn1")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        planes = (64, 128, 256, 512)
        for stage, (blocks, p) in enumerate(zip(self.layers, planes)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                y = Bottleneck(
                    planes=p, stride=stride if b == 0 else 1,
                    downsample=(b == 0), dtype=self.dtype,
                    name=f"res{stage + 2}_{b}",
                )(y)
            feats.append(y)
        c2, c3, c4, c5 = feats

        # FPN: 1x1 laterals, nearest top-down, 3x3 outputs
        laterals = []
        for i, c in enumerate((c2, c3, c4, c5)):
            laterals.append(
                nn.Conv(self.fpn_channels, (1, 1), dtype=self.dtype,
                        name=f"fpn_lateral{i + 2}")(c)
            )
        tops = [laterals[3]]
        for i in (2, 1, 0):
            up = jnp.repeat(jnp.repeat(tops[0], 2, axis=1), 2, axis=2)
            up = up[:, : laterals[i].shape[1], : laterals[i].shape[2], :]
            tops.insert(0, laterals[i] + up)
        outs = [
            nn.Conv(self.fpn_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"fpn_output{i + 2}")(t)
            for i, t in enumerate(tops)
        ]
        p6 = nn.max_pool(outs[3], (1, 1), strides=(2, 2))
        return outs + [p6]  # [P2, P3, P4, P5, P6]


class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness / anchor-delta heads (A=3 anchors)."""

    num_anchors: int = len(ANCHOR_RATIOS)
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name="objectness_logits")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                         name="anchor_deltas")
        out = []
        for f in feats:
            t = nn.relu(conv(f))
            out.append((obj(t).astype(jnp.float32),
                        deltas(t).astype(jnp.float32)))
        return out


class BoxHead(nn.Module):
    """2-FC box head + class/box predictors (81 classes: 80 + background)."""

    num_classes: int = 80
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (R, 7, 7, 256)
        r = x.shape[0]
        y = x.astype(self.dtype).reshape(r, -1)
        y = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc1")(y))
        y = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc2")(y))
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          name="cls_score")(y)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          name="bbox_pred")(y)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class MaskHead(nn.Module):
    """4x conv + 2x deconv + per-class 28x28 mask predictor."""

    num_classes: int = 80
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (R, 14, 14, 256)
        y = x.astype(self.dtype)
        for i in range(4):
            y = nn.relu(
                nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"mask_fcn{i + 1}")(y)
            )
        # transpose_kernel=True gives torch ConvTranspose2d tap placement
        # (kernel layout (kh, kw, out, in); validated vs torch in
        # tests/test_mask_rcnn.py)
        y = nn.relu(
            nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=self.dtype,
                             transpose_kernel=True, padding="VALID",
                             name="deconv")(y)
        )
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="predictor")(y)
        return y.astype(jnp.float32)  # (R, 28, 28, 80) logits


# --------------------------------------------------------------------------
# Box math (float32, detectron2 Box2BoxTransform conventions)
# --------------------------------------------------------------------------


def decode_boxes(anchors, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    """anchors (..., 4) xyxy + deltas (..., 4) -> boxes (..., 4) xyxy."""
    wx, wy, ww, wh = weights
    ax0, ay0, ax1, ay1 = jnp.split(anchors, 4, axis=-1)
    dx, dy, dw, dh = jnp.split(deltas, 4, axis=-1)
    aw = ax1 - ax0
    ah = ay1 - ay0
    acx = ax0 + 0.5 * aw
    acy = ay0 + 0.5 * ah
    cx = dx / wx * aw + acx
    cy = dy / wy * ah + acy
    w = jnp.exp(jnp.minimum(dw / ww, SCALE_CLAMP)) * aw
    h = jnp.exp(jnp.minimum(dh / wh, SCALE_CLAMP)) * ah
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def clip_boxes(boxes, hw):
    h, w = hw
    x0 = jnp.clip(boxes[..., 0], 0.0, w)
    y0 = jnp.clip(boxes[..., 1], 0.0, h)
    x1 = jnp.clip(boxes[..., 2], 0.0, w)
    y1 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def pairwise_iou(a, b):
    """(K, 4) x (M, 4) -> (K, M) IoU."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    x0 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y0 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x1 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y1 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_keep(boxes, scores, iou_thresh, valid=None):
    """Greedy NMS as a fixed-point iteration of the vectorized
    suppression operator.

    Greedy NMS is the unique solution of the well-founded recursion
    `keep[i] = valid[i] and no kept j earlier in score order overlaps i`.
    Iterating `keep <- F(keep)` with
    `F(keep)[i] = v[i] & ~any_j(sup[j, i] & keep[j])` (sup = strict
    upper-triangular IoU>t in score order) converges to that unique fixed
    point in at most the suppression-chain depth (a suppresses b which
    would have suppressed c, ...) — a handful of trips in practice — and
    each trip is one (K, K) masked reduction on the VPU. The previous
    per-candidate `fori_loop` was K=1000 *serial* dependent steps and
    latency-dominated the whole Mask R-CNN frame (15.3 ms for one call,
    six calls per frame; see PERF.md round 4).

    Returns a 0/1 keep mask aligned with the inputs (NOT sorted); static
    shapes throughout (no variable-length index list, the CUDA idiom).
    """
    k = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    iou = pairwise_iou(b, b)
    v = jnp.ones((k,), bool) if valid is None else valid[order]
    # sup[j, i]: j (earlier in score order) suppresses i when kept
    ar = jnp.arange(k)
    sup = (iou > iou_thresh) & (ar[:, None] < ar[None, :]) & v[:, None]

    # Fixed-point iteration converges in at most the suppression-chain
    # depth <= k trips; the trip bound keeps worst-case latency at the old
    # serial-NMS cost (k trips of the vectorized O(k^2) body) even on
    # adversarial long-chain layouts.
    def cond(c):
        return c[1] & (c[2] < k)

    def body(c):
        keep, _, trip = c
        new = v & ~jnp.any(sup & keep[:, None], axis=0)
        return new, jnp.any(new != keep), trip + 1

    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (v, jnp.array(True), jnp.array(0, jnp.int32))
    )
    inv = jnp.zeros((k,), jnp.int32).at[order].set(jnp.arange(k))
    return keep_sorted[inv]


def batched_nms(boxes, scores, idxs, iou_thresh, valid=None):
    """Category-independent NMS via the coordinate-offset trick."""
    span = jnp.max(boxes) + 1.0
    off = idxs.astype(jnp.float32)[:, None] * span
    return nms_keep(boxes + off, scores, iou_thresh, valid=valid)


# --------------------------------------------------------------------------
# ROIAlign (aligned=True, sampling_ratio=2) — batched, static shapes
# --------------------------------------------------------------------------


def _bilinear_sample(feat, xs, ys):
    """feat (H, W, C); xs/ys (...,) continuous pixel coords -> (..., C).
    Out-of-range samples read 0 (detectron2 zero-pads)."""
    h, w, _ = feat.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return feat[yc, xc] * ok[..., None]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def roi_align_level(feat, boxes, out_size: int, stride: float,
                    sampling: int = 2):
    """feat (H, W, C), boxes (R, 4) image-space xyxy -> (R, out, out, C).

    detectron2 ROIAlignV2 semantics: aligned (half-pixel offset), bin grid
    of `sampling`^2 samples averaged per bin.
    """
    r = boxes.shape[0]
    b = boxes / stride - 0.5  # aligned=True continuous coords
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = jnp.maximum(x1 - x0, 1e-6)
    bh = jnp.maximum(y1 - y0, 1e-6)

    n = out_size * sampling
    # sample centers: (R, n) per axis
    gi = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    xs = x0[:, None] + gi[None, :] * bw[:, None]
    ys = y0[:, None] + gi[None, :] * bh[:, None]
    xx = jnp.broadcast_to(xs[:, None, :], (r, n, n))
    yy = jnp.broadcast_to(ys[:, :, None], (r, n, n))
    samples = _bilinear_sample(feat, xx, yy)  # (R, n, n, C)
    c = samples.shape[-1]
    samples = samples.reshape(r, out_size, sampling, out_size, sampling, c)
    return samples.mean(axis=(2, 4))


def assign_levels(boxes, k_min=2, k_max=5):
    """FPN level per box: floor(4 + log2(sqrt(area)/224)), clamped."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / 224.0 + 1e-9))
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32)


def _bilinear_sample_levels(atlas, xs, ys, hb, wb, yob):
    """Bilinear taps from a vertically-stacked level atlas. xs/ys are
    LEVEL-LOCAL continuous coords (R, n, n); hb/wb/yob are each box's level
    dims + atlas row origin (R,) int32. Out-of-level taps read 0 — identical
    border semantics to _bilinear_sample on the individual level map."""
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    hbb = hb[:, None, None]
    wbb = wb[:, None, None]
    yo = yob[:, None, None]

    def tap(yi, xi):
        ok = (yi >= 0) & (yi < hbb) & (xi >= 0) & (xi < wbb)
        yc = jnp.clip(yi, 0, hbb - 1) + yo
        xc = jnp.clip(xi, 0, wbb - 1)
        return atlas[yc, xc] * ok[..., None]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def roi_align_fpn(feats, boxes, out_size: int, sampling: int = 2):
    """Multi-level ROIAlign as ONE gather pass: the P2..P5 maps are stacked
    into a vertical atlas (zero-padded to common width) and each box samples
    at its assigned level's row origin with its level's stride. Static
    shapes, no per-level redundancy (the earlier one-hot blend gathered all
    4 levels for every box — 4x the taps; PERF.md)."""
    lvl = assign_levels(boxes)
    maps = [f.astype(jnp.float32)[0] for f in feats[:4]]  # P2..P5
    hs = [m.shape[0] for m in maps]
    ws = [m.shape[1] for m in maps]
    W = max(ws)
    atlas = jnp.concatenate(
        [jnp.pad(m, ((0, 0), (0, W - m.shape[1]), (0, 0))) for m in maps],
        axis=0,
    )
    y_off = [0, hs[0], hs[0] + hs[1], hs[0] + hs[1] + hs[2]]
    li = lvl - 2  # (R,) index into P2..P5
    hb = jnp.asarray(hs, jnp.int32)[li]
    wb = jnp.asarray(ws, jnp.int32)[li]
    yob = jnp.asarray(y_off, jnp.int32)[li]
    stride_b = 4.0 * (2.0 ** li.astype(jnp.float32))

    r = boxes.shape[0]
    b = boxes / stride_b[:, None] - 0.5  # aligned=True level-local coords
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = jnp.maximum(x1 - x0, 1e-6)
    bh = jnp.maximum(y1 - y0, 1e-6)
    n = out_size * sampling
    gi = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    xs = x0[:, None] + gi[None, :] * bw[:, None]
    ys = y0[:, None] + gi[None, :] * bh[:, None]
    xx = jnp.broadcast_to(xs[:, None, :], (r, n, n))
    yy = jnp.broadcast_to(ys[:, :, None], (r, n, n))
    samples = _bilinear_sample_levels(atlas, xx, yy, hb, wb, yob)
    c = samples.shape[-1]
    samples = samples.reshape(r, out_size, sampling, out_size, sampling, c)
    return samples.mean(axis=(2, 4))


# --------------------------------------------------------------------------
# Anchors + full model
# --------------------------------------------------------------------------


def level_anchors(hw: Tuple[int, int], stride: int, size: float):
    """(H*W*A, 4) xyxy anchors for one level (detectron2 grid convention:
    centers at (x + 0.5) * stride? -- detectron2 uses x * stride offsets)."""
    h, w = hw
    ws, hs = [], []
    for ratio in ANCHOR_RATIOS:
        area = size * size
        aw = math.sqrt(area / ratio)
        ah = aw * ratio
        ws.append(aw)
        hs.append(ah)
    ws = jnp.asarray(ws, jnp.float32)
    hs = jnp.asarray(hs, jnp.float32)
    base = jnp.stack([-ws / 2, -hs / 2, ws / 2, hs / 2], axis=-1)  # (A, 4)
    sx = (jnp.arange(w, dtype=jnp.float32)) * stride
    sy = (jnp.arange(h, dtype=jnp.float32)) * stride
    shift = jnp.stack(
        jnp.meshgrid(sx, sy, indexing="xy") * 2, axis=-1
    ).reshape(h * w, 1, 4)
    return (shift + base[None]).reshape(-1, 4)


class MaskRCNN(nn.Module):
    """Full inference graph: image (1, H, W, 3) RGB in [0, 1] ->
    dict(boxes (D, 4), scores (D,), classes (D,), masks (D, 28, 28)).

    Invalid detection slots have score 0 (static MAX_DETECTIONS output).
    """

    num_classes: int = 80
    dtype: type = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet50FPN(dtype=self.dtype, name="backbone")
        self.rpn = RPNHead(dtype=self.dtype, name="rpn")
        self.box_head = BoxHead(self.num_classes, dtype=self.dtype,
                                name="box_head")
        self.mask_head = MaskHead(self.num_classes, dtype=self.dtype,
                                  name="mask_head")

    def __call__(self, image):
        h, w = image.shape[1:3]
        x = image[..., ::-1] * 255.0  # RGB -> BGR, detectron2 pixel space
        x = x - jnp.asarray(PIXEL_MEAN_BGR, image.dtype)
        feats = self.backbone(x)
        rpn_out = self.rpn(feats)

        # -- proposals ------------------------------------------------------
        all_boxes, all_scores = [], []
        for i, (obj, deltas) in enumerate(rpn_out):
            stride = 4 * (2 ** i)
            fh, fw = obj.shape[1:3]
            anchors = level_anchors((fh, fw), stride, ANCHOR_SIZES[i])
            scores = obj[0].reshape(-1)
            d = deltas[0].reshape(fh * fw, len(ANCHOR_RATIOS), 4).reshape(-1, 4)
            k = min(RPN_PRE_NMS_TOPK, scores.shape[0])
            top_scores, top_idx = jax.lax.top_k(scores, k)
            boxes = decode_boxes(anchors[top_idx], d[top_idx])
            boxes = clip_boxes(boxes, (h, w))
            keep = nms_keep(boxes, top_scores, RPN_NMS_THRESH)
            all_boxes.append(boxes)
            all_scores.append(jnp.where(keep, top_scores, -jnp.inf))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        k = min(RPN_POST_NMS_TOPK, scores.shape[0])
        prop_scores, idx = jax.lax.top_k(scores, k)
        proposals = boxes[idx]  # (R, 4)

        # -- box head -------------------------------------------------------
        pooled = roi_align_fpn(feats, proposals, 7)
        cls_logits, box_deltas = self.box_head(pooled)
        probs = jax.nn.softmax(cls_logits, axis=-1)[:, :-1]  # drop background
        r = proposals.shape[0]
        deltas = box_deltas.reshape(r, self.num_classes, 4)
        det_boxes = decode_boxes(
            proposals[:, None, :], deltas, weights=BBOX_REG_WEIGHTS
        )
        det_boxes = clip_boxes(det_boxes, (h, w))

        flat_boxes = det_boxes.reshape(-1, 4)
        flat_scores = probs.reshape(-1)
        flat_cls = jnp.broadcast_to(
            jnp.arange(self.num_classes)[None, :], probs.shape
        ).reshape(-1)
        valid = flat_scores > ROI_SCORE_THRESH
        # cap the NMS problem: top 1000 candidates by score
        kk = min(1000, flat_scores.shape[0])
        cand_scores, cand_idx = jax.lax.top_k(
            jnp.where(valid, flat_scores, -jnp.inf), kk
        )
        cand_boxes = flat_boxes[cand_idx]
        cand_cls = flat_cls[cand_idx]
        keep = batched_nms(
            cand_boxes, cand_scores, cand_cls, ROI_NMS_THRESH,
            valid=jnp.isfinite(cand_scores),
        )
        final_scores, fidx = jax.lax.top_k(
            jnp.where(keep, cand_scores, -jnp.inf), MAX_DETECTIONS
        )
        final_boxes = cand_boxes[fidx]
        final_cls = cand_cls[fidx]
        final_scores = jnp.where(
            jnp.isfinite(final_scores), final_scores, 0.0
        )

        # -- mask head ------------------------------------------------------
        mpooled = roi_align_fpn(feats, final_boxes, 14)
        mask_logits = self.mask_head(mpooled)  # (D, 28, 28, 80)
        masks = jax.nn.sigmoid(
            jnp.take_along_axis(
                mask_logits, final_cls[:, None, None, None], axis=-1
            )[..., 0]
        )
        return {
            "boxes": final_boxes,
            "scores": final_scores,
            "classes": final_cls,
            "masks": masks,
        }


def paste_masks(masks, boxes, hw: Tuple[int, int], threshold: float = 0.5):
    """(D, 28, 28) masks + (D, 4) boxes -> (D, H, W) bool, vectorized over
    the full image grid (no per-box dynamic crops).

    Zero-padded bilinear is SEPARABLE: value(x, y) = sum_k sum_l
    hat(my-k) hat(mx-l) m[k,l] with hat(t) = max(0, 1-|t|), so the paste
    is two per-detection matmuls (D,H,28)@(D,28,28)@(D,28,W) on the MXU
    instead of 4 gathered taps per output pixel — measured 5020 ms -> the
    gather formulation was 96% of the whole Mask R-CNN frame at 800x1344
    (PERF.md)."""
    h, w = hw
    d, ms, _ = masks.shape
    x = jnp.arange(w, dtype=jnp.float32) + 0.5
    y = jnp.arange(h, dtype=jnp.float32) + 0.5
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x1 - x0, 1e-6)
    bh = jnp.maximum(y1 - y0, 1e-6)
    # image pixel -> continuous mask coords
    mx = (x[None, :] - x0[:, None]) / bw[:, None] * ms - 0.5  # (D, W)
    my = (y[None, :] - y0[:, None]) / bh[:, None] * ms - 0.5  # (D, H)

    k = jnp.arange(ms, dtype=jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(my[..., None] - k))  # (D, H, ms)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(mx[..., None] - k))  # (D, W, ms)
    vals = jnp.einsum(
        "dhk,dkl,dwl->dhw", wy, masks, wx, precision=jax.lax.Precision.HIGHEST
    )
    inside = (
        (x[None, None, :] >= x0[:, None, None])
        & (x[None, None, :] <= x1[:, None, None])
        & (y[None, :, None] >= y0[:, None, None])
        & (y[None, :, None] <= y1[:, None, None])
    )
    return (vals > threshold) & inside


def dynamic_mask_from_detections(det: Dict, hw: Tuple[int, int],
                                 score_thresh: float = ROI_SCORE_THRESH):
    """Union of pasted masks over the dynamic COCO categories ->
    (H, W) bool, True = DYNAMIC (caller dilates + inverts like the
    reference, dynamic_mask_generation.py:156-182)."""
    dyn = jnp.isin(det["classes"], jnp.asarray(DYNAMIC_OBJECT_CATEGORIES))
    sel = dyn & (det["scores"] > score_thresh)
    pasted = paste_masks(det["masks"], det["boxes"], hw)
    return jnp.any(pasted & sel[:, None, None], axis=0)
