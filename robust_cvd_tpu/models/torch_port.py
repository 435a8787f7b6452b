"""Torch checkpoint -> Flax parameter conversion.

Ports the reference's shipped weights into the Flax re-implementations:
  - MiDaS-v2.1 `midas_v21-f6b98070.pt` (reference midas_v2_model.py:10-12)
  - RAFT `raft-things.pth` (reference optical_flow_homography.py:245-258)

Pure tensor-renaming/transposition — no torch model classes are needed, just
the pickled state dicts. Conv kernels OIHW -> HWIO; BatchNorm running stats
go to flax `batch_stats`.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv_kernel(t):
    return np.transpose(_np(t), (2, 3, 1, 0))  # OIHW -> HWIO


def _set(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def load_torch_state_dict(path: str) -> Dict[str, "np.ndarray"]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # strip DataParallel "module." prefixes
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def convert_midas_v2(sd: Dict) -> Tuple[dict, dict]:
    """midas_v21 state dict -> (params, batch_stats) for models.midas.MidasNet.

    Checkpoint layout (reference midas_v2/blocks.py:19-52 wiring):
      pretrained.layer1.0 = conv1, .1 = bn1, .4.{i} = resnet layer1 blocks;
      pretrained.layer{2,3,4}.{i} = blocks; scratch.layerK_rn,
      scratch.refinenetK.resConfUnit{1,2}.conv{1,2},
      scratch.output_conv.{0,2,4}.
    """
    params: dict = {}
    stats: dict = {}

    def put_conv(flax_path, key, bias=True):
        _set(params, flax_path + ("kernel",), _conv_kernel(sd[key + ".weight"]))
        if bias and key + ".bias" in sd:
            _set(params, flax_path + ("bias",), _np(sd[key + ".bias"]))

    def put_bn(flax_path, key):
        _set(params, flax_path + ("scale",), _np(sd[key + ".weight"]))
        _set(params, flax_path + ("bias",), _np(sd[key + ".bias"]))
        _set(stats, flax_path + ("mean",), _np(sd[key + ".running_mean"]))
        _set(stats, flax_path + ("var",), _np(sd[key + ".running_var"]))

    put_conv(("pretrained", "conv1"), "pretrained.layer1.0", bias=False)
    put_bn(("pretrained", "bn1"), "pretrained.layer1.1")

    for stage in range(1, 5):
        prefix = (
            "pretrained.layer1.4" if stage == 1 else f"pretrained.layer{stage}"
        )
        b = -1
        while f"{prefix}.{b + 1}.conv1.weight" in sd:
            b += 1
            src = f"{prefix}.{b}"
            dst = ("pretrained", f"layer{stage}_{b}")
            for c in ("conv1", "conv2", "conv3"):
                put_conv(dst + (c,), f"{src}.{c}", bias=False)
            for bn in ("bn1", "bn2", "bn3"):
                put_bn(dst + (bn,), f"{src}.{bn}")
            if f"{src}.downsample.0.weight" in sd:
                put_conv(dst + ("downsample_conv",), f"{src}.downsample.0", bias=False)
                put_bn(dst + ("downsample_bn",), f"{src}.downsample.1")

    for k in range(1, 5):
        put_conv((f"layer{k}_rn",), f"scratch.layer{k}_rn", bias=False)

    for k in range(1, 5):
        for rcu in ("resConfUnit1", "resConfUnit2"):
            if k == 4 and rcu == "resConfUnit1":
                # refinenet4 receives no skip input, so its resConfUnit1 is
                # dead weight in the checkpoint (reference midas_net.py:66,
                # blocks.py:147-151) and has no flax counterpart
                continue
            for c in ("conv1", "conv2"):
                put_conv(
                    (f"refinenet{k}", rcu, c),
                    f"scratch.refinenet{k}.{rcu}.{c}",
                )

    put_conv(("output_conv1",), "scratch.output_conv.0")
    put_conv(("output_conv2",), "scratch.output_conv.2")
    put_conv(("output_conv3",), "scratch.output_conv.4")

    return params, stats


def convert_raft(sd: Dict) -> Tuple[dict, dict]:
    """raft-things.pth state dict -> (params, batch_stats) for models.raft.RAFT.

    fnet uses InstanceNorm (no parameters); cnet uses BatchNorm (ported into
    batch_stats); all convs carry biases (reference extractor.py)."""
    params: dict = {}
    stats: dict = {}

    def put_conv(flax_path, key):
        _set(params, flax_path + ("kernel",), _conv_kernel(sd[key + ".weight"]))
        if key + ".bias" in sd:
            _set(params, flax_path + ("bias",), _np(sd[key + ".bias"]))

    def put_bn(flax_path, key):
        _set(params, flax_path + ("scale",), _np(sd[key + ".weight"]))
        _set(params, flax_path + ("bias",), _np(sd[key + ".bias"]))
        _set(stats, flax_path + ("mean",), _np(sd[key + ".running_mean"]))
        _set(stats, flax_path + ("var",), _np(sd[key + ".running_var"]))

    for enc in ("fnet", "cnet"):
        put_conv((enc, "conv1"), f"{enc}.conv1")
        if f"{enc}.norm1.weight" in sd:
            put_bn((enc, "norm1", "bn"), f"{enc}.norm1")
        for i in range(1, 4):
            for j in range(2):
                src = f"{enc}.layer{i}.{j}"
                dst = (enc, f"layer{i}_{j}")
                put_conv(dst + ("conv1",), f"{src}.conv1")
                put_conv(dst + ("conv2",), f"{src}.conv2")
                for n in ("norm1", "norm2"):
                    if f"{src}.{n}.weight" in sd:
                        put_bn(dst + (n, "bn"), f"{src}.{n}")
                if f"{src}.downsample.0.weight" in sd:
                    put_conv(dst + ("downsample_conv",), f"{src}.downsample.0")
                    if f"{src}.downsample.1.weight" in sd:
                        put_bn(dst + ("norm3", "bn"), f"{src}.downsample.1")
        put_conv((enc, "conv2"), f"{enc}.conv2")

    # the scanned iteration body nests the update block under
    # update_block/block (models/raft.py _IterBody)
    ub = ("update_block", "block")
    for c in ("convc1", "convc2", "convf1", "convf2", "conv"):
        put_conv(ub + ("encoder", c), f"update_block.encoder.{c}")
    for c in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        put_conv(ub + ("gru", c), f"update_block.gru.{c}")
    put_conv(ub + ("flow_head", "conv1"), "update_block.flow_head.conv1")
    put_conv(ub + ("flow_head", "conv2"), "update_block.flow_head.conv2")
    put_conv(ub + ("mask_conv1",), "update_block.mask.0")
    put_conv(ub + ("mask_conv2",), "update_block.mask.2")

    return params, stats


def load_raft(path: str, iters: int = 20):
    import jax

    from .raft import RAFT

    sd = load_torch_state_dict(path)
    params, stats = convert_raft(sd)
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    stats = jax.tree.map(lambda x: np.asarray(x, np.float32), stats)
    return RAFT(iters=iters), {"params": params, "batch_stats": stats}


def load_midas_v2(path: str):
    """Load + convert; returns a ready MidasV2Adapter."""
    import jax

    from .midas import MidasV2Adapter

    sd = load_torch_state_dict(path)
    params, stats = convert_midas_v2(sd)
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    stats = jax.tree.map(lambda x: np.asarray(x, np.float32), stats)
    return MidasV2Adapter(params=params, batch_stats=stats)


def load_detectron2_pkl(path: str) -> Dict[str, "np.ndarray"]:
    """Detectron2 model zoo checkpoints are pickles of numpy arrays:
    {"model": {key: ndarray}, "__author__": ...}."""
    import pickle

    with open(path, "rb") as f:
        blob = pickle.load(f, encoding="latin1")
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob
    return {k: _np(v) for k, v in sd.items()}


def convert_mask_rcnn_r50fpn(sd: Dict) -> dict:
    """Detectron2 mask_rcnn_R_50_FPN state dict -> params for
    models.mask_rcnn.MaskRCNN (reference dynamic_mask_generation.py:34-41).

    FrozenBatchNorm is folded into a per-channel affine:
      scale = gamma / sqrt(var + eps), bias = beta - mean * scale.
    The box-head fc1 input is re-ordered from torch's (C, 7, 7) flatten to
    flax's NHWC (7, 7, C) flatten.
    """
    eps = 1e-5
    params: dict = {}

    def put_conv(flax_path, key, bias=True):
        _set(params, flax_path + ("kernel",), _conv_kernel(sd[key + ".weight"]))
        if bias and key + ".bias" in sd:
            _set(params, flax_path + ("bias",), _np(sd[key + ".bias"]))

    def put_frozen_bn(flax_path, key):
        gamma = _np(sd[key + ".weight"])
        beta = _np(sd[key + ".bias"])
        mean = _np(sd[key + ".running_mean"])
        var = _np(sd[key + ".running_var"])
        scale = gamma / np.sqrt(var + eps)
        _set(params, flax_path + ("scale",), scale)
        _set(params, flax_path + ("bias",), beta - mean * scale)

    def put_fc(flax_path, key, spatial=None):
        w = _np(sd[key + ".weight"])  # (out, in)
        if spatial is not None:
            c, h, wd = spatial  # torch flatten order (C, H, W)
            out = w.shape[0]
            w = (
                w.reshape(out, c, h, wd)
                .transpose(2, 3, 1, 0)
                .reshape(h * wd * c, out)
            )
        else:
            w = w.T
        _set(params, flax_path + ("kernel",), w)
        _set(params, flax_path + ("bias",), _np(sd[key + ".bias"]))

    bb = "backbone.bottom_up"
    put_conv(("backbone", "stem_conv1"), f"{bb}.stem.conv1", bias=False)
    put_frozen_bn(("backbone", "stem_bn1"), f"{bb}.stem.conv1.norm")
    for stage, blocks in zip((2, 3, 4, 5), (3, 4, 6, 3)):
        for b in range(blocks):
            src = f"{bb}.res{stage}.{b}"
            dst = ("backbone", f"res{stage}_{b}")
            for c in ("conv1", "conv2", "conv3"):
                put_conv(dst + (c,), f"{src}.{c}", bias=False)
                put_frozen_bn(dst + (f"bn{c[-1]}",), f"{src}.{c}.norm")
            if f"{src}.shortcut.weight" in sd:
                put_conv(dst + ("downsample_conv",), f"{src}.shortcut",
                         bias=False)
                put_frozen_bn(dst + ("downsample_bn",), f"{src}.shortcut.norm")
    for lvl in (2, 3, 4, 5):
        put_conv(("backbone", f"fpn_lateral{lvl}"), f"backbone.fpn_lateral{lvl}")
        put_conv(("backbone", f"fpn_output{lvl}"), f"backbone.fpn_output{lvl}")

    rpn = "proposal_generator.rpn_head"
    put_conv(("rpn", "conv"), f"{rpn}.conv")
    put_conv(("rpn", "objectness_logits"), f"{rpn}.objectness_logits")
    put_conv(("rpn", "anchor_deltas"), f"{rpn}.anchor_deltas")

    put_fc(("box_head", "fc1"), "roi_heads.box_head.fc1", spatial=(256, 7, 7))
    put_fc(("box_head", "fc2"), "roi_heads.box_head.fc2")
    put_fc(("box_head", "cls_score"), "roi_heads.box_predictor.cls_score")
    put_fc(("box_head", "bbox_pred"), "roi_heads.box_predictor.bbox_pred")

    for i in range(1, 5):
        put_conv(("mask_head", f"mask_fcn{i}"),
                 f"roi_heads.mask_head.mask_fcn{i}")
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax transpose_kernel
    # layout (kh, kw, out, in)
    _set(
        params,
        ("mask_head", "deconv", "kernel"),
        np.transpose(_np(sd["roi_heads.mask_head.deconv.weight"]), (2, 3, 1, 0)),
    )
    _set(params, ("mask_head", "deconv", "bias"),
         _np(sd["roi_heads.mask_head.deconv.bias"]))
    put_conv(("mask_head", "predictor"), "roi_heads.mask_head.predictor")

    return params
