"""Reference-layout state-dict generators at REAL shapes (random values).

These replicate the exact key names + tensor shapes of the reference's
shipped checkpoints so the torch->flax converters can be validated end-to-end
without the (unavailable) pretrained files:

  - `midas_v21-f6b98070.pt`: MidasNet over a ResNeXt-101 32x8d backbone
    (reference monodepth/midas_v2/midas_net.py:13-75, blocks.py:19-52;
    torchvision resnext101_32x8d layout).
  - `raft-things.pth`: RAFT with BasicEncoder fnet (instance norm, no
    affine params) + cnet (batch norm) + BasicUpdateBlock (reference
    raft/core/extractor.py, update.py, raft.py). Key/shape table verified
    against the reference model's state_dict (179 tensors).
"""

from __future__ import annotations

import numpy as np
import torch


def _t(rng, *shape):
    return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)


def _bn(sd, rng, key, c):
    sd[f"{key}.weight"] = _t(rng, c).abs() + 0.5
    sd[f"{key}.bias"] = _t(rng, c)
    sd[f"{key}.running_mean"] = _t(rng, c)
    sd[f"{key}.running_var"] = _t(rng, c).abs() + 0.5
    sd[f"{key}.num_batches_tracked"] = torch.tensor(0)


def make_midas_v21_state_dict(seed: int = 0):
    """Full-scale midas_v21 layout: ResNeXt-101 32x8d + RefineNet scratch."""
    rng = np.random.default_rng(seed)
    sd = {}

    sd["pretrained.layer1.0.weight"] = _t(rng, 64, 3, 7, 7)
    _bn(sd, rng, "pretrained.layer1.1", 64)

    # (stage, num_blocks, planes); width = planes*4 = out channels (32x8d)
    specs = [(1, 3, 64), (2, 4, 128), (3, 23, 256), (4, 3, 512)]
    in_ch = 64
    for stage, blocks, planes in specs:
        width = planes * 4
        out = planes * 4
        prefix = "pretrained.layer1.4" if stage == 1 else f"pretrained.layer{stage}"
        for b in range(blocks):
            src = f"{prefix}.{b}"
            cin = in_ch if b == 0 else out
            sd[f"{src}.conv1.weight"] = _t(rng, width, cin, 1, 1)
            _bn(sd, rng, f"{src}.bn1", width)
            # grouped 3x3: groups=32 -> per-group input width/32
            sd[f"{src}.conv2.weight"] = _t(rng, width, width // 32, 3, 3)
            _bn(sd, rng, f"{src}.bn2", width)
            sd[f"{src}.conv3.weight"] = _t(rng, out, width, 1, 1)
            _bn(sd, rng, f"{src}.bn3", out)
            if b == 0:
                sd[f"{src}.downsample.0.weight"] = _t(rng, out, cin, 1, 1)
                _bn(sd, rng, f"{src}.downsample.1", out)
        in_ch = out

    for k, cin in zip(range(1, 5), (256, 512, 1024, 2048)):
        sd[f"scratch.layer{k}_rn.weight"] = _t(rng, 256, cin, 3, 3)

    for k in range(1, 5):
        for rcu in ("resConfUnit1", "resConfUnit2"):
            for c in ("conv1", "conv2"):
                sd[f"scratch.refinenet{k}.{rcu}.{c}.weight"] = _t(rng, 256, 256, 3, 3)
                sd[f"scratch.refinenet{k}.{rcu}.{c}.bias"] = _t(rng, 256)

    sd["scratch.output_conv.0.weight"] = _t(rng, 128, 256, 3, 3)
    sd["scratch.output_conv.0.bias"] = _t(rng, 128)
    sd["scratch.output_conv.2.weight"] = _t(rng, 32, 128, 3, 3)
    sd["scratch.output_conv.2.bias"] = _t(rng, 32)
    sd["scratch.output_conv.4.weight"] = _t(rng, 1, 32, 1, 1)
    sd["scratch.output_conv.4.bias"] = _t(rng, 1)
    return sd


def _encoder(sd, rng, enc: str, batch_norm: bool):
    """BasicEncoder(output_dim=256): conv1 7x7/64, 3 residual layers
    (64, 96, 128), conv2 1x1 -> 256. Instance norm carries no params."""
    sd[f"{enc}.conv1.weight"] = _t(rng, 64, 3, 7, 7)
    sd[f"{enc}.conv1.bias"] = _t(rng, 64)
    if batch_norm:
        _bn(sd, rng, f"{enc}.norm1", 64)
    dims = [(64, 64), (64, 96), (96, 128)]
    for li, (cin, cout) in enumerate(dims, start=1):
        for b in range(2):
            src = f"{enc}.layer{li}.{b}"
            c0 = cin if b == 0 else cout
            sd[f"{src}.conv1.weight"] = _t(rng, cout, c0, 3, 3)
            sd[f"{src}.conv1.bias"] = _t(rng, cout)
            sd[f"{src}.conv2.weight"] = _t(rng, cout, cout, 3, 3)
            sd[f"{src}.conv2.bias"] = _t(rng, cout)
            if batch_norm:
                _bn(sd, rng, f"{src}.norm1", cout)
                _bn(sd, rng, f"{src}.norm2", cout)
            if b == 0 and (cin != cout or li > 1):
                sd[f"{src}.downsample.0.weight"] = _t(rng, cout, c0, 1, 1)
                sd[f"{src}.downsample.0.bias"] = _t(rng, cout)
                if batch_norm:
                    _bn(sd, rng, f"{src}.downsample.1", cout)
                    # the reference registers the same norm module both as
                    # `norm3` and inside the downsample Sequential, so the
                    # checkpoint carries aliased keys (extractor.py)
                    for suf in (
                        "weight", "bias", "running_mean", "running_var",
                        "num_batches_tracked",
                    ):
                        sd[f"{src}.norm3.{suf}"] = sd[f"{src}.downsample.1.{suf}"]
    sd[f"{enc}.conv2.weight"] = _t(rng, 256, 128, 1, 1)
    sd[f"{enc}.conv2.bias"] = _t(rng, 256)


def make_raft_things_state_dict(seed: int = 0):
    """Full-scale raft-things layout (179 tensors)."""
    rng = np.random.default_rng(seed)
    sd = {}
    _encoder(sd, rng, "fnet", batch_norm=False)
    _encoder(sd, rng, "cnet", batch_norm=True)

    # BasicMotionEncoder: corr planes = 4 levels * (2*4+1)^2 = 324
    ub = "update_block"
    for key, (o, i, kh, kw) in {
        f"{ub}.encoder.convc1": (256, 324, 1, 1),
        f"{ub}.encoder.convc2": (192, 256, 3, 3),
        f"{ub}.encoder.convf1": (128, 2, 7, 7),
        f"{ub}.encoder.convf2": (64, 128, 3, 3),
        f"{ub}.encoder.conv": (126, 256, 3, 3),
        f"{ub}.gru.convz1": (128, 384, 1, 5),
        f"{ub}.gru.convr1": (128, 384, 1, 5),
        f"{ub}.gru.convq1": (128, 384, 1, 5),
        f"{ub}.gru.convz2": (128, 384, 5, 1),
        f"{ub}.gru.convr2": (128, 384, 5, 1),
        f"{ub}.gru.convq2": (128, 384, 5, 1),
        f"{ub}.flow_head.conv1": (256, 128, 3, 3),
        f"{ub}.flow_head.conv2": (2, 256, 3, 3),
        f"{ub}.mask.0": (256, 128, 3, 3),
        f"{ub}.mask.2": (576, 256, 1, 1),
    }.items():
        sd[f"{key}.weight"] = _t(rng, o, i, kh, kw)
        sd[f"{key}.bias"] = _t(rng, o)
    return sd
