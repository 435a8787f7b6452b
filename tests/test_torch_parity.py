"""Numerical torch-vs-Flax parity at real shapes.

The acceptance budget ("within 2% photo-consistency of the reference",
BASELINE.md) rides on the ported networks computing the SAME function as
the reference's torch networks. Shape tests can't catch BN-epsilon,
padding, align_corners, or grid_sample semantic drift — these tests can:
the same random state dict is loaded into BOTH the reference torch model
and our Flax model, and the outputs must agree to float32 tolerance.

- RAFT: the reference implementation at /root/reference/raft/core/raft.py
  imports standalone (torch is in the env); full 12-iteration forward at
  128x160 is compared end-to-end.
- MiDaS: the reference's blocks.py needs torchvision (absent), so the
  torch side is reconstructed here from its exact specification
  (reference monodepth/midas_v2/midas_net.py:13-75, blocks.py:19-157,
  torchvision Bottleneck semantics) — full ResNeXt-101 32x8d backbone +
  RefineNet decoder + output head, compared end-to-end at 128x96.

Both nets run in float32 on CPU on both sides; tolerance 1e-3 absolute on
O(1) outputs, far below any semantic drift (a BN-epsilon or align_corners
mismatch moves outputs by >1e-2).
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from robust_cvd_tpu.models import torch_port

torch.manual_seed(0)


def _randomize_bn(module):
    """Give every BatchNorm non-trivial affine params and running stats so
    eval-mode semantics (running stats + eps placement) are actually
    exercised, not hidden behind weight=1/mean=0/var=1 defaults."""
    g = torch.Generator().manual_seed(7)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1
                )
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )


# ---------------------------------------------------------------------------
# RAFT: reference torch net vs models/raft.py
# ---------------------------------------------------------------------------


def test_raft_full_net_parity():
    sys.path.insert(0, "/root/reference")
    try:
        from raft.core.raft import RAFT as TorchRAFT
    finally:
        sys.path.remove("/root/reference")

    import argparse

    args = argparse.Namespace(
        small=False, dropout=0.0, mixed_precision=False, alternate_corr=False
    )
    tmodel = TorchRAFT(args)
    _randomize_bn(tmodel)
    tmodel.eval()

    H, W, iters = 128, 160, 12
    rng = np.random.default_rng(0)
    img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
        t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
        _, flow_t = tmodel(t1, t2, iters=iters, test_mode=True)
    flow_torch = flow_t.numpy().transpose(0, 2, 3, 1)  # (1, H, W, 2)

    from robust_cvd_tpu.models.raft import RAFT

    params, stats = torch_port.convert_raft(tmodel.state_dict())
    fmodel = RAFT(iters=iters, dtype=jnp.float32)
    flow_flax = np.asarray(
        fmodel.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(img1), jnp.asarray(img2),
        )
    )

    assert flow_flax.shape == flow_torch.shape
    # the two implementations must be the same function of the weights
    mag = np.abs(flow_torch).mean()
    assert mag > 1e-3, "degenerate zero flow — test would be vacuous"
    np.testing.assert_allclose(flow_flax, flow_torch, atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------------
# MiDaS: torch reconstruction of the reference net vs models/midas.py
# ---------------------------------------------------------------------------


class _Bottleneck(nn.Module):
    """torchvision Bottleneck, ResNeXt-101 32x8d configuration (the
    reference backbone — blocks.py:31-33 loads resnext101_32x8d_wsl):
    1x1 reduce -> grouped 3x3 (stride here, resnet-B style) -> 1x1 expand,
    BN after each, ReLU between, projection shortcut on the first block."""

    def __init__(self, inplanes, planes, stride=1, groups=32, base_width=8):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        out = planes * 4
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(
            width, width, 3, stride=stride, padding=1, groups=groups, bias=False
        )
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        if stride != 1 or inplanes != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, out, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class _ResidualConvUnit(nn.Module):
    """reference blocks.py:88-123. The skip adds relu(x), not x: the
    reference's inplace ReLU mutates its input before the `out + x`
    (see test_midas_reference_decoder_parity, which runs the reference's
    own code and confirms this numerically)."""

    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, padding=1, bias=True)
        self.conv2 = nn.Conv2d(features, features, 3, padding=1, bias=True)

    def forward(self, x):
        x = F.relu(x)
        out = self.conv2(F.relu(self.conv1(x)))
        return out + x


class _FeatureFusionBlock(nn.Module):
    """reference blocks.py:125-157."""

    def __init__(self, features):
        super().__init__()
        self.resConfUnit1 = _ResidualConvUnit(features)
        self.resConfUnit2 = _ResidualConvUnit(features)

    def forward(self, *xs):
        output = xs[0]
        if len(xs) == 2:
            output = output + self.resConfUnit1(xs[1])
        output = self.resConfUnit2(output)
        return F.interpolate(
            output, scale_factor=2, mode="bilinear", align_corners=True
        )


class _Interpolate(nn.Module):
    """reference blocks.py:54-85 (align_corners=False — note the decoder's
    fusion blocks use align_corners=True; both conventions are exercised)."""

    def forward(self, x):
        return F.interpolate(
            x, scale_factor=2, mode="bilinear", align_corners=False
        )


class _TorchMidasNet(nn.Module):
    """reference midas_net.py:13-75 with the checkpoint's module layout
    (pretrained.layer1 = Sequential(conv1, bn1, relu, maxpool, blocks))."""

    def __init__(self, layers=(3, 4, 23, 3), features=256):
        super().__init__()

        def stage(inplanes, planes, blocks, stride):
            mods = [_Bottleneck(inplanes, planes, stride)]
            for _ in range(1, blocks):
                mods.append(_Bottleneck(planes * 4, planes))
            return nn.Sequential(*mods)

        self.pretrained = nn.Module()
        self.pretrained.layer1 = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(3, stride=2, padding=1),
            stage(64, 64, layers[0], 1),
        )
        self.pretrained.layer2 = stage(256, 128, layers[1], 2)
        self.pretrained.layer3 = stage(512, 256, layers[2], 2)
        self.pretrained.layer4 = stage(1024, 512, layers[3], 2)

        self.scratch = nn.Module()
        for k, cin in zip(range(1, 5), (256, 512, 1024, 2048)):
            setattr(
                self.scratch, f"layer{k}_rn",
                nn.Conv2d(cin, features, 3, padding=1, bias=False),
            )
        for k in range(1, 5):
            setattr(self.scratch, f"refinenet{k}", _FeatureFusionBlock(features))
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(features, 128, 3, padding=1),
            _Interpolate(),
            nn.Conv2d(128, 32, 3, padding=1),
            nn.ReLU(True),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(True),
        )

    def forward(self, x):
        layer_1 = self.pretrained.layer1(x)
        layer_2 = self.pretrained.layer2(layer_1)
        layer_3 = self.pretrained.layer3(layer_2)
        layer_4 = self.pretrained.layer4(layer_3)
        l1 = self.scratch.layer1_rn(layer_1)
        l2 = self.scratch.layer2_rn(layer_2)
        l3 = self.scratch.layer3_rn(layer_3)
        l4 = self.scratch.layer4_rn(layer_4)
        p4 = self.scratch.refinenet4(l4)
        p3 = self.scratch.refinenet3(p4, l3)
        p2 = self.scratch.refinenet2(p3, l2)
        p1 = self.scratch.refinenet1(p2, l1)
        return torch.squeeze(self.scratch.output_conv(p1), dim=1)


def test_midas_full_net_parity():
    tmodel = _TorchMidasNet()
    _randomize_bn(tmodel)
    # bias the head so the final ReLU passes a non-trivial signal
    with torch.no_grad():
        tmodel.scratch.output_conv[4].bias.fill_(0.5)
    tmodel.eval()

    # checkpoint layout check: the fabricated golden layout from round 2
    # and this reconstruction must agree key-for-key and shape-for-shape
    from torch_layouts import make_midas_v21_state_dict

    golden = make_midas_v21_state_dict()
    sd = tmodel.state_dict()
    ours = {k: tuple(v.shape) for k, v in sd.items() if "num_batches" not in k}
    ref = {k: tuple(v.shape) for k, v in golden.items() if "num_batches" not in k}
    assert ours == ref

    H, W = 128, 96
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        disp_torch = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy()  # (1, H, W)

    from robust_cvd_tpu.models.midas import MidasNet

    params, stats = torch_port.convert_midas_v2(sd)
    fmodel = MidasNet(dtype=jnp.float32)
    disp_flax = np.asarray(
        fmodel.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )

    assert disp_flax.shape == disp_torch.shape
    assert (disp_torch > 0).mean() > 0.2, "output mostly clipped — vacuous"
    np.testing.assert_allclose(disp_flax, disp_torch, atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# MiDaS with the REFERENCE'S OWN decoder code (closes the round-3
# reconstruction-vs-reconstruction circularity): monodepth/midas_v2/
# midas_net.py + blocks.py execute verbatim from /root/reference; only the
# torchvision ResNeXt backbone that torch.hub would download is
# reconstructed here (torchvision is absent in this env).
# ---------------------------------------------------------------------------


class _TorchVisionResNeXt(nn.Module):
    """torchvision.models.ResNet in the resnext101_32x8d configuration, the
    exact module torch.hub.load("facebookresearch/WSL-Images",
    "resnext101_32x8d_wsl") returns. Per-line provenance (torchvision
    0.13 torchvision/models/resnet.py):

      - Bottleneck.width = int(planes * (base_width / 64.0)) * groups
        (resnet.py Bottleneck.__init__: width computation) with
        groups=32, width_per_group=8 for resnext101_32x8d
        (resnet.py resnext101_32x8d: kwargs["groups"]=32,
        kwargs["width_per_group"]=8).
      - conv1 = 1x1 conv inplanes->width, no bias (conv1x1), bn1.
      - conv2 = 3x3 conv width->width, stride=stride, padding=dilation=1,
        groups=groups, no bias (conv3x3) — THE STRIDE LIVES ON THE 3x3
        (ResNet-B / "v1.5"), not on conv1; bn2.
      - conv3 = 1x1 conv width->planes*expansion (expansion=4), bn3.
      - forward: relu(bn1 conv1) -> relu(bn2 conv2) -> bn3 conv3,
        += identity (downsample(x) if present), final relu
        (resnet.py Bottleneck.forward).
      - downsample on the first block of a stage when stride != 1 or
        inplanes != planes*expansion: Sequential(conv1x1(stride), bn)
        (resnet.py ResNet._make_layer).
      - stem: conv2d(3, 64, 7, stride=2, padding=3, bias=False), bn, relu,
        maxpool(3, stride=2, padding=1); stages layer1..4 with
        planes 64/128/256/512, blocks 3/4/23/3, strides 1/2/2/2
        (resnet.py ResNet.__init__).
    """

    def __init__(self, layers=(3, 4, 23, 3), groups=32, width_per_group=8):
        super().__init__()
        self.inplanes = 64
        self.groups = groups
        self.base_width = width_per_group
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)

    def _make_layer(self, planes, blocks, stride):
        mods = [
            _Bottleneck(
                self.inplanes, planes, stride, self.groups, self.base_width
            )
        ]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            mods.append(
                _Bottleneck(self.inplanes, planes, 1, self.groups, self.base_width)
            )
        return nn.Sequential(*mods)

    def forward(self, x):  # torchvision ResNet._forward_impl
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def _import_reference_midas(hub_model):
    """Import the reference's monodepth.midas_v2.midas_net with torchvision/
    iopath shims and torch.hub.load patched to return `hub_model` (what the
    hub download would produce). Returns the loaded module."""
    import importlib
    import types

    shims = {}
    for name in ("iopath", "iopath.common", "iopath.common.file_io",
                 "torchvision", "torchvision.models",
                 "torchvision.models.resnet"):
        if name not in sys.modules:
            shims[name] = types.ModuleType(name)

    class _PathManager:  # blocks.py:9 instantiates one; never used after
        pass

    if "iopath.common.file_io" in shims:
        shims["iopath.common.file_io"].PathManager = _PathManager
    if "torchvision.models.resnet" in shims:
        # blocks.py:6 imports these names; they are never called (the
        # backbone arrives via torch.hub.load)
        shims["torchvision.models.resnet"].ResNet = object
        shims["torchvision.models.resnet"].Bottleneck = object

    real_hub_load = torch.hub.load
    torch.hub.load = lambda *a, **k: hub_model
    sys.modules.update(shims)
    sys.path.insert(0, "/root/reference")
    # drop any cached partial imports
    stale = [k for k in sys.modules if k.startswith("monodepth")]
    for k in stale:
        del sys.modules[k]
    try:
        mod = importlib.import_module("monodepth.midas_v2.midas_net")
        # construct while the hub patch is live (blocks.py:33 resolves
        # torch.hub.load at call time inside MidasNet.__init__)
        model = mod.MidasNet(path=None, use_pretrained_resnext=True)
    finally:
        sys.path.remove("/root/reference")
        torch.hub.load = real_hub_load
        for k in shims:
            sys.modules.pop(k, None)
    return mod, model


def test_midas_reference_decoder_parity():
    """The torch side executes the reference's OWN MidasNet/blocks forward
    code (midas_net.py:13-75, blocks.py:12-157) over the reconstructed
    torchvision backbone — so the decoder, scratch convs, fusion blocks,
    interpolation conventions, and wiring under test are reference code,
    not a second reconstruction."""
    backbone = _TorchVisionResNeXt()
    _, tmodel = _import_reference_midas(backbone)
    assert type(tmodel).__module__ == "monodepth.midas_v2.midas_net"
    _randomize_bn(tmodel)
    with torch.no_grad():
        tmodel.scratch.output_conv[4].bias.fill_(0.5)
    tmodel.eval()

    # the reference-assembled net must produce the exact midas_v21
    # checkpoint layout (keys AND shapes)
    from torch_layouts import make_midas_v21_state_dict

    golden = make_midas_v21_state_dict()
    sd = tmodel.state_dict()
    ours = {k: tuple(v.shape) for k, v in sd.items() if "num_batches" not in k}
    ref = {k: tuple(v.shape) for k, v in golden.items() if "num_batches" not in k}
    assert ours == ref

    H, W = 128, 96
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        disp_torch = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    from robust_cvd_tpu.models.midas import MidasNet

    params, stats = torch_port.convert_midas_v2(sd)
    fmodel = MidasNet(dtype=jnp.float32)
    disp_flax = np.asarray(
        fmodel.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    assert disp_flax.shape == disp_torch.shape
    assert (disp_torch > 0).mean() > 0.2, "output mostly clipped — vacuous"
    np.testing.assert_allclose(disp_flax, disp_torch, atol=1e-3, rtol=1e-3)
