"""MiDaS-v2.1 monocular depth network in Flax (NHWC, TPU-native).

Re-implementation of the reference's MiDaS stack
(reference monodepth/midas_v2/midas_net.py:13-75, blocks.py:12-160,
midas_v2_model.py:16-67): ResNeXt-101 32x8d backbone + RefineNet-style
fusion decoder + disparity head.

Differences from the reference (deliberate, TPU-first):
  - channels-last NHWC layout (MXU/convolution native on TPU),
  - grouped convolutions via feature_group_count,
  - whole-clip batched inference: the adapter maps over (N, H, W, 3) frame
    stacks in one jit instead of a per-frame DataLoader loop,
  - BatchNorm runs with frozen (running) statistics by default; pass
    train=True + mutable=['batch_stats'] to update them like the reference's
    model.train() fine-tuning mode (depth_fine_tuning.py:413).

Weights are ported from the reference checkpoint `midas_v21-f6b98070.pt`
via models/torch_port.py when available.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import upsample2x

# ImageNet normalization (reference midas_v2_model.py:41-42).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class GroupedConv3x3(nn.Module):
    """3x3 grouped convolution with a selectable lowering.

    The checkpoint parameter shape is ALWAYS the grouped one
    (3, 3, C/groups, features) — identical to nn.Conv with
    feature_group_count — so torch ports are lowering-agnostic.

    impl:
      'grouped':     XLA's native grouped conv. Per-group contraction width
                     is C/groups (8..64 here) — far below the 128-wide MXU,
                     so the systolic array runs mostly empty.
      'merge<m>':    fuse m adjacent groups into one supergroup: expand the
                     kernel to a block-diagonal dense kernel of m blocks per
                     supergroup and run the conv with feature_group_count =
                     groups/m. Contraction width becomes m*(C/groups) at m-x
                     redundant FLOPs — the knob that trades MXU occupancy
                     against wasted multiplies. 'merge2'..'merge32'.
      'block_dense': alias for merge<groups>: one full-width dense kernel
                     (one broadcast multiply with an identity mask; XLA
                     folds it). Costs `groups`x redundant FLOPs but
                     contracts at full MXU width.
      'im2col':      materialize the 9 shifted taps and contract each group
                     as ONE batched matmul (G, N*H*W, 9*C/G) x
                     (G, 9*C/G, F/G): the contraction folds the 3x3 window
                     into the channel axis, widening it 9x (72..576 here)
                     with NO redundant FLOPs — the classic systolic-array
                     grouped-conv lowering. Measured HBM-bound (PERF.md).
    """

    features: int
    groups: int
    stride: int = 1
    dtype: type = jnp.bfloat16
    impl: str = "grouped"

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        w_in = C // self.groups
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, w_in, self.features),
            jnp.float32,
        )
        k = kernel.astype(self.dtype)
        if self.impl == "im2col":
            G = self.groups
            w_out = self.features // G
            N, Hi, Wi, _ = x.shape
            xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
            taps = [
                xp[:, dy : dy + Hi : self.stride, dx : dx + Wi : self.stride, :]
                for dy in range(3)
                for dx in range(3)
            ]
            pat = jnp.stack(taps, axis=3)  # (N, Ho, Wo, 9, C)
            Ho, Wo = pat.shape[1], pat.shape[2]
            pat = pat.reshape(N, Ho, Wo, 9, G, w_in)
            pat = pat.transpose(4, 0, 1, 2, 3, 5).reshape(G, N * Ho * Wo, 9 * w_in)
            kk = k.reshape(3, 3, w_in, G, w_out)
            kk = kk.transpose(3, 0, 1, 2, 4).reshape(G, 9 * w_in, w_out)
            y = jnp.einsum("gnk,gkf->gnf", pat, kk)
            return y.transpose(1, 0, 2).reshape(N, Ho, Wo, G * w_out)
        if self.impl == "block_dense" or self.impl.startswith("merge"):
            G = self.groups
            m = G if self.impl == "block_dense" else int(self.impl[len("merge"):])
            if G % m:
                raise ValueError(f"merge width {m} must divide groups={G}")
            S = G // m  # supergroups = new feature_group_count
            w_out = self.features // G
            # dense[h, k, (gi, a), (s, go, b)] =
            #   kernel[h, k, a, (s*m+go)*w_out + b] * (gi == go)
            # where gi/go index the m merged groups inside supergroup s and
            # the conv's own grouping handles the s axis.
            t = k.reshape(3, 3, w_in, S, m, w_out)  # (3, 3, a, s, go, b)
            eye = jnp.eye(m, dtype=self.dtype)
            dense = (
                eye[None, None, :, None, None, :, None]
                * t[:, :, None, :, :, :, :]
            )  # (3, 3, gi, a, s, go, b)
            k = dense.reshape(3, 3, m * w_in, S * m * w_out)
            fg = S
        else:
            fg = self.groups
        return jax.lax.conv_general_dilated(
            x, k,
            window_strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fg,
        )


class Bottleneck(nn.Module):
    """torchvision-style ResNeXt bottleneck (groups=32, width/group=8)."""

    planes: int  # output channels = planes * 4
    stride: int = 1
    groups: int = 32
    base_width: int = 8
    downsample: bool = False
    dtype: type = jnp.bfloat16
    groups_impl: str = "grouped"

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )

        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = GroupedConv3x3(
            width,
            self.groups,
            stride=self.stride,
            dtype=self.dtype,
            impl=self.groups_impl,
            name="conv2",
        )(y)
        y = norm("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)

        if self.downsample:
            identity = nn.Conv(
                out_ch,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = norm("downsample_bn")(identity)

        return nn.relu(y + identity)


class ResNeXt101Features(nn.Module):
    """ResNeXt-101 32x8d backbone returning the four stage feature maps
    (reference blocks.py:19-33 _make_resnet_backbone)."""

    layers: Sequence[int] = (3, 4, 23, 3)
    dtype: type = jnp.bfloat16
    # per-stage grouped-conv lowering (see GroupedConv3x3); per-group widths
    # are 8/16/32/64 for stages 1-4 — merging to the 128-wide MXU contraction
    # (merge16/8/4/2) measures fastest on all four (PERF.md)
    groups_impl: Sequence[str] = ("grouped",) * 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        planes = (64, 128, 256, 512)
        for stage, (blocks, p) in enumerate(zip(self.layers, planes)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                y = Bottleneck(
                    planes=p,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    groups_impl=self.groups_impl[stage],
                    name=f"layer{stage + 1}_{b}",
                )(y, train)
            feats.append(y)
        return feats  # channels: 256, 512, 1024, 2048; strides 4, 8, 16, 32


class ResidualConvUnit(nn.Module):
    """reference blocks.py:88-128.

    The skip connection adds relu(x), NOT x: the reference's
    `self.relu = nn.ReLU(inplace=True)` mutates its input, so by the time
    `out + x` executes, x has already been rewritten to relu(x)
    (blocks.py:101-123 — `out = self.relu(x)` aliases x in eval mode).
    The upstream MiDaS checkpoints were trained with this exact code, so
    the weights expect the rectified skip. Verified numerically against
    the reference's own forward in tests/test_torch_parity.py
    (test_midas_reference_decoder_parity): with `+ x` the outputs diverge
    by 7e-2; with `+ relu(x)` they agree to 1e-7."""

    features: int
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(y)
        return y + nn.relu(x)


class FeatureFusionBlock(nn.Module):
    """reference blocks.py:131-160: optional skip-add through an RCU, an RCU,
    then 2x bilinear upsample with align_corners=True."""

    features: int
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None):
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features, dtype=self.dtype,
                                         name="resConfUnit1")(skip)
        out = ResidualConvUnit(self.features, dtype=self.dtype,
                               name="resConfUnit2")(out)
        return upsample2x(out, align_corners=True)


class MidasNet(nn.Module):
    """Full MiDaS-v2 network: (B, H, W, 3) normalized RGB -> (B, H, W)
    non-negative disparity (reference midas_net.py:47-75)."""

    features: int = 256
    non_negative: bool = True
    dtype: type = jnp.bfloat16
    # backbone stage depths; (3, 4, 23, 3) = ResNeXt-101. Reduced depths give
    # the same program structure with a far smaller graph (compile-speed knob
    # for CI / virtual-mesh dry runs on few-core hosts).
    backbone_layers: Sequence[int] = (3, 4, 23, 3)
    # Measured on v5e (PERF.md, fwd+bwd batch 4 at 224x384, min over warm
    # trials): grouped everywhere 59.4 ms; block_dense on the 8/16-wide
    # stages 44.7 ms; merging groups to exactly the 128-wide MXU contraction
    # on EVERY stage (merge16/8/4/2 for the 8/16/32/64-wide stages) wins at
    # 36.9 ms — full systolic-array width at the minimum redundancy that
    # reaches it. im2col loses outright (100.6 ms, HBM-bound patch
    # materialization). ROUND-5 revision (tools/profile_net2.py, B=2 with
    # non-constant cotangents): STAGE 1 flips to block_dense — full-net
    # fwd+bwd 23.69 (merge16) -> 22.61 ms; isolated layer1 agrees
    # (4.74 -> 3.93). block_dense on every stage still regresses (36.4),
    # as does grouped stage 1 (37.5).
    groups_impl: Sequence[str] = ("block_dense", "merge8", "merge4", "merge2")

    @nn.compact
    def __call__(self, x, train: bool = False):
        l1, l2, l3, l4 = ResNeXt101Features(
            layers=tuple(self.backbone_layers), dtype=self.dtype,
            groups_impl=tuple(self.groups_impl), name="pretrained",
        )(x, train)

        rn = lambda ch, name: nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name=name,
        )
        l1_rn = rn(256, "layer1_rn")(l1)
        l2_rn = rn(512, "layer2_rn")(l2)
        l3_rn = rn(1024, "layer3_rn")(l3)
        l4_rn = rn(2048, "layer4_rn")(l4)

        p4 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet4")(l4_rn)
        p3 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet3")(p4, l3_rn)
        p2 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet2")(p3, l2_rn)
        p1 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet1")(p2, l1_rn)

        y = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="output_conv1")(p1)
        y = upsample2x(y, align_corners=False)
        y = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="output_conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv3")(y)
        if self.non_negative:
            y = nn.relu(y)
        return y[..., 0].astype(jnp.float32)


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> ImageNet-normalized (reference midas_v2_model.py:50-52)."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


def disparity_to_depth(disparity: jnp.ndarray, epsilon: float = 1e-7) -> jnp.ndarray:
    """(reference midas_v2_model.py:60-62)."""
    return 1.0 / (disparity + epsilon)


def depth_apply(net, variables, images: jnp.ndarray) -> jnp.ndarray:
    """THE whole-clip inference function — normalize + forward +
    disparity->depth — shared by the depth stage, the fine-tuner's
    per-epoch refresh, the adapter, and the driver dryrun, so the depth
    convention cannot drift between single- and multi-device paths.
    images: (B, H, W, 3) in [0, 1] -> depth (B, H, W)."""
    return disparity_to_depth(net.apply(variables, normalize_images(images)))


class MidasV2Adapter:
    """Model adapter: requirements + batched whole-clip inference
    (reference monodepth/midas_v2_model.py class attrs + estimate_depth)."""

    align = 32
    learning_rate = 1e-6
    lambda_view_baseline = 1e-4

    def __init__(self, params=None, batch_stats=None):
        self.net = MidasNet()
        self.params = params
        self.batch_stats = batch_stats

    def init(self, rng, shape=(1, 384, 224, 3)):
        variables = self.net.init(rng, jnp.zeros(shape, jnp.float32))
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats")
        return self

    def estimate_depth(self, images: jnp.ndarray, scales=None) -> jnp.ndarray:
        """images: (B, H, W, 3) in [0,1] -> depth (B, H, W)."""
        variables = {"params": self.params, "batch_stats": self.batch_stats}
        if scales is None:
            return depth_apply(self.net, variables, images)
        disp = self.net.apply(variables, normalize_images(images))
        return disparity_to_depth(disp / scales)
