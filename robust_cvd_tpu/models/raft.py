"""RAFT optical flow in Flax (NHWC, TPU-native).

Re-implementation of the vendored RAFT (reference raft/core/raft.py:13-116,
corr.py:9-56, update.py:8-156, extractor.py:8-198): feature/context encoders,
all-pairs correlation pyramid with radius-4 bilinear lookup, SepConvGRU
update block with convex 8x upsampling.

TPU-first redesign:
  - the all-pairs correlation volume is one big MXU matmul per pair, kept
    HBM-resident; the 4-level pyramid is average pooling over the second
    image's spatial dims,
  - the radius-4 lookup is a batched bilinear gather (XLA fuses it),
  - the 20 refinement iterations run as one lax.scan — one compiled program
    per resolution instead of a Python loop dispatching per iteration,
  - frame pairs are batched along the leading axis (the reference loops
    pairs in Python, optical_flow_homography.py:245-277).

Weights port from `raft-things.pth` via models/torch_port.py.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import resize_bilinear

_HI = jax.lax.Precision.HIGHEST


def instance_norm(x, eps=1e-5):
    """nn.InstanceNorm2d(affine=False): per-sample, per-channel over H, W.
    Statistics in f32 regardless of the compute dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
    var = jnp.var(xf, axis=(-3, -2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class _Norm(nn.Module):
    """norm_fn dispatch (reference extractor.py:19-43)."""

    kind: str  # 'instance' | 'batch' | 'none'

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "instance":
            return instance_norm(x)
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=x.dtype, name="bn",
            )(x)
        return x


class ResidualBlock(nn.Module):
    """reference extractor.py:8-60."""

    planes: int
    norm: str
    stride: int = 1
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(_Norm(self.norm, name="norm1")(y, train))
        y = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_Norm(self.norm, name="norm2")(y, train))
        if self.stride != 1:
            x = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                dtype=self.dtype, name="downsample_conv",
            )(x)
            x = _Norm(self.norm, name="norm3")(x, train)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """reference extractor.py:126-198: 7x7/2 stem + 3 stages of 2 residual
    blocks (64, 96/2, 128/2) + 1x1 output conv. Overall stride 8."""

    output_dim: int = 256
    norm: str = "instance"
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(_Norm(self.norm, name="norm1")(y, train))
        for i, (dim, stride) in enumerate(((64, 1), (96, 2), (128, 2)), start=1):
            y = ResidualBlock(dim, self.norm, stride, dtype=self.dtype,
                              name=f"layer{i}_0")(y, train)
            y = ResidualBlock(dim, self.norm, 1, dtype=self.dtype,
                              name=f"layer{i}_1")(y, train)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(y)


def build_corr_pyramid(fmap1, fmap2, num_levels=4):
    """All-pairs correlation pyramid (reference corr.py:14-24, 49-56).

    fmap1/fmap2: (B, H, W, D). Returns list of (B, H, W, H/2^i, W/2^i).

    Average-pooling the correlation VOLUME commutes with the dot product
    (pooling is linear): avg_pool(<f1, f2>) == <f1, avg_pool(f2)>. So each
    level is one well-shaped MXU einsum against the 2^i-pooled SECOND
    feature map instead of a chained mean-reduce over the 115 MB volume —
    measured 10.9 -> ~1 ms per 16-pair chunk (tools/profile_raft.py).
    Pooling runs in f32 (exact for the f32 parity path; for bf16 inputs the
    single f32->bf16 round of the pooled features sits inside the existing
    bf16 product noise floor). bf16 inputs yield a bf16-resident pyramid —
    halves the volume the per-iteration lookup streams from HBM."""
    B, H, W, D = fmap1.shape
    # bf16 feature maps use the native MXU path with f32 accumulation;
    # f32 inputs request full precision (the default would silently drop
    # to bf16 passes on this backend).
    prec = None if fmap1.dtype == jnp.bfloat16 else _HI
    out_dtype = jnp.bfloat16 if fmap1.dtype == jnp.bfloat16 else jnp.float32
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    f1 = fmap1.reshape(B, H * W, D)
    f2 = fmap2
    pyramid = []
    for i in range(num_levels):
        h2, w2 = f2.shape[1], f2.shape[2]
        corr = jnp.einsum(
            "bxd,byd->bxy",
            f1,
            f2.reshape(B, h2 * w2, D),
            precision=prec,
            preferred_element_type=jnp.float32,
        ) * scale
        pyramid.append(corr.astype(out_dtype).reshape(B, H, W, h2, w2))
        if i + 1 < num_levels:
            he, we = (h2 // 2) * 2, (w2 // 2) * 2  # floor semantics
            f2 = (
                f2[:, :he, :we]
                .astype(jnp.float32)
                .reshape(B, h2 // 2, 2, w2 // 2, 2, D)
                .mean(axis=(2, 4))
                .astype(f2.dtype)
            )
    return pyramid


def lookup_corr(pyramid, coords, radius=4, dtype=jnp.bfloat16):
    """Bilinear lookup of the correlation pyramid around `coords`
    (reference corr.py:26-47). coords: (B, H, W, 2) pixel coords in image2
    at 1/8 res. Returns (B, H, W, num_levels * (2r+1)^2).

    GATHER-FREE formulation: per query position, build bilinear row/column
    selectors and extract the whole (2r+1)^2 window as two batched matmuls
    (R @ corr @ C^T). Gathers at these shapes are pathologically slow on TPU
    (take_along_axis / dynamic_slice variants measured 6-43x worse,
    tools/sweep_raft_lookup.py); the selector matmuls ride the MXU.
    Selector rows outside the map are all-zero == torch grid_sample's zero
    padding.

    Each selector row is ONE fused arithmetic HAT — relu(1 - |i - ctr|),
    ctr = coord + offset — instead of two one_hots with the bilinear
    fractions folded in: identical linear-interpolation weights, ~40% less
    build cost. The dissection (tools/sweep_raft_lookup.py): selector
    CONSTRUCTION was 53 of the 84 ms/chunk (the einsums with precomputed
    selectors run in 31 ms); hat build cuts the scan to 64 ms. A
    block-diagonal query-grouping variant (one MXU pass serving G queries)
    measured SLOWER (103 ms) — the G-times-larger selectors outweigh the
    saved passes."""
    B, H, W, _ = coords.shape
    r = radius
    K = 2 * r + 1
    k = jnp.arange(-r, r + 1, dtype=jnp.float32)
    prec = None if dtype == jnp.bfloat16 else _HI

    out = []
    for i, corr in enumerate(pyramid):
        h2, w2 = corr.shape[3], corr.shape[4]
        Q = H * W
        c = coords.reshape(B, Q, 2) / (2.0**i)
        cx, cy = c[..., 0], c[..., 1]
        ih = jnp.arange(h2, dtype=jnp.float32)
        iw = jnp.arange(w2, dtype=jnp.float32)
        ctr_y = cy[..., None] + k  # (B, Q, K) sample rows
        ctr_x = cx[..., None] + k
        # hats computed in f32 (bf16 iota-coordinate subtraction would lose
        # up to 0.25 at map widths ~48), weights cast once for the MXU
        R = jax.nn.relu(
            1.0 - jnp.abs(ih[None, None, None, :] - ctr_y[..., None])
        ).astype(dtype)  # (B, Q, K, h2)
        C = jax.nn.relu(
            1.0 - jnp.abs(iw[None, None, None, :] - ctr_x[..., None])
        ).astype(dtype)  # (B, Q, K, w2)

        corr_q = corr.reshape(B, Q, h2, w2).astype(dtype)
        rowed = jnp.einsum(
            "bqrh,bqhw->bqrw", R, corr_q, precision=prec,
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        # window flattened x-offset-major: the reference's lookup builds its
        # offset grid as meshgrid(dy, dx) but adds the FIRST output to the x
        # coordinate (corr.py:36-40), so checkpoint update-block weights
        # expect channel a*K+b == offset (dx=a-r, dy=b-r). Emitting (dy, dx)
        # order here would silently permute channels under ported weights
        # (caught by tests/test_torch_parity.py).
        win = jnp.einsum(
            "bqrw,bqcw->bqcr", rowed, C, precision=prec,
            preferred_element_type=jnp.float32,
        )
        out.append(win.reshape(B, H, W, K * K))
    return jnp.concatenate(out, axis=-1)


class BasicMotionEncoder(nn.Module):
    """reference update.py:97-116."""

    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, flow, corr):
        flow = flow.astype(self.dtype)
        corr = corr.astype(self.dtype)
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=((3, 3), (3, 3)), dtype=self.dtype, name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="convf2")(f))
        out = nn.relu(
            nn.Conv(126, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv")(
                jnp.concatenate([c, f], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class SepConvGRU(nn.Module):
    """reference update.py:37-77: horizontal 1x5 then vertical 5x1 GRU."""

    hidden: int = 128
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, h, x):
        h = h.astype(self.dtype)
        x = x.astype(self.dtype)

        def gru(h, x, ksize, pad, suffix):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden, ksize, padding=pad, dtype=self.dtype, name=f"convz{suffix}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden, ksize, padding=pad, dtype=self.dtype, name=f"convr{suffix}")(hx))
            q = nn.tanh(
                nn.Conv(self.hidden, ksize, padding=pad, dtype=self.dtype, name=f"convq{suffix}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            return (1 - z) * h + z * q

        h = gru(h, x, (1, 5), ((0, 0), (2, 2)), "1")
        h = gru(h, x, (5, 1), ((2, 2), (0, 0)), "2")
        return h


class FlowHead(nn.Module):
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(x))
        return nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(y).astype(jnp.float32)


class BasicUpdateBlock(nn.Module):
    """reference update.py:137-156."""

    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(dtype=self.dtype, name="encoder")(flow, corr)
        x = jnp.concatenate([inp.astype(self.dtype), motion], axis=-1)
        net = SepConvGRU(dtype=self.dtype, name="gru")(net, x)
        delta = FlowHead(dtype=self.dtype, name="flow_head")(net)
        m = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="mask_conv1")(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="mask_conv2")(m)
        return net, mask.astype(jnp.float32), delta


def upsample_flow_convex(flow, mask):
    """Convex-combination 8x upsampling (reference raft.py:49-60).

    flow: (B, h, w, 2); mask: (B, h, w, 576). Returns (B, 8h, 8w, 2)."""
    B, h, w, _ = flow.shape
    mask = mask.reshape(B, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    # 3x3 neighborhoods of 8*flow (zero padded).
    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [
            fp[:, dy : dy + h, dx : dx + w, :]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=3,
    )  # (B, h, w, 9, 2)

    # contraction over only k=9 with tiny M/N — as a dot_general this is
    # 21504 pathologically small batched matmuls (measured 10.1 ms of the
    # 118 ms chunk), and a fused broadcast-sum over a (..., 9, 64, 2)
    # intermediate keeps the minormost dim at 2, wasting 126 of 128 vector
    # lanes (measured 8.75 ms). Unrolling k=9 per flow channel keeps every
    # elementwise op on (B, h, w, 64) tiles — 64 lanes busy, no big
    # intermediate.
    m = mask.reshape(B, h, w, 9, 64)
    chans = []
    for ch in range(2):
        acc = m[..., 0, :] * neigh[:, :, :, 0, ch : ch + 1]
        for kk in range(1, 9):
            acc = acc + m[..., kk, :] * neigh[:, :, :, kk, ch : ch + 1]
        chans.append(acc.reshape(B, h, w, 8, 8))
    up = jnp.stack(chans, axis=-1)  # (B, h, w, 8, 8, 2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * h, 8 * w, 2)


class _IterBody(nn.Module):
    """One RAFT refinement iteration as a scanned body: correlation lookup
    + motion encoder + SepConvGRU + flow head. Scanning compiles the body
    ONCE instead of unrolling 20 copies (20x smaller program; measured a
    large end-to-end win on this backend)."""

    corr_radius: int = 4
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, carry, _xs):
        net, coords1, coords0, inp, pyramid = carry
        coords1 = jax.lax.stop_gradient(coords1)
        corr = lookup_corr(list(pyramid), coords1, self.corr_radius,
                           dtype=self.dtype)
        flow = coords1 - coords0
        net, mask, delta = BasicUpdateBlock(dtype=self.dtype, name="block")(
            net, inp, corr, flow)
        return (net, coords1 + delta, coords0, inp, pyramid), mask


class RAFT(nn.Module):
    """Full RAFT: (B, H, W, 3) uint8-range images -> (B, H, W, 2) flow.

    H, W must be multiples of 8 (the pipeline's flow stage aligns to 64,
    reference flow.py:40-42)."""

    iters: int = 20
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, image1, image2, train: bool = False):
        img1 = 2.0 * (image1 / 255.0) - 1.0
        img2 = 2.0 * (image2 / 255.0) - 1.0

        fnet = BasicEncoder(256, "instance", dtype=self.dtype, name="fnet")
        # both images through ONE fnet call (reference raft.py:90:
        # fnet([image1, image2])): instance norm is per-sample, so this is
        # numerically identical to two calls and doubles the batch the
        # conv tiles see
        fmaps = fnet(jnp.concatenate([img1, img2], axis=0), train)
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels)

        cnet = BasicEncoder(
            self.hidden_dim + self.context_dim, "batch", dtype=self.dtype,
            name="cnet",
        )(img1, train)
        net = nn.tanh(cnet[..., : self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim :])

        B, h, w, _ = fmap1.shape
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        coords0 = jnp.broadcast_to(jnp.stack([xs, ys], -1), (B, h, w, 2))

        body = _IterBody(corr_radius=self.corr_radius, dtype=self.dtype,
                         name="update_block")
        scan_body = nn.scan(
            _IterBody.__call__.__wrapped__
            if hasattr(_IterBody.__call__, "__wrapped__")
            else _IterBody.__call__,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=self.iters,
        )
        carry = (net, coords0, coords0, inp, tuple(pyramid))
        (net, coords1, _, _, _), masks = scan_body(body, carry, None)
        mask = masks[-1]

        flow = coords1 - coords0
        return upsample_flow_convex(flow, mask)
