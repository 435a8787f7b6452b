"""Dissect the backbone stage-1 fwd+bwd wall (tools/profile_net.py: 16.6 ms
of the 26.7 ms net, stages 2-4 add only ~3.7 ms).

Suspects, each timed in isolation at 224x384 B=2 bf16:
  - stem 7x7/s2 conv (3->64): grad-wrt-filter contracts over 3 channels
    (MXU-hostile); space-to-depth candidate (8x8-padded kernel split into
    2x2 phases -> 4x4/s1 conv on (H/2, W/2, 12), exactly equivalent).
  - 3x3/s2 maxpool backward: XLA select_and_scatter is a known TPU slow
    path; candidate: argmax-free re-derivation (compare x to the pooled
    max, split gradient equally among ties) — NOT numerically identical
    on ties, measure first.
  - layer1 (3 bottlenecks at 56x96, 256ch, merged grouped convs).

PERF.md timing rules: readback before timing, >=3 trials, min.
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from robust_cvd_tpu.models.midas import Bottleneck

H, W, B = 224, 384, 2
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.bfloat16)


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:56s} {best*1e3:8.2f} ms", flush=True)
    return best


def fb(mod, xin, train=True):
    v = mod.init(jax.random.PRNGKey(0), xin, *([train] if train is not None else []))
    has_stats = "batch_stats" in v

    def loss(p, xx):
        kw = {}
        if has_stats:
            out, _ = mod.apply({"params": p, "batch_stats": v["batch_stats"]},
                               xx, train, mutable=["batch_stats"])
        elif train is not None:
            out = mod.apply({"params": p}, xx, train)
        else:
            out = mod.apply({"params": p}, xx)
        return jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))

    return v, jax.jit(jax.grad(loss)), jax.jit(loss)


class StemConv(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        return nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                       use_bias=False, dtype=jnp.bfloat16, name="conv1")(x)


class StemConvBN(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=jnp.bfloat16, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.bfloat16, name="bn1")(y)
        return nn.relu(y)


class StemFull(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        y = StemConvBN(name="cbn")(x, train)
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class StemS2D(nn.Module):
    """Space-to-depth stem: exactly the 7x7/s2 conv, lowered as a 4x4/s1
    conv over 2x2-phase-packed input. Kernel (7,7,3,64) zero-pads to
    (8,8,3,64) and regroups to (4,4,12,64)."""

    @nn.compact
    def __call__(self, x, train=True):
        B_, H_, W_, C = x.shape
        # pad so the 7x7/s2 SAME windows align with 2x2 phases: torch SAME
        # for stride 2 pads 3 left; with s2d we pad 4 left (one full phase)
        # and start the kernel one phase later — equivalent to an 8x8 kernel
        # whose first row/col is zero.
        oh, ow = (H_ + 6 - 7) // 2 + 1, (W_ + 6 - 7) // 2 + 1
        rp_h = 3 + (H_ + 7) % 2  # make padded height even
        rp_w = 3 + (W_ + 7) % 2
        xp = jnp.pad(x, ((0, 0), (4, rp_h), (4, rp_w), (0, 0)))
        Hp, Wp = xp.shape[1], xp.shape[2]
        xs = xp.reshape(B_, Hp // 2, 2, Wp // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(B_, Hp // 2, Wp // 2, 4 * C)
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, C, 64), jnp.float32).astype(jnp.bfloat16)
        k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # leading zero phase
        k4 = k8.reshape(4, 2, 4, 2, C, 64).transpose(0, 2, 1, 3, 4, 5)
        k4 = k4.reshape(4, 4, 4 * C, 64)
        out = jax.lax.conv_general_dilated(
            xs, k4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out[:, :oh, :ow, :]


class Layer1(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        y = x
        for b in range(3):
            y = Bottleneck(planes=64, stride=1, downsample=(b == 0),
                           dtype=jnp.bfloat16, groups_impl="grouped",
                           name=f"layer1_{b}")(y, train)
        return y


# equivalence check first (CPU-cheap shapes ok on TPU too)
m_ref, m_s2d = StemConv(), StemS2D()
v_ref = m_ref.init(jax.random.PRNGKey(0), x, True)
v_s2d = {"params": {"kernel": v_ref["params"]["conv1"]["kernel"].astype(jnp.float32)}}
a = m_ref.apply(v_ref, x, True)
b = m_s2d.apply(v_s2d, x, True)
print("s2d shapes:", a.shape, b.shape, flush=True)
err = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
print(f"s2d max abs err vs direct conv: {err:.2e}", flush=True)

for name, mod, xin in [
    ("stem 7x7/s2 conv only", StemConv(), x),
    ("stem 7x7/s2 conv s2d-lowered", StemS2D(), x),
    ("stem conv+bn+relu", StemConvBN(), x),
    ("stem conv+bn+relu+maxpool", StemFull(), x),
]:
    v, g, f = fb(mod, xin)
    timeit(name + " fwd", f, v["params"], xin)
    timeit(name + " fwd+bwd", g, v["params"], xin)

x1 = jnp.asarray(rng.uniform(0, 1, (B, H // 4, W // 4, 64)), jnp.bfloat16)
v, g, f = fb(Layer1(), x1)
timeit("layer1 (3 bottlenecks @56x96) fwd", f, v["params"], x1)
timeit("layer1 (3 bottlenecks @56x96) fwd+bwd", g, v["params"], x1)
