"""Decoder dissection round 2: the assembled decoder with grads wrt params
ONLY measures 8.3 ms, but the full net pays ~19 ms for the decoder — the
difference is the dgrad chain INTO the backbone features (grad wrt l1..l4),
which XLA prunes when feats are not differentiated. Reproduce it, then
A/B the layerX_rn lowering (native conv vs im2col matmul) for the
feature-dgrad path. Production shape 224x384 B=2 bf16; PERF.md timing
rules."""
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from robust_cvd_tpu.models.midas import FeatureFusionBlock
from robust_cvd_tpu.models.layers import upsample2x

B = 2
rng = np.random.default_rng(0)


def timeit(name, fn, *args, n=20):
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


def rand(shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.uniform(-1, 1, shape), dtype)


def conv3x3_im2col(x, kernel):
    """3x3 SAME conv as one matmul: taps folded into the channel axis.
    kernel: (3, 3, Cin, Cout) — the nn.Conv layout."""
    N, H, W, C = x.shape
    F = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    pat = jnp.concatenate(
        [xp[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # (N, H, W, 9C)
    kk = kernel.reshape(9 * C, F)
    return jax.lax.dot_general(
        pat.reshape(N * H * W, 9 * C), kk,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(N, H, W, F)


class RnConv(nn.Module):
    impl: str = "native"

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, x.shape[-1], 256), jnp.float32).astype(x.dtype)
        if self.impl == "im2col":
            return conv3x3_im2col(x, k)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Head(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=jnp.bfloat16, name="output_conv1")(x)
        y = upsample2x(y, align_corners=False)
        y = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=jnp.bfloat16, name="output_conv2")(y)
        y = nn.relu(y)
        return nn.Conv(1, (1, 1), dtype=jnp.bfloat16, name="output_conv3")(y)


class Decoder(nn.Module):
    impl: str = "native"

    @nn.compact
    def __call__(self, l1, l2, l3, l4):
        rn = lambda name: RnConv(impl=self.impl, name=name)
        l1r, l2r = rn("layer1_rn")(l1), rn("layer2_rn")(l2)
        l3r, l4r = rn("layer3_rn")(l3), rn("layer4_rn")(l4)
        p4 = FeatureFusionBlock(256, name="refinenet4")(l4r)
        p3 = FeatureFusionBlock(256, name="refinenet3")(p4, l3r)
        p2 = FeatureFusionBlock(256, name="refinenet2")(p3, l2r)
        p1 = FeatureFusionBlock(256, name="refinenet1")(p2, l1r)
        return Head(name="head")(p1)


def main():
    float(jnp.zeros(()).sum())
    feats = [rand((B, 56, 96, 256)), rand((B, 28, 48, 512)),
             rand((B, 14, 24, 1024)), rand((B, 7, 12, 2048))]

    for impl in ["native", "im2col"]:
        dec = Decoder(impl=impl)
        v = dec.init(jax.random.PRNGKey(0), *feats)

        def loss(p, fs):
            return jnp.sum(dec.apply({"params": p}, *fs).astype(jnp.float32))

        g_p = jax.jit(jax.grad(loss))
        g_pf = jax.jit(jax.grad(loss, argnums=(0, 1)))
        timeit(f"decoder[{impl}] grad(params)", g_p, v["params"], feats)
        timeit(f"decoder[{impl}] grad(params+feats)", g_pf, v["params"], feats)

    # which rn conv's feature-dgrad dominates: drop them one at a time
    dec = Decoder(impl="native")
    v = dec.init(jax.random.PRNGKey(0), *feats)

    def loss(p, fs):
        return jnp.sum(dec.apply({"params": p}, *fs).astype(jnp.float32))

    for k in range(4):
        def loss_k(p, f_k, k=k):
            fs = list(feats)
            fs[k] = f_k
            return jnp.sum(dec.apply({"params": p}, *fs).astype(jnp.float32))

        g = jax.jit(jax.grad(loss_k, argnums=(0, 1)))
        timeit(f"decoder grad(params + feat l{k+1} ONLY)", g, v["params"],
               feats[k])


if __name__ == "__main__":
    main()
