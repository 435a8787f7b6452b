"""MiDaS DECODER dissection (round 5): profile_net.py with the PRODUCTION
backbone lowerings shows the decoder is ~19 of the 27.3 ms net fwd+bwd —
the round-4 'stem/layer1 wall' was measured on the non-production grouped
impl. This locates the time inside the decoder at the production shape
(224x384, B=2, bf16): the four layerX_rn convs, each refinenet fusion
block, and the output head pieces, fwd and fwd+bwd.

Timing rules per PERF.md: readback first, >=4 warm trials, min; pieces
below ~6 ms sit at the tunnel dispatch floor — compare fwd+bwd DELTAS.
"""
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
    print(f"{name:52s} {best*1e3:8.2f} ms", flush=True)
    return best


def fb(mod, v, *xs):
    def loss(p, *xx):
        return jnp.sum(mod.apply({"params": p}, *xx).astype(jnp.float32))

    return jax.jit(lambda p, *xx: loss(p, *xx)), jax.jit(jax.grad(loss))


def rand(shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.uniform(-1, 1, shape), dtype)


def main():
    float(jnp.zeros(()).sum())

    # layerX_rn 3x3 convs at their stage shapes
    for cin, hw, name in [
        (256, (56, 96), "layer1_rn"),
        (512, (28, 48), "layer2_rn"),
        (1024, (14, 24), "layer3_rn"),
        (2048, (7, 12), "layer4_rn"),
    ]:
        conv = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                       dtype=jnp.bfloat16)
        x = rand((B, *hw, cin))
        v = conv.init(jax.random.PRNGKey(0), x)
        f, g = fb(conv, v, x)
        timeit(f"{name} ({cin}ch @ {hw}) fwd+bwd", g, v["params"], x)

    # refinenet blocks at their operating shapes (skip-fused except rn4)
    for hw, skip, name in [
        ((7, 12), False, "refinenet4"),
        ((14, 24), True, "refinenet3"),
        ((28, 48), True, "refinenet2"),
        ((56, 96), True, "refinenet1"),
    ]:
        blk = FeatureFusionBlock(256)
        x = rand((B, *hw, 256))
        args = (x, rand((B, *hw, 256))) if skip else (x,)
        v = blk.init(jax.random.PRNGKey(0), *args)
        f, g = fb(blk, v, *args)
        timeit(f"{name} @ {hw}{' +skip' if skip else ''} fwd", f,
               v["params"], *args)
        timeit(f"{name} @ {hw}{' +skip' if skip else ''} fwd+bwd", g,
               v["params"], *args)

    # output head pieces
    class Head(nn.Module):
        upto: int = 3

        @nn.compact
        def __call__(self, x):
            y = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=jnp.bfloat16, name="output_conv1")(x)
            if self.upto >= 2:
                y = upsample2x(y, align_corners=False)
                y = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=jnp.bfloat16, name="output_conv2")(y)
                y = nn.relu(y)
            if self.upto >= 3:
                y = nn.Conv(1, (1, 1), dtype=jnp.bfloat16,
                            name="output_conv3")(y)
            return y

    p1 = rand((B, 112, 192, 256))
    for upto, label in [(1, "head conv1 only (112x192)"),
                        (2, "head conv1+up+conv2 (224x384)"),
                        (3, "head full")]:
        h = Head(upto=upto)
        v = h.init(jax.random.PRNGKey(0), p1)
        f, g = fb(h, v, p1)
        timeit(f"{label} fwd+bwd", g, v["params"], p1)

    # assembled decoder (rn convs + 4 fusions + head) — the profile_net
    # "decoder = full - backbone" cross-check
    class Decoder(nn.Module):
        @nn.compact
        def __call__(self, l1, l2, l3, l4):
            rn = lambda name: nn.Conv(
                256, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                dtype=jnp.bfloat16, name=name,
            )
            l1r, l2r = rn("layer1_rn")(l1), rn("layer2_rn")(l2)
            l3r, l4r = rn("layer3_rn")(l3), rn("layer4_rn")(l4)
            p4 = FeatureFusionBlock(256, name="refinenet4")(l4r)
            p3 = FeatureFusionBlock(256, name="refinenet3")(p4, l3r)
            p2 = FeatureFusionBlock(256, name="refinenet2")(p3, l2r)
            p1 = FeatureFusionBlock(256, name="refinenet1")(p2, l1r)
            return Head(name="head")(p1)

    feats = [rand((B, 56, 96, 256)), rand((B, 28, 48, 512)),
             rand((B, 14, 24, 1024)), rand((B, 7, 12, 2048))]
    dec = Decoder()
    v = dec.init(jax.random.PRNGKey(0), *feats)
    f, g = fb(dec, v, *feats)
    timeit("assembled decoder fwd", f, v["params"], *feats)
    timeit("assembled decoder fwd+bwd", g, v["params"], *feats)


if __name__ == "__main__":
    main()
