"""Dissect the stage-1 (stem + layer1) fwd+bwd wall (VERDICT r4 ask #1).

Round 4's profile_net.py truncation used ResNeXt101Features' DEFAULT
groups_impl=("grouped",)*4 — not the production merge16 — so the 16.6 ms
"stem+layer1 backward" number may not describe the shipped net. This
profiler measures, at the production shape (224x384, batch 2, bf16):

  stem conv7x7+bn+relu            fwd and fwd+bwd
  maxpool 3x3/2 alone             fwd and fwd+bwd (SelectAndScatter bwd)
  layer1 (3 bottlenecks @ 56x96)  fwd and fwd+bwd per groups_impl
  stem+pool+layer1 (stage-1)      fwd+bwd, grouped vs merge16 (the r4 basis)

Timing rules per PERF.md: readback before timing, >=4 warm trials, min.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from robust_cvd_tpu.models.midas import Bottleneck, ResNeXt101Features

H, W, B = 224, 384, 2
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)


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
    print(f"{name:48s} {best*1e3:8.2f} ms", flush=True)
    return best


def fb(net, v, xin, has_stats=True):
    stats = v.get("batch_stats")

    def loss(p, xx):
        if has_stats and stats is not None:
            out, _ = net.apply(
                {"params": p, "batch_stats": stats}, xx, train=True,
                mutable=["batch_stats"],
            )
        else:
            out = net.apply({"params": p}, xx)
        return jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))

    return jax.jit(lambda p, xx: loss(p, xx)), jax.jit(jax.grad(loss))


class Stem(nn.Module):
    dtype: type = jnp.bfloat16
    pool: bool = False

    @nn.compact
    def __call__(self, xx, train: bool = False):
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(xx.astype(self.dtype))
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        if self.pool:
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return y


class Layer1(nn.Module):
    impl: str = "merge16"
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, y, train: bool = False):
        for b in range(3):
            y = Bottleneck(planes=64, stride=1, downsample=(b == 0),
                           dtype=self.dtype, groups_impl=self.impl,
                           name=f"layer1_{b}")(y, train)
        return y


def main():
    float(jnp.sum(x))  # honest tunnel timings

    stem = Stem()
    v = stem.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    f, g = fb(stem, v, x)
    timeit("stem conv+bn+relu fwd", f, v["params"], x)
    timeit("stem conv+bn+relu fwd+bwd", g, v["params"], x)

    stemp = Stem(pool=True)
    vp = stemp.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    fp, gp = fb(stemp, vp, x)
    timeit("stem+maxpool fwd", fp, vp["params"], x)
    timeit("stem+maxpool fwd+bwd", gp, vp["params"], x)

    # maxpool alone (no params: grad wrt input)
    y64 = jnp.asarray(rng.uniform(0, 1, (B, 112, 192, 64)), jnp.bfloat16)

    def pool_loss(xx):
        return jnp.sum(nn.max_pool(xx, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1))).astype(jnp.float32))

    timeit("maxpool fwd", jax.jit(pool_loss), y64)
    timeit("maxpool fwd+bwd (SelectAndScatter)", jax.jit(jax.grad(pool_loss)), y64)

    y1 = jnp.asarray(rng.uniform(0, 1, (B, 56, 96, 64)), jnp.bfloat16)
    for impl in ["grouped", "merge16", "block_dense", "im2col"]:
        l1 = Layer1(impl=impl)
        vl = l1.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 96, 64)))
        fl, gl = fb(l1, vl, y1)
        timeit(f"layer1[{impl}] fwd", fl, vl["params"], y1)
        timeit(f"layer1[{impl}] fwd+bwd", gl, vl["params"], y1)

    # the r4 profile_net basis, for reconciliation
    for impl in ["grouped", "merge16"]:
        bb = ResNeXt101Features(layers=(3, 0, 0, 0), groups_impl=(impl,) * 4)
        vb = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
        fbb, gbb = fb(bb, vb, x)
        timeit(f"stage-1 truncation [{impl}] fwd", fbb, vb["params"], x)
        timeit(f"stage-1 truncation [{impl}] fwd+bwd", gbb, vb["params"], x)


if __name__ == "__main__":
    main()
