"""Net dissection round 2: HONEST COTANGENTS + lowering A/Bs.

profile_net.py's truncation losses are plain sums — the backward's seed
cotangent is a constant ones-tensor, which XLA can fold/simplify, so
backbone-alone and decoder-alone understate their share of the real
27.3 ms full-net fwd+bwd (they sum to ~17). Here every loss is
sum(out * R) with fixed random R (data-dependent cotangents, nothing
foldable), at the production shape 224x384 B=2:

  full MidasNet                      fwd+bwd
  backbone stages 1-4 (production)   fwd+bwd, random-weighted all 4 feats
  decoder (random feats in)          grad wrt params AND feats
  full net, stage-1 impl A/B         merge16 (prod) vs block_dense
                                     (isolated layer1 fwd+bwd: 4.74 vs 3.93)

PERF.md timing rules (scalar readbacks, >=4 trials, min).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from robust_cvd_tpu.models.midas import MidasNet, ResNeXt101Features

H, W, B = 224, 384, 2
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:56s} {best*1e3:8.2f} ms", flush=True)
    return best


def fwd_bwd(net, v):
    stats = v.get("batch_stats")

    # precompute random cotangent weights OUTSIDE any trace (shapes via
    # eval_shape) — creating them lazily inside the traced loss leaks
    out_shape = jax.eval_shape(
        lambda p, xx: net.apply(
            {"params": p, "batch_stats": stats}, xx, train=True,
            mutable=["batch_stats"],
        )[0],
        v["params"], jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32),
    )
    ws = [
        jnp.asarray(np.random.default_rng(i).normal(size=s.shape),
                    jnp.float32)
        for i, s in enumerate(jax.tree.leaves(out_shape))
    ]

    def loss(p, xx):
        out, _ = net.apply(
            {"params": p, "batch_stats": stats}, xx, train=True,
            mutable=["batch_stats"],
        )
        leaves = jax.tree.leaves(out)
        return sum(
            jnp.sum(l.astype(jnp.float32) * w) for l, w in zip(leaves, ws)
        )

    return jax.jit(lambda p, xx: loss(p, xx)), jax.jit(jax.grad(loss))


def main():
    float(jnp.sum(x))

    # full production net, random output cotangent
    net = MidasNet()
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    f, g = fwd_bwd(net, v)
    timeit("full net [prod merge16/8/4/2] fwd", f, v["params"], x)
    t_full = timeit("full net [prod] fwd+bwd (random cotangent)", g,
                    v["params"], x)

    # production backbone, random cotangents on all four feature maps
    bb = ResNeXt101Features(
        layers=(3, 4, 23, 3),
        groups_impl=("merge16", "merge8", "merge4", "merge2"),
    )
    vb = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    fb_, gb = fwd_bwd(bb, vb)
    timeit("backbone [prod] fwd", fb_, vb["params"], x)
    t_bb = timeit("backbone [prod] fwd+bwd (random cotangents)", gb,
                  vb["params"], x)
    print(f"{'full - backbone (decoder share)':56s} "
          f"{(t_full - t_bb)*1e3:8.2f} ms", flush=True)

    # stage-1 lowering A/B on the FULL net
    for impl1 in ["block_dense", "grouped"]:
        net2 = MidasNet(groups_impl=(impl1, "merge8", "merge4", "merge2"))
        v2 = net2.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
        f2, g2 = fwd_bwd(net2, v2)
        timeit(f"full net [stage1={impl1}] fwd+bwd", g2, v2["params"], x)

    # stage-2/3 A/B (block_dense everywhere cheap to test)
    net3 = MidasNet(groups_impl=("block_dense",) * 4)
    v3 = net3.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    f3, g3 = fwd_bwd(net3, v3)
    timeit("full net [block_dense x4] fwd+bwd", g3, v3["params"], x)


if __name__ == "__main__":
    main()
