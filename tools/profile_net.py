"""Region-level dissection of the MiDaS train-step forward+backward.

The full step is ~43.7 ms (bench r4) of which the net fwd+bwd measured
39.8 ms (tools/profile_step2.py); this locates the time inside the net:
stem, backbone stages 1-4 (cumulative truncations), and decoder
(= full - backbone). Random weights: timing only.

Respect PERF.md measurement rules: a readback before timing, >=3 trials,
min. Run as ONE process (tunnel startup dominates otherwise).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from robust_cvd_tpu.models.midas import MidasNet, ResNeXt101Features

H, W, B = 224, 384, 2
x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, H, W, 3)), jnp.float32)


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # enable honest timing
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


def fwd_bwd_fn(net, variables):
    params, stats = variables["params"], variables.get("batch_stats")

    def loss(p, x):
        out, _ = net.apply(
            {"params": p, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )
        first = jax.tree.leaves(out)[0]
        return jnp.sum(first.astype(jnp.float32))

    g = jax.jit(jax.grad(loss))
    f = jax.jit(lambda p, x: loss(p, x))
    return f, g


# full net
net = MidasNet()
v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
f, g = fwd_bwd_fn(net, v)
timeit("full net fwd", f, v["params"], x)
t_full = timeit("full net fwd+bwd", g, v["params"], x)

# backbone truncations (cumulative): stem+L1, +L2, +L3, +L4.
# ROUND-5 FIX: pass the PRODUCTION merge16/8/4/2 lowerings — the round-4
# run used this class's default ("grouped",)*4, which made stage-1 look
# like a 16.6 ms wall when the production merge16 stage-1 is ~5.7 ms
# (tools/profile_stem.py).
PROD_IMPL = ("merge16", "merge8", "merge4", "merge2")
for k, layers in enumerate([(3, 0, 0, 0), (3, 4, 0, 0), (3, 4, 23, 0), (3, 4, 23, 3)]):
    bb = ResNeXt101Features(layers=layers, groups_impl=PROD_IMPL)
    vb = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    fb, gb = fwd_bwd_fn(bb, vb)
    timeit(f"backbone thru stage {k + 1} {layers} fwd", fb, vb["params"], x)
    tb = timeit(f"backbone thru stage {k + 1} {layers} fwd+bwd", gb, vb["params"], x)
print(f"decoder (full - backbone) fwd+bwd            ~{(t_full - tb)*1e3:8.2f} ms")
