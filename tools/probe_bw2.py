"""What does this v5e-via-tunnel actually sustain on elementwise streams?

round-4's probe_adam_bw measured copy at 0.5 GB/s with per-dispatch timing
(untrustworthy); this probe chains everything inside ONE program (lax.scan,
20 iterations) so dispatch cost is amortized and buffers stay on device.
Shapes are well-tiled 2-D (8192 x 8192 f32 = 256 MB). If copy lands near
819 GB/s the chip is fine and Adam's 9.2 ms (315 GB/s effective) has ~3x
headroom; if copy lands at tens of GB/s, large elementwise streams are
backend-limited and tree-Adam is already near the achievable ceiling.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

float(jnp.zeros(()).sum())  # honest tunnel timings

N = 8192
x = jnp.asarray(np.random.default_rng(0).normal(size=(N, N)), jnp.float32)
GB = N * N * 4 / 2**30


def timeit(name, fn, *args, streams, n=2):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n / 20)
    bw = streams * GB / best
    print(f"{name:34s} {best*1e3:8.2f} ms/iter  {bw:7.1f} GB/s", flush=True)


@jax.jit
def copy20(x):
    def step(c, _):
        return c + 1.0, ()

    c, _ = jax.lax.scan(step, x, None, length=20)
    return c


@jax.jit
def triad20(x):
    def step(c, _):
        return c * 1.0001 + x, ()

    c, _ = jax.lax.scan(step, jnp.zeros_like(x), None, length=20)
    return c


@jax.jit
def adam_shaped20(p):
    b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-4
    g = p * 1e-3

    def step(carry, _):
        pp, mm, vv = carry
        mm = b1 * mm + (1 - b1) * g
        vv = b2 * vv + (1 - b2) * g * g
        return (pp - lr * mm / (jnp.sqrt(vv) + eps), mm, vv), ()

    (p2, m2, v2), _ = jax.lax.scan(
        step, (p, jnp.zeros_like(p), jnp.zeros_like(p)), None, length=20
    )
    return p2


timeit("copy (+1), 2 streams", copy20, x, streams=2)
timeit("triad, 3 streams", triad20, x, streams=3)
timeit("adam-shaped 256MB, 7 streams", adam_shaped20, x, streams=7)

# the shape profile_adam's pathological flat variant used: tall-skinny
# (101562, 1024) — isolates aspect-ratio vs everything else
x2 = jnp.asarray(
    np.random.default_rng(1).normal(size=(101562, 1024)), jnp.float32
)
GB2 = x2.size * 4 / 2**30


@jax.jit
def adam_tall20(p):
    b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-4
    g = p * 1e-3

    def step(carry, _):
        pp, mm, vv = carry
        mm = b1 * mm + (1 - b1) * g
        vv = b2 * vv + (1 - b2) * g * g
        return (pp - lr * mm / (jnp.sqrt(vv) + eps), mm, vv), ()

    (p2, m2, v2), _ = jax.lax.scan(
        step, (p, jnp.zeros_like(p), jnp.zeros_like(p)), None, length=20
    )
    return p2, m2, v2


out = adam_tall20(x2)
jax.block_until_ready(out)
best = 1e9
for _ in range(4):
    t0 = time.perf_counter()
    for _ in range(2):
        out = adam_tall20(x2)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - t0) / 2 / 20)
print(f"{'adam tall (101562,1024) 3-out':34s} {best*1e3:8.2f} ms/iter  "
      f"{7*GB2/best:7.1f} GB/s", flush=True)

# small-array comparison: the SAME total bytes as 350-leaf tree adam
xs = [jnp.asarray(np.random.default_rng(i).normal(size=(544, 544)), jnp.float32)
      for i in range(32)]  # 32 x ~1.2 MB


@jax.jit
def many_copy20(xs):
    def step(cs, _):
        return [c + 1.0 for c in cs], ()

    cs, _ = jax.lax.scan(step, xs, None, length=20)
    return cs


out = many_copy20(xs)
jax.block_until_ready(out)
best = 1e9
for _ in range(4):
    t0 = time.perf_counter()
    for _ in range(2):
        out = many_copy20(xs)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - t0) / 2 / 20)
tot = sum(c.size * 4 for c in xs) * 2 / 2**30
print(f"{'32 x 1.2MB copies':34s} {best*1e3:8.2f} ms/iter  {tot/best:7.1f} GB/s",
      flush=True)
