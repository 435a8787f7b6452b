"""Is the Adam update bandwidth-limited by XLA or by the chip?

The round-4 profile parked Adam at ~13.3 ms for a 104M-param tree
(~2.9 GB/update -> ~220 GB/s effective). Before writing a Pallas kernel,
measure what this v5e actually sustains on elementwise streams:

  1. copy (1 read + 1 write)
  2. triad a = b + s*c (2R + 1W)
  3. adam-shaped fused update on ONE flat f32 array (4R + 3W)
  4. same via a Pallas blocked kernel with input_output_aliasing

If (3) ~= (4) ~= chip roofline, Adam's 220 GB/s is a many-small-arrays
artifact; if (4) >> (3), a Pallas fused optimizer is the lever.
Timing rules per PERF.md.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

float(jnp.zeros(()).sum())  # enable honest timings

N = 104_000_000  # the real param count


def timeit(name, fn, *args, n=10, bytes_moved=None):
    # The module-level scalar readback above already disabled dispatch
    # cancellation for the whole process (PERF.md gotcha #1); a per-trial
    # np.asarray of a 104M-element result would drag ~416 MB through the
    # ~20 MB/s tunnel PER TRIAL and swamp the measurement.
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    bw = (bytes_moved / best / 1e9) if bytes_moved else 0.0
    print(f"{name:46s} {best*1e3:8.2f} ms   {bw:7.1f} GB/s", flush=True)
    return best


key = jax.random.PRNGKey(0)
p = jax.random.normal(key, (N,), jnp.float32)
g = jax.random.normal(jax.random.PRNGKey(1), (N,), jnp.float32) * 1e-3
mu = jnp.zeros((N,), jnp.float32)
nu = jnp.zeros((N,), jnp.float32)
jax.block_until_ready((p, g, mu, nu))

B1, B2, EPS, LR = 0.9, 0.999, 1e-8, 1e-4

timeit("copy (2 streams, 0.83 GB)", jax.jit(lambda x: x + 1.0), p,
       bytes_moved=2 * 4 * N)
timeit("triad (3 streams, 1.25 GB)",
       jax.jit(lambda a, b: a + 0.5 * b), p, g, bytes_moved=3 * 4 * N)


def adam_flat(p, g, mu, nu):
    mu = B1 * mu + (1 - B1) * g
    nu = B2 * nu + (1 - B2) * g * g
    upd = mu / (jnp.sqrt(nu) + EPS)
    return p - LR * upd, mu, nu


timeit("adam one flat array (7 streams, 2.9 GB)", jax.jit(adam_flat),
       p, g, mu, nu, bytes_moved=7 * 4 * N)

adam_donated = jax.jit(adam_flat, donate_argnums=(0, 2, 3))


# donation consumes buffers; re-make fresh copies per trial
def adam_donate_trial():
    pp = p + 0.0
    mm = mu + 0.0
    nn = nu + 0.0
    jax.block_until_ready((pp, mm, nn))
    t0 = time.perf_counter()
    out = adam_donated(pp, g, mm, nn)
    jax.block_until_ready(out)
    np.asarray(out[0]).ravel()[:1]
    return time.perf_counter() - t0


best = min(adam_donate_trial() for _ in range(6))
print(f"{'adam flat donated (single calls)':46s} {best*1e3:8.2f} ms   "
      f"{7*4*N/best/1e9:7.1f} GB/s", flush=True)

# ---- pallas blocked version --------------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 1 << 21  # 2M f32 per block x 7 streams = 58 MB HBM traffic per step
NPAD = -(-N // BLK) * BLK
pp = jnp.concatenate([p, jnp.zeros((NPAD - N,), jnp.float32)]).reshape(-1, 8, 128)
gg = jnp.concatenate([g, jnp.zeros((NPAD - N,), jnp.float32)]).reshape(-1, 8, 128)
mm = jnp.zeros_like(pp)
nn = jnp.zeros_like(pp)
rows = NPAD // (8 * 128)
blk_rows = BLK // (8 * 128)


def adam_kernel(p_ref, g_ref, mu_ref, nu_ref, po_ref, mo_ref, no_ref):
    gv = g_ref[:]
    mu = B1 * mu_ref[:] + (1 - B1) * gv
    nu = B2 * nu_ref[:] + (1 - B2) * gv * gv
    mo_ref[:] = mu
    no_ref[:] = nu
    po_ref[:] = p_ref[:] - LR * (mu / (jnp.sqrt(nu) + EPS))


spec = pl.BlockSpec((blk_rows, 8, 128), lambda i: (i, 0, 0))
adam_pl = jax.jit(lambda p, g, mu, nu: pl.pallas_call(
    adam_kernel,
    grid=(rows // blk_rows,),
    in_specs=[spec] * 4,
    out_specs=[spec] * 3,
    out_shape=[jax.ShapeDtypeStruct(pp.shape, jnp.float32)] * 3,
)(p, g, mu, nu))

timeit("adam pallas blocked (7 streams)", adam_pl, pp, gg, mm, nn,
       bytes_moved=7 * 4 * NPAD)

# bf16 optimizer state: mu/nu halve their 4 streams
mub = jnp.zeros((N,), jnp.bfloat16)
nub = jnp.zeros((N,), jnp.bfloat16)


def adam_bf16_state(p, g, mu, nu):
    mu32 = mu.astype(jnp.float32)
    nu32 = nu.astype(jnp.float32)
    mu32 = B1 * mu32 + (1 - B1) * g
    nu32 = B2 * nu32 + (1 - B2) * g * g
    upd = mu32 / (jnp.sqrt(nu32) + EPS)
    return (p - LR * upd, mu32.astype(jnp.bfloat16),
            nu32.astype(jnp.bfloat16))


timeit("adam flat bf16 m/v (5 eff streams, 2.1 GB)",
       jax.jit(adam_bf16_state), p, g, mub, nub,
       bytes_moved=int(5 * 4 * N))
