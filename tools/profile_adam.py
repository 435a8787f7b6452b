"""Adam roofline dissection (VERDICT r4 ask #2).

PERF.md r4: "adam update alone 13.3 ms, ~2.9 GB traffic, ~27% of HBM
roofline; flatten/donation/bf16-mu all neutral; parked". Hypothesis this
round: the 13.3 ms standalone number carries the tunnel's ~6 ms
per-dispatch floor — the production step runs Adam INSIDE the scanned
epoch program where dispatch is amortized, so the honest question is the
amortized in-program cost. Measured here:

  single dispatch       the r4 protocol (1 update / dispatch)
  scan20                20 chained updates in ONE program, /20
  scan20 bf16 m/v       optax.adam(mu_dtype=bf16) + v in bf16 via custom
  scan20 flat           one concatenated f32 supertensor, hand-written adam
  scan20 flat bf16 m/v  the traffic floor variant (p f32, m/v bf16)

Roofline: p+g+m+v reads + p+m+v writes = 7 x 4 B x 104 M ~ 2.9 GB f32;
bf16 m/v cuts it to ~2.0 GB. v5e ~819 GB/s -> 3.5 / 2.4 ms.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from robust_cvd_tpu.models.midas import MidasNet

H, W = 224, 384


def timeit(name, fn, *args, n=5):
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
    print(f"{name:36s} {best*1e3:8.2f} ms", flush=True)
    return best


def main():
    net = MidasNet()
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    params = v["params"]
    nparams = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {nparams/1e6:.1f} M, leaves: {len(jax.tree.leaves(params))}")
    grads = jax.tree.map(lambda x: jnp.full_like(x, 1e-4), params)
    float(jnp.sum(jax.tree.leaves(params)[0]))  # honest tunnel timings

    def run_variant(name, opt, p0):
        state = jax.jit(opt.init)(p0)

        @jax.jit
        def one(p, s, g):
            u, s2 = opt.update(g, s, p)
            return optax.apply_updates(p, u), s2

        t1 = timeit(f"{name} single dispatch", one, p0, state, grads)

        @jax.jit
        def scan20(p, s, g):
            def step(carry, _):
                pp, ss = carry
                u, s2 = opt.update(g, ss, pp)
                return (optax.apply_updates(pp, u), s2), ()

            (p2, s2), _ = jax.lax.scan(step, (p, s), None, length=20)
            return p2, s2

        t20 = timeit(f"{name} scan20 (/20)", scan20, p0, state, grads, n=2)
        print(f"{'':36s} -> amortized {t20*1e3/20:6.2f} ms/update", flush=True)

    run_variant("tree adam f32", optax.adam(1e-4), params)
    run_variant("tree adam bf16 mu/nu",
                optax.adam(1e-4, mu_dtype=jnp.bfloat16), params)

    # flat supertensor variants
    flat, unravel = jax.flatten_util.ravel_pytree(params)
    gflat, _ = jax.flatten_util.ravel_pytree(grads)

    def flat_adam(mv_dtype):
        b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-4

        @jax.jit
        def scan20(p, m, vv, g):
            def step(carry, _):
                pp, mm, vvv = carry
                mm = (b1 * mm.astype(jnp.float32)
                      + (1 - b1) * g).astype(mv_dtype)
                vvv = (b2 * vvv.astype(jnp.float32)
                       + (1 - b2) * g * g).astype(mv_dtype)
                upd = lr * mm.astype(jnp.float32) / (
                    jnp.sqrt(vvv.astype(jnp.float32)) + eps)
                return (pp - upd, mm, vvv), ()

            (p2, m2, v2), _ = jax.lax.scan(step, (p, m, vv), None, length=20)
            return p2, m2, v2

        m0 = jnp.zeros_like(flat, mv_dtype)
        v0 = jnp.zeros_like(flat, mv_dtype)
        t20 = timeit(f"flat adam {mv_dtype.__name__} scan20 (/20)",
                     scan20, flat, m0, v0, gflat, n=2)
        print(f"{'':36s} -> amortized {t20*1e3/20:6.2f} ms/update", flush=True)

    flat_adam(jnp.float32)
    flat_adam(jnp.bfloat16)


if __name__ == "__main__":
    main()
