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
    # READBACK MUST BE SCALAR-SIZED: the first version of this harness did
    # np.asarray(first_leaf) inside the timed region — for flat/bucketed
    # variants that leaf is up to 416 MB and the ~55 MB/s tunnel D2H made
    # them look 40-70x slower than they are ("flat adam 391 ms/update" was
    # ~7.5 s of D2H per trial; tools/probe_bw2.py measures the same update
    # at 5.2 ms with a one-element readback). Tree variants were unaffected
    # (their first leaf is a small conv kernel) — which is why the
    # comparison inverted.
    def consume(out):
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])

    out = fn(*args)
    jax.block_until_ready(out)
    consume(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        consume(out)
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
    # production-shaped candidate: m/v live as ONE flat vector (5.2 ms
    # update at 522 GB/s, tools/probe_bw2.py) with ravel-in/unravel-out
    # folded into the same program
    run_variant("optax.flatten(adam)", optax.flatten(optax.adam(1e-4)),
                params)

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

    # ---- bucketed: leaves concatenated into ~32 MB flat buckets ----------
    # one 104M supertensor measured 391 ms/update (pathological); 350
    # individual leaves measured 9.2 (per-leaf loop overhead). Buckets test
    # the middle: few enough loops to amortize, small enough buffers to
    # avoid whatever breaks the 416 MB case.
    leaves = jax.tree.leaves(params)
    gleaves = jax.tree.leaves(grads)
    BUCKET = 8_000_000  # 32 MB f32
    buckets, gbuckets, cur, gcur, n = [], [], [], [], 0
    for l, gl in zip(leaves, gleaves):
        cur.append(l.ravel())
        gcur.append(gl.ravel())
        n += l.size
        if n >= BUCKET:
            buckets.append(jnp.concatenate(cur))
            gbuckets.append(jnp.concatenate(gcur))
            cur, gcur, n = [], [], 0
    if cur:
        buckets.append(jnp.concatenate(cur))
        gbuckets.append(jnp.concatenate(gcur))
    print(f"buckets: {len(buckets)} of ~{BUCKET*4//2**20} MB", flush=True)

    b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-4

    @jax.jit
    def bucket_scan20(ps, ms, vs, gs):
        def step(carry, _):
            ps, ms, vs = carry
            ms = [b1 * m + (1 - b1) * g for m, g in zip(ms, gs)]
            vs = [b2 * v + (1 - b2) * g * g for v, g in zip(vs, gs)]
            ps = [p - lr * m / (jnp.sqrt(v) + eps)
                  for p, m, v in zip(ps, ms, vs)]
            return (ps, ms, vs), ()

        (ps, ms, vs), _ = jax.lax.scan(step, (ps, ms, vs), None, length=20)
        return ps, ms, vs

    ms0 = [jnp.zeros_like(b) for b in buckets]
    vs0 = [jnp.zeros_like(b) for b in buckets]
    t20 = timeit("bucketed(32MB,1D) adam scan20 (/20)", bucket_scan20,
                 buckets, ms0, vs0, gbuckets, n=2)
    print(f"{'':36s} -> amortized {t20*1e3/20:6.2f} ms/update", flush=True)

    # 2-D layout theory: TPU tiles (sublane, lane) 2-D arrays; giant 1-D
    # vectors may lower degenerately. Same buckets reshaped (-1, 1024).
    def to2d(b):
        pad = (-b.size) % 1024
        return jnp.pad(b, (0, pad)).reshape(-1, 1024)

    b2d = [to2d(b) for b in buckets]
    g2d = [to2d(b) for b in gbuckets]
    m2d = [jnp.zeros_like(b) for b in b2d]
    v2d = [jnp.zeros_like(b) for b in b2d]
    t20 = timeit("bucketed(32MB,2D) adam scan20 (/20)", bucket_scan20,
                 b2d, m2d, v2d, g2d, n=2)
    print(f"{'':36s} -> amortized {t20*1e3/20:6.2f} ms/update", flush=True)

    # one flat 104M supertensor, 2-D
    f2d = to2d(flat)
    gf2d = to2d(gflat)

    @jax.jit
    def flat2d_scan20(p, m, vv, g):
        def step(carry, _):
            pp, mm, vvv = carry
            mm = b1 * mm + (1 - b1) * g
            vvv = b2 * vvv + (1 - b2) * g * g
            return (pp - lr * mm / (jnp.sqrt(vvv) + eps), mm, vvv), ()

        (p2, m2, v2), _ = jax.lax.scan(step, (p, m, vv), None, length=20)
        return p2, m2, v2

    t20 = timeit("flat(104M,2D) adam scan20 (/20)", flat2d_scan20,
                 f2d, jnp.zeros_like(f2d), jnp.zeros_like(f2d), gf2d, n=2)
    print(f"{'':36s} -> amortized {t20*1e3/20:6.2f} ms/update", flush=True)

    # cost of moving between tree and buckets (needed on the real step:
    # concat grads in, slice params out)
    sizes = [l.size for l in leaves]

    @jax.jit
    def concat_and_slice(gs_tree, buckets):
        flat = [g.ravel() for g in jax.tree.leaves(gs_tree)]
        # concat per bucket
        out, i = [], 0
        for b in buckets:
            take, tot = [], 0
            while tot < b.size:
                take.append(flat[i])
                tot += flat[i].size
                i += 1
            out.append(jnp.concatenate(take))
        # slice back to leaves
        back, bi, off = [], 0, 0
        for s in sizes:
            if off + s > out[bi].size:
                bi, off = bi + 1, 0
            back.append(jax.lax.dynamic_slice(out[bi], (off,), (s,)))
            off += s
        return back

    timeit("tree->buckets->tree roundtrip", concat_and_slice, grads, buckets)


if __name__ == "__main__":
    main()
