"""First-ever RAFT stage dissection (VERDICT r4 ask #3).

Times the production shape (bench.py stage 2: 224x384, chunk of 16 pairs,
20 scan iterations) in pieces:

  full            the exact bench program (RAFT.apply)
  encoders        fnet(img1) + fnet(img2) + cnet(img1)
  pyramid         build_corr_pyramid from precomputed fmaps
  scan20          20x scanned iteration body from a precomputed carry
  lookup20        20x lookup_corr alone (scanned, coords drift per iter)
  update20        20x BasicUpdateBlock alone (fixed corr input)
  upsample        convex 8x upsampling of the final flow

Protocol per PERF.md: one device readback before any timing (tunnel
cancellation), >=4 warm trials of `calls` calls each, report min ms/call.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from robust_cvd_tpu.models import raft as raft_mod

B, H, W = 16, 224, 384
ITERS = 20
CALLS = 4
TRIALS = 4


def bench_fn(name, fn, *args):
    fn(*args)  # compile + warm
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        for _ in range(CALLS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / CALLS)
    print(f"{name:12s} {best * 1e3:8.2f} ms/call  ({best * 1e3 / B:6.2f} ms/pair)")
    return best


def main():
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)

    model = raft_mod.RAFT(iters=ITERS)
    variables = model.init(jax.random.PRNGKey(0), img1[:1], img2[:1])
    variables = jax.device_put(variables)

    # enable honest timings on the tunnel (see PERF.md measurement gotcha)
    float(jnp.sum(img1))

    full = jax.jit(lambda v, a, b: model.apply(v, a, b))
    bench_fn("full", full, variables, img1, img2)

    # ---- encoders ----------------------------------------------------------
    fnet = raft_mod.BasicEncoder(256, "instance", name="fnet")
    cnet = raft_mod.BasicEncoder(256, "batch", name="cnet")
    fv = {"params": variables["params"]["fnet"]}
    cv = {
        "params": variables["params"]["cnet"],
        **(
            {"batch_stats": variables["batch_stats"]["cnet"]}
            if "batch_stats" in variables
            else {}
        ),
    }
    norm = lambda im: 2.0 * (im / 255.0) - 1.0

    @jax.jit
    def encoders(fv, cv, a, b):
        f1 = fnet.apply(fv, norm(a))
        f2 = fnet.apply(fv, norm(b))
        c = cnet.apply(cv, norm(a))
        return f1, f2, c

    bench_fn("encoders", encoders, fv, cv, img1, img2)
    fmap1, fmap2, cfeat = encoders(fv, cv, img1, img2)

    # ---- correlation pyramid -----------------------------------------------
    pyr_fn = jax.jit(lambda a, b: raft_mod.build_corr_pyramid(a, b))
    bench_fn("pyramid", pyr_fn, fmap1, fmap2)
    pyramid = tuple(pyr_fn(fmap1, fmap2))

    h, w = fmap1.shape[1:3]
    net = jnp.tanh(cfeat[..., :128])
    inp = jax.nn.relu(cfeat[..., 128:])
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    coords0 = jnp.broadcast_to(jnp.stack([xs, ys], -1), (B, h, w, 2))

    # ---- 20x scanned full iteration body ------------------------------------
    body = raft_mod._IterBody()
    bparams = {"params": variables["params"]["update_block"]}

    @jax.jit
    def scan20(bp, net, inp, pyramid):
        def step(carry, _):
            return body.apply(bp, carry, None)

        carry = (net, coords0, coords0, inp, pyramid)
        (net2, coords1, _, _, _), masks = jax.lax.scan(
            step, carry, None, length=ITERS
        )
        return coords1, masks[-1]

    bench_fn("scan20", scan20, bparams, net, inp, pyramid)
    coords1, last_mask = scan20(bparams, net, inp, pyramid)

    # ---- 20x lookup alone (coords drift a little each iter) -----------------
    @jax.jit
    def lookup20(pyramid, c0):
        def step(c, _):
            corr = raft_mod.lookup_corr(list(pyramid), c, 4)
            return c + 0.01 * corr[..., :2], corr.sum()

        c, sums = jax.lax.scan(step, c0, None, length=ITERS)
        return c, sums

    bench_fn("lookup20", lookup20, pyramid, coords0)

    # ---- 20x update block alone (fixed corr) --------------------------------
    corr_fixed = raft_mod.lookup_corr(list(pyramid), coords0, 4)
    ub = raft_mod.BasicUpdateBlock()
    ubp = {"params": variables["params"]["update_block"]["block"]}

    @jax.jit
    def update20(ubp, net, inp, corr):
        def step(carry, _):
            net, flow = carry
            net2, mask, delta = ub.apply(ubp, net, inp, corr, flow)
            return (net2, flow + delta), mask.sum()

        (net2, flow), sums = jax.lax.scan(
            step, (net, jnp.zeros((B, h, w, 2))), None, length=ITERS
        )
        return net2, flow, sums

    bench_fn("update20", update20, ubp, net, inp, corr_fixed)

    # ---- upsample ------------------------------------------------------------
    up_fn = jax.jit(raft_mod.upsample_flow_convex)
    bench_fn("upsample", up_fn, coords1 - coords0, last_mask)


if __name__ == "__main__":
    main()
