"""Sweep lookup_corr implementations (the RAFT wall: 61.4 of 118 ms/chunk).

The shipped lookup is two one-hot hat-weight contractions per level — tiny
batched matmuls (M=9, K=28/48, N=48/9 per query; 21504 queries) that run at
~0.15% MXU utilization. Candidates, each checked numerically against the
shipped lookup then timed as a 20-iteration scan at the production shape
(B=16, 224x384 -> 28x48 @ 1/8):

  A  shipped one-hot matmuls (baseline)
  B  A + pyramid pre-flattened to (B, Q, h, w) bf16 OUTSIDE the scan
  C  band extraction: rows via take_along_axis (contiguous 48-wide rows),
     bilinear row-combine elementwise, transpose, columns the same way
  I  10x10 window via vmapped dynamic_slice on a zero-padded volume,
     bilinear combine elementwise (VPU), no matmuls at all

Timing rules per PERF.md (readback first, >=4 trials, min).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from robust_cvd_tpu.models import raft as raft_mod

B, H, W = 16, 224, 384
ITERS = 20
R = 4
K = 2 * R + 1


def prep():
    rng = np.random.default_rng(0)
    h, w = H // 8, W // 8
    Q = h * w
    fmap1 = jnp.asarray(rng.normal(size=(B, h, w, 256)), jnp.bfloat16)
    fmap2 = jnp.asarray(rng.normal(size=(B, h, w, 256)), jnp.bfloat16)
    pyramid = raft_mod.build_corr_pyramid(fmap1, fmap2)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = np.stack([xs, ys], -1).astype(np.float32)
    coords = jnp.asarray(
        base[None] + rng.uniform(-6, 6, (B, h, w, 2)).astype(np.float32)
    )
    return pyramid, coords, (h, w, Q)


def flat_bf16(pyramid, Q):
    return tuple(
        c.reshape(c.shape[0], Q, c.shape[3], c.shape[4]).astype(jnp.bfloat16)
        for c in pyramid
    )


# ---- candidate C: row-band gathers + elementwise bilinear ----------------
def lookup_band(pyr_flat, coords, radius=4):
    Bq, h, w, _ = coords.shape
    Q = h * w
    k = jnp.arange(-radius, radius + 2)  # 10 offsets (window + 1 for frac)
    out = []
    for i, corr in enumerate(pyr_flat):
        h2, w2 = corr.shape[2], corr.shape[3]
        c = coords.reshape(Bq, Q, 2) / (2.0**i)
        x0 = jnp.floor(c[..., 0])
        y0 = jnp.floor(c[..., 1])
        fx = (c[..., 0] - x0).astype(corr.dtype)[..., None, None]
        fy = (c[..., 1] - y0).astype(corr.dtype)[..., None, None]
        rows = y0[..., None].astype(jnp.int32) + k  # (B, Q, 10)
        cols = x0[..., None].astype(jnp.int32) + k
        rv = ((rows >= 0) & (rows < h2)).astype(corr.dtype)
        cv = ((cols >= 0) & (cols < w2)).astype(corr.dtype)
        band = jnp.take_along_axis(
            corr, jnp.clip(rows, 0, h2 - 1)[..., None], axis=2
        )  # (B, Q, 10, w2)
        band = band * rv[..., None]
        rowed = (1.0 - fy) * band[:, :, :-1] + fy * band[:, :, 1:]  # (B,Q,9,w2)
        bandT = rowed.transpose(0, 1, 3, 2)  # (B, Q, w2, 9)
        colsel = jnp.take_along_axis(
            bandT, jnp.clip(cols, 0, w2 - 1)[..., None], axis=2
        )  # (B, Q, 10, 9)
        colsel = colsel * cv[..., None]
        win = (1.0 - fx) * colsel[:, :, :-1] + fx * colsel[:, :, 1:]
        # win (B, Q, 10->9 cols, 9 rows): axes are (colwin c, rowwin r);
        # shipped channel order is c*K+r (x-offset-major)
        out.append(win.astype(jnp.float32).reshape(Bq, h, w, K * K))
    return jnp.concatenate(out, axis=-1)


# ---- candidate I: padded dynamic_slice windows + elementwise bilinear ----
def lookup_dynslice(pyr_flat, coords, radius=4):
    Bq, h, w, _ = coords.shape
    Q = h * w
    pad = K + 1  # 10: covers every partially-valid window; clamping on the
    # padded array yields all-zero windows for fully-OOB starts
    out = []
    for i, corr in enumerate(pyr_flat):
        h2, w2 = corr.shape[2], corr.shape[3]
        c = coords.reshape(Bq, Q, 2) / (2.0**i)
        x0 = jnp.floor(c[..., 0])
        y0 = jnp.floor(c[..., 1])
        fx = (c[..., 0] - x0).astype(corr.dtype)[..., None, None]
        fy = (c[..., 1] - y0).astype(corr.dtype)[..., None, None]
        cp = jnp.pad(corr, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
        ys = jnp.clip(y0.astype(jnp.int32) - radius + pad, 0, h2 + pad)
        xs = jnp.clip(x0.astype(jnp.int32) - radius + pad, 0, w2 + pad)

        def slice_one(cimg, yy, xx):
            return jax.lax.dynamic_slice(cimg, (yy, xx), (K + 1, K + 1))

        win10 = jax.vmap(jax.vmap(slice_one))(cp, ys, xs)  # (B, Q, 10, 10)
        win = (
            (1 - fy) * (1 - fx) * win10[:, :, :-1, :-1]
            + (1 - fy) * fx * win10[:, :, :-1, 1:]
            + fy * (1 - fx) * win10[:, :, 1:, :-1]
            + fy * fx * win10[:, :, 1:, 1:]
        )  # (B, Q, 9 rows, 9 cols)
        # shipped order: channel c*K + r (x-offset-major) -> transpose
        out.append(
            win.transpose(0, 1, 3, 2).astype(jnp.float32).reshape(Bq, h, w, K * K)
        )
    return jnp.concatenate(out, axis=-1)


# ---- candidate F: hat-function selectors (no one_hot) --------------------
def lookup_hat(pyramid, coords, radius=4, dtype=jnp.bfloat16):
    """Shipped two-matmul structure, but each bilinear selector row is built
    as ONE fused arithmetic hat — relu(1 - |h - (cy + r - radius)|) — instead
    of two one_hots + two weight multiplies + add. Same weights exactly
    (linear interpolation hat), zero outside the two taps and for
    out-of-range coordinates (grid_sample zero padding)."""
    B, H, W, _ = coords.shape
    r = radius
    K = 2 * r + 1
    k = jnp.arange(-r, r + 1, dtype=jnp.float32)

    out = []
    for i, corr in enumerate(pyramid):
        h2, w2 = corr.shape[3], corr.shape[4]
        Q = H * W
        c = coords.reshape(B, Q, 2) / (2.0**i)
        cx, cy = c[..., 0], c[..., 1]
        ih = jnp.arange(h2, dtype=jnp.float32)
        iw = jnp.arange(w2, dtype=jnp.float32)
        # centers: (B, Q, K)
        ctr_y = cy[..., None] + k
        ctr_x = cx[..., None] + k
        Rm = jax.nn.relu(
            1.0 - jnp.abs(ih[None, None, None, :] - ctr_y[..., None])
        ).astype(dtype)  # (B, Q, K, h2)
        Cm = jax.nn.relu(
            1.0 - jnp.abs(iw[None, None, None, :] - ctr_x[..., None])
        ).astype(dtype)  # (B, Q, K, w2)
        corr_q = corr.reshape(B, Q, h2, w2).astype(dtype)
        rowed = jnp.einsum(
            "bqrh,bqhw->bqrw", Rm, corr_q,
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        win = jnp.einsum(
            "bqrw,bqcw->bqcr", rowed, Cm,
            preferred_element_type=jnp.float32,
        )
        out.append(win.reshape(B, H, W, K * K))
    return jnp.concatenate(out, axis=-1)


# ---- candidate E: binary one-hot band (10 rows/cols), bilinear after ----
def lookup_binary_band(pyramid, coords, radius=4, dtype=jnp.bfloat16):
    """Same two-matmul structure as the shipped lookup but the selectors are
    PURE one-hots over K+1=10 consecutive taps (no bilinear weights folded
    in); the bilinear row/col combines run elementwise on the tiny
    (B, Q, 10, w2) band afterwards. Halves one_hot construction and removes
    the two weighted-one-hot multiplies on the big selector tensors."""
    B, H, W, _ = coords.shape
    r = radius
    K = 2 * r + 1
    k10 = jnp.arange(-r, r + 2, dtype=jnp.float32)  # 10 taps
    prec = None if dtype == jnp.bfloat16 else None

    out = []
    for i, corr in enumerate(pyramid):
        h2, w2 = corr.shape[3], corr.shape[4]
        Q = H * W
        c = coords.reshape(B, Q, 2) / (2.0**i)
        cx, cy = c[..., 0], c[..., 1]
        y0 = jnp.floor(cy)
        x0 = jnp.floor(cx)
        ry = (cy - y0)[..., None, None].astype(dtype)
        rx = (cx - x0)[..., None, None].astype(dtype)

        rows = (y0[..., None] + k10).astype(jnp.int32)  # (B, Q, 10)
        cols = (x0[..., None] + k10).astype(jnp.int32)
        R10 = jax.nn.one_hot(rows, h2, dtype=dtype)  # (B, Q, 10, h2)
        C10 = jax.nn.one_hot(cols, w2, dtype=dtype)

        corr_q = corr.reshape(B, Q, h2, w2).astype(dtype)
        band = jnp.einsum(
            "bqrh,bqhw->bqrw", R10, corr_q, precision=prec,
            preferred_element_type=jnp.float32,
        ).astype(dtype)  # (B, Q, 10, w2)
        rowed = (1.0 - ry) * band[:, :, :K] + ry * band[:, :, 1:]
        colsel = jnp.einsum(
            "bqrw,bqcw->bqcr", rowed, C10, precision=prec,
            preferred_element_type=jnp.float32,
        )  # (B, Q, 10, K)
        rxf = rx.astype(jnp.float32)
        win = (1.0 - rxf) * colsel[:, :, :K] + rxf * colsel[:, :, 1:]
        out.append(win.reshape(B, H, W, K * K))
    return jnp.concatenate(out, axis=-1)


def bench(name, fn, *args):
    fn(*args)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best * 1e3:8.2f} ms / 20 iters", flush=True)
    return best


def main():
    pyramid, coords, (h, w, Q) = prep()
    pyr_flat = flat_bf16(pyramid, Q)
    float(jnp.sum(coords))  # honest timings on the tunnel

    # ---- correctness vs shipped ------------------------------------------
    ref = jax.jit(lambda p, c: raft_mod.lookup_corr(list(p), c))(pyramid, coords)
    for name, fn, args in [
        ("C band", lookup_band, (pyr_flat, coords)),
        ("I dynslice", lookup_dynslice, (pyr_flat, coords)),
    ]:
        got = jax.jit(fn)(*args)
        err = float(jnp.max(jnp.abs(got - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"{name:12s} max abs err {err:.3e} (scale {scale:.1f})", flush=True)

    # ---- 20-iteration scans ------------------------------------------------
    def scan_of(lookup, pyr):
        def run(pyr, c0):
            def step(c, _):
                corr = lookup(pyr, c)
                return c + 0.01 * corr[..., :2], corr.sum()

            c, sums = jax.lax.scan(step, c0, None, length=ITERS)
            return c, sums

        return jax.jit(run)

    bench("A shipped (f32 pyr in carry)",
          scan_of(lambda p, c: raft_mod.lookup_corr(list(p), c), pyramid),
          pyramid, coords)
    bench("B shipped + pre-flat bf16 pyr",
          scan_of(lambda p, c: raft_mod.lookup_corr(
              [x.reshape(x.shape[0], h, w, x.shape[2], x.shape[3])
               for x in p], c), pyr_flat),
          pyr_flat, coords)
    bench("C band take_along_axis", scan_of(lookup_band, pyr_flat), pyr_flat,
          coords)

    # ---- E: binary 10-tap one-hot + elementwise bilinear --------------------
    gotE = jax.jit(lookup_binary_band)(pyramid, coords)
    errE = float(jnp.max(jnp.abs(gotE - ref)))
    print(f"{'E binary band':12s} max abs err {errE:.3e}", flush=True)
    bench("E binary-one-hot band", scan_of(lookup_binary_band, pyramid),
          pyramid, coords)

    # ---- F: hat-function selectors ------------------------------------------
    gotF = jax.jit(lookup_hat)(pyramid, coords)
    errF = float(jnp.max(jnp.abs(gotF - ref)))
    print(f"{'F hat sel':12s} max abs err {errF:.3e}", flush=True)
    bench("F hat-function selectors", scan_of(lookup_hat, pyramid),
          pyramid, coords)
    bench("F hat + pre-flat bf16 pyr",
          scan_of(lambda p, c: lookup_hat(
              [x.reshape(x.shape[0], h, w, x.shape[2], x.shape[3])
               for x in p], c), pyr_flat),
          pyr_flat, coords)

    # ---- D: shipped einsums with PRECOMPUTED selectors (isolates one_hot
    # construction cost; not a production candidate — coords change per iter)
    def precompute_sel(coords):
        sels = []
        r, K = R, 2 * R + 1
        kk = jnp.arange(-r, r + 1, dtype=jnp.float32)
        for i, corr in enumerate(pyramid):
            h2, w2 = corr.shape[3], corr.shape[4]
            Bq, hq, wq, _ = coords.shape
            Q = hq * wq
            c = coords.reshape(Bq, Q, 2) / (2.0**i)
            cx, cy = c[..., 0], c[..., 1]
            y0, x0 = jnp.floor(cy), jnp.floor(cx)
            ry = (cy - y0)[..., None, None]
            rx = (cx - x0)[..., None, None]
            rows = (y0[..., None] + kk).astype(jnp.int32)
            cols = (x0[..., None] + kk).astype(jnp.int32)
            Rm = (jax.nn.one_hot(rows, h2, dtype=jnp.bfloat16) * (1 - ry).astype(jnp.bfloat16)
                  + jax.nn.one_hot(rows + 1, h2, dtype=jnp.bfloat16) * ry.astype(jnp.bfloat16))
            Cm = (jax.nn.one_hot(cols, w2, dtype=jnp.bfloat16) * (1 - rx).astype(jnp.bfloat16)
                  + jax.nn.one_hot(cols + 1, w2, dtype=jnp.bfloat16) * rx.astype(jnp.bfloat16))
            sels.append((Rm, Cm))
        return sels

    sels = jax.jit(precompute_sel)(coords)
    jax.block_until_ready(sels)

    def run_fixed(pyr, sels):
        def step(c, _):
            outs = []
            for i, corr in enumerate(pyr):
                Bq = corr.shape[0]
                h2, w2 = corr.shape[3], corr.shape[4]
                Rm, Cm = sels[i]
                corr_q = corr.reshape(Bq, Q, h2, w2).astype(jnp.bfloat16)
                rowed = jnp.einsum("bqrh,bqhw->bqrw", Rm, corr_q,
                                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                win = jnp.einsum("bqrw,bqcw->bqcr", rowed, Cm,
                                 preferred_element_type=jnp.float32)
                outs.append(win.reshape(Bq, h, w, 81))
            corr_out = jnp.concatenate(outs, axis=-1)
            return c + 0.01 * corr_out[..., :2], corr_out.sum()

        c, sums = jax.lax.scan(step, coords, None, length=ITERS)
        return c, sums

    bench("D fixed precomputed selectors", jax.jit(run_fixed), pyramid, sels)


if __name__ == "__main__":
    main()
