"""Homography registration stage dissection on TPU (round-4 ask #6).

Times the full register_pairs chunk program plus ablations: descriptor
extraction (gather vs one-hot contraction), matching matmul + top_k, RANSAC
hypotheses, warp. Timing rules per PERF.md.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from robust_cvd_tpu.ops import geometry
from robust_cvd_tpu.ops import homography as hg

B, H, W = 16, 224, 384
rng = np.random.default_rng(0)
im1 = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
# frame2 = x-shifted frame1 so matching has real structure
im2 = np.roll(im1, 5, axis=2)

float(jnp.zeros(()).sum())  # enable honest timings


def timeit(name, fn, *args, n=10):
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
    print(f"{name:44s} {best*1e3:8.2f} ms ({best*1e3/B:6.2f} ms/pair)",
          flush=True)
    return best


j1, j2 = jnp.asarray(im1), jnp.asarray(im2)
timeit("register_pairs full chunk (16 pairs)",
       lambda a, b: hg.register_pairs(np.asarray(a), np.asarray(b)), j1, j2)

# pieces
g1 = 0.299 * j1[..., 0] + 0.587 * j1[..., 1] + 0.114 * j1[..., 2]
from robust_cvd_tpu.solver.constraints import corner_min_eigenval

resp = corner_min_eigenval(g1)
K = 1024
xs, ys, v = jax.jit(hg._nms_topk, static_argnums=1)(resp, K)

timeit("  corner response + nms topk", jax.jit(
    lambda g: hg._nms_topk(corner_min_eigenval(g), K)[0]), g1)

timeit("  descriptors one-hot (TPU path)", jax.jit(
    lambda g, x, y: hg._patch_descriptors_b(g, x, y)), g1, xs, ys)

r = hg._PATCH_RADIUS


def desc_gather(g, x, y):
    size = 2 * r + 1
    pad = jnp.pad(g, ((0, 0), (r, r), (r, r)), mode="edge")
    dy, dx = jnp.meshgrid(jnp.arange(size), jnp.arange(size), indexing="ij")
    yy = y.astype(jnp.int32)[:, :, None] + dy.reshape(-1)[None, None, :]
    xx = x.astype(jnp.int32)[:, :, None] + dx.reshape(-1)[None, None, :]
    return jax.vmap(lambda gg, a, b: gg[a, b])(pad, yy, xx)


timeit("  descriptors gather (old path)", jax.jit(desc_gather), g1, xs, ys)

d1 = hg._patch_descriptors_b(g1, xs, ys)
d2 = hg._patch_descriptors_b(g1, xs, ys)


def match_topk(a, b):
    sim = jnp.einsum("bkd,bld->bkl", a.astype(jnp.bfloat16),
                     b.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return jax.lax.top_k(sim, 2)


def match_approx(a, b):
    sim = jnp.einsum("bkd,bld->bkl", a.astype(jnp.bfloat16),
                     b.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return jax.lax.approx_max_k(sim, 2)


timeit("  match matmul + lax.top_k(2)", jax.jit(match_topk), d1, d2)
timeit("  match matmul + approx_max_k(2)", jax.jit(match_approx), d1, d2)

# warp alone
Hs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))


def warp_gather(im, Hm):
    pix = geometry.pixel_grid((H, W)).reshape(-1, 2)
    src = hg._apply_h_j(jnp.linalg.inv(Hm)[:, None], pix[None, None])[:, 0]
    return jax.vmap(geometry.grid_sample)(im, src.reshape(B, H, W, 2))


def warp_mxu(im, Hm):
    pix = geometry.pixel_grid((H, W)).reshape(-1, 2)
    src = hg._apply_h_j(jnp.linalg.inv(Hm)[:, None], pix[None, None])[:, 0]
    return jax.vmap(geometry.grid_sample_mxu)(im, src.reshape(B, H, W, 2))


timeit("  inverse-warp gather", jax.jit(warp_gather), j2, Hs)
timeit("  inverse-warp mxu", jax.jit(warp_mxu), j2, Hs)
