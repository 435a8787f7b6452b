"""Mask R-CNN frames-per-dispatch sweep (round 5).

Round 4 landed FB=2 (43 -> ~31 ms/frame: the serial NMS/ROI fori_loops
are latency-bound, a vmapped second frame rides nearly free) with
"larger batches trade against backbone activation memory at 800px" left
unmeasured. v5e has 16 GB HBM; sweep FB = 2 / 4 / 8 at the bench shape
(224x384 clip frames -> 800px test scale) and report ms/frame.
PERF.md timing rules."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from robust_cvd_tpu.models.mask_rcnn import MaskRCNN, dynamic_mask_from_detections

H, W = 224, 384
test_size, max_size = 800, 1333
mscale = test_size / min(H, W)
if mscale * max(H, W) > max_size:
    mscale = max_size / max(H, W)
th, tw = int(round(H * mscale)), int(round(W * mscale))
ph, pw = -(-th // 32) * 32, -(-tw // 32) * 32

rng = np.random.default_rng(0)
images = jnp.asarray(rng.uniform(0, 1, (16, H, W, 3)), jnp.float32)

rcnn = MaskRCNN()
params = rcnn.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))["params"]
float(jnp.sum(images))


def mask_frame(params, img):
    net_in = jax.image.resize(img, (th, tw, 3), "bilinear")
    x = jnp.zeros((1, ph, pw, 3), jnp.float32).at[0, :th, :tw].set(net_in)
    det = rcnn.apply({"params": params}, x)
    m = dynamic_mask_from_detections(det, (ph, pw), 0.5)[:th, :tw]
    return jax.image.resize(m.astype(jnp.float32), (H, W), "bilinear")


for FB in [2, 4, 8]:
    fn = jax.jit(
        lambda p, imgs: jax.vmap(lambda im: mask_frame(p, im))(imgs)
    )
    out = fn(params, images[:FB])
    jax.block_until_ready(out)
    np.asarray(out.ravel()[:1])
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for s in range(0, 16, FB):
            out = fn(params, images[s : s + FB])
        jax.block_until_ready(out)
        np.asarray(out.ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    print(f"FB={FB}: {best*1e3:8.2f} ms / 16 frames  "
          f"({best*1e3/16:6.2f} ms/frame)", flush=True)
