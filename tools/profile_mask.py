"""Mask R-CNN frame dissection on TPU (round 4, after the fixed-point NMS).

Times nms_keep (fixed-point vs the old serial fori_loop) at the production
K=1000, then the full frame program at 1/2/4 frames per dispatch to re-pick
FB. Timing rules per PERF.md: first readback before timing, min of >=3
warm trials.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from robust_cvd_tpu.models import mask_rcnn as M

float(jnp.zeros(()).sum())  # enable honest timings


def timeit(name, fn, *args, n=5, div=1.0):
    # One scalar readback at module import disables dispatch cancellation
    # for the process; per-trial full-array readbacks would add ~50 ms of
    # tunnel D2H per MB of output and contaminate the timing.
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:48s} {best*1e3:8.2f} ms ({best*1e3/div:7.2f} ms/unit)",
          flush=True)
    return best


# ---- NMS standalone at K=1000 ------------------------------------------
rng = np.random.default_rng(0)
K = 1000
boxes = rng.uniform(0, 700, (K, 4)).astype(np.float32)
boxes[:, 2:] = boxes[:, :2] + rng.uniform(10, 200, (K, 2))
scores = rng.uniform(0, 1, K).astype(np.float32)


def nms_keep_serial(boxes, scores, iou_thresh):
    """The pre-round-4 per-candidate fori_loop, kept here for the A/B."""
    k = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    iou = M.pairwise_iou(b, b)
    v = jnp.ones((k,), bool)

    def body(i, keep):
        sup = jnp.any((iou[i] > iou_thresh) & keep & (jnp.arange(k) < i))
        return keep.at[i].set(~sup & keep[i])

    keep_sorted = jax.lax.fori_loop(0, k, body, v)
    inv = jnp.zeros((k,), jnp.int32).at[order].set(jnp.arange(k))
    return keep_sorted[inv]


jb, js = jnp.asarray(boxes), jnp.asarray(scores)
a = timeit("nms_keep serial fori_loop (old), K=1000",
           jax.jit(lambda b, s: nms_keep_serial(b, s, 0.5)), jb, js)
b = timeit("nms_keep fixed-point (new), K=1000",
           jax.jit(lambda b, s: M.nms_keep(b, s, 0.5)), jb, js)
same = np.array_equal(np.asarray(nms_keep_serial(jb, js, 0.5)),
                      np.asarray(M.nms_keep(jb, js, 0.5)))
print(f"  identical keep sets: {same}   speedup {a/b:.1f}x", flush=True)

# ---- full frame at 800px, FB in {1, 2, 4} -------------------------------
H, W = 384, 672  # 384p clip frames
test_size, max_size = 800, 1333
s = test_size / min(H, W)
if s * max(H, W) > max_size:
    s = max_size / max(H, W)
th, tw = int(round(H * s)), int(round(W * s))
ph, pw = -(-th // 32) * 32, -(-tw // 32) * 32
print(f"net input {ph}x{pw}", flush=True)

net = M.MaskRCNN()
params = jax.device_put(
    net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
)
jax.block_until_ready(params)
imgs = jnp.asarray(rng.uniform(0, 1, (4, H, W, 3)).astype(np.float32))


def frame(params, img):
    net_in = jax.image.resize(img, (th, tw, 3), "bilinear")
    x = jnp.zeros((1, ph, pw, 3), jnp.float32).at[0, :th, :tw].set(net_in)
    det = net.apply({"params": params}, x)
    m = M.dynamic_mask_from_detections(det, (ph, pw), 0.5)[:th, :tw]
    return jax.image.resize(m.astype(jnp.float32), (H, W), "bilinear")


for fb in (1, 2, 4):
    fn = jax.jit(lambda p, im: jax.vmap(lambda i: frame(p, i))(im))
    timeit(f"full frame program, FB={fb}", fn, params, imgs[:fb], div=fb)
