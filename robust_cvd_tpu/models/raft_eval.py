"""RAFT optical-flow evaluation harness (EPE / px-accuracy / KITTI Fl-all).

The reference vendors RAFT's upstream evaluation code
(reference raft/evaluate.py:80-160 validate_chairs/validate_sintel/
validate_kitti) — the only code in the repo that produces reference
numbers. This is the TPU-native equivalent:

  - metrics are computed on device in one batched program per resolution
    (the upstream code runs one image pair at a time through .cuda()),
  - `InputPadder` becomes pad-to-multiple-of-8 handled inside the jitted
    evaluator (static per-shape),
  - dataset loaders read the standard Sintel / KITTI / FlyingChairs
    directory layouts when present, and are cleanly skipped otherwise
    (no datasets ship in this environment).
"""

from __future__ import annotations

import os
from os.path import join as pjoin
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def flow_metrics(
    flow_pred: jnp.ndarray,
    flow_gt: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Batched flow metrics.

    flow_pred/flow_gt: (B, H, W, 2); valid: (B, H, W) optional 0/1.
    Returns scalars: epe, 1px, 3px, 5px, fl_all (KITTI outlier rate:
    epe > 3 px AND epe > 5% of GT magnitude, reference
    raft/evaluate.py:139-160).
    """
    epe = jnp.sqrt(jnp.sum((flow_pred - flow_gt) ** 2, axis=-1))
    mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1))
    if valid is None:
        valid = jnp.ones_like(epe)
    else:
        valid = valid.astype(epe.dtype)
    # PER-IMAGE valid means (B,) — the harness aggregates them two ways to
    # reproduce both upstream protocols: epe/Npx as the mean over images of
    # per-image means (validate_kitti epe_list.append(epe[val].mean())),
    # fl_all at the PIXEL level over all valid pixels (out_list
    # concatenation). An all-invalid image counts as 0 here where upstream
    # would propagate NaN.
    n = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1.0)

    def vmean(x):
        return jnp.sum(x * valid, axis=(1, 2)) / n

    out = {
        "epe": vmean(epe),
        "1px": vmean((epe < 1.0).astype(epe.dtype)),
        "3px": vmean((epe < 3.0).astype(epe.dtype)),
        "5px": vmean((epe < 5.0).astype(epe.dtype)),
    }
    outlier = (epe > 3.0) & (epe / jnp.maximum(mag, 1e-9) > 0.05)
    out["fl_all"] = vmean(outlier.astype(epe.dtype))
    out["n"] = jnp.sum(valid, axis=(1, 2))
    return out


def pad_to_multiple(x: jnp.ndarray, mult: int = 8) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Pad (B, H, W, C) spatially to a multiple of `mult` (the upstream
    InputPadder, raft/utils/utils.py). Returns (padded, (ph, pw))."""
    h, w = x.shape[1:3]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph == 0 and pw == 0:
        return x, (0, 0)
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge"), (ph, pw)


def make_flow_fn(raft, variables, iters: int = 24) -> Callable:
    """Jitted (im1, im2) -> flow evaluator with internal pad/unpad.

    im1/im2: (B, H, W, 3) float in [0, 255] (upstream convention)."""

    @jax.jit
    def fn(im1, im2):
        h, w = im1.shape[1:3]
        p1, _ = pad_to_multiple(im1)
        p2, _ = pad_to_multiple(im2)
        flow = raft.apply(variables, p1, p2)
        return flow[:, :h, :w]

    return fn


def evaluate_pairs(
    flow_fn: Callable,
    pairs: Iterable[Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray]]],
    batch: int = 4,
) -> Dict[str, float]:
    """Evaluate a stream of (im1, im2, flow_gt, valid|None) samples.

    Images float [0, 255] HWC; accumulates metrics over batches at a fixed
    resolution (one compile per distinct shape).

    Aggregation matches the upstream protocols exactly
    (reference raft/evaluate.py): epe/1px/3px/5px are the mean over IMAGES
    of per-image valid means (validate_kitti averages epe_list of
    per-image means; for Sintel every image has the same pixel count so
    this equals the pixel-level mean of the concatenated epe_all), while
    fl_all is PIXEL-level over all valid pixels (out_list concatenation
    — images with more valid pixels weigh more)."""
    metrics_fn = jax.jit(flow_metrics)
    img_sums: Dict[str, float] = {}
    images = 0
    fl_px_sum = 0.0
    px_count = 0.0
    buf: List = []

    def flush():
        nonlocal images, fl_px_sum, px_count
        if not buf:
            return
        im1 = jnp.asarray(np.stack([b[0] for b in buf]), jnp.float32)
        im2 = jnp.asarray(np.stack([b[1] for b in buf]), jnp.float32)
        gt = jnp.asarray(np.stack([b[2] for b in buf]), jnp.float32)
        valid = None
        if buf[0][3] is not None:
            valid = jnp.asarray(np.stack([b[3] for b in buf]), jnp.float32)
        pred = flow_fn(im1, im2)
        m = metrics_fn(pred, gt, valid)
        n = np.asarray(m.pop("n"), np.float64)
        fl = np.asarray(m.pop("fl_all"), np.float64)
        fl_px_sum += float(np.sum(fl * n))
        px_count += float(np.sum(n))
        for k, v in m.items():
            img_sums[k] = img_sums.get(k, 0.0) + float(
                np.sum(np.asarray(v, np.float64))
            )
        images += len(buf)
        buf.clear()

    for sample in pairs:
        buf.append(sample)
        if len(buf) == batch:
            flush()
    flush()
    if images == 0:
        return {}
    out = {k: v / images for k, v in img_sums.items()}
    out["fl_all"] = fl_px_sum / max(px_count, 1.0)
    return out


# -- dataset readers (standard layouts; skipped when absent) -----------------


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo format: magic f32 202021.25, w:i32, h:i32, data."""
    with open(path, "rb") as f:
        magic = np.frombuffer(f.read(4), np.float32)[0]
        if abs(magic - 202021.25) > 1e-3:
            raise ValueError(f"{path}: bad .flo magic {magic}")
        w = int(np.frombuffer(f.read(4), np.int32)[0])
        h = int(np.frombuffer(f.read(4), np.int32)[0])
        data = np.frombuffer(f.read(h * w * 2 * 4), np.float32)
    return data.reshape(h, w, 2)


def decode_kitti_flow(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """KITTI 16-bit flow encoding: (u, v) = (I - 2^15) / 64, valid = ch 3."""
    img = np.asarray(img, np.float64)
    flow = (img[..., :2] - 2 ** 15) / 64.0
    valid = img[..., 2] > 0
    return flow.astype(np.float32), valid.astype(np.float32)


def read_kitti_flow_png(path: str) -> Tuple[np.ndarray, np.ndarray]:
    import imageio.v2 as imageio

    return decode_kitti_flow(imageio.imread(path))


def _load_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path), np.float32)


def sintel_samples(root: str, dstype: str = "clean"):
    """MPI-Sintel training split: root/training/{clean,final}/<scene>/
    frame_%04d.png + root/training/flow/<scene>/frame_%04d.flo."""
    img_root = pjoin(root, "training", dstype)
    flow_root = pjoin(root, "training", "flow")
    for scene in sorted(os.listdir(img_root)):
        frames = sorted(os.listdir(pjoin(img_root, scene)))
        for a, b in zip(frames[:-1], frames[1:]):
            flo = pjoin(flow_root, scene, os.path.splitext(a)[0] + ".flo")
            if not os.path.exists(flo):
                continue
            yield (
                _load_image(pjoin(img_root, scene, a)),
                _load_image(pjoin(img_root, scene, b)),
                read_flo(flo),
                None,
            )


def kitti_samples(root: str):
    """KITTI-2015 training split: root/training/image_2/%06d_1{0,1}.png +
    root/training/flow_occ/%06d_10.png."""
    img_root = pjoin(root, "training", "image_2")
    flow_root = pjoin(root, "training", "flow_occ")
    for name in sorted(os.listdir(flow_root)):
        base = name[:-7]  # strip "_10.png"
        flow, valid = read_kitti_flow_png(pjoin(flow_root, name))
        yield (
            _load_image(pjoin(img_root, f"{base}_10.png")),
            _load_image(pjoin(img_root, f"{base}_11.png")),
            flow,
            valid,
        )


def validate(
    raft, variables, dataset_root: str, dataset: str = "sintel",
    iters: int = 24, batch: int = 2,
) -> Dict[str, float]:
    """Run an upstream-style validation if the dataset directory exists
    (reference raft/evaluate.py validate_*); returns {} when absent."""
    if not os.path.isdir(dataset_root):
        return {}
    flow_fn = make_flow_fn(raft, variables, iters)
    if dataset == "sintel":
        results = {}
        for dstype in ("clean", "final"):
            m = evaluate_pairs(flow_fn, sintel_samples(dataset_root, dstype), batch)
            if m:
                results[dstype] = m
                print(
                    f"Validation ({dstype}) EPE: {m['epe']:.4f}, "
                    f"1px: {m['1px']:.4f}, 3px: {m['3px']:.4f}, 5px: {m['5px']:.4f}"
                )
        return results
    if dataset == "kitti":
        m = evaluate_pairs(flow_fn, kitti_samples(dataset_root), batch)
        if m:
            print(f"Validation KITTI: EPE {m['epe']:.4f}, Fl-all {m['fl_all']:.4f}")
        return m
    raise ValueError(f"unknown dataset {dataset!r}")
