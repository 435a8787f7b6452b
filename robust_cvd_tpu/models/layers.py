"""Shared NN building blocks (Flax linen, NHWC, TPU-friendly)."""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Static (out, in) two-tap align_corners=True interpolation matrix:
    row p holds weights (1-r, r) at columns (i0, i0+1) for the sample
    position p * (in-1)/(out-1). Contracting with it IS the bilinear
    resize along that axis, and its transpose is the exact VJP — so both
    directions run as MXU matmuls instead of gather forward / scatter-add
    backward (the scatter is the slow path on TPU; same redesign as the
    loss-sampling hat-factor contraction, PERF.md round 3/4)."""
    if in_size == 1 or out_size == 1:
        A = np.zeros((out_size, in_size), np.float32)
        A[:, 0] = 1.0
        return A
    pos = np.arange(out_size, dtype=np.float64) * ((in_size - 1) / (out_size - 1))
    i0 = np.clip(np.floor(pos), 0, in_size - 2).astype(np.int64)
    r = (pos - i0).astype(np.float32)
    A = np.zeros((out_size, in_size), np.float32)
    A[np.arange(out_size), i0] = 1.0 - r
    A[np.arange(out_size), i0 + 1] = r
    return A


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) matching torch's two conventions.

    align_corners=False == jax.image.resize's half-pixel-center convention
    (itself matmul-based); align_corners=True samples at i * (in-1)/(out-1)
    and is lowered here as two static hat-matrix contractions.
    """
    H, W = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (oh, ow) == (H, W):
        return x
    if not align_corners:
        return jax.image.resize(
            x, x.shape[:-3] + (oh, ow, x.shape[-1]), method="bilinear"
        )
    Ah = jnp.asarray(_interp_matrix(oh, H))
    Aw = jnp.asarray(_interp_matrix(ow, W))
    # f32 weights promote bf16 activations exactly like the previous
    # gather+lerp formulation did (bf16 * f32 -> f32 output).
    y = jnp.einsum("ph,...hwc->...pwc", Ah, x)
    return jnp.einsum("qw,...pwc->...pqc", Aw, y)


def upsample2x(x: jnp.ndarray, align_corners: bool) -> jnp.ndarray:
    H, W = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (2 * H, 2 * W), align_corners)
