"""Shared NN building blocks (Flax linen, NHWC, TPU-friendly)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) matching torch's two conventions.

    align_corners=False == jax.image.resize's half-pixel-center convention;
    align_corners=True samples at i * (in - 1) / (out - 1).
    """
    H, W = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (oh, ow) == (H, W):
        return x
    if not align_corners:
        return jax.image.resize(
            x, x.shape[:-3] + (oh, ow, x.shape[-1]), method="bilinear"
        )
    ys = jnp.arange(oh, dtype=jnp.float32) * ((H - 1) / (oh - 1) if oh > 1 else 0.0)
    xs = jnp.arange(ow, dtype=jnp.float32) * ((W - 1) / (ow - 1) if ow > 1 else 0.0)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 2).astype(jnp.int32) if H > 1 else jnp.zeros_like(ys, jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 2).astype(jnp.int32) if W > 1 else jnp.zeros_like(xs, jnp.int32)
    ry = (ys - y0) if H > 1 else jnp.zeros_like(ys)
    rx = (xs - x0) if W > 1 else jnp.zeros_like(xs)

    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)

    top = x.take(y0, axis=-3)
    bot = x.take(y1, axis=-3)
    ry_ = ry.reshape((-1, 1, 1))
    rows = top * (1 - ry_) + bot * ry_
    left = rows.take(x0, axis=-2)
    right = rows.take(x1, axis=-2)
    rx_ = rx.reshape((-1, 1))
    return left * (1 - rx_) + right * rx_


def upsample2x(x: jnp.ndarray, align_corners: bool) -> jnp.ndarray:
    H, W = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (2 * H, 2 * W), align_corners)
