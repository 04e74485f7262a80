"""Backward warping (bilinear gather) — the #1 hot op of Super SloMo.

Reference semantics (scripts/models/layers.py:73-120): build a pixel grid,
add the flow, normalize to [-1, 1] with 2*x/(W-1)-1, and call
``nn.functional.grid_sample(x, vgrid, align_corners=True)`` with the default
``padding_mode='zeros'``. With align_corners=True that normalization round
trips exactly, so the effective sample location for output pixel (y, x) is
``(y + v, x + u)`` in *pixel* coordinates, bilinearly interpolated, with
out-of-bounds taps contributing zero.

This module implements those semantics directly as an NHWC gather — no
normalize/denormalize dance — in a form XLA lowers to efficient dynamic
gathers, and is fully differentiable (the VJP is the corresponding
scatter-add, which JAX derives automatically from the one-hot-free take
formulation below).

A fused Pallas kernel with a custom VJP lives in ops/warp_pallas.py; this
pure-JAX version is the reference implementation and the fallback on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_hw(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather img[iy, ix] where img is (H, W, C) and iy/ix are (H, W) int32.

    Flattens H*W so XLA emits a single 1-D gather (fast on TPU) instead of a
    2-D gather.
    """
    H, W, C = img.shape
    flat = img.reshape(H * W, C)
    idx = iy * W + ix
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(iy.shape + (C,))


def _warp_single(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp one image. img: (H, W, C); flow: (H, W, 2) with (u, v) = (dx, dy).

    Position/weight math is always f32 — sample coordinates up to W=1280
    lose whole pixels in bf16 — while gathered values keep the image dtype
    (bf16 images halve the gather bandwidth)."""
    H, W, _ = img.shape
    dtype = jnp.float32
    flow = flow.astype(dtype)

    # Sample positions in pixel coordinates: (x + u, y + v).
    xs = jnp.arange(W, dtype=dtype)[None, :] + flow[..., 0]
    ys = jnp.arange(H, dtype=dtype)[:, None] + flow[..., 1]

    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    wx = xs - x0f
    wy = ys - y0f

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    # zeros padding: out-of-bounds corners contribute nothing.
    def inb(iy, ix):
        return ((iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)).astype(dtype)

    m00 = inb(y0, x0)
    m01 = inb(y0, x1)
    m10 = inb(y1, x0)
    m11 = inb(y1, x1)

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    v00 = _gather_hw(img, y0c, x0c)
    v01 = _gather_hw(img, y0c, x1c)
    v10 = _gather_hw(img, y1c, x0c)
    v11 = _gather_hw(img, y1c, x1c)

    vd = img.dtype
    w00 = ((1 - wy) * (1 - wx) * m00)[..., None].astype(vd)
    w01 = ((1 - wy) * wx * m01)[..., None].astype(vd)
    w10 = (wy * (1 - wx) * m10)[..., None].astype(vd)
    w11 = (wy * wx * m11)[..., None].astype(vd)

    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def backward_warp(img: jnp.ndarray, flow: jnp.ndarray, use_pallas: bool = False,
                  in_band=None) -> jnp.ndarray:
    """Backward-warp a batch of images by a flow field.

    :param img: (B, H, W, C) source images.
    :param flow: (B, H, W, 2) flow; channel 0 = u (x displacement),
        channel 1 = v (y displacement) — matching the reference's channel
        order where flow[:, 0] is u and flow[:, 1] is v (layers.py:100-116).
    :returns: (B, H, W, C) warped images, output[y, x] = bilinear sample of
        img at (y + v, x + u), zero outside the frame.
    """
    if img.ndim != 4 or flow.ndim != 4 or flow.shape[-1] != 2:
        raise ValueError(f"bad shapes img={img.shape} flow={flow.shape}")
    if use_pallas:
        from superslomo_tpu.ops.warp_pallas import backward_warp_pallas

        return backward_warp_pallas(img, flow, in_band=in_band)
    return jax.vmap(_warp_single)(img, flow)
