"""Average pooling, matching the reference encoder's AvgPool2d(2) blocks
(reference: scripts/models/layers.py:60-63, ceil_mode=False,
count_include_pad=True — i.e. plain non-overlapping 2x2 mean)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool over NHWC. H and W must be even (the model
    only ever sees /32-divisible inputs, enforced by the data layer's EvalPad
    / RandomCrop, as in the reference)."""
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        raise ValueError(f"avg_pool_2x2 needs even H, W; got {H}x{W}")
    # A reshape-mean compiles to a single fused reduction on TPU and avoids
    # reduce_window's generality.
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.mean(axis=(2, 4))


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool over NHWC (used by the VGG16 perceptual-loss
    feature extractor; reference loss: scripts/models/losses.py:23-41)."""
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        raise ValueError(f"max_pool_2x2 needs even H, W; got {H}x{W}")
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.max(axis=(2, 4))
