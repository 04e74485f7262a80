"""Bilinear 2x upsampling matching torch's F.upsample(mode="bilinear") with
align_corners=False (the torch default the reference relies on at
scripts/models/flow_computation.py:92-137 and flow_interpolation.py:92-141).

Half-pixel-center convention: output pixel i samples source coordinate
(i + 0.5) / 2 - 0.5, clamped at the borders. For a fixed 2x factor this is a
static 2-tap filter with weights (0.25, 0.75), so we express it as pad +
fixed linear combination — cheap VPU work XLA fuses with the surrounding
convs, rather than a general gather-based resize.
"""

from __future__ import annotations

import jax.numpy as jnp


def _up2_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Upsample one spatial axis by 2 with half-pixel bilinear weights.

    out[2k]   = 0.25 * src[k-1] + 0.75 * src[k]   (src[-1] clamped to src[0])
    out[2k+1] = 0.75 * src[k]   + 0.25 * src[k+1] (src[n] clamped to src[n-1])
    """
    n = x.shape[axis]

    def take(lo, hi):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(lo, hi)
        return x[tuple(idx)]

    prev = jnp.concatenate([take(0, 1), take(0, n - 1)], axis=axis)
    nxt = jnp.concatenate([take(1, n), take(n - 1, n)], axis=axis)

    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt

    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


def upsample_2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample of an NHWC tensor (align_corners=False)."""
    if x.ndim != 4:
        raise ValueError(f"expected NHWC, got shape {x.shape}")
    x = _up2_axis(x, 1)
    x = _up2_axis(x, 2)
    return x
