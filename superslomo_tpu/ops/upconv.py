"""Composite "upsample-2x-then-3x3-conv" as ONE dense conv on the half grid.

Every Super SloMo decoder block starts with bilinear 2x upsample followed by
a 3x3 conv (reference: scripts/models/flow_computation.py:92-137 F.upsample
+ conv). Done literally on TPU this is the single worst part of the whole
model: the upsample materializes a huge intermediate (measured 12-21 ms per
decoder block at 720p/B=7 — pure HBM traffic), and the conv that follows
runs at 25-70 TF/s because its output-channel count underfills the MXU's
128 lanes (conv10a: 64 lanes; conv11a after space-to-depth: 4x-inflated
MACs at 25% kernel density).

Both ops are linear, so they commute into a single conv evaluated on the
HALF-resolution grid: for output phase a ∈ {0,1} (full-res row 2m+a),

    y[2m+a] = Σ_k w[k] · up[2m+a+k],   up[2κ+a'] = Σ_δ β_{a'}[δ] · z[κ+δ]

with the half-pixel 2-tap blend β_0 = (0.25·prev, 0.75·cur), β_1 =
(0.75·cur, 0.25·next) (ops/resize.py). Folding gives a 3-tap composite per
phase, C[a] = A[a]^T w (rows) ⊗ A[b] (cols) — a DENSE (3, 3, Cin, 4·Cout)
kernel producing all four phases as channel blocks in space-to-depth layout
(r, s, c). The MAC count equals the original full-res conv exactly (no
polyphase zero-inflation), the output channel count is 4x (full MXU lanes),
and no full-res intermediate ever exists. Measured: decoder block 11 drops
from 49 ms (s2d-upsample 20.8 + 25%-dense conv 28.6) to ~7 ms.

Border semantics are reproduced exactly:
* the upsample's edge CLAMP → edge-replicate z by 1 and convolve VALID;
* the conv's zero padding at the full-res border clips one tap on the
  outermost full-res row/col — those four lines are recomputed from thin
  2-row/2-col strips and overwritten (each strip pass is exact, including
  corners, so application order is irrelevant).

Parameters keep the original (3, 3, Cin, Cout) HWIO shapes: checkpoints and
the PyTorch converter are untouched; the fold happens inside the trace and
is differentiable.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# A[a][k, r]: weight of composite tap r (z offset r-1) for conv tap k
# (offset k-1) at output row-phase a. Derivation in the module docstring.
_A0 = np.array([[0.75, 0.25, 0.0], [0.25, 0.75, 0.0], [0.0, 0.75, 0.25]])
_A1 = np.array([[0.25, 0.75, 0.0], [0.0, 0.75, 0.25], [0.0, 0.25, 0.75]])


def fold_upsample_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) conv kernel → (3, 3, Cin, 4·Cout) composite kernel
    whose output channel blocks are the (a, b) phases in s2d (r, s, c) order."""
    mats = [jnp.asarray(_A0, w.dtype), jnp.asarray(_A1, w.dtype)]
    phases = [
        jnp.einsum("kr,ls,klio->rsio", mats[a], mats[b], w)
        for a in (0, 1)
        for b in (0, 1)
    ]
    return jnp.concatenate(phases, axis=-1)


def _conv(x, w, padding):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _up2_1d(z0, z1, first: bool):
    """The two boundary values of a 2-tap upsample along one axis:
    first  → up[0] = clamp blend = z0 itself, up[1] = 0.75 z0 + 0.25 z1;
    last   → up[-2] = 0.25 z0 + 0.75 z1, up[-1] = z1."""
    if first:
        return z0, 0.75 * z0 + 0.25 * z1
    return 0.25 * z0 + 0.75 * z1, z1


def _col_upsample(z: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample along axis 2 (W) with edge clamp; rows kept."""
    prev = jnp.concatenate([z[:, :, :1], z[:, :, :-1]], axis=2)
    nxt = jnp.concatenate([z[:, :, 1:], z[:, :, -1:]], axis=2)
    even = 0.25 * prev + 0.75 * z
    odd = 0.75 * z + 0.25 * nxt
    B, H, W, C = z.shape
    return jnp.stack([even, odd], axis=3).reshape(B, H, 2 * W, C)


def _row_upsample(z: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample along axis 1 (H) with edge clamp; cols kept."""
    prev = jnp.concatenate([z[:, :1], z[:, :-1]], axis=1)
    nxt = jnp.concatenate([z[:, 1:], z[:, -1:]], axis=1)
    even = 0.25 * prev + 0.75 * z
    odd = 0.75 * z + 0.25 * nxt
    B, H, W, C = z.shape
    return jnp.stack([even, odd], axis=2).reshape(B, 2 * H, W, C)


def upsample_conv(z: jnp.ndarray, w: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """conv3x3_same(upsample_2x_bilinear(z), w) in s2d form, without ever
    materializing the upsample.

    :param z: (B, Hh, Wh, Cin) half-resolution input.
    :param w: (3, 3, Cin, Cout) the full-resolution conv's kernel.
    :param dtype: compute dtype for the convs; the kernel fold happens in
        w's own (param) dtype first for precision.
    :returns: (B, Hh, Wh, 4·Cout) — space_to_depth of the (B, 2Hh, 2Wh,
        Cout) result, bias/activation NOT applied.
    """
    B, Hh, Wh, Ci = z.shape
    Co = w.shape[-1]
    wc = fold_upsample_kernel(w)
    if dtype is not None:
        z, w, wc = z.astype(dtype), w.astype(dtype), wc.astype(dtype)

    # interior (exact except the outermost full-res row/col, fixed below):
    # edge-replicate by 1 reproduces the upsample's clamp; VALID conv.
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = _conv(zp, wc, "VALID")  # (B, Hh, Wh, 4Co)

    # --- border corrections: the full-res conv zero-pads, so the first and
    # last full-res rows/cols lose one tap — recompute them from strips.
    r1 = min(1, Hh - 1)
    c1 = min(1, Wh - 1)

    # top/bottom full-res rows: col-upsample two boundary z rows, build the
    # two adjacent full-res rows, convolve with the two valid kernel rows.
    zc_top = _col_upsample(z[:, 0:1]), _col_upsample(z[:, r1 : r1 + 1])
    up0, up1 = _up2_1d(zc_top[0], zc_top[1], first=True)
    strip = jnp.concatenate([up0, up1], axis=1)  # (B, 2, 2Wh, Ci)
    row_top = _conv(strip, w[1:3], ((0, 0), (1, 1)))[:, 0]  # (B, 2Wh, Co)

    zc_bot = _col_upsample(z[:, Hh - 1 - r1 : Hh - r1]), _col_upsample(z[:, Hh - 1 :])
    upm2, upm1 = _up2_1d(zc_bot[0], zc_bot[1], first=False)
    strip = jnp.concatenate([upm2, upm1], axis=1)
    row_bot = _conv(strip, w[0:2], ((0, 0), (1, 1)))[:, 0]

    # left/right full-res cols: row-upsample two boundary z cols.
    zr_l = _row_upsample(z[:, :, 0:1]), _row_upsample(z[:, :, c1 : c1 + 1])
    upl0, upl1 = _up2_1d(zr_l[0], zr_l[1], first=True)
    strip = jnp.concatenate([upl0, upl1], axis=2)  # (B, 2Hh, 2, Ci)
    col_l = _conv(strip, w[:, 1:3], ((1, 1), (0, 0)))[:, :, 0]  # (B, 2Hh, Co)

    zr_r = _row_upsample(z[:, :, Wh - 1 - c1 : Wh - c1]), _row_upsample(z[:, :, Wh - 1 :])
    upr0, upr1 = _up2_1d(zr_r[0], zr_r[1], first=False)
    strip = jnp.concatenate([upr0, upr1], axis=2)
    col_r = _conv(strip, w[:, 0:2], ((1, 1), (0, 0)))[:, :, 0]

    # scatter the exact border lines into the (a, b) phase blocks
    y5 = y.reshape(B, Hh, Wh, 2, 2, Co)
    y5 = y5.at[:, 0, :, 0].set(row_top.reshape(B, Wh, 2, Co))
    y5 = y5.at[:, Hh - 1, :, 1].set(row_bot.reshape(B, Wh, 2, Co))
    y5 = y5.at[:, :, 0, :, 0].set(col_l.reshape(B, Hh, 2, Co))
    y5 = y5.at[:, :, Wh - 1, :, 1].set(col_r.reshape(B, Hh, 2, Co))
    return y5.reshape(B, Hh, Wh, 4 * Co)


class UpConvLReLU(nn.Module):
    """upsample_2x_bilinear → 3x3 same conv (+bias) → LeakyReLU(0.1), as the
    composite half-grid conv; output in s2d form. Param names/shapes match
    ConvLReLU ('conv/kernel' (3,3,Cin,Cout), 'conv/bias') so checkpoints
    port unchanged."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cin = z.shape[-1]
        # params live under a 'conv' child scope mirroring nn.Conv's names
        w, b = _UpConvParams(self.features, name="conv")(cin)
        y = upsample_conv(z, w, dtype=self.dtype)
        y = y + jnp.tile(b.astype(self.dtype), 4)
        return nn.leaky_relu(y, negative_slope=0.1)


class _UpConvParams(nn.Module):
    """Holds the (3,3,Cin,Cout) kernel + bias under the same names nn.Conv
    uses, so checkpoint paths ('.../conv/kernel') stay identical."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return w, b
