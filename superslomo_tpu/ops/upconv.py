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

Border semantics (the upsample's edge CLAMP and the conv's zero padding at
the full-res border) are reproduced exactly: the interior runs as a plain
zero-padded SAME conv and the outermost half-grid ring — the only place a
composite tap crosses the boundary — is recomputed from thin 3-row/3-col
upsample strips and overwritten (each strip pass is exact including
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


def _border_rows(z, w, top: bool):
    """Exact first/last TWO full-res output rows (all phases of the boundary
    half-grid row) from a 3-row upsample strip: the zero-padded SAME conv
    reproduces the full-res conv's boundary-tap clipping, and the strip is
    built with the upsample's edge clamp. → (B, 2, 2Wh, Co)."""
    B, Hh, Wh, Ci = z.shape
    r1 = min(1, Hh - 1)
    if top:
        zc0 = _col_upsample(z[:, 0:1])
        zc1 = _col_upsample(z[:, r1 : r1 + 1])
        rows = [zc0, 0.75 * zc0 + 0.25 * zc1, 0.25 * zc0 + 0.75 * zc1]
    else:
        zc0 = _col_upsample(z[:, Hh - 1 - r1 : Hh - r1])
        zc1 = _col_upsample(z[:, Hh - 1 :])
        rows = [0.75 * zc0 + 0.25 * zc1, 0.25 * zc0 + 0.75 * zc1, zc1]
    if Hh == 1:  # the image is 2 full-res rows tall: both taps clip
        strip = jnp.concatenate(rows[:2] if top else rows[1:], axis=1)
        pad_rows = (1, 1)
    else:
        strip = jnp.concatenate(rows, axis=1)
        pad_rows = (1, 0) if top else (0, 1)
    return _conv(strip, w, (pad_rows, (1, 1)))


def _border_cols(z, w, left: bool):
    """Column analogue of _border_rows → (B, 2Hh, 2, Co) (exact for every
    row incl. corners: zero row-padding matches the full-res conv)."""
    B, Hh, Wh, Ci = z.shape
    c1 = min(1, Wh - 1)
    if left:
        zr0 = _row_upsample(z[:, :, 0:1])
        zr1 = _row_upsample(z[:, :, c1 : c1 + 1])
        cols = [zr0, 0.75 * zr0 + 0.25 * zr1, 0.25 * zr0 + 0.75 * zr1]
    else:
        zr0 = _row_upsample(z[:, :, Wh - 1 - c1 : Wh - c1])
        zr1 = _row_upsample(z[:, :, Wh - 1 :])
        cols = [0.75 * zr0 + 0.25 * zr1, 0.25 * zr0 + 0.75 * zr1, zr1]
    if Wh == 1:
        strip = jnp.concatenate(cols[:2] if left else cols[1:], axis=2)
        pad_cols = (1, 1)
    else:
        strip = jnp.concatenate(cols, axis=2)
        pad_cols = (1, 0) if left else (0, 1)
    return _conv(strip, w, ((1, 1), pad_cols))


def upsample_conv(
    z: jnp.ndarray, w: jnp.ndarray, dtype=None, wc: jnp.ndarray | None = None
) -> jnp.ndarray:
    """conv3x3_same(upsample_2x_bilinear(z), w) in s2d form, without ever
    materializing the upsample.

    The interior runs as a plain zero-padded SAME conv — NO materialized
    pad (an edge-replicated pad of the half grid costs a full extra pass
    over the tensor in HBM; measured 4.2 ms for decoder block 11 alone at
    720p). Zero padding is wrong wherever a composite tap crosses the
    boundary — exactly the outermost half-grid ring — so the first/last
    TWO full-res rows and columns are recomputed from thin strips that
    honor both border semantics (the upsample's edge clamp, the conv's
    zero padding) and overwritten.

    :param z: (B, Hh, Wh, Cin) half-resolution input.
    :param w: (3, 3, Cin, Cout) the full-resolution conv's kernel.
    :param dtype: compute dtype for the convs; the kernel fold happens in
        w's own (param) dtype first for precision.
    :param wc: optional pre-folded (3, 3, Cin, 4·Cout) composite kernel
        (ops/prepare.py) — skips tracing fold_upsample_kernel into the hot
        program. fold(cast(w)) == cast(fold(w)) is NOT exact in bf16, so the
        prepared kernel is stored in param dtype and cast here, exactly like
        the in-trace fold.
    :returns: (B, Hh, Wh, 4·Cout) — space_to_depth of the (B, 2Hh, 2Wh,
        Cout) result, bias/activation NOT applied.
    """
    B, Hh, Wh, Ci = z.shape
    Co = w.shape[-1]
    if wc is None:
        wc = fold_upsample_kernel(w)
    if dtype is not None:
        z, w, wc = z.astype(dtype), w.astype(dtype), wc.astype(dtype)

    y = _conv(z, wc, "SAME")  # exact except the outermost half-grid ring
    y5 = y.reshape(B, Hh, Wh, 2, 2, Co)

    top = _border_rows(z, w, True)  # (B, 2, 2Wh, Co) = full-res rows 0..1
    bot = _border_rows(z, w, False)
    as_row = lambda r: r.reshape(B, 2, Wh, 2, Co).transpose(0, 2, 1, 3, 4)
    top, bot = as_row(top), as_row(bot)  # (B, Wh, 2, 2, Co)
    left = _border_cols(z, w, True)  # (B, 2Hh, 2, Co) = full-res cols 0..1
    right = _border_cols(z, w, False)
    as_col = lambda c: c.reshape(B, Hh, 2, 2, Co)
    left, right = as_col(left), as_col(right)  # (B, Hh, 2, 2, Co)

    if Hh == 1 or Wh == 1:
        # degenerate 2-px-tall/wide images (tests only): scatter semantics,
        # later writes win at overlaps
        y5 = y5.at[:, 0].set(top).at[:, Hh - 1].set(bot)
        y5 = y5.at[:, :, 0].set(left).at[:, :, Wh - 1].set(right)
        return y5.reshape(B, Hh, Wh, 4 * Co)

    # Apply the border ring ADDITIVELY as zero-padded corrections instead of
    # four dynamic-update-slices: DUS of thin rows/columns ran at ~3 GB/s on
    # TPU (profiled ~5.5 ms/step at 720p), while the pad+add lowers into the
    # same loop fusion as the caller's bias+LeakyReLU epilogue. Corner
    # algebra matches the overwrite order (rows first, columns win):
    #   corr_col = col_target − (y5 + row corrections) at that column.
    # The interior's boundary rows/columns are RECOMPUTED from 2-row/2-col
    # strips of z rather than sliced out of y5: a strided column slice of
    # the big (B, Hh, Wh, 2, 2, Co) tensor lowered into a ~77 GB/s gather
    # fusion (profiled 6.3 ms/step at 720p, ~12 ms at 1080p) while the
    # narrow convs are sub-0.1 ms.
    def interior_rows(lo: bool):
        # SAME conv of a 2-row strip: output row 0 (lo) sees [zero-pad,
        # strip0, strip1] == the true boundary taps; row 1 (hi) sees
        # [strip0, strip1, zero-pad] likewise. The other row is invalid
        # (its outer tap is a pad standing in for a real z row) and unused.
        zs = z[:, 0:2] if lo else z[:, Hh - 2 : Hh]
        y2 = _conv(zs, wc, "SAME")  # (B, 2, Wh, 4Co)
        y2 = y2[:, 0:1] if lo else y2[:, 1:2]
        return y2.reshape(B, Wh, 2, 2, Co)

    def interior_cols(lo: bool):
        zs = z[:, :, 0:2] if lo else z[:, :, Wh - 2 : Wh]
        y2 = _conv(zs, wc, "SAME")  # (B, Hh, 2, 4Co)
        y2 = y2[:, :, 0:1] if lo else y2[:, :, 1:2]
        return y2.reshape(B, Hh, 2, 2, Co)

    corr_top = (top - interior_rows(True))[:, None]  # (B, 1, Wh, 2, 2, Co)
    corr_bot = (bot - interior_rows(False))[:, None]
    col0 = (
        interior_cols(True).at[:, 0].set(top[:, 0]).at[:, Hh - 1].set(bot[:, 0])
    )
    colL = (
        interior_cols(False)
        .at[:, 0].set(top[:, Wh - 1])
        .at[:, Hh - 1].set(bot[:, Wh - 1])
    )
    corr_left = (left - col0)[:, :, None]  # (B, Hh, 1, 2, 2, Co)
    corr_right = (right - colL)[:, :, None]

    z4 = ((0, 0),) * 4
    y5 = y5 + jnp.pad(corr_top, ((0, 0), (0, Hh - 1)) + z4)
    y5 = y5 + jnp.pad(corr_bot, ((0, 0), (Hh - 1, 0)) + z4)
    y5 = y5 + jnp.pad(corr_left, ((0, 0), (0, 0), (0, Wh - 1)) + z4[:3])
    y5 = y5 + jnp.pad(corr_right, ((0, 0), (0, 0), (Wh - 1, 0)) + z4[:3])
    return y5.reshape(B, Hh, Wh, 4 * Co)


def upsample_conv_pair(z1, z2, w, dtype=None, wc=None):
    """``upsample_conv(concat([z1, z2], -1), w)`` without materializing the
    concatenation (LAYOUT_V2): every decoder block's input is a channel
    concat of the upsampled trunk and a skip tensor, and profiling showed
    XLA lowering that concat as a multi-pass relayout copy chain between
    the two producers' layouts and the conv's preferred layout (~1.4-2.8 ms
    per block at 720p). Upsample+conv is linear in input channels, so the
    interior conv splits into the operands' channel blocks (outputs sum —
    the add fuses into the second conv's epilogue) and every border /
    interior-recompute strip is built from thin 2-row/2-col slices of the
    operands concatenated at negligible cost. Same algebra as
    ``upsample_conv`` on the concatenated tensor; in bf16 the split sum
    rounds once more (the conv output was already bf16-quantized)."""
    B, Hh, Wh, c1 = z1.shape
    Co = w.shape[-1]
    if wc is None:
        wc = fold_upsample_kernel(w)
    if dtype is not None:
        z1, z2 = z1.astype(dtype), z2.astype(dtype)
        w, wc = w.astype(dtype), wc.astype(dtype)
    if Hh == 1 or Wh == 1:  # degenerate 2-px shapes (tests only)
        return upsample_conv(jnp.concatenate([z1, z2], axis=-1), w, None, wc)

    y = _conv(z1, wc[:, :, :c1], "SAME") + _conv(z2, wc[:, :, c1:], "SAME")
    y5 = y.reshape(B, Hh, Wh, 2, 2, Co)

    cat = lambda a, b: jnp.concatenate([a, b], axis=-1)
    zt = cat(z1[:, 0:2], z2[:, 0:2])  # rows {0, 1} of the virtual concat
    zb = cat(z1[:, Hh - 2 :], z2[:, Hh - 2 :])
    zl = cat(z1[:, :, 0:2], z2[:, :, 0:2])
    zr = cat(z1[:, :, Wh - 2 :], z2[:, :, Wh - 2 :])

    # _border_rows/_border_cols only read the two boundary rows/cols they
    # are given; on a 2-row slice their internal indices (0, r1=1) address
    # exactly the rows the full tensor would have contributed.
    top = _border_rows(zt, w, True)
    bot = _border_rows(zb, w, False)
    as_row = lambda r: r.reshape(B, 2, Wh, 2, Co).transpose(0, 2, 1, 3, 4)
    top, bot = as_row(top), as_row(bot)
    left = _border_cols(zl, w, True)
    right = _border_cols(zr, w, False)
    as_col = lambda c: c.reshape(B, Hh, 2, 2, Co)
    left, right = as_col(left), as_col(right)

    def interior_rows(lo: bool):
        y2 = _conv(zt if lo else zb, wc, "SAME")
        y2 = y2[:, 0:1] if lo else y2[:, 1:2]
        return y2.reshape(B, Wh, 2, 2, Co)

    def interior_cols(lo: bool):
        y2 = _conv(zl if lo else zr, wc, "SAME")
        y2 = y2[:, :, 0:1] if lo else y2[:, :, 1:2]
        return y2.reshape(B, Hh, 2, 2, Co)

    corr_top = (top - interior_rows(True))[:, None]
    corr_bot = (bot - interior_rows(False))[:, None]
    col0 = (
        interior_cols(True).at[:, 0].set(top[:, 0]).at[:, Hh - 1].set(bot[:, 0])
    )
    colL = (
        interior_cols(False)
        .at[:, 0].set(top[:, Wh - 1])
        .at[:, Hh - 1].set(bot[:, Wh - 1])
    )
    corr_left = (left - col0)[:, :, None]
    corr_right = (right - colL)[:, :, None]

    z4 = ((0, 0),) * 4
    y5 = y5 + jnp.pad(corr_top, ((0, 0), (0, Hh - 1)) + z4)
    y5 = y5 + jnp.pad(corr_bot, ((0, 0), (Hh - 1, 0)) + z4)
    y5 = y5 + jnp.pad(corr_left, ((0, 0), (0, 0), (0, Wh - 1)) + z4[:3])
    y5 = y5 + jnp.pad(corr_right, ((0, 0), (0, 0), (Wh - 1, 0)) + z4[:3])
    return y5.reshape(B, Hh, Wh, 4 * Co)


class UpConvLReLU(nn.Module):
    """upsample_2x_bilinear → 3x3 same conv (+bias) → LeakyReLU(0.1), as the
    composite half-grid conv; output in s2d form. Param names/shapes match
    ConvLReLU ('conv/kernel' (3,3,Cin,Cout), 'conv/bias') so checkpoints
    port unchanged.

    A ``prepared`` variable collection (ops/prepare.py) supplies the
    pre-folded composite kernel so fold_upsample_kernel isn't traced into
    the hot program; the original kernel is still read for the thin border
    strips (which need the unfolded 3x3 weights)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        pair = isinstance(z, (tuple, list))
        cin = z[0].shape[-1] + z[1].shape[-1] if pair else z.shape[-1]
        # params live under a 'conv' child scope mirroring nn.Conv's names
        w, b = _UpConvParams(self.features, name="conv")(cin)
        wc = None
        if not self.is_initializing() and self.has_variable(
            "prepared", "kernel_folded"
        ):
            wc = self.get_variable("prepared", "kernel_folded")
        if pair:
            y = upsample_conv_pair(z[0], z[1], w, dtype=self.dtype, wc=wc)
        else:
            y = upsample_conv(z, w, dtype=self.dtype, wc=wc)
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
