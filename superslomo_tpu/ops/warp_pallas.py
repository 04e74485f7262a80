"""Fused Pallas backward-warp kernel for TPU.

Replaces the XLA gather path of ops/warp.py (which profiles at ~34 ms per
(736, 1280, 3) warp on TPU v5e — the dominant cost of the whole 8x
interpolation step) with a banded row-offset decomposition built on what
Mosaic actually supports: dynamic gathers only along the *lane* (minor)
dimension, and only within a single 128-lane vreg (verified empirically —
sublane, flattened, and >128-lane gathers do not compile).

A bilinear backward warp out[y, x] = Σ w·img[y0+dy, x0+dx] is NOT separable
into a vertical then horizontal gather (y0 must be evaluated at the output
pixel, not at the gathered column), so the kernel instead loops over the
integer row offset d = y0 - y:

    for d in [-B, B+1]:                  # scalar-predicated, skipped when
        rows_d = img[y + d, :]           # no pixel in the block needs d
        c0 = lane_gather(rows_d, x0)     # segmented 128-lane gathers
        c1 = lane_gather(rows_d, x0 + 1)
        out += (y0 == y+d) · (w00·c0 + w01·c1)
             + (y0+1 == y+d) · (w10·c0 + w11·c1)

The d loop runs over a static band of ±B rows but each iteration is guarded
by a scalar min/max test of the block's offset field, so smooth real flows
touch only a handful of offsets. Horizontal reach is ±_U_SEG·128 lanes
around each output chunk.

Exactness bounds: |v| ≤ B (=128) rows and |u| ≤ _U_SEG·128 (=128) columns.
Within those bounds the kernel reproduces torch grid_sample
(align_corners=True, padding_mode='zeros') exactly, like the reference warp
(scripts/models/layers.py:73-120); beyond them it degrades to zero
contribution (as if out of frame). The model's own flows sit far inside the
bounds at 720p/1080p; use ops.warp.backward_warp (XLA gather, unbounded) if
arbitrary-magnitude flows must be honored.

A custom VJP routes gradients through the mathematically identical pure-JAX
warp (XLA scatter-add), so training is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superslomo_tpu.ops import warp as warp_ref

_LANES = 128   # Mosaic dynamic_gather shuffles within one 128-lane vreg
_BAND = 128    # max |vertical flow| in rows
_U_SEG = 1     # horizontal reach in 128-lane segments (max |u| = 128)
_HB = 64       # output row-block (sublane) size


def _gather_row_chunk(rows: jnp.ndarray, idx: jnp.ndarray, j0: int):
    """out[s, l] = rows[s, idx[s, l] - 128·j0] over the lane segments of
    ``rows`` (whose lane 0 is absolute column 128·j0)."""
    S, L = rows.shape
    acc = jnp.zeros((S, _LANES), rows.dtype)
    for j in range(L // _LANES):
        local = idx - (j0 + j) * _LANES
        inseg = (local >= 0) & (local < _LANES)
        seg = rows[:, j * _LANES : (j + 1) * _LANES]
        g = jnp.take_along_axis(seg, jnp.clip(local, 0, _LANES - 1), axis=1)
        acc = jnp.where(inseg, g, acc)
    return acc


def _warp_kernel(img_ref, u_ref, v_ref, out_ref, *, h_total: int, w_total: int):
    """img_ref: full (Hpad, Wl) plane in VMEM, zero-padded _BAND rows top and
    bottom (row y of the image lives at img_ref[y + _BAND]).
    u/v/out blocks: (_HB, Wl), grid over row blocks."""
    HB, Wl = out_ref.shape
    nseg = Wl // _LANES
    dtype = out_ref.dtype
    r0 = pl.program_id(0) * HB

    for k in range(nseg):
        sl = slice(k * _LANES, (k + 1) * _LANES)
        u = u_ref[:, sl]
        v = v_ref[:, sl]

        xx = jax.lax.broadcasted_iota(jnp.int32, (HB, _LANES), 1) + k * _LANES
        sx = xx.astype(dtype) + u
        x0f = jnp.floor(sx)
        wx = sx - x0f
        x0 = x0f.astype(jnp.int32)

        yy = jax.lax.broadcasted_iota(jnp.int32, (HB, _LANES), 0) + r0
        sy = yy.astype(dtype) + v
        y0f = jnp.floor(sy)
        wy = sy - y0f
        y0 = y0f.astype(jnp.int32)
        dfield = y0 - yy  # integer row offset each pixel needs

        in_x0 = (x0 >= 0) & (x0 < w_total)
        in_x1 = (x0 + 1 >= 0) & (x0 + 1 < w_total)
        in_y0 = (y0 >= 0) & (y0 < h_total)
        in_y1 = (y0 + 1 >= 0) & (y0 + 1 < h_total)

        w00 = jnp.where(in_y0 & in_x0, (1 - wy) * (1 - wx), 0).astype(dtype)
        w01 = jnp.where(in_y0 & in_x1, (1 - wy) * wx, 0).astype(dtype)
        w10 = jnp.where(in_y1 & in_x0, wy * (1 - wx), 0).astype(dtype)
        w11 = jnp.where(in_y1 & in_x1, wy * wx, 0).astype(dtype)

        x0c = jnp.clip(x0, 0, w_total - 1)
        x1c = jnp.clip(x0 + 1, 0, w_total - 1)

        # Only offsets in [min(dfield), max(dfield)+1] can contribute
        # (+1: y0+1 contributions live at d = dfield + 1). The loop walks
        # 8-aligned row groups: ONE (HB+8)-row block load (dynamic sublane
        # loads must be 8-aligned) serves the 8 sub-offsets inside it.
        dlo = jnp.maximum(jnp.min(dfield), -_BAND)
        dhi = jnp.minimum(jnp.max(dfield) + 1, _BAND + 1)
        qlo = jnp.floor_divide(dlo, 8)
        qhi = jnp.floor_divide(dhi, 8)

        # lane segments the x-gather can touch for this chunk
        j0 = max(0, k - _U_SEG)
        j1 = min(nseg, k + _U_SEG + 1)
        lanes = slice(j0 * _LANES, j1 * _LANES)

        out_ref[:, sl] = jnp.zeros((HB, _LANES), dtype)

        def body(i, carry):
            q = qlo + i
            base = pl.multiple_of(r0 + _BAND + 8 * q, 8)
            blk = img_ref[pl.ds(base, HB + 8), lanes]
            for s in range(8):
                d = 8 * q + s

                @pl.when((d >= dlo) & (d <= dhi))
                def _(s=s, d=d):
                    rows = jax.lax.slice_in_dim(blk, s, s + HB, axis=0)
                    c0 = _gather_row_chunk(rows, x0c, j0)
                    c1 = _gather_row_chunk(rows, x1c, j0)
                    m0 = (dfield == d).astype(dtype)
                    m1 = (dfield + 1 == d).astype(dtype)
                    out_ref[:, sl] += m0 * (w00 * c0 + w01 * c1) + m1 * (
                        w10 * c0 + w11 * c1
                    )

            return carry

        jax.lax.fori_loop(0, qhi - qlo + 1, body, 0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _warp_plane(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp one (H, W) plane by (H, W, 2) flow."""
    H, W = img.shape
    Wl = _round_up(W, _LANES)
    Hp = _round_up(H, _HB)

    # the d loop reaches _BAND + 1 and the aligned block load spans _HB + 8
    # rows from base ≤ (Hp - _HB) + _BAND + 8·ceil((_BAND+1)/8), so pad with
    # 16 extra rows beyond the band and round to the 8-sublane tile
    Hpad = _round_up(Hp + 2 * _BAND + 16, 8)
    img_pad = jnp.pad(img, ((_BAND, Hpad - H - _BAND), (0, Wl - W)))
    u = jnp.pad(flow[..., 0], ((0, Hp - H), (0, Wl - W)))
    v = jnp.pad(flow[..., 1], ((0, Hp - H), (0, Wl - W)))

    out = pl.pallas_call(
        functools.partial(_warp_kernel, h_total=H, w_total=W),
        grid=(Hp // _HB,),
        in_specs=[
            pl.BlockSpec((Hpad, Wl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_HB, Wl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_HB, Wl), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_HB, Wl), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wl), img.dtype),
    )(img_pad, u, v)
    return out[:H, :W]


# The kernel keeps the whole padded plane in VMEM; beyond this byte budget
# (double-buffered input + blocks must fit in 16 MB) fall back to XLA.
_VMEM_PLANE_BUDGET = 6_500_000


def fits_vmem(h: int, w: int, itemsize: int = 4) -> bool:
    Hpad = _round_up(_round_up(h, _HB) + 2 * _BAND + 16, 8)
    Wl = _round_up(w, _LANES)
    return Hpad * Wl * itemsize <= _VMEM_PLANE_BUDGET


@jax.custom_vjp
def backward_warp_pallas(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) x (B, H, W, 2) → (B, H, W, C); grid_sample parity within
    the |v| ≤ 128, |u| ≤ 128 band (see module docstring). Falls back to the
    XLA gather for planes too large to hold in VMEM (≳1080p f32)."""
    B, H, W, C = img.shape
    if not fits_vmem(H, W, img.dtype.itemsize):
        return warp_ref.backward_warp(img, flow)
    flow = flow.astype(img.dtype)

    def per_image(im, fl):  # (H, W, C), (H, W, 2)
        planes = [_warp_plane(im[..., c], fl) for c in range(im.shape[-1])]
        return jnp.stack(planes, axis=-1)

    return jax.vmap(per_image)(img, flow)


def _fwd(img, flow):
    return backward_warp_pallas(img, flow), (img, flow)


def _bwd(res, g):
    img, flow = res
    _, vjp = jax.vjp(lambda i, f: warp_ref.backward_warp(i, f), img, flow)
    return vjp(g)


backward_warp_pallas.defvjp(_fwd, _bwd)
