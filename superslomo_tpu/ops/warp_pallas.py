"""Fused Pallas backward-warp kernel for TPU.

Replaces the XLA gather path of ops/warp.py with two lane-gather passes that
map onto what Mosaic actually supports on TPU (dynamic gathers are only
available along the *lane* (minor) dimension — verified empirically; sublane
and flattened 2-D gathers do not compile):

  pass V (vertical, transposed layout): for dy ∈ {0, 1}
      GdyT[x, y] = imgT[x, clip(y0(y,x) + dy)]      # lane gather over H
  pass H (horizontal + blend):
      out[y, x] = Σ_{dy,dx} w_{dy,dx}(y,x) · Gdy[y, clip(x0(y,x) + dx)]
                                                     # lane gather over W
with the zeros-padding masks folded into the bilinear weights, reproducing
torch grid_sample(align_corners=True, padding_mode='zeros') exactly, like
the reference warp (scripts/models/layers.py:73-120).

Both passes are row/column blocked so VMEM stays small at 720p/1080p, and a
custom VJP re-expresses the backward pass with the same kernels'
pure-JAX equivalent (scatter-add), keeping training correct.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superslomo_tpu.ops import warp as warp_ref

# Block sizes (sublane dim of each pass). Multiples of 8 for f32 tiling.
_BLOCK = 128
_LANES = 128  # Mosaic dynamic_gather operates within one 128-lane vreg


def _gather_chunk(src_ref, idx_chunk: jnp.ndarray, n_src_lanes: int) -> jnp.ndarray:
    """out[s, l] = src_ref[s, idx_chunk[s, l]] for one 128-lane output chunk.

    Mosaic's tpu.dynamic_gather only shuffles within a single 128-lane
    vector register, so the gather walks the (n_src_lanes/128) source vregs
    with in-segment masks. Loops are static → unrolled VPU code; only one
    (S, 128) accumulator is live at a time.
    """
    S = src_ref.shape[0]
    acc = jnp.zeros((S, _LANES), src_ref.dtype)
    for j in range(n_src_lanes // _LANES):
        local = idx_chunk - j * _LANES
        inseg = (local >= 0) & (local < _LANES)
        seg = src_ref[:, j * _LANES : (j + 1) * _LANES]
        g = jnp.take_along_axis(seg, jnp.clip(local, 0, _LANES - 1), axis=1)
        acc = jnp.where(inseg, g, acc)
    return acc


def _vertical_kernel(imgT_ref, vT_ref, g0T_ref, g1T_ref, *, h_total: int):
    """Gather rows: GdyT[x, y] = imgT[x, clip(floor(y + v) + dy)].

    imgT/vT blocks: (Wb, Hp) with lane dim Hp a 128-multiple; clipping uses
    the true image height ``h_total``. Output written chunk-by-chunk to keep
    VMEM pressure flat.
    """
    Wb, Hp = imgT_ref.shape
    for k in range(Hp // _LANES):
        sl = slice(k * _LANES, (k + 1) * _LANES)
        yy = jax.lax.broadcasted_iota(jnp.int32, (Wb, _LANES), 1) + k * _LANES
        sy = yy.astype(vT_ref.dtype) + vT_ref[:, sl]
        y0 = jnp.floor(sy).astype(jnp.int32)
        g0T_ref[:, sl] = _gather_chunk(imgT_ref, jnp.clip(y0, 0, h_total - 1), Hp)
        g1T_ref[:, sl] = _gather_chunk(imgT_ref, jnp.clip(y0 + 1, 0, h_total - 1), Hp)


def _horizontal_kernel(g0_ref, g1_ref, u_ref, v_ref, out_ref, *,
                       h_total: int, w_total: int):
    """Gather columns of the row-gathered planes and blend with the bilinear
    weights (OOB corners → weight 0). Blocks: (Hb, Wp), lane dim Wp a
    128-multiple; true width ``w_total`` bounds the gather. Processes one
    128-lane output chunk at a time to keep VMEM pressure flat."""
    Hb, W = g0_ref.shape  # W == Wp (padded)
    dtype = g0_ref.dtype
    row0 = pl.program_id(0) * Hb

    for k in range(W // _LANES):
        sl = slice(k * _LANES, (k + 1) * _LANES)
        u = u_ref[:, sl]
        v = v_ref[:, sl]
        xx = jax.lax.broadcasted_iota(jnp.int32, (Hb, _LANES), 1) + k * _LANES
        sx = xx.astype(dtype) + u
        x0f = jnp.floor(sx)
        wx = sx - x0f
        x0 = x0f.astype(jnp.int32)

        yy = jax.lax.broadcasted_iota(jnp.int32, (Hb, _LANES), 0) + row0
        sy = yy.astype(dtype) + v
        y0f = jnp.floor(sy)
        wy = sy - y0f
        y0 = y0f.astype(jnp.int32)

        x0c = jnp.clip(x0, 0, w_total - 1)
        x1c = jnp.clip(x0 + 1, 0, w_total - 1)

        in_x0 = (x0 >= 0) & (x0 < w_total)
        in_x1 = (x0 + 1 >= 0) & (x0 + 1 < w_total)
        in_y0 = (y0 >= 0) & (y0 < h_total)
        in_y1 = (y0 + 1 >= 0) & (y0 + 1 < h_total)

        w00 = jnp.where(in_y0 & in_x0, (1 - wy) * (1 - wx), 0).astype(dtype)
        w01 = jnp.where(in_y0 & in_x1, (1 - wy) * wx, 0).astype(dtype)
        w10 = jnp.where(in_y1 & in_x0, wy * (1 - wx), 0).astype(dtype)
        w11 = jnp.where(in_y1 & in_x1, wy * wx, 0).astype(dtype)

        acc = _gather_chunk(g0_ref, x0c, W) * w00
        acc = acc + _gather_chunk(g0_ref, x1c, W) * w01
        acc = acc + _gather_chunk(g1_ref, x0c, W) * w10
        acc = acc + _gather_chunk(g1_ref, x1c, W) * w11
        out_ref[:, sl] = acc


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _warp_plane(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp one (H, W) plane by (H, W, 2) flow via the two Pallas passes.

    Mosaic's dynamic_gather needs tile-aligned (8, 128) operands, so the
    gather (lane) axis of each pass is padded to a 128-multiple and the
    sublane axis to the block size.
    """
    H, W = img.shape
    Hl = _round_up(H, 128)  # lane dim of pass V
    Wl = _round_up(W, 128)  # lane dim of pass H
    wb = min(_BLOCK, _round_up(W, 8))  # sublane block of pass V
    hb = min(_BLOCK, _round_up(H, 8))  # sublane block of pass H
    Wp = _round_up(W, wb)
    Hp = _round_up(H, hb)

    imgT = jnp.pad(img.T, ((0, Wp - W), (0, Hl - H)))  # (Wp, Hl)
    vT = jnp.pad(flow[..., 1].T, ((0, Wp - W), (0, Hl - H)))

    g0T, g1T = pl.pallas_call(
        functools.partial(_vertical_kernel, h_total=H),
        grid=(Wp // wb,),
        in_specs=[
            pl.BlockSpec((wb, Hl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, Hl), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((wb, Hl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, Hl), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Wp, Hl), img.dtype),
            jax.ShapeDtypeStruct((Wp, Hl), img.dtype),
        ],
    )(imgT, vT)

    g0 = jnp.pad(g0T[:W, :H].T, ((0, Hp - H), (0, Wl - W)))  # (Hp, Wl)
    g1 = jnp.pad(g1T[:W, :H].T, ((0, Hp - H), (0, Wl - W)))
    u = jnp.pad(flow[..., 0], ((0, Hp - H), (0, Wl - W)))
    v = jnp.pad(flow[..., 1], ((0, Hp - H), (0, Wl - W)))

    out = pl.pallas_call(
        functools.partial(_horizontal_kernel, h_total=H, w_total=W),
        grid=(Hp // hb,),
        in_specs=[
            pl.BlockSpec((hb, Wl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, Wl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, Wl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, Wl), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, Wl), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wl), img.dtype),
    )(g0, g1, u, v)
    return out[:H, :W]


@jax.custom_vjp
def backward_warp_pallas(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) x (B, H, W, 2) → (B, H, W, C); grid_sample parity."""
    flow = flow.astype(img.dtype)

    def per_image(im, fl):  # (H, W, C), (H, W, 2)
        planes = [_warp_plane(im[..., c], fl) for c in range(im.shape[-1])]
        return jnp.stack(planes, axis=-1)

    return jax.vmap(per_image)(img, flow)


def _fwd(img, flow):
    return backward_warp_pallas(img, flow), (img, flow)


def _bwd(res, g):
    # Backward through the mathematically identical pure-JAX warp: XLA's
    # scatter-add VJP. Warp calls dominate inference; training keeps the
    # reference numerics.
    img, flow = res
    _, vjp = jax.vjp(lambda i, f: warp_ref.backward_warp(i, f), img, flow)
    return vjp(g)


backward_warp_pallas.defvjp(_fwd, _bwd)
