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


def _warp_kernel(*refs, h_total: int, w_total: int, n_chan: int, sub: int):
    """refs = (img_0..img_{C-1}, u, v, out_0..out_{C-1}).

    img_c: full (Hpad, Wl) planes in VMEM, zero-padded _BAND rows top and
    bottom (row y of the image lives at img[y + _BAND]). u/v/out blocks:
    (_HB, Wl), grid over row blocks. All channels share one pass of index
    math, flow loads, and d-loop control — only the gathers repeat per
    channel.

    Index/weight math is ALWAYS f32 (u/v arrive f32): sample positions up
    to W=1280 px would lose whole pixels in bf16's 8-bit mantissa. Planes
    may be stored bf16 — halving VMEM lets all 3 channels share ONE kernel
    at 720p (one index-math pass instead of three) — but gathers/compute
    run f32: Mosaic's dynamic_gather requires index and value bitwidths to
    match, so each block load upcasts once per row group (amortized over
    the ``sub`` sub-offsets it serves). Outputs are always f32; the caller
    casts back. ``sub`` is the dynamic-sublane alignment of the plane
    dtype: 8 rows for f32, 16 for bf16."""
    img_refs = refs[:n_chan]
    u_ref, v_ref = refs[n_chan], refs[n_chan + 1]
    out_refs = refs[n_chan + 2 :]
    HB, Wl = out_refs[0].shape
    nseg = Wl // _LANES
    dtype = out_refs[0].dtype  # f32: gather/accumulate dtype
    f32 = jnp.float32
    r0 = pl.program_id(0) * HB

    for k in range(nseg):
        sl = slice(k * _LANES, (k + 1) * _LANES)
        u = u_ref[:, sl]
        v = v_ref[:, sl]

        xx = jax.lax.broadcasted_iota(jnp.int32, (HB, _LANES), 1) + k * _LANES
        sx = xx.astype(f32) + u
        x0f = jnp.floor(sx)
        wx = sx - x0f
        x0 = x0f.astype(jnp.int32)

        yy = jax.lax.broadcasted_iota(jnp.int32, (HB, _LANES), 0) + r0
        sy = yy.astype(f32) + v
        y0f = jnp.floor(sy)
        wy = sy - y0f
        y0 = y0f.astype(jnp.int32)
        dfield = y0 - yy  # integer row offset each pixel needs

        in_x0 = (x0 >= 0) & (x0 < w_total)
        in_x1 = (x0 + 1 >= 0) & (x0 + 1 < w_total)
        in_y0 = (y0 >= 0) & (y0 < h_total)
        in_y1 = (y0 + 1 >= 0) & (y0 + 1 < h_total)

        w00 = jnp.where(in_y0 & in_x0, (1 - wy) * (1 - wx), 0)
        w01 = jnp.where(in_y0 & in_x1, (1 - wy) * wx, 0)
        w10 = jnp.where(in_y1 & in_x0, wy * (1 - wx), 0)
        w11 = jnp.where(in_y1 & in_x1, wy * wx, 0)

        x0c = jnp.clip(x0, 0, w_total - 1)
        x1c = jnp.clip(x0 + 1, 0, w_total - 1)

        # Only offsets in [min(dfield), max(dfield)+1] can contribute
        # (+1: y0+1 contributions live at d = dfield + 1). The loop walks
        # sub-aligned row groups: ONE (HB+sub)-row block load (dynamic
        # sublane loads must be tile-aligned) serves the sub sub-offsets
        # inside it.
        dlo = jnp.maximum(jnp.min(dfield), -_BAND)
        dhi = jnp.minimum(jnp.max(dfield) + 1, _BAND + 1)
        qlo = jnp.floor_divide(dlo, sub)
        qhi = jnp.floor_divide(dhi, sub)

        # lane segments the x-gather can touch for this chunk
        j0 = max(0, k - _U_SEG)
        j1 = min(nseg, k + _U_SEG + 1)
        lanes = slice(j0 * _LANES, j1 * _LANES)

        for out_ref in out_refs:
            out_ref[:, sl] = jnp.zeros((HB, _LANES), dtype)

        def body(i, carry):
            q = qlo + i
            base = pl.multiple_of(r0 + _BAND + sub * q, sub)
            blks = [
                img_ref[pl.ds(base, HB + sub), lanes].astype(dtype)
                for img_ref in img_refs
            ]
            for s in range(sub):
                d = sub * q + s

                @pl.when((d >= dlo) & (d <= dhi))
                def _(s=s, d=d):
                    m0 = (dfield == d).astype(f32)
                    m1 = (dfield + 1 == d).astype(f32)
                    g0 = (m0 * w00 + m1 * w10).astype(dtype)
                    g1 = (m0 * w01 + m1 * w11).astype(dtype)
                    for blk, out_ref in zip(blks, out_refs):
                        rows = jax.lax.slice_in_dim(blk, s, s + HB, axis=0)
                        c0 = _gather_row_chunk(rows, x0c, j0)
                        c1 = _gather_row_chunk(rows, x1c, j0)
                        out_ref[:, sl] += g0 * c0 + g1 * c1

            return carry

        jax.lax.fori_loop(0, qhi - qlo + 1, body, 0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sublane(dtype) -> int:
    """Dynamic-sublane alignment for a plane dtype (f32: 8, bf16: 16)."""
    return {4: 8, 2: 16}[jnp.dtype(dtype).itemsize]


def _warp_image(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp one (H, W, C) image by (H, W, 2) f32 flow — all channels in ONE
    kernel so index math, flow loads, and loop control amortize. Planes may
    be f32 or bf16 (index math stays f32 either way)."""
    H, W, C = img.shape
    sub = _sublane(img.dtype)
    flow = flow.astype(jnp.float32)
    Wl = _round_up(W, _LANES)
    Hp = _round_up(H, _HB)

    # the d loop reaches _BAND + 1 and the aligned block load spans
    # _HB + sub rows from base ≤ (Hp - _HB) + _BAND + sub·ceil((_BAND+1)/sub),
    # so pad 2·sub extra rows beyond the band and round to the sublane tile
    Hpad = _round_up(Hp + 2 * _BAND + 2 * sub, sub)
    planes = [
        jnp.pad(img[..., c], ((_BAND, Hpad - H - _BAND), (0, Wl - W)))
        for c in range(C)
    ]
    u = jnp.pad(flow[..., 0], ((0, Hp - H), (0, Wl - W)))
    v = jnp.pad(flow[..., 1], ((0, Hp - H), (0, Wl - W)))

    plane_spec = pl.BlockSpec((Hpad, Wl), lambda i: (0, 0), memory_space=pltpu.VMEM)
    block_spec = pl.BlockSpec((_HB, Wl), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_warp_kernel, h_total=H, w_total=W, n_chan=C, sub=sub),
        grid=(Hp // _HB,),
        in_specs=[plane_spec] * C + [block_spec, block_spec],
        out_specs=[block_spec] * C,
        # outputs are f32 regardless of plane dtype (gathers run f32)
        out_shape=[jax.ShapeDtypeStruct((Hp, Wl), jnp.float32)] * C,
    )(*planes, u, v)
    return jnp.stack([o[:H, :W] for o in outs], axis=-1).astype(img.dtype)


def _warp_kernel_mf(img_ref, u_ref, v_ref, out_ref, acc_ref, *, h_total,
                    w_total, sub, grid_dims):
    """Multi-flow kernel body: one image warped by many flows.

    img_ref: (Cg, Hpad, Wl) channel plane(s), CONSTANT across the grid —
    Pallas fetches them once and every (flow, row-block) grid step reuses
    the VMEM copy (the whole point: at 7 t-values the per-t kernels would
    otherwise re-DMA and re-pad the same planes seven times).
    u_ref/v_ref: (1, HB, Wl) f32 blocks of the (n, Hp, Wl) flow stacks.
    out_ref: (Cg, 1, HB, Wl) blocks of the (Cg, n, Hp, Wl) outputs — f32,
    or the consumer's bf16 (round 5): the stage-2 input warps feed convs
    that quantize to bf16 anyway, so storing bf16 halves this step's
    dominant warp-output HBM traffic with the SAME values (accumulation
    stays f32 in ``acc_ref`` VMEM scratch; only the final store rounds,
    exactly like the astype the consumer used to apply).
    Index math identical to _warp_kernel."""
    Cg = img_ref.shape[0]
    HB, Wl = out_ref.shape[2], out_ref.shape[3]
    nseg = Wl // _LANES
    f32 = jnp.float32
    # the row-block index is the last grid dimension
    r0 = pl.program_id(grid_dims - 1) * HB

    for k in range(nseg):
        sl = slice(k * _LANES, (k + 1) * _LANES)
        u = u_ref[0, :, sl]
        v = v_ref[0, :, sl]

        xx = jax.lax.broadcasted_iota(jnp.int32, (HB, _LANES), 1) + k * _LANES
        sx = xx.astype(f32) + u
        x0f = jnp.floor(sx)
        wx = sx - x0f
        x0 = x0f.astype(jnp.int32)

        yy = jax.lax.broadcasted_iota(jnp.int32, (HB, _LANES), 0) + r0
        sy = yy.astype(f32) + v
        y0f = jnp.floor(sy)
        wy = sy - y0f
        y0 = y0f.astype(jnp.int32)
        dfield = y0 - yy

        in_x0 = (x0 >= 0) & (x0 < w_total)
        in_x1 = (x0 + 1 >= 0) & (x0 + 1 < w_total)
        in_y0 = (y0 >= 0) & (y0 < h_total)
        in_y1 = (y0 + 1 >= 0) & (y0 + 1 < h_total)

        w00 = jnp.where(in_y0 & in_x0, (1 - wy) * (1 - wx), 0)
        w01 = jnp.where(in_y0 & in_x1, (1 - wy) * wx, 0)
        w10 = jnp.where(in_y1 & in_x0, wy * (1 - wx), 0)
        w11 = jnp.where(in_y1 & in_x1, wy * wx, 0)

        x0c = jnp.clip(x0, 0, w_total - 1)
        x1c = jnp.clip(x0 + 1, 0, w_total - 1)

        dlo = jnp.maximum(jnp.min(dfield), -_BAND)
        dhi = jnp.minimum(jnp.max(dfield) + 1, _BAND + 1)
        qlo = jnp.floor_divide(dlo, sub)
        qhi = jnp.floor_divide(dhi, sub)

        j0 = max(0, k - _U_SEG)
        j1 = min(nseg, k + _U_SEG + 1)
        lanes = slice(j0 * _LANES, j1 * _LANES)

        for c in range(Cg):
            acc_ref[c] = jnp.zeros((HB, _LANES), f32)

        def body(i, carry):
            q = qlo + i
            base = pl.multiple_of(r0 + _BAND + sub * q, sub)
            blks = [
                img_ref[c, pl.ds(base, HB + sub), lanes].astype(f32)
                for c in range(Cg)
            ]
            for s in range(sub):
                d = sub * q + s

                @pl.when((d >= dlo) & (d <= dhi))
                def _(s=s, d=d):
                    m0 = (dfield == d).astype(f32)
                    m1 = (dfield + 1 == d).astype(f32)
                    g0 = m0 * w00 + m1 * w10
                    g1 = m0 * w01 + m1 * w11
                    for c, blk in enumerate(blks):
                        rows = jax.lax.slice_in_dim(blk, s, s + HB, axis=0)
                        c0 = _gather_row_chunk(rows, x0c, j0)
                        c1 = _gather_row_chunk(rows, x1c, j0)
                        acc_ref[c] += g0 * c0 + g1 * c1

            return carry

        jax.lax.fori_loop(0, qhi - qlo + 1, body, 0)
        for c in range(Cg):
            out_ref[c, 0, :, sl] = acc_ref[c].astype(out_ref.dtype)


def _warp_planes_core(planes: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                      H: int, W: int,
                      out_dtype=jnp.float32) -> jnp.ndarray:
    """Shared multi-flow kernel launch on UNPADDED planar inputs.

    planes: (C, H, W) image planes (f32/bf16); u, v: (n, H, W) f32 flow
    components. → (C, n, H, W) ``out_dtype`` (accumulation is always f32 in
    VMEM scratch; a bf16 out_dtype only moves the consumer's astype into
    the kernel's store — same values, half the output HBM traffic). Channel
    planes are DMA'd to VMEM once and shared by all n warps: either all C
    channels resident (bf16 720p and small f32) with grid (n, i), or one
    channel at a time via a Python loop of single-plane calls."""
    C = planes.shape[0]
    n = u.shape[0]
    sub = _sublane(planes.dtype)
    Wl = _round_up(W, _LANES)
    Hp = _round_up(H, _HB)
    Hpad = _round_up(Hp + 2 * _BAND + 2 * sub, sub)

    planes = jnp.pad(
        planes, ((0, 0), (_BAND, Hpad - H - _BAND), (0, Wl - W))
    )  # (C, Hpad, Wl)
    u = jnp.pad(u.astype(jnp.float32), ((0, 0), (0, Hp - H), (0, Wl - W)))
    v = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, Hp - H), (0, Wl - W)))

    grid = (n, Hp // _HB)
    uv_spec = pl.BlockSpec((1, _HB, Wl), lambda f, i: (f, i, 0),
                           memory_space=pltpu.VMEM)
    if fits_vmem(H, W, planes.dtype.itemsize, n_chan=C):
        # all channels resident in one kernel. The plane spec's index map is
        # CONSTANT over the grid, so Pallas single-buffers it — one DMA for
        # the whole (flow, row-block) sweep.
        img_spec = pl.BlockSpec((C, Hpad, Wl), lambda f, i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((C, 1, _HB, Wl), lambda f, i: (0, f, i, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_warp_kernel_mf, h_total=H, w_total=W, sub=sub,
                              grid_dims=len(grid)),
            grid=grid,
            in_specs=[img_spec, uv_spec, uv_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((C, n, Hp, Wl), out_dtype),
            scratch_shapes=[pltpu.VMEM((C, _HB, _LANES), jnp.float32)],
        )(planes, u, v)
    else:
        # plane-at-a-time, one pallas_call per channel: a channel grid dim
        # would make Pallas double-buffer the big plane (prefetching the
        # next channel) and blow VMEM at 1080p f32; a Python loop keeps
        # each call's plane constant-indexed → single-buffered, still
        # shared across all n flows.
        img_spec = pl.BlockSpec((1, Hpad, Wl), lambda f, i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, 1, _HB, Wl), lambda f, i: (0, f, i, 0),
                                memory_space=pltpu.VMEM)
        outs = [
            pl.pallas_call(
                functools.partial(_warp_kernel_mf, h_total=H, w_total=W,
                                  sub=sub, grid_dims=len(grid)),
                grid=grid,
                in_specs=[img_spec, uv_spec, uv_spec],
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((1, n, Hp, Wl), out_dtype),
                scratch_shapes=[pltpu.VMEM((1, _HB, _LANES), jnp.float32)],
            )(planes[c : c + 1], u, v)
            for c in range(C)
        ]
        out = jnp.concatenate(outs, axis=0)
    return out[:, :, :H, :W]


def _warp_image_multiflow(img: jnp.ndarray, flows: jnp.ndarray) -> jnp.ndarray:
    """One (H, W, C) image warped by (n, H, W, 2) f32 flows → (n, H, W, C)
    (channel-minor wrapper over the planar core)."""
    H, W, C = img.shape
    planes = jnp.stack([img[..., c] for c in range(C)])
    out = _warp_planes_core(planes, flows[..., 0], flows[..., 1], H, W)
    return out.transpose(1, 2, 3, 0).astype(img.dtype)


def _planar_via_xla(planes, u, v):
    """XLA-gather reference of the planar multi-flow warp (gradients +
    CPU/out-of-band fallback). planes (B, C, H, W); u, v (B, n, H, W)."""
    img = planes.transpose(0, 2, 3, 1)
    flows = jnp.stack([u, v], axis=-1)
    out = _mf_tiled_xla(img, flows)  # (B, n, H, W, C)
    return out.transpose(0, 4, 1, 2, 3).astype(jnp.float32)


def _batched_pallas(fn, *args):
    """Batch a per-image Pallas computation. B == 1 keeps the exact vmap
    HLO of the single-stream production programs (compile-cache-stable);
    B >= 2 unrolls a Python loop of per-image calls instead — vmapping the
    pallas_call adds a batch grid dimension whose constant-index-map
    single-buffered plane spec crashes the Mosaic compiler (the 'B=2 720p
    HTTP 500' compile-helper failure isolated by benchmarks/
    batch720_probe.py: every B=2 variant with the kernel dies, the
    XLA-warp variant compiles)."""
    B = args[0].shape[0]
    if B == 1:
        return jax.vmap(fn)(*args)
    return jnp.stack([fn(*(a[i] for a in args)) for i in range(B)])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mf_unguarded_planar(out_dtype, planes, u, v):
    B, C, H, W = planes.shape
    return _batched_pallas(
        lambda p, uu, vv: _warp_planes_core(p, uu, vv, H, W, out_dtype),
        planes, u, v,
    )


def _mfu_p_fwd(out_dtype, planes, u, v):
    return _mf_unguarded_planar(out_dtype, planes, u, v), (planes, u, v)


def _mfu_p_bwd(out_dtype, res, g):
    planes, u, v = res
    _, vjp = jax.vjp(_planar_via_xla, planes, u, v)
    return vjp(g.astype(jnp.float32))


_mf_unguarded_planar.defvjp(_mfu_p_fwd, _mfu_p_bwd)


def backward_warp_multiflow_planar(planes: jnp.ndarray, u: jnp.ndarray,
                                   v: jnp.ndarray,
                                   out_dtype=jnp.float32) -> jnp.ndarray:
    """Planar-native multi-flow warp: (B, C, H, W) planes x (B, n, H, W)
    f32 u/v components → (B, C, n, H, W) ``out_dtype`` (f32 accumulation;
    a bf16 out_dtype equals astype-after-f32-warp bit-for-bit and halves
    the output HBM traffic — used by the stage-2 input warps, whose
    consumer quantizes to bf16 anyway).

    The fused multi-t epilogue keeps flows and visibility maps as planes
    (models/superslomo.py): a (H, W) plane tiles the TPU's (8, 128)
    vregs perfectly, where the channel-minor (H, W, 2) layout would put 2
    channels in the 128-lane dimension — every surrounding elementwise op
    and the kernel's own u/v slicing paid layout copies for it. This entry
    point skips both the channel slicing on the way in and the
    planar→channel-minor transpose on the way out of _warp_image_multiflow.

    ALWAYS unguarded (no in-graph band cond): callers run under the
    host-checked-bound protocol (SuperSloMo.interpolate_multi_t
    with_bounds=True). Falls back to the channel-minor colsplit path when a
    plane exceeds the shared-residency VMEM budget (1080p f32)."""
    B, C, H, W = planes.shape
    if not _mf_plane_fits(H, W, planes.dtype.itemsize):
        img = planes.transpose(0, 2, 3, 1)
        flows = jnp.stack([u, v], axis=-1)
        out = backward_warp_multiflow(img, flows, unguarded=True)
        return out.transpose(0, 4, 1, 2, 3).astype(out_dtype)
    return _mf_unguarded_planar(jnp.dtype(out_dtype), planes,
                                u.astype(jnp.float32), v.astype(jnp.float32))


def _mf_tiled_xla(img, flows):
    B, n, H, W, _ = flows.shape
    C = img.shape[-1]
    tiled = jnp.broadcast_to(img[:, None], (B, n, H, W, C)).reshape(B * n, H, W, C)
    out = warp_ref.backward_warp(tiled, flows.reshape(B * n, H, W, 2))
    return out.reshape(B, n, H, W, C)


@jax.custom_vjp
def _mf_guarded(img: jnp.ndarray, flows: jnp.ndarray, band_f: jnp.ndarray):
    """Guarded multi-flow warp with the cond hidden from autodiff (see
    _guarded_core)."""
    return jax.lax.cond(
        band_f > 0.5,
        lambda i, f: _batched_pallas(_warp_image_multiflow, i, f),
        _mf_tiled_xla,
        img,
        flows,
    )


def _mf_fwd(img, flows, band_f):
    return _mf_guarded(img, flows, band_f), (img, flows)


def _mf_bwd(res, g):
    img, flows = res
    _, vjp = jax.vjp(_mf_tiled_xla, img, flows)
    return vjp(g) + (jnp.zeros(()),)


_mf_guarded.defvjp(_mf_fwd, _mf_bwd)


@jax.custom_vjp
def _mf_unguarded(img: jnp.ndarray, flows: jnp.ndarray):
    return _batched_pallas(_warp_image_multiflow, img, flows)


def _mfu_fwd(img, flows):
    return _mf_unguarded(img, flows), (img, flows)


def _mfu_bwd(res, g):
    img, flows = res
    _, vjp = jax.vjp(_mf_tiled_xla, img, flows)
    return vjp(g)


_mf_unguarded.defvjp(_mfu_fwd, _mfu_bwd)


def backward_warp_multiflow(img: jnp.ndarray, flows: jnp.ndarray, in_band=None,
                            unguarded: bool = False):
    """(B, H, W, C) x (B, n, H, W, 2) → (B, n, H, W, C): each batch image
    backward-warped by n flow fields, sharing one VMEM copy of its planes
    (the fused multi-t step warps the same frame at every t). Same band
    guard / fallback semantics as backward_warp_pallas."""
    B, n, H, W, _ = flows.shape
    C = img.shape[-1]
    flows = flows.astype(jnp.float32)
    if not _mf_plane_fits(H, W, img.dtype.itemsize):
        # plane too big for shared residency (1080p f32): tile the image and
        # use the per-flow kernel, which can column-split with halos —
        # NEVER the XLA gather (25-60 ms per 1080p warp)
        tiled = jnp.broadcast_to(img[:, None], (B, n, H, W, C)).reshape(
            B * n, H, W, C
        )
        out = backward_warp_pallas(tiled, flows.reshape(B * n, H, W, 2),
                                   in_band=in_band, unguarded=unguarded)
        return out.reshape(B, n, H, W, C)
    if unguarded:
        return _mf_unguarded(img, flows)
    if in_band is None:
        in_band = jnp.max(jnp.abs(flows)) <= jnp.asarray(_MAX_FLOW, flows.dtype)
    return _mf_guarded(img, flows, jnp.asarray(in_band, jnp.float32))


# The kernel keeps the padded channel planes in VMEM. Budgets leave room for
# double-buffered u/v/out blocks inside the 16 MB VMEM; beyond them fall
# back to fewer channels per kernel, then to the XLA gather.
_VMEM_MULTI_BUDGET = 12_000_000  # all C planes resident at once
_VMEM_SINGLE_BUDGET = 6_500_000  # one plane resident (verified at 720p f32)


# The multi-flow kernel's per-grid-step working set beyond the plane is
# small (double-buffered (64, W) u/v/out blocks), so a single resident
# plane can be bigger than the per-flow kernel's budget — this is what
# keeps 1080p f32 final-image warps on the shared-plane path instead of
# column-split (plane there: 10.6 MB).
_VMEM_MF_PLANE_BUDGET = 11_500_000


def _mf_plane_fits(h: int, w: int, itemsize: int) -> bool:
    sub = {4: 8, 2: 16}[itemsize]
    Hpad = _round_up(_round_up(h, _HB) + 2 * _BAND + 2 * sub, sub)
    return Hpad * _round_up(w, _LANES) * itemsize <= _VMEM_MF_PLANE_BUDGET


def fits_vmem(h: int, w: int, itemsize: int = 4, n_chan: int = 3) -> bool:
    sub = {4: 8, 2: 16}[itemsize]
    Hpad = _round_up(_round_up(h, _HB) + 2 * _BAND + 2 * sub, sub)
    Wl = _round_up(w, _LANES)
    budget = _VMEM_SINGLE_BUDGET if n_chan == 1 else _VMEM_MULTI_BUDGET
    return n_chan * Hpad * Wl * itemsize <= budget


# Column halo covering the kernel's horizontal reach: segments ±_U_SEG plus
# the within-segment offset (≤127) and the x0+1 tap.
_HALO = (_U_SEG + 1) * _LANES


def _warp_image_colsplit(img: jnp.ndarray, flow: jnp.ndarray, n_splits: int):
    """Warp a wide (H, W, C) image as column slices with halos.

    The gather for output columns [s0, s1) reads source columns within
    ±_HALO, so each slice warps independently: the source slice is the
    zero-padded window [s0-_HALO, s1+_HALO) and the flow is shifted by the
    output-to-slice column offset. Zero padding beyond the true image edge
    reproduces grid_sample's zeros semantics (gathers there return 0).
    """
    H, W, C = img.shape
    ws = -(-W // n_splits)
    right = _HALO + n_splits * ws - W
    pad_img = jnp.pad(img, ((0, 0), (_HALO, right), (0, 0)))
    # flow for halo/overhang columns is irrelevant (their outputs are
    # cropped) — zero-pad it with the same geometry
    pad_flow = jnp.pad(flow, ((0, 0), (_HALO, right), (0, 0)))
    outs = []
    for i in range(n_splits):
        s0 = i * ws  # padded-coordinate start of this slice's window
        src = jax.lax.slice_in_dim(pad_img, s0, s0 + ws + 2 * _HALO, axis=1)
        fl = jax.lax.slice_in_dim(pad_flow, s0, s0 + ws + 2 * _HALO, axis=1)
        # slice-local x' samples src[y+v, x'+u] = img[y+v, (s0-_HALO+x')+u]:
        # exactly the global warp; zeros in the padded halo reproduce the
        # out-of-image zeros semantics
        warped = [
            _warp_image(src[..., c : c + 1], fl) for c in range(C)
        ]
        out = jnp.concatenate(warped, axis=-1)
        outs.append(out[:, _HALO : _HALO + ws])
    return jnp.concatenate(outs, axis=1)[:, :W]


# Exact band of the kernel (see module docstring): the d loop covers integer
# row offsets |d| ≤ _BAND (plus the y0+1 tap) and the lane gather reaches
# ±_U_SEG·128 columns. |u|, |v| ≤ 128.0 inclusive is safe (at exactly +128
# the dropped x0+1 tap has zero weight).
_MAX_FLOW = float(_BAND)


def _pallas_dispatch(img: jnp.ndarray, flow: jnp.ndarray):
    """Static shape-based kernel selection. Returns the pallas warp path for
    this (shape, dtype), or None when no variant fits VMEM."""
    B, H, W, C = img.shape
    if fits_vmem(H, W, img.dtype.itemsize, n_chan=C):
        # all channels in one kernel: index math and flow loads amortize
        return jax.vmap(_warp_image)
    if fits_vmem(H, W, img.dtype.itemsize, n_chan=1):
        # plane at a time (720p f32 territory)
        def per_image(im, fl):
            planes = [_warp_image(im[..., c : c + 1], fl) for c in range(C)]
            return jnp.concatenate(planes, axis=-1)

        return jax.vmap(per_image)
    # wide frames (1080p+): split columns with a halo covering the kernel's
    # horizontal reach, warping each slice independently
    for n_splits in (2, 4, 8):
        ws = -(-W // n_splits)
        if fits_vmem(H, ws + 2 * _HALO, img.dtype.itemsize, n_chan=1):
            return jax.vmap(
                lambda im, fl, n=n_splits: _warp_image_colsplit(im, fl, n)
            )
    return None


@jax.custom_vjp
def _guarded_core(img: jnp.ndarray, flow: jnp.ndarray, band_f: jnp.ndarray):
    """cond(in-band → banded kernel, else → XLA gather), with the guard
    HIDDEN from autodiff: the custom VJP is the XLA warp's VJP, which is
    mathematically the gradient of BOTH branches (in band they are the same
    function), so training never linearizes through the cond — jax's cond
    rule would otherwise partial-eval and residual-save both branches,
    measurably slowing the train step. ``band_f`` is a f32 scalar (1.0 in
    band) so it carries an ordinary zero cotangent."""
    path = _pallas_dispatch(img, flow)
    return jax.lax.cond(
        band_f > 0.5, path, lambda im, fl: warp_ref.backward_warp(im, fl), img, flow
    )


def _fwd(img, flow, band_f):
    return _guarded_core(img, flow, band_f), (img, flow)


def _bwd(res, g):
    img, flow = res
    _, vjp = jax.vjp(lambda i, f: warp_ref.backward_warp(i, f), img, flow)
    return vjp(g) + (jnp.zeros(()),)


_guarded_core.defvjp(_fwd, _bwd)


@jax.custom_vjp
def _unguarded_core(img: jnp.ndarray, flow: jnp.ndarray):
    """The banded kernel with NO runtime guard (ops.unguarded_warps): the
    caller checks the returned flow bound host-side. Custom VJP = XLA warp
    (correct in band, where callers keep it)."""
    return _pallas_dispatch(img, flow)(img, flow)


def _ug_fwd(img, flow):
    return _unguarded_core(img, flow), (img, flow)


def _ug_bwd(res, g):
    img, flow = res
    _, vjp = jax.vjp(lambda i, f: warp_ref.backward_warp(i, f), img, flow)
    return vjp(g)


_unguarded_core.defvjp(_ug_fwd, _ug_bwd)


def backward_warp_pallas(img: jnp.ndarray, flow: jnp.ndarray, in_band=None,
                         unguarded: bool = False) -> jnp.ndarray:
    """(B, H, W, C) x (B, H, W, 2) → (B, H, W, C); grid_sample parity.

    The kernel is exact within its |v| ≤ 128, |u| ≤ 128 band (see module
    docstring); a runtime max-|flow| guard routes out-of-band batches to the
    XLA gather (ops/warp.py), so arbitrary-magnitude flows are always correct
    — fast motion at 1080p degrades to the slower exact path instead of
    silently contributing zeros. Also falls back statically for planes too
    large to hold in VMEM. The flow is always f32 (sample positions lose
    whole pixels in bf16); images may be f32 or bf16.

    :param in_band: optional precomputed scalar bool asserting
        max|flow| ≤ 128. Callers that already know a bound (e.g. the model
        bounds all its derived flows by two cheap reduces over the raw bf16
        network outputs — models/superslomo.py) pass it to skip the
        per-call 40 MB reduce.
    """
    flow = flow.astype(jnp.float32)
    if _pallas_dispatch(img, flow) is None:
        return warp_ref.backward_warp(img, flow)
    if unguarded:
        return _unguarded_core(img, flow)
    if in_band is None:
        in_band = jnp.max(jnp.abs(flow)) <= jnp.asarray(_MAX_FLOW, flow.dtype)
    return _guarded_core(img, flow, jnp.asarray(in_band, jnp.float32))
