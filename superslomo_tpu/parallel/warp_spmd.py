"""Backward warp under SPMD: a shard_map island with row-halo exchange.

``pallas_call`` carries no GSPMD partitioning rules, so inside a jit that
shards the batch/height axes the kernel must run as a per-device program.
This module wraps the warp in ``jax.shard_map`` over the (data, spatial)
mesh (parallel/mesh.py):

* batch is sharded over ``data`` — each device warps its local samples;
* height is sharded over ``spatial`` — the kernel's vertical reach is
  ±(_BAND + 1) rows (ops/warp_pallas.py), so each shard first receives a
  _HALO_ROWS-row halo from its neighbours over ICI via ``lax.ppermute``
  (the conv-halo-exchange analogue the reference never needed: its
  DataParallel replicas, scripts/main.py:74-76, never split an image).

Zero-filled halos at the global top/bottom edges reproduce grid_sample's
zeros padding exactly: an out-of-image tap gathers a zero value instead of
being weight-masked, which yields the same output.

Exactness under spatial sharding: the halo path is exact for vertical
motion up to ``halo_reach`` rows (min(kernel band, halo rows − 1)). The
guarded path therefore carries a *globally coherent* runtime guard — the
flow bound is pmax-reduced over the spatial axis so every shard takes the
same branch — whose out-of-band branch all-gathers the full image height
over ICI and runs the exact XLA warp (rare, cost accepted). The unguarded
path (ops.unguarded_warps) traces the halo path only; its caller must check
the returned flow bound against ``halo_reach`` host-side (the evaluator
does, eval/evaluate_interpolation.py).

Gradients: the guard is hidden from autodiff behind a custom VJP whose
backward pass is the halo path's XLA-warp gradient — exact within
``halo_reach`` (the band in which training operates; the same policy as the
single-device guarded kernel, ops/warp_pallas.py _guarded_core).

Requirements: batch divisible by the ``data`` axis size and height divisible
by the ``spatial`` axis size (the trainer's mesh construction guarantees
both).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from superslomo_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS
from superslomo_tpu.ops.warp_pallas import _BAND, _MAX_FLOW

# Vertical reach of the banded kernel: |v| ≤ _BAND rows plus the y0+1 tap,
# rounded up to the 8-sublane tile.
_HALO_ROWS = _BAND + 8


def halo_reach(n_spatial: int, full_h: int) -> float:
    """Max |flow| (px) for which the spatially-sharded halo warp is exact:
    the kernel band, clamped by how many neighbour rows the one-hop halo
    can supply. Callers running the unguarded fast path on a spatial mesh
    must host-check the flow bound against THIS (not the plain 128)."""
    if n_spatial <= 1:
        return float(_MAX_FLOW)
    hv = min(_HALO_ROWS, full_h // n_spatial)
    return float(min(_MAX_FLOW, hv - 1))


def _inner_warp(img, flow, in_band=None, unguarded=False):
    """Per-shard warp: Pallas kernel on TPU (with its own out-of-band
    guard unless ``unguarded``), XLA gather elsewhere — same selection as
    ops.warp_auto."""
    from superslomo_tpu import ops as _ops
    from superslomo_tpu.ops import warp as warp_mod

    use = _ops._PALLAS_WARP_OVERRIDE
    if use is None:
        use = jax.default_backend() == "tpu"
    if use:
        from superslomo_tpu.ops.warp_pallas import backward_warp_pallas

        return backward_warp_pallas(img, flow, in_band=in_band, unguarded=unguarded)
    return warp_mod.backward_warp(img, flow)


def _halo_extend(im: jnp.ndarray, hv: int, n_spatial: int) -> jnp.ndarray:
    """[shard i−1 bottom rows | local | shard i+1 top rows] over ICI;
    ppermute zero-fills the global top/bottom edges (= grid_sample zeros)."""
    from_above = jax.lax.ppermute(
        im[:, -hv:], SPATIAL_AXIS, [(i, i + 1) for i in range(n_spatial - 1)]
    )
    from_below = jax.lax.ppermute(
        im[:, :hv], SPATIAL_AXIS, [(i + 1, i) for i in range(n_spatial - 1)]
    )
    return jnp.concatenate([from_above, im, from_below], axis=1)


def _guard_pred(fl, band, reach, spatial_axis_only_max):
    """Globally coherent in-band predicate (f32 0/1): identical on every
    shard of a spatial group, so the cond's collectives stay aligned.
    A caller-supplied ``band`` (already a global max|flow| ≤ 128 check) is
    trusted only when the halo supplies the full kernel band. stop_gradient:
    the predicate (pmax has no JVP rule) must not enter the autodiff graph —
    the custom VJP downstream never differentiates it anyway."""
    if band is not None and reach >= float(_MAX_FLOW):
        return jnp.asarray(band, jnp.float32)
    fl = jax.lax.stop_gradient(fl)
    gmax = jax.lax.pmax(spatial_axis_only_max(fl), SPATIAL_AXIS)
    return (gmax <= reach).astype(jnp.float32)


def warp_sharded(img, flow, mesh: Mesh, in_band=None, unguarded=False):
    """(B, H, W, C) x (B, H, W, 2) → (B, H, W, C) under the mesh.

    B is sharded over ``data``; H over ``spatial`` (halo exchange when the
    spatial axis is non-trivial). ``in_band``: optional replicated scalar
    bool (see ops.warp_auto). ``unguarded``: trace without any runtime
    guard (caller host-checks the bound against ``halo_reach``)."""
    if img.ndim != 4 or flow.ndim != 4 or flow.shape[-1] != 2:
        raise ValueError(f"bad shapes img={img.shape} flow={flow.shape}")
    n_spatial = mesh.shape[SPATIAL_AXIS]
    spec = P(DATA_AXIS, SPATIAL_AXIS)

    def body(im, fl, *band):
        band = band[0].reshape(()) if band else None
        if n_spatial == 1:
            return _inner_warp(im, fl, band, unguarded)
        hv = min(_HALO_ROWS, im.shape[1])
        reach = float(min(_MAX_FLOW, hv - 1))
        local_h = im.shape[1]

        def halo(im, fl):
            ext = _halo_extend(im, hv, n_spatial)
            # Output row y (local) lives at ext row y + hv and samples ext
            # row y + hv + v — i.e. the plain warp of ext with the flow
            # shifted down by hv rows (pad values are irrelevant: those
            # outputs are cropped). The outer guard already established
            # in-band, so the inner kernel runs unguarded.
            fl_ext = jnp.pad(fl, ((0, 0), (hv, hv), (0, 0), (0, 0)))
            out = _inner_warp(ext, fl_ext, None, unguarded=True)
            return out[:, hv : hv + local_h]

        if unguarded:
            return halo(im, fl)

        def full(im, fl):
            # Exact fallback for |v| beyond the halo: all-gather the full
            # image height over ICI, XLA-warp it, take the local rows.
            from superslomo_tpu.ops import warp as warp_mod

            im_f = jax.lax.all_gather(im, SPATIAL_AXIS, axis=1, tiled=True)
            fl_f = jax.lax.all_gather(fl, SPATIAL_AXIS, axis=1, tiled=True)
            out = warp_mod.backward_warp(im_f, fl_f)
            off = jax.lax.axis_index(SPATIAL_AXIS) * local_h
            return jax.lax.dynamic_slice_in_dim(out, off, local_h, axis=1)

        band_f = _guard_pred(fl, band, reach, lambda f: jnp.max(jnp.abs(f)))

        @jax.custom_vjp
        def guarded(im, fl, band_f):
            return jax.lax.cond(band_f > 0.5, halo, full, im, fl)

        def g_fwd(im, fl, band_f):
            return guarded(im, fl, band_f), (im, fl)

        def g_bwd(res, g):
            im, fl = res
            _, vjp = jax.vjp(halo, im, fl)
            return vjp(g) + (jnp.zeros(()),)

        guarded.defvjp(g_fwd, g_bwd)
        return guarded(im, fl, band_f)

    args = (img, flow.astype(jnp.float32))  # positions are always f32
    in_specs = (spec, spec)
    if in_band is not None:
        args = args + (jnp.asarray(in_band).reshape(1),)
        in_specs = in_specs + (P(),)
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=spec, check_vma=False
    )(*args)


def warp_multiflow_sharded(img, flows, mesh: Mesh, in_band=None, unguarded=False):
    """(B, H, W, C) x (B, n, H, W, 2) under the mesh: B over ``data``, image
    rows over ``spatial`` with the same one-hop halo (and the same globally
    coherent guard / all-gather fallback) as warp_sharded."""
    n_spatial = mesh.shape[SPATIAL_AXIS]
    img_spec = P(DATA_AXIS, SPATIAL_AXIS)
    flow_spec = P(DATA_AXIS, None, SPATIAL_AXIS)

    def _inner(im, fl, band, inner_unguarded):
        from superslomo_tpu import ops as _ops

        use = _ops._PALLAS_WARP_OVERRIDE
        if use is None:
            use = jax.default_backend() == "tpu"
        if use:
            from superslomo_tpu.ops.warp_pallas import backward_warp_multiflow

            return backward_warp_multiflow(
                im, fl, in_band=band, unguarded=inner_unguarded
            )
        return _xla_multiflow(im, fl)

    def _xla_multiflow(im, fl):
        from superslomo_tpu.ops import warp as warp_mod

        B, n, H, W, _ = fl.shape
        C = im.shape[-1]
        tiled = jnp.broadcast_to(im[:, None], (B, n, H, W, C)).reshape(-1, H, W, C)
        return warp_mod.backward_warp(tiled, fl.reshape(-1, H, W, 2)).reshape(
            B, n, H, W, C
        )

    def body(im, fl, *band):
        band = band[0].reshape(()) if band else None
        if n_spatial == 1:
            return _inner(im, fl, band, unguarded)
        hv = min(_HALO_ROWS, im.shape[1])
        reach = float(min(_MAX_FLOW, hv - 1))
        local_h = im.shape[1]

        def halo(im, fl):
            ext = _halo_extend(im, hv, n_spatial)
            fl_ext = jnp.pad(fl, ((0, 0), (0, 0), (hv, hv), (0, 0), (0, 0)))
            out = _inner(ext, fl_ext, None, True)
            return out[:, :, hv : hv + local_h]

        if unguarded:
            return halo(im, fl)

        def full(im, fl):
            im_f = jax.lax.all_gather(im, SPATIAL_AXIS, axis=1, tiled=True)
            fl_f = jax.lax.all_gather(fl, SPATIAL_AXIS, axis=2, tiled=True)
            out = _xla_multiflow(im_f, fl_f)
            off = jax.lax.axis_index(SPATIAL_AXIS) * local_h
            return jax.lax.dynamic_slice_in_dim(out, off, local_h, axis=2)

        band_f = _guard_pred(fl, band, reach, lambda f: jnp.max(jnp.abs(f)))

        @jax.custom_vjp
        def guarded(im, fl, band_f):
            return jax.lax.cond(band_f > 0.5, halo, full, im, fl)

        def g_fwd(im, fl, band_f):
            return guarded(im, fl, band_f), (im, fl)

        def g_bwd(res, g):
            im, fl = res
            _, vjp = jax.vjp(halo, im, fl)
            return vjp(g) + (jnp.zeros(()),)

        guarded.defvjp(g_fwd, g_bwd)
        return guarded(im, fl, band_f)

    args = (img, flows.astype(jnp.float32))
    in_specs = (img_spec, flow_spec)
    if in_band is not None:
        args = args + (jnp.asarray(in_band).reshape(1),)
        in_specs = in_specs + (P(),)
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=flow_spec, check_vma=False
    )(*args)
