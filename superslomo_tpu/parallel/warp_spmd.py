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
being weight-masked, which yields the same output. The wrapper is fully
differentiable — ``ppermute``'s transpose routes halo-row gradients back to
the owning shard automatically, and the inner warp brings its own VJP.

Requirements: batch divisible by the ``data`` axis size and height divisible
by the ``spatial`` axis size (the trainer's mesh construction guarantees
both).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from superslomo_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS
from superslomo_tpu.ops.warp_pallas import _BAND

# Vertical reach of the banded kernel: |v| ≤ _BAND rows plus the y0+1 tap,
# rounded up to the 8-sublane tile.
_HALO_ROWS = _BAND + 8


def _inner_warp(img: jnp.ndarray, flow: jnp.ndarray, in_band=None) -> jnp.ndarray:
    """Per-shard warp: Pallas kernel on TPU (with its own out-of-band
    guard), XLA gather elsewhere — same selection as ops.warp_auto."""
    from superslomo_tpu import ops as _ops
    from superslomo_tpu.ops import warp as warp_mod

    use = _ops._PALLAS_WARP_OVERRIDE
    if use is None:
        use = jax.default_backend() == "tpu"
    return warp_mod.backward_warp(img, flow, use_pallas=bool(use), in_band=in_band)


def warp_sharded(img: jnp.ndarray, flow: jnp.ndarray, mesh: Mesh, in_band=None) -> jnp.ndarray:
    """(B, H, W, C) x (B, H, W, 2) → (B, H, W, C) under the mesh.

    B is sharded over ``data``; H over ``spatial`` (halo exchange when the
    spatial axis is non-trivial). ``in_band``: optional replicated scalar
    bool (see ops.warp_auto).
    """
    if img.ndim != 4 or flow.ndim != 4 or flow.shape[-1] != 2:
        raise ValueError(f"bad shapes img={img.shape} flow={flow.shape}")
    n_spatial = mesh.shape[SPATIAL_AXIS]
    spec = P(DATA_AXIS, SPATIAL_AXIS)

    def body(im, fl, *band):
        band = band[0].reshape(()) if band else None
        if n_spatial == 1:
            return _inner_warp(im, fl, band)
        # One-hop halo: vertical reach is min(_HALO_ROWS, local height).
        # Real spatially-sharded deployments (720p+ over ≤4 shards) keep the
        # full ±128-row band; only tiny test shapes clamp below it.
        hv = min(_HALO_ROWS, im.shape[1])
        # Shard i's extended image = [shard i-1 bottom rows | local | shard
        # i+1 top rows]; ppermute zero-fills the global top/bottom edges.
        from_above = jax.lax.ppermute(
            im[:, -hv:], SPATIAL_AXIS, [(i, i + 1) for i in range(n_spatial - 1)]
        )
        from_below = jax.lax.ppermute(
            im[:, :hv], SPATIAL_AXIS, [(i + 1, i) for i in range(n_spatial - 1)]
        )
        ext = jnp.concatenate([from_above, im, from_below], axis=1)
        # Output row y (local) lives at ext row y + hv and samples ext row
        # y + hv + v — i.e. the plain warp of ext with the flow shifted down
        # by hv rows (pad values are irrelevant: those outputs are cropped).
        fl_ext = jnp.pad(fl, ((0, 0), (hv, hv), (0, 0), (0, 0)))
        out = _inner_warp(ext, fl_ext, band)
        return out[:, hv : hv + im.shape[1]]

    args = (img, flow.astype(jnp.float32))  # positions are always f32
    in_specs = (spec, spec)
    if in_band is not None:
        args = args + (jnp.asarray(in_band).reshape(1),)
        in_specs = in_specs + (P(),)
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=spec, check_vma=False
    )(*args)


def warp_multiflow_sharded(img, flows, mesh: Mesh, in_band=None):
    """(B, H, W, C) x (B, n, H, W, 2) under the mesh: B over ``data``, image
    rows over ``spatial`` with the same one-hop halo as warp_sharded."""
    n_spatial = mesh.shape[SPATIAL_AXIS]
    img_spec = P(DATA_AXIS, SPATIAL_AXIS)
    flow_spec = P(DATA_AXIS, None, SPATIAL_AXIS)

    def _inner(im, fl, band):
        from superslomo_tpu import ops as _ops

        use = _ops._PALLAS_WARP_OVERRIDE
        if use is None:
            use = jax.default_backend() == "tpu"
        if use:
            from superslomo_tpu.ops.warp_pallas import backward_warp_multiflow

            return backward_warp_multiflow(im, fl, in_band=band)
        B, n, H, W, _ = fl.shape
        C = im.shape[-1]
        tiled = jnp.broadcast_to(im[:, None], (B, n, H, W, C)).reshape(-1, H, W, C)
        from superslomo_tpu.ops import warp as warp_mod

        return warp_mod.backward_warp(tiled, fl.reshape(-1, H, W, 2)).reshape(
            B, n, H, W, C
        )

    def body(im, fl, *band):
        band = band[0].reshape(()) if band else None
        if n_spatial == 1:
            return _inner(im, fl, band)
        hv = min(_HALO_ROWS, im.shape[1])
        from_above = jax.lax.ppermute(
            im[:, -hv:], SPATIAL_AXIS, [(i, i + 1) for i in range(n_spatial - 1)]
        )
        from_below = jax.lax.ppermute(
            im[:, :hv], SPATIAL_AXIS, [(i + 1, i) for i in range(n_spatial - 1)]
        )
        ext = jnp.concatenate([from_above, im, from_below], axis=1)
        fl_ext = jnp.pad(fl, ((0, 0), (0, 0), (hv, hv), (0, 0), (0, 0)))
        out = _inner(ext, fl_ext, band)
        return out[:, :, hv : hv + im.shape[1]]

    args = (img, flows.astype(jnp.float32))
    in_specs = (img_spec, flow_spec)
    if in_band is not None:
        args = args + (jnp.asarray(in_band).reshape(1),)
        in_specs = in_specs + (P(),)
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=flow_spec, check_vma=False
    )(*args)
