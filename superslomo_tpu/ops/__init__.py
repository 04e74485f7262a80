"""TPU-native tensor ops for superslomo_tpu (layer L0).

Replaces the reference's torch/cuDNN primitives (reference:
scripts/models/layers.py) with XLA-friendly NHWC equivalents, plus Pallas
kernels for the hot backward-warp path.
"""

import contextlib

from superslomo_tpu.ops.warp import backward_warp  # noqa: F401
from superslomo_tpu.ops.pooling import avg_pool_2x2  # noqa: F401
from superslomo_tpu.ops.prepare import (  # noqa: F401
    prepare_inference_params,
    with_prepared,
)
from superslomo_tpu.ops.resize import upsample_2x_bilinear  # noqa: F401

_PALLAS_WARP_OVERRIDE = None  # None = AUTO (TPU → Pallas kernel)
_WARP_MESH = None  # set inside sharded step bodies via warp_mesh()
_GUARD_DISABLED = False  # set inside unguarded_warps()


def set_pallas_warp(enabled):
    """Force (True/False) or restore AUTO (None) selection of the Pallas
    warp kernel. AUTO uses the kernel on TPU, with a runtime max-|flow|
    guard falling back to the XLA gather out of band."""
    global _PALLAS_WARP_OVERRIDE
    _PALLAS_WARP_OVERRIDE = enabled


def apply_warp_config(cfg) -> None:
    """Apply the [TPU] USE_PALLAS_WARP config knob (AUTO | TRUE | FALSE) —
    called by the drivers (Trainer/Evaluator/Interpolator) so .ini files
    control kernel selection without code changes."""
    mode = cfg.get("TPU", "USE_PALLAS_WARP").strip().upper()
    if mode == "AUTO":
        set_pallas_warp(None)
    elif mode in ("TRUE", "FALSE"):
        set_pallas_warp(mode == "TRUE")
    else:
        raise ValueError(f"[TPU] USE_PALLAS_WARP must be AUTO/TRUE/FALSE, got {mode!r}")


@contextlib.contextmanager
def warp_mesh(mesh):
    """Route every warp traced inside this context through the shard_map
    halo-exchange wrapper (parallel/warp_spmd.py) over ``mesh``.

    Enter it INSIDE the traced step function (the body runs at trace time),
    so only the sharded program picks it up — e.g. the trainer's jitted
    step — while ordinary single-device forwards keep the plain kernel:

        def train_step(...):
            with ops.warp_mesh(self.mesh):
                ...
    """
    global _WARP_MESH
    prev = _WARP_MESH
    _WARP_MESH = mesh
    try:
        yield
    finally:
        _WARP_MESH = prev


@contextlib.contextmanager
def unguarded_warps():
    """Trace warps WITHOUT the in-band lax.cond guard.

    The cond itself is expensive on TPU (~7 ms of conditional operand
    copies per 720p warp group — more than the kernel), so the fast
    inference path traces unguarded kernels and instead RETURNS the flow
    bound to the host (SuperSloMo.interpolate_multi_t(..., with_bounds=
    True)); the caller checks it off the critical path and reruns the rare
    out-of-band batch through the guarded program
    (eval/evaluate_interpolation.py). Exactness is preserved at the
    protocol level; only callers that implement the check may use this."""
    global _GUARD_DISABLED
    prev = _GUARD_DISABLED
    _GUARD_DISABLED = True
    try:
        yield
    finally:
        _GUARD_DISABLED = prev


def warp_multiflow(img, flows, in_band=None):
    """(B, H, W, C) x (B, n, H, W, 2) → (B, n, H, W, C): one image warped by
    n flow fields. On TPU the Pallas kernel shares one VMEM copy of the
    image planes across all n warps (the fused multi-t step's shape); on
    CPU it is the tiled XLA gather."""
    import jax
    import jax.numpy as jnp

    if _WARP_MESH is not None:
        from superslomo_tpu.parallel.warp_spmd import warp_multiflow_sharded

        return warp_multiflow_sharded(
            img, flows, _WARP_MESH, in_band=in_band, unguarded=_GUARD_DISABLED
        )
    use = _PALLAS_WARP_OVERRIDE
    if use is None:
        use = jax.default_backend() == "tpu"
    if use:
        from superslomo_tpu.ops.warp_pallas import backward_warp_multiflow

        return backward_warp_multiflow(img, flows, in_band=in_band,
                                       unguarded=_GUARD_DISABLED)
    B, n, H, W, _ = flows.shape
    C = img.shape[-1]
    tiled = jnp.broadcast_to(img[:, None], (B, n, H, W, C)).reshape(B * n, H, W, C)
    out = backward_warp(tiled, flows.reshape(B * n, H, W, 2))
    return out.reshape(B, n, H, W, C)


def warp_multiflow_planar(planes, u, v, out_dtype=None):
    """Planar multi-flow warp: (B, C, H, W) image planes x (B, n, H, W) f32
    u/v → (B, C, n, H, W) ``out_dtype`` (default f32).

    The planar layout keeps every (H, W) plane perfectly tiled on the TPU's
    (8, 128) vregs — the channel-minor API pays layout copies slicing u/v
    out of (..., 2) tensors and transposing outputs back. ALWAYS unguarded:
    callers follow the host-checked-bound protocol (the fused multi-t
    epilogue, models/superslomo.py). Not mesh-routed — the sharded eval
    path uses the channel-minor wrappers (parallel/warp_spmd.py).

    ``out_dtype``: accumulation/interpolation is always f32; a bf16
    out_dtype moves the consumer's astype into the kernel's store (same
    values bit-for-bit, half the output HBM traffic) — used for the
    stage-2 input warps, whose consumer convs are bf16."""
    import jax
    import jax.numpy as jnp

    if out_dtype is None:
        out_dtype = jnp.float32
    use = _PALLAS_WARP_OVERRIDE
    if use is None:
        use = jax.default_backend() == "tpu"
    if use:
        from superslomo_tpu.ops.warp_pallas import backward_warp_multiflow_planar

        return backward_warp_multiflow_planar(planes, u, v, out_dtype=out_dtype)
    B, C, H, W = planes.shape
    n = u.shape[1]
    img = planes.transpose(0, 2, 3, 1)
    flows = jnp.stack([u, v], axis=-1).astype(jnp.float32)
    tiled = jnp.broadcast_to(img[:, None], (B, n, H, W, C)).reshape(B * n, H, W, C)
    out = backward_warp(tiled, flows.reshape(B * n, H, W, 2)).reshape(B, n, H, W, C)
    return out.transpose(0, 4, 1, 2, 3).astype(out_dtype)


def warp_auto(img, flow, in_band=None):
    """Backward warp with platform- and mesh-appropriate kernel selection.

    ``in_band``: optional precomputed scalar bool asserting max|flow| ≤ 128
    (skips the Pallas guard's per-call reduce; see warp_pallas)."""
    import jax

    if _WARP_MESH is not None:
        from superslomo_tpu.parallel.warp_spmd import warp_sharded

        return warp_sharded(
            img, flow, _WARP_MESH, in_band=in_band, unguarded=_GUARD_DISABLED
        )
    use = _PALLAS_WARP_OVERRIDE
    if use is None:
        use = jax.default_backend() == "tpu"
    if use and _GUARD_DISABLED:
        from superslomo_tpu.ops.warp_pallas import backward_warp_pallas

        return backward_warp_pallas(img, flow, unguarded=True)
    return backward_warp(img, flow, use_pallas=bool(use), in_band=in_band)
