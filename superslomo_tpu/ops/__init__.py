"""TPU-native tensor ops for superslomo_tpu (layer L0).

Replaces the reference's torch/cuDNN primitives (reference:
scripts/models/layers.py) with XLA-friendly NHWC equivalents, plus Pallas
kernels for the hot backward-warp path.
"""

from superslomo_tpu.ops.warp import backward_warp  # noqa: F401
from superslomo_tpu.ops.pooling import avg_pool_2x2  # noqa: F401
from superslomo_tpu.ops.resize import upsample_2x_bilinear  # noqa: F401

_PALLAS_WARP_OVERRIDE = None  # None = AUTO (TPU → Pallas kernel)


def set_pallas_warp(enabled):
    """Force (True/False) or restore AUTO (None) selection of the Pallas
    warp kernel. The sharded multi-chip train step sets False: pallas_call
    does not yet carry SPMD partitioning rules, so the XLA gather path is
    used there."""
    global _PALLAS_WARP_OVERRIDE
    _PALLAS_WARP_OVERRIDE = enabled


def warp_auto(img, flow):
    """Backward warp with platform-appropriate kernel selection."""
    import jax

    use = _PALLAS_WARP_OVERRIDE
    if use is None:
        use = jax.default_backend() == "tpu"
    return backward_warp(img, flow, use_pallas=bool(use))
