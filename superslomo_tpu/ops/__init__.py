"""TPU-native tensor ops for superslomo_tpu (layer L0).

Replaces the reference's torch/cuDNN primitives (reference:
scripts/models/layers.py) with XLA-friendly NHWC equivalents, plus Pallas
kernels for the hot backward-warp path.
"""

import contextlib

from superslomo_tpu.ops.warp import backward_warp  # noqa: F401
from superslomo_tpu.ops.pooling import avg_pool_2x2  # noqa: F401
from superslomo_tpu.ops.resize import upsample_2x_bilinear  # noqa: F401

_PALLAS_WARP_OVERRIDE = None  # None = AUTO (TPU → Pallas kernel)
_WARP_MESH = None  # set inside sharded step bodies via warp_mesh()


def set_pallas_warp(enabled):
    """Force (True/False) or restore AUTO (None) selection of the Pallas
    warp kernel. AUTO uses the kernel on TPU, with a runtime max-|flow|
    guard falling back to the XLA gather out of band."""
    global _PALLAS_WARP_OVERRIDE
    _PALLAS_WARP_OVERRIDE = enabled


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


def warp_auto(img, flow):
    """Backward warp with platform- and mesh-appropriate kernel selection."""
    import jax

    if _WARP_MESH is not None:
        from superslomo_tpu.parallel.warp_spmd import warp_sharded

        return warp_sharded(img, flow, _WARP_MESH)
    use = _PALLAS_WARP_OVERRIDE
    if use is None:
        use = jax.default_backend() == "tpu"
    return backward_warp(img, flow, use_pallas=bool(use))
