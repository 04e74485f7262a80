"""TPU-native tensor ops for superslomo_tpu (layer L0).

Replaces the reference's torch/cuDNN primitives (reference:
scripts/models/layers.py) with XLA-friendly NHWC equivalents, plus Pallas
kernels for the hot backward-warp path.
"""

from superslomo_tpu.ops.warp import backward_warp  # noqa: F401
from superslomo_tpu.ops.pooling import avg_pool_2x2  # noqa: F401
from superslomo_tpu.ops.resize import upsample_2x_bilinear  # noqa: F401
