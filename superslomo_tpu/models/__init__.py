"""Network modules (layer L1/L2): U-Nets, recurrent bottlenecks, the
composite SuperSloMo / SuperSloMo-R model, and losses."""

from superslomo_tpu.models.unet import UNet  # noqa: F401
from superslomo_tpu.models.superslomo import SuperSloMo  # noqa: F401
