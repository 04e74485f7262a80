"""Data pipeline (layer L3): dataset readers, transforms, and a
device-prefetching loader.

Replaces the reference's torch DataLoader stack (scripts/utils/dataset.py,
scripts/utils/dataloaders/*) with a torch-free NHWC pipeline: numpy
transforms, a thread-pool batch producer, and double-buffered device_put
prefetch feeding TPU HBM.
"""

from superslomo_tpu.data.readers import get_dataset  # noqa: F401
from superslomo_tpu.data.pipeline import Loader, prefetch_to_device  # noqa: F401
