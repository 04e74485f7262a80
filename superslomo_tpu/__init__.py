"""superslomo_tpu — a TPU-native Super SloMo video-interpolation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SreenivasVRao/SuperSloMo-VideoInterpolation-PyTorch (reference mounted at
/root/reference): dual flow-computation / flow-interpolation U-Nets, the
recurrent SSM-R variant (bidirectional ConvLSTM/ConvGRU bottleneck), the full
data pipeline (Adobe240fps / NFS / Vimeo / Slowflow / Sintel-HFR readers),
training with the composite reconstruction + warp + perceptual loss, and the
PSNR / SSIM / IE / EPE evaluation suites.

Nothing here is a port: layouts are NHWC, per-window Python loops become
vmap/fold-into-batch, the recurrent bottleneck is a lax.scan, the hot
backward-warp is a fused gather-bilinear kernel, and scale-out is
jax.sharding.Mesh + jit instead of torch.nn.DataParallel.
"""

__version__ = "0.1.0"

from superslomo_tpu.config import Config, load_config, default_config  # noqa: F401
