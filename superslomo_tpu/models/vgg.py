"""VGG-16 conv4_3 feature extractor for the perceptual loss.

The reference uses frozen torchvision ``vgg16(pretrained=True).features[:23]``
(scripts/models/losses.py:12-41): ten 3x3 convs with ReLU and three 2x2
max-pools, ending after the ReLU on conv4_3. This is the same network
re-expressed in NHWC flax; parameters are named ``features_{i}`` after the
torchvision layer indices (0,2,5,7,10,12,14,17,19,21) so a converted
torchvision checkpoint maps 1:1 (see training/checkpoint.py:convert_vgg16).

The build image has no torchvision and no network egress, so pretrained
weights must be supplied as a file (.npz of the converted state_dict). When
absent we fall back to a *deterministic* random init — still a usable
multi-scale feature loss for smoke training, but published-quality parity
requires the pretrained file; the trainer logs loudly in that case.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from superslomo_tpu.ops.pooling import max_pool_2x2

# torchvision features index → out-channels; pools sit at indices 4, 9, 16.
_VGG_CONVS = ((0, 64), (2, 64), (5, 128), (7, 128), (10, 256), (12, 256),
              (14, 256), (17, 512), (19, 512), (21, 512))
_POOL_AFTER = {2, 7, 14}  # pool follows the ReLU of these conv indices


class VGG16Features(nn.Module):
    """conv1_1 .. conv4_3 (+ReLU) of VGG-16, NHWC."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for idx, feats in _VGG_CONVS:
            x = nn.Conv(
                feats, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                dtype=self.dtype, name=f"features_{idx}",
            )(x)
            x = nn.relu(x)
            if idx in _POOL_AFTER:
                x = max_pool_2x2(x)
        return x


def init_vgg_params(weights_path: str | None = None) -> dict:
    """Initialize VGG params — from a converted .npz when available, else a
    deterministic random init (seed 0)."""
    if weights_path:
        data = np.load(weights_path)
        params = {}
        for idx, feats in _VGG_CONVS:
            # torchvision keys: features.{idx}.weight (OIHW), .bias
            w = data[f"features.{idx}.weight"].transpose(2, 3, 1, 0)  # → HWIO
            b = data[f"features.{idx}.bias"]
            params[f"features_{idx}"] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
        return {"params": params}
    model = VGG16Features()
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
