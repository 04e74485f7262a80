"""Primitive network blocks (reference: scripts/models/layers.py).

NHWC, flax.linen. The conv block is Conv + LeakyReLU(0.1) with bias, exactly
the reference ``conv()`` factory (layers.py:21-33). Param names are chosen so
a ported PyTorch checkpoint maps 1:1 (see training/checkpoint.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ConvLReLU(nn.Module):
    """3x3/5x5/7x7 same-padding conv with bias + LeakyReLU(0.1)."""

    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=((p, p), (p, p)),
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.leaky_relu(x, negative_slope=0.1)


class FinalConv(nn.Module):
    """Plain 3x3 conv head, no activation (reference layers final_conv,
    flow_computation.py:145-153)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)


def make_norm_layer(norm_type: str, features: int, gn_groups: int = 32):
    """Normalization factory (reference layers.py:9-18). The shipped model
    family never instantiates a normed block; provided for capability
    parity with ``conv_norm``."""
    if norm_type.lower() == "bn":
        return nn.BatchNorm(use_running_average=True)
    if norm_type.lower() == "gn":
        return nn.GroupNorm(num_groups=gn_groups)
    raise ValueError(f"Not supported normalization layer type: {norm_type}")


class ConvNormReLU(nn.Module):
    """conv + norm + ReLU (reference conv_norm, layers.py:36-57; unused by
    the shipped configs)."""

    features: int
    kernel: int = 3
    norm_type: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=((p, p), (p, p)), dtype=self.dtype, name="conv")(x)
        x = make_norm_layer(self.norm_type, self.features)(x)
        return nn.relu(x)


class PredictFlow(nn.Module):
    """2-channel 3x3 flow head (reference predict_flow, layers.py:123-124)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)


class Deconv(nn.Module):
    """4x4 stride-2 transposed conv (reference deconv, layers.py:127-130;
    the shipped model upsamples bilinearly instead)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                padding="SAME", dtype=self.dtype, name="conv")(x)
