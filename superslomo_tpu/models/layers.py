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
