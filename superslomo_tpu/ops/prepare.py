"""Build the ``prepared`` variable collection: all weight-only
transformations of the hot inference program, hoisted into one tiny jitted
pass that runs once per eval session.

Why: the polyphase S2D kernel remap (ops/s2d.py remap_kernel — zeros plus a
~K'²·16 dynamic-update-slice chain per conv) and the upconv composite fold
(ops/upconv.py fold_upsample_kernel) are functions of the *parameters
only*, but because params are jit arguments XLA cannot constant-fold them —
profiled at ~11 ms of every 720p step (resolution-independent, so ~3% of a
1080p step too). This module walks a params pytree, pre-computes those
transforms, and returns a collection the modules consume directly:

    prepared = prepare_inference_params(params)
    out = model.apply({**params, "prepared": prepared}, ...)

Bit-exactness: the S2D remap is a pure scatter, so remap(cast(w)) ==
cast(remap(w)); the upconv fold is stored in param dtype (f32) and cast at
use, exactly like the in-trace fold. Training never uses the collection
(gradients flow to the original params through the in-trace transforms).

Module-name registry (matches models/unet.py):
  S2D-form convs: conv1a/b (7x7), conv2a/b (5x5), conv10b, conv11b,
  fuse_conv, final_conv (3x3) — each holds a child scope 'conv'.
  Upconv folds:   conv7a, conv8a, conv9a, conv10a, conv11a.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from superslomo_tpu.ops.s2d import remap_kernel
from superslomo_tpu.ops.upconv import fold_upsample_kernel

_S2D_CONV_NAMES = frozenset(
    {"conv1a", "conv1b", "conv2a", "conv2b", "conv10b", "conv11b",
     "fuse_conv", "final_conv"}
)
_UPCONV_NAMES = frozenset({"conv7a", "conv8a", "conv9a", "conv10a", "conv11a"})


def _walk(node: Mapping[str, Any]) -> dict:
    out = {}
    for name, child in node.items():
        if not isinstance(child, Mapping):
            continue
        if name in _S2D_CONV_NAMES and "conv" in child and "kernel" in child["conv"]:
            w = child["conv"]["kernel"]
            Wp, _ = remap_kernel(w)
            out[name] = {
                "conv": {"kernel": Wp, "bias": jnp.tile(child["conv"]["bias"], 4)}
            }
        elif name in _UPCONV_NAMES and "conv" in child and "kernel" in child["conv"]:
            out[name] = {"kernel_folded": fold_upsample_kernel(child["conv"]["kernel"])}
        else:
            sub = _walk(child)
            if sub:
                out[name] = sub
    return out


def prepare_inference_params(params: Mapping[str, Any]) -> dict:
    """params (the ``{'params': ...}`` dict or the inner tree) → the
    ``prepared`` collection, mirroring module scopes. Jitted so the remap
    chains run once, on device, at session start."""
    tree = params.get("params", params)
    return jax.jit(_walk)(tree)


def with_prepared(params: Mapping[str, Any]) -> dict:
    """Convenience: return the full variables dict ``{'params': ...,
    'prepared': ...}`` ready for model.apply."""
    tree = params.get("params", params)
    return {"params": tree, "prepared": prepare_inference_params(params)}
