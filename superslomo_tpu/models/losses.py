"""Super SloMo composite training loss.

Reference semantics (scripts/models/losses.py:196-249), reproduced exactly:

* reconstruction: λ_R · per-sample-mean L1(Î_t, I_t)          (:103-111, :217)
* warp: λ_W · per-sample-mean of
    stage-1 term  L1(g(I_1, F_01), I_0) + L1(g(I_0, F_10), I_1)
    + stage-2 term L1(g(I_0, F_t0+ΔF_t0), I_t) + L1(g(I_1, F_t1+ΔF_t1), I_t)
  with each term dropped when its stage is frozen               (:113-170)
* perceptual: λ_P · per-sample-mean MSE of VGG-16 conv4_3 features (:172-181)

Returns the reference's ``[B, 4]`` per-sample tensor ordered
(total, reconstruction, warp, perceptual) (:240-249) — kept per-sample so the
data-parallel mean is exact under batch sharding, the same motivation the
reference gives for DataParallel (:235-238). Per-window losses are summed
over windows and divided by the window count (superslomo_r.py:215-240).

The stage-freeze gates are *static* Python booleans from the config, so jit
specializes the program and frozen-stage warps vanish from the graph.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from superslomo_tpu.config import ModelSpec
from superslomo_tpu.models.physics import refined_flows
from superslomo_tpu.models.superslomo import ModelOutputs
from superslomo_tpu.ops import warp_auto as backward_warp


class LossWeights(NamedTuple):
    lambda_r: float = 60.0
    lambda_w: float = 10.0
    lambda_p: float = 20.0


def _per_sample_mean(x: jnp.ndarray) -> jnp.ndarray:
    """(B, ...) → (B,) mean over all non-batch axes."""
    return x.reshape(x.shape[0], -1).mean(axis=1)


def window_losses(
    img_pair: jnp.ndarray,  # (B, H, W, 6)
    flowC_out: jnp.ndarray,  # (B, H, W, 4)
    flowI_in: jnp.ndarray,  # (B, H, W, 16)
    flowI_out: jnp.ndarray,  # (B, H, W, 5)
    pred_img: jnp.ndarray,  # (B, H, W, 3)
    target: jnp.ndarray,  # (B, H, W, 3)
    spec: ModelSpec,
    weights: LossWeights,
    vgg_apply: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Losses for one interpolation window → (B, 4)."""
    img_0 = img_pair[..., 0:3]
    img_1 = img_pair[..., 3:6]

    loss_r = weights.lambda_r * _per_sample_mean(jnp.abs(pred_img - target))

    warp = jnp.zeros((pred_img.shape[0],), pred_img.dtype)
    if not spec.stage1_freeze:
        flow_01 = flowC_out[..., 0:2]
        flow_10 = flowC_out[..., 2:4]
        warp = warp + _per_sample_mean(
            jnp.abs(backward_warp(img_1, flow_01) - img_0)
            + jnp.abs(backward_warp(img_0, flow_10) - img_1)
        )
    if not spec.stage2_freeze:
        pred_flow_t1, pred_flow_t0 = refined_flows(flowI_in, flowI_out)
        warp = warp + _per_sample_mean(
            jnp.abs(backward_warp(img_0, pred_flow_t0) - target)
            + jnp.abs(backward_warp(img_1, pred_flow_t1) - target)
        )
    loss_w = weights.lambda_w * warp

    feat_pred = vgg_apply(pred_img)
    feat_tgt = jax.lax.stop_gradient(vgg_apply(target))
    loss_p = weights.lambda_p * _per_sample_mean((feat_pred - feat_tgt) ** 2)

    total = loss_r + loss_w + loss_p
    return jnp.stack([total, loss_r, loss_w, loss_p], axis=1)  # (B, 4)


def compute_losses(
    outputs: ModelOutputs,
    targets: jnp.ndarray,  # (B, T-1, H, W, 3)
    spec: ModelSpec,
    weights: LossWeights,
    vgg_apply: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """All windows → (B, 4), averaged over windows
    (reference: superslomo_r.py:215-240).

    Windows are folded into the batch axis (not vmapped) so the loss warps
    and the VGG forward each run once at (B·W_n) batch — and the shard_map
    SPMD warp composes (it cannot live under a vmap)."""
    B, W_n = targets.shape[:2]
    fold = lambda x: x.reshape((B * W_n,) + x.shape[2:])
    per_sample = window_losses(
        fold(outputs.image_pairs),
        fold(outputs.flowC_out),
        fold(outputs.flowI_in),
        fold(outputs.flowI_out),
        fold(outputs.pred_images),
        fold(targets),
        spec,
        weights,
        vgg_apply,
    )
    return per_sample.reshape(B, W_n, 4).mean(axis=1)  # → (B, 4)
