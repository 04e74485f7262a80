"""The Super SloMo interpolation "physics": arbitrary-t flow interpolation,
visibility extraction, and the final occlusion-aware blend.

Formulas from Jiang et al. (CVPR 2018) as implemented by the reference
(scripts/models/flow_interpolation.py:338-429). All tensors NHWC; ``t`` may
be a scalar or a (B, 1, 1, 1) per-sample tensor, broadcast as in the
reference where t arrives as B 1 1 1 slices of the B T-1 1 1 1 t_interp
tensor (superslomo_r.py:171-175).

Channel layout of the 16-channel stage-2 input (flow_interpolation.py:364-367):
  [ img1(0:3) | g(img1, F̂_t1)(3:6) | F̂_t1(6:8) | F̂_t0(8:10)
    | g(img0, F̂_t0)(10:13) | img0(13:16) ]
and of the 5-channel stage-2 output (flow_interpolation.py:374-392):
  [ visibility logit V_1t(0) | ΔF_t1(1:3) | ΔF_t0(3:5) ]
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from superslomo_tpu.ops import warp_auto as backward_warp


def interpolate_flows(flow_pred: jnp.ndarray, t) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Arbitrary-t intermediate flow estimates from bidirectional flow.

    F̂_t0 = -(1-t)·t·F_01 + t²·F_10
    F̂_t1 = (1-t)²·F_01 - t·(1-t)·F_10
    (flow_interpolation.py:353-356)

    :param flow_pred: (B, H, W, 4) stage-1 output, channels [F_01 | F_10].
    :returns: (est_flow_t0, est_flow_t1), each (B, H, W, 2).
    """
    flow_01 = flow_pred[..., 0:2]
    flow_10 = flow_pred[..., 2:4]
    est_flow_t0 = -(1.0 - t) * t * flow_01 + (t * t) * flow_10
    est_flow_t1 = (1.0 - t) * (1.0 - t) * flow_01 - t * (1.0 - t) * flow_10
    return est_flow_t0, est_flow_t1


def compute_stage2_inputs(
    img_pair: jnp.ndarray, flow_pred: jnp.ndarray, t, warp_dtype=None, in_band=None
) -> jnp.ndarray:
    """Build the 16-channel stage-2 input tensor (flow_interpolation.py:338-372).

    :param img_pair: (B, H, W, 6) = [img0 | img1] channel concat.
    :param flow_pred: (B, H, W, 4) stage-1 flow output.
    :param t: scalar or (B, 1, 1, 1).
    :param warp_dtype: optional reduced dtype (bf16) for the two warps.
        These warped images feed ONLY the stage-2 U-Net, which computes in
        that dtype anyway — so quantizing at the warp costs no quality while
        halving the gather bandwidth (flow/position math stays f32 inside
        the warp). The final-image warps (compute_output_image) are NOT
        reduced.
    """
    est_flow_t0, est_flow_t1 = interpolate_flows(flow_pred, t)
    img_0 = img_pair[..., 0:3]
    img_1 = img_pair[..., 3:6]
    if warp_dtype is not None and jnp.dtype(warp_dtype) != img_pair.dtype:
        wd = jnp.dtype(warp_dtype)
        warped_img_1t = backward_warp(
            img_1.astype(wd), est_flow_t1, in_band=in_band
        ).astype(img_pair.dtype)
        warped_img_0t = backward_warp(
            img_0.astype(wd), est_flow_t0, in_band=in_band
        ).astype(img_pair.dtype)
    else:
        warped_img_1t = backward_warp(img_1, est_flow_t1, in_band=in_band)
        warped_img_0t = backward_warp(img_0, est_flow_t0, in_band=in_band)
    return jnp.concatenate(
        [img_1, warped_img_1t, est_flow_t1, est_flow_t0, warped_img_0t, img_0],
        axis=-1,
    )


class Stage2Outputs(NamedTuple):
    v_1t: jnp.ndarray  # (B, H, W, 1) visibility of frame 1 at t, in (0, 1)
    dflow_t1: jnp.ndarray  # (B, H, W, 2) residual flow t→1
    dflow_t0: jnp.ndarray  # (B, H, W, 2) residual flow t→0
    v_0t: jnp.ndarray  # (B, H, W, 1) = 1 - v_1t


def extract_stage2_outputs(output_tensor: jnp.ndarray) -> Stage2Outputs:
    """Split the raw 5-channel stage-2 output (flow_interpolation.py:374-392)."""
    v_1t = jnp.asarray(output_tensor[..., 0:1])
    v_1t = 1.0 / (1.0 + jnp.exp(-v_1t))  # sigmoid
    dflow_t1 = output_tensor[..., 1:3]
    dflow_t0 = output_tensor[..., 3:5]
    return Stage2Outputs(v_1t, dflow_t1, dflow_t0, 1.0 - v_1t)


def compute_output_image_from_flows(
    img_pair: jnp.ndarray,
    est_flow_t1: jnp.ndarray,
    est_flow_t0: jnp.ndarray,
    stage2_output: jnp.ndarray,
    t,
    in_band=None,
) -> jnp.ndarray:
    """Refine flows, warp both frames, and blend with visibility weights.

    Î_t = ((1-t)·V_0t·g(I_0, F_t0) + t·V_1t·g(I_1, F_t1))
          / ((1-t)·V_0t + t·V_1t)
    (flow_interpolation.py:394-429; no epsilon in the denominator — the
    sigmoid keeps it strictly positive, and we preserve the reference's
    numerics for parity.) The est flows arrive as separate f32 tensors so
    the stage-2 U-Net input can live in bf16 without quantizing the flows
    the final image is sampled with.
    """
    img_0 = img_pair[..., 0:3]
    img_1 = img_pair[..., 3:6]

    outs = extract_stage2_outputs(stage2_output)
    pred_flow_t1 = est_flow_t1 + outs.dflow_t1
    pred_flow_t0 = est_flow_t0 + outs.dflow_t0

    pred_img_0t = backward_warp(img_0, pred_flow_t0, in_band=in_band) * outs.v_0t
    pred_img_1t = backward_warp(img_1, pred_flow_t1, in_band=in_band) * outs.v_1t

    weighted_sum = (1.0 - t) * pred_img_0t + t * pred_img_1t
    normalization = (1.0 - t) * outs.v_0t + t * outs.v_1t
    return weighted_sum / normalization


def compute_output_image(
    img_pair: jnp.ndarray,
    stage2_input: jnp.ndarray,
    stage2_output: jnp.ndarray,
    t,
) -> jnp.ndarray:
    """Reference-shaped variant reading the est flows from the 16-channel
    stage-2 input (flow_interpolation.py:394-429)."""
    return compute_output_image_from_flows(
        img_pair,
        stage2_input[..., 6:8],
        stage2_input[..., 8:10],
        stage2_output,
        t,
    )


def refined_flows(stage2_input: jnp.ndarray, stage2_output: jnp.ndarray):
    """(F_t1 + ΔF_t1, F_t0 + ΔF_t0) — used by intermediates/visualization
    (superslomo_r.py:139-140)."""
    outs = extract_stage2_outputs(stage2_output)
    return (
        stage2_input[..., 6:8] + outs.dflow_t1,
        stage2_input[..., 8:10] + outs.dflow_t0,
    )
