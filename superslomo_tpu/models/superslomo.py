"""The composite SuperSloMo / SuperSloMo-R model (layer L2).

Capabilities of the reference ``FullModel`` (scripts/models/superslomo_r.py:
33-293): pair adjacent frames, run the stage-1 flow U-Net over all
interpolation windows, build the stage-2 physics inputs at the sampled t,
run the stage-2 refinement U-Net (with optional cross-stage skip), and
produce the interpolated image per window. Plain SuperSloMo is the special
case BOTTLENECK=CONV, N_FRAMES=2 (superslomo_r.py:256) — exactly as here.

TPU-native differences:
* window loops (superslomo_r.py:167-178, :215-239) are vmap/fold-into-batch;
* ``interpolate_multi_t`` computes stage-1 flow ONCE per pair and folds an
  entire t-grid into the batch for stage-2 — replacing the reference eval
  protocol of 7 (or 31) full forward passes per batch
  (evaluate_interpolation_results.py:234-242) with a single jitted program;
* recurrent bottleneck state can be carried across clips (``rnn_carry``) for
  streaming long videos.

Loss computation lives in models/losses.py (the reference embeds it in
forward; keeping the model a pure tensor→tensor function is what lets the
same apply() serve train, eval, and the fused multi-t path).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from superslomo_tpu.config import ModelSpec
from superslomo_tpu.models import physics
from superslomo_tpu.models.unet import UNet


def make_pairs(frames: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, 3) frames → (B, T-1, H, W, 6) adjacent-pair windows
    (reference get_image_pairs, superslomo_r.py:90-106)."""
    return jnp.concatenate([frames[:, :-1], frames[:, 1:]], axis=-1)


def _broadcast_t(t_interp: jnp.ndarray, n_windows: int) -> jnp.ndarray:
    """Normalize t_interp to (B, T-1, 1, 1, 1). Accepts (B, T-1),
    (B, T-1, 1, 1, 1) (the reference's shape), or a scalar."""
    t = jnp.asarray(t_interp)
    if t.ndim == 0:
        return t  # scalar broadcasts everywhere
    if t.ndim == 2:
        return t[:, :, None, None, None]
    if t.ndim == 5:
        return t
    raise ValueError(f"t_interp must be scalar, (B,T-1) or (B,T-1,1,1,1); got {t.shape}")


class ModelOutputs(NamedTuple):
    """Everything downstream consumers (losses, eval, viz) need."""

    image_pairs: jnp.ndarray  # (B, T-1, H, W, 6)
    flowC_out: jnp.ndarray  # (B, T-1, H, W, 4) stage-1 bidirectional flow
    flowI_in: jnp.ndarray  # (B, T-1, H, W, 16)
    flowI_out: jnp.ndarray  # (B, T-1, H, W, 5)
    pred_images: jnp.ndarray  # (B, T-1, H, W, 3) interpolated frames
    t_interp: jnp.ndarray  # (B, T-1, 1, 1, 1) (or scalar)
    rnn_carry: Any  # {stage1:…, stage2:…} or None


class Intermediates(NamedTuple):
    """The reference's inference-time tuple-of-7 for the mid window
    (superslomo_r.py:108-150)."""

    flowC_01: jnp.ndarray
    flowC_10: jnp.ndarray
    est_flow_t1: jnp.ndarray
    est_flow_t0: jnp.ndarray
    refined_flow_t1: jnp.ndarray
    refined_flow_t0: jnp.ndarray
    v_0t: jnp.ndarray


class SuperSloMo(nn.Module):
    """Two-stage Super SloMo over T-frame windows."""

    spec: ModelSpec

    def setup(self):
        dtype = jnp.bfloat16 if self.spec.compute_dtype == "bfloat16" else jnp.float32
        clstm = dict(
            clstm_merge=self.spec.clstm_merge.lower(),
            clstm_gate_order=self.spec.clstm_gate_order.lower(),
        )
        # Rematerialization: recompute each U-Net's activations in the
        # backward pass instead of keeping them live (jax.checkpoint) —
        # unlocks batch>=8 at 352² per chip ([TPU] REMAT).
        unet_cls = nn.remat(UNet) if self.spec.remat else UNet
        self.stage1 = unet_cls(
            out_channels=4,
            bottleneck=self.spec.stage1_bottleneck,
            emit_encoding=self.spec.cross_skip,
            dtype=dtype,
            name="stage1",
            **clstm,
        )
        self.stage2 = unet_cls(
            out_channels=5,
            bottleneck=self.spec.stage2_bottleneck,
            accept_encoding=self.spec.cross_skip,
            dtype=dtype,
            name="stage2",
            **clstm,
        )

    # ------------------------------------------------------------------ #
    def __call__(
        self,
        frames: jnp.ndarray,
        t_interp: jnp.ndarray,
        rnn_carry: Optional[dict] = None,
    ) -> ModelOutputs:
        """Forward over all windows (training & single-t inference).

        :param frames: (B, T, H, W, 3) normalized frames, T = N_FRAMES.
        :param t_interp: per-window interpolation instants in (0, 1);
            (B, T-1) or the reference's (B, T-1, 1, 1, 1).
        :param rnn_carry: optional recurrent-bottleneck state from a previous
            clip, as returned in ModelOutputs.rnn_carry.
        """
        pairs = make_pairs(frames)
        t = _broadcast_t(t_interp, pairs.shape[1])
        B, W_n = pairs.shape[:2]

        carry1 = rnn_carry.get("stage1") if rnn_carry else None
        carry2 = rnn_carry.get("stage2") if rnn_carry else None

        flowC_out, encoding, carry1_out = self.stage1(pairs, rnn_carry=carry1)
        flowC_out = flowC_out.astype(jnp.float32)

        # Physics over the window axis: fold windows into the batch (NOT a
        # vmap) so the warps see one big (B·W_n)-batch — bigger kernels, and
        # the shard_map SPMD warp (parallel/warp_spmd.py) composes with a
        # plain batch dimension where it cannot with a vmapped one.
        fold = lambda x: x.reshape((B * W_n,) + x.shape[2:])
        unfold = lambda x: x.reshape((B, W_n) + x.shape[1:])
        t_f = t if jnp.ndim(t) == 0 else fold(t)
        wd = jnp.bfloat16 if self.spec.compute_dtype == "bfloat16" else None
        flowI_in = unfold(
            physics.compute_stage2_inputs(
                fold(pairs), fold(flowC_out), t_f, warp_dtype=wd
            )
        )

        flowI_out, _, carry2_out = self.stage2(
            flowI_in, cross_encoding=encoding, rnn_carry=carry2
        )
        flowI_out = flowI_out.astype(jnp.float32)

        pred_images = unfold(
            physics.compute_output_image(
                fold(pairs), fold(flowI_in), fold(flowI_out), t_f
            )
        )

        carry_out = None
        if carry1_out is not None or carry2_out is not None:
            carry_out = {"stage1": carry1_out, "stage2": carry2_out}

        return ModelOutputs(pairs, flowC_out, flowI_in, flowI_out, pred_images, t, carry_out)

    # ------------------------------------------------------------------ #
    def interpolate_multi_t(
        self,
        frames: jnp.ndarray,
        t_values: jnp.ndarray,
        rnn_carry: Optional[dict] = None,
    ) -> jnp.ndarray:
        """The fused multi-t interpolation step (the "8x slow-mo" path).

        Computes stage-1 flow once per pair, then folds the whole t-grid into
        the batch for the physics + stage-2 U-Net, all inside one jitted
        program. Replaces the reference's per-t full forwards
        (evaluate_interpolation_results.py:234-242).

        :param frames: (B, T, H, W, 3) normalized frames.
        :param t_values: (n_t,) interpolation instants in (0, 1).
        :returns: (B, n_t, H, W, 3) mid-window interpolations, one per t.
        """
        pairs = make_pairs(frames)
        B, W_n, H, W_, C = pairs.shape
        n_t = t_values.shape[0]

        carry1 = rnn_carry.get("stage1") if rnn_carry else None
        flowC_out, encoding, _ = self.stage1(pairs, rnn_carry=carry1)
        flowC_out = flowC_out.astype(jnp.float32)

        # Fold the t-grid into the batch axis, SAMPLE-major: (B*n_t, T-1,
        # ...). Keeping the original batch as the leading-dim major order
        # preserves a batch sharding across the reshape (no resharding at
        # the shard_map warp boundary under a data-parallel mesh).
        def tile(x):
            return jnp.broadcast_to(
                x[:, None], (B, n_t) + x.shape[1:]
            ).reshape((B * n_t,) + x.shape[1:])

        pairs_t = tile(pairs)
        flow_t = tile(flowC_out)
        enc_t = tile(encoding) if encoding is not None else None
        # t for sample b*n_t + k, window w is t_values[k]
        t = jnp.tile(t_values, B).reshape(B * n_t, 1, 1, 1, 1)
        t = jnp.broadcast_to(t, (B * n_t, W_n, 1, 1, 1))

        fold = lambda x: x.reshape((B * n_t * W_n,) + x.shape[2:])
        wd = jnp.bfloat16 if self.spec.compute_dtype == "bfloat16" else None
        flowI_in = physics.compute_stage2_inputs(
            fold(pairs_t), fold(flow_t), fold(t), warp_dtype=wd
        ).reshape(B * n_t, W_n, H, W_, 16)

        carry2 = rnn_carry.get("stage2") if rnn_carry else None
        flowI_out, _, _ = self.stage2(flowI_in, cross_encoding=enc_t, rnn_carry=carry2)
        flowI_out = flowI_out.astype(jnp.float32)

        mid = W_n // 2
        pred = physics.compute_output_image(
            pairs_t[:, mid], flowI_in[:, mid], flowI_out[:, mid], t[:, mid]
        )
        return pred.reshape(B, n_t, H, W_, 3)


def intermediates_for_window(outputs: ModelOutputs, window: int) -> Intermediates:
    """The reference's inference intermediates for one window
    (superslomo_r.py:108-150): stage-1 flows, estimated flows, refined flows,
    and the visibility map v_0t."""
    flowC = outputs.flowC_out[:, window]
    flowI_in = outputs.flowI_in[:, window]
    flowI_out = outputs.flowI_out[:, window]
    ref_t1, ref_t0 = physics.refined_flows(flowI_in, flowI_out)
    s2 = physics.extract_stage2_outputs(flowI_out)
    return Intermediates(
        flowC_01=flowC[..., 0:2],
        flowC_10=flowC[..., 2:4],
        est_flow_t1=flowI_in[..., 6:8],
        est_flow_t0=flowI_in[..., 8:10],
        refined_flow_t1=ref_t1,
        refined_flow_t0=ref_t0,
        v_0t=s2.v_0t,
    )


def mid_window(outputs: ModelOutputs) -> int:
    """Reference mid-window convention: T_windows // 2 (superslomo_r.py:270)."""
    return outputs.pred_images.shape[1] // 2


def forward_inference(model, params, frames, t_interp, rnn_carry=None):
    """Reference-shaped inference API: returns
    ``(est_img_t, Intermediates, rnn_carry)`` for the mid window
    (superslomo_r.py:245-248)."""
    outputs = model.apply(params, frames, t_interp, rnn_carry)
    mid = mid_window(outputs)
    return outputs.pred_images[:, mid], intermediates_for_window(outputs, mid), outputs.rnn_carry
