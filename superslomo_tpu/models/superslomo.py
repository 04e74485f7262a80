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


def _head_fence() -> bool:
    """Trace-time A/B knob for the LAYOUT_V2 head fence (default ON).
    ``SSMTPU_NO_HEAD_FENCE=1`` disables it for controlled profiling."""
    import os

    return os.environ.get("SSMTPU_NO_HEAD_FENCE", "0") != "1"


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
        # unlocks batch>=8 at 352² per chip ([TPU] REMAT). The s2d_head /
        # input_is_s2d call flags (positions 4/5 counting self) are Python
        # statics — mark them so the lifted checkpoint doesn't trace them.
        unet_cls = nn.remat(UNet, static_argnums=(4, 5)) if self.spec.remat else UNet
        self.stage1 = unet_cls(
            out_channels=4,
            bottleneck=self.spec.stage1_bottleneck,
            emit_encoding=self.spec.cross_skip,
            dtype=dtype,
            split_decoder=self.spec.v2_split_decoder,
            name="stage1",
            **clstm,
        )
        self.stage2 = unet_cls(
            out_channels=5,
            bottleneck=self.spec.stage2_bottleneck,
            accept_encoding=self.spec.cross_skip,
            dtype=dtype,
            split_decoder=self.spec.v2_split_decoder,
            grouped_input=self.spec.v2_assembly,
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

        flowC_out, encoding, carry1_out = self.stage1(pairs, None, carry1, False, False)
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

        flowI_out, _, carry2_out = self.stage2(flowI_in, encoding, carry2, False, False)
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
        with_bounds: bool = False,
    ) -> jnp.ndarray:
        """The fused multi-t interpolation step (the "8x slow-mo" path).

        Computes stage-1 flow once per pair, then folds the whole t-grid into
        the batch for the physics + stage-2 U-Net, all inside one jitted
        program. Replaces the reference's per-t full forwards
        (evaluate_interpolation_results.py:234-242).

        :param frames: (B, T, H, W, 3) normalized frames.
        :param t_values: (n_t,) interpolation instants in (0, 1).
        :param rnn_carry: optional recurrent-bottleneck state from a prior
            ``__call__`` (batch B); the stage-2 carry is broadcast over the
            folded t-grid. This path does NOT return an updated carry —
            stateful streaming threads state through ``__call__`` and uses
            this method for the dense t-grid render.
        :param with_bounds: trace the warps WITHOUT the in-band lax.cond
            guard (whose conditional operand copies cost more than the warp
            kernels at 720p) and additionally return the max-|flow| bound
            scalar. The caller MUST check it host-side — off the critical
            path — and rerun the rare out-of-band batch through the guarded
            program (eval/evaluate_interpolation.py does this pipelined).
        :returns: (B, n_t, H, W, 3) mid-window interpolations, one per t;
            with ``with_bounds``, a ``(pred, bound)`` tuple.
        """
        if with_bounds:
            from superslomo_tpu import ops as _ops

            with _ops.unguarded_warps():
                return self._interpolate_multi_t(
                    frames, t_values, rnn_carry, with_bounds=True
                )
        return self._interpolate_multi_t(frames, t_values, rnn_carry)

    def _interpolate_multi_t(
        self, frames, t_values, rnn_carry=None, with_bounds: bool = False
    ):
        from superslomo_tpu import ops as _ops

        if with_bounds and _ops._WARP_MESH is None:
            # the production single-device fast path: planar epilogue +
            # direct-S2D stage-2 input (see _multi_t_planar). The sharded
            # (mesh) and guarded (_safe_step) paths keep the channel-minor
            # implementation below.
            return self._multi_t_planar(frames, t_values, rnn_carry)

        pairs = make_pairs(frames)
        B, W_n, H, W_, C = pairs.shape
        n_t = t_values.shape[0]
        cdt = jnp.bfloat16 if self.spec.compute_dtype == "bfloat16" else jnp.float32

        carry1 = rnn_carry.get("stage1") if rnn_carry else None
        flowC_raw, encoding, _ = self.stage1(pairs, None, carry1, False, False)
        flowC_out = flowC_raw.astype(jnp.float32)
        # One cheap reduce over the raw (compute-dtype) stage-1 flow bounds
        # EVERY derived est flow for the warp-band guard: |F̂_t0| ≤ t·M and
        # |F̂_t1| ≤ (1-t)·M for M = max|F_01, F_10| — no per-warp 40 MB
        # reduce. (The f32 flow is the exact upcast, so max matches.)
        boundC = jnp.max(jnp.abs(flowC_raw)).astype(jnp.float32)
        in_band_est = boundC <= 128.0

        # Fold the t-grid into the batch axis, SAMPLE-major: (B*n_t, T-1,
        # ...). Keeping the original batch as the leading-dim major order
        # preserves a batch sharding across the reshape (no resharding at
        # the shard_map warp boundary under a data-parallel mesh).
        def tile(x):
            return jnp.broadcast_to(
                x[:, None], (B, n_t) + x.shape[1:]
            ).reshape((B * n_t,) + x.shape[1:])

        enc_t = tile(encoding) if encoding is not None else None
        # t for sample b*n_t + k, window w is t_values[k]
        t = jnp.tile(t_values, B).reshape(B * n_t, 1, 1, 1, 1)
        t = jnp.broadcast_to(t, (B * n_t, W_n, 1, 1, 1))

        from superslomo_tpu.ops import warp_multiflow

        # est flows in f32 WITHOUT materializing a tiled flow tensor: the
        # per-t flows are scalar combinations of the same F_01/F_10, so
        # broadcast t over an inserted axis instead (same expression tree
        # as physics.interpolate_flows — bit-identical per sample). Layout
        # (B, W_n, n_t, ...) so the multi-flow warp below groups the n_t
        # flows of each frame pair without a transpose.
        t_col = t_values.reshape(1, 1, n_t, 1, 1, 1)
        est_t0, est_t1 = physics.interpolate_flows(flowC_out[:, :, None], t_col)
        est_t0 = est_t0.reshape(B * W_n, n_t, H, W_, 2)
        est_t1 = est_t1.reshape(B * W_n, n_t, H, W_, 2)

        # Stage-2 U-Net input in the compute dtype (bf16 on TPU): the convs
        # consume it at that precision anyway, and halving these full-res
        # tensors halves the dominant HBM traffic of the step. The f32 est
        # flows above are what the final image is sampled with. The warps
        # run ONE multi-flow kernel per frame/direction: the image planes
        # sit in VMEM once and all n_t flows gather from them.
        cpairs = pairs.reshape(B * W_n, H, W_, 6).astype(cdt)
        img_0, img_1 = cpairs[..., 0:3], cpairs[..., 3:6]
        w1t = warp_multiflow(img_1, est_t1, in_band=in_band_est)
        w0t = warp_multiflow(img_0, est_t0, in_band=in_band_est)

        def tile_t(x):  # (B*W_n, H, W, c) → (B*W_n, n_t, H, W, c)
            return jnp.broadcast_to(x[:, None], (B * W_n, n_t) + x.shape[1:])

        flowI_in = jnp.concatenate(
            [tile_t(img_1), w1t, est_t1.astype(cdt), est_t0.astype(cdt),
             w0t, tile_t(img_0)],
            axis=-1,
        ).reshape(B, W_n, n_t, H, W_, 16)
        # → (B*n_t, W_n, ...) for the U-Net (t-major within each sample);
        # W_n == 1 for the flagship 2-frame model, so this is a pure reshape
        flowI_in = jnp.swapaxes(flowI_in, 1, 2).reshape(B * n_t, W_n, H, W_, 16)

        carry2 = rnn_carry.get("stage2") if rnn_carry else None
        if carry2 is not None:
            # stage-2 sees the t-grid folded into the batch (B*n_t); a
            # streamed-in carry has batch B — broadcast each sample's state
            # over its n_t copies (sample-major, matching tile()). Carry
            # OUTPUTS are not returned by this fused path: stateful
            # streaming uses __call__ (see docstring).
            carry2 = jax.tree.map(tile, carry2)
        flowI_out_raw, _, _ = self.stage2(flowI_in, enc_t, carry2, False, False)
        # refined flows = est + Δ, so boundC + max|Δ| bounds the final warps
        bound_ref = boundC + jnp.max(jnp.abs(flowI_out_raw[..., 1:5])).astype(
            jnp.float32
        )
        in_band_ref = bound_ref <= 128.0

        mid = W_n // 2
        outs = physics.extract_stage2_outputs(
            flowI_out_raw.astype(jnp.float32)[:, mid]
        )  # (B*n_t, H, W, ...)
        grp = lambda x: x.reshape(B, n_t, H, W_, -1)
        est_t1_mid = est_t1.reshape(B, W_n, n_t, H, W_, 2)[:, mid]
        est_t0_mid = est_t0.reshape(B, W_n, n_t, H, W_, 2)[:, mid]
        pred_flow_t1 = est_t1_mid + grp(outs.dflow_t1)
        pred_flow_t0 = est_t0_mid + grp(outs.dflow_t0)

        # final-image warps in f32 (quality); multi-flow kernels again
        mid_pairs = pairs[:, mid]
        w0 = warp_multiflow(mid_pairs[..., 0:3], pred_flow_t0, in_band=in_band_ref)
        w1 = warp_multiflow(mid_pairs[..., 3:6], pred_flow_t1, in_band=in_band_ref)
        v_0t, v_1t = grp(outs.v_0t), grp(outs.v_1t)
        t_g = t_values.reshape(1, n_t, 1, 1, 1)
        weighted = (1.0 - t_g) * (w0 * v_0t) + t_g * (w1 * v_1t)
        norm = (1.0 - t_g) * v_0t + t_g * v_1t
        pred = weighted / norm
        if with_bounds:
            return pred, jnp.maximum(boundC, bound_ref)
        return pred

    # ------------------------------------------------------------------ #
    def _multi_t_planar(self, frames, t_values, rnn_carry=None):
        """The planar-epilogue fused multi-t step (always returns
        ``(pred, bound)``; traced only for the unguarded host-checked-bound
        protocol on a single device).

        TPU rationale: every physics tensor here has 1-5 channels. In the
        channel-minor (..., C) layout XLA puts those channels in the
        128-lane dimension — so the est-flow algebra, the 5-channel head
        extraction, and the warp kernel's u/v slicing each paid layout
        copies (profiled ~15 ms of the 52 ms/step "data formatting" bucket
        at 720p). This path instead keeps flows, visibility maps, and the
        blend as (N, H, W) PLANES — perfectly tiled on (8, 128) vregs —
        feeds the multi-flow warp through its planar entry
        (ops.warp_multiflow_planar), extracts the stage-2 head straight
        from its S2D form, and assembles the stage-2 U-Net input directly
        in S2D (r, s, c) layout so the full-res 16-channel concat +
        space_to_depth relayouts never exist. Numerics: identical algebra
        to the channel-minor path (physics.interpolate_flows /
        extract_stage2_outputs formulas), same bf16 quantization points.
        """
        from superslomo_tpu.ops import warp_multiflow_planar

        pairs = make_pairs(frames)  # (B, W_n, H, W, 6) f32
        B, W_n, H, W_, _ = pairs.shape
        BW = B * W_n
        n_t = t_values.shape[0]
        cdt = jnp.bfloat16 if self.spec.compute_dtype == "bfloat16" else jnp.float32
        f32 = jnp.float32

        def head_planes(head_s2d, n_ch, dtype):
            """(N, Hh, Wh, 4·n_ch) S2D head → n_ch full-res (N, H, W)
            planes. ONE big transpose (XLA copy engine, near-BW) rather
            than per-channel strided slices — strided multi-slice interleaves
            lower into catastrophically slow gather-style fusions (measured
            136 ms for the 64-way variant of this pattern)."""
            N, Hh, Wh, _ = head_s2d.shape
            ph = head_s2d.reshape(N, Hh, Wh, 2, 2, n_ch)
            allp = ph.transpose(5, 0, 1, 3, 2, 4).reshape(
                n_ch, N, 2 * Hh, 2 * Wh
            ).astype(dtype)
            return [allp[c] for c in range(n_ch)]

        carry1 = rnn_carry.get("stage1") if rnn_carry else None
        head1_s2d, encoding, _ = self.stage1(pairs, None, carry1, True, False)
        if self.spec.v2_fence and _head_fence():
            # Layout fence: round-3 profiling showed the head-extraction
            # transposes' layout preferences propagating INTO the full-res
            # tail convs (conv11b/fuse/final ran at 8-17% efficiency with
            # T(2,128) tilings at batch 1). The barrier keeps the convs on
            # their natural layouts; the transpose pays its own cost once.
            head1_s2d = jax.lax.optimization_barrier(head1_s2d)
        # (B, W_n, H/2, W/2, 16) compute dtype; same elements as the d2s'd
        # stage-1 flow, so the bound matches the channel-minor path's
        boundC = jnp.max(jnp.abs(head1_s2d)).astype(f32)
        h1 = head1_s2d.reshape(BW, H // 2, W_ // 2, 16)
        # extract in the head's own (compute) dtype — the relayout copy
        # halves in bf16 — and upcast to f32 inside the est-flow fusions
        # (bf16→f32 is exact, so this matches the channel-minor path's
        # "d2s then astype(f32)" values bit-for-bit)
        u01, v01, u10, v10 = (
            p.astype(f32) for p in head_planes(h1, 4, head1_s2d.dtype)
        )

        # est flows per component — physics.interpolate_flows algebra
        tc = t_values.astype(f32).reshape(1, n_t, 1, 1)
        u_t0 = -(1.0 - tc) * tc * u01[:, None] + (tc * tc) * u10[:, None]
        v_t0 = -(1.0 - tc) * tc * v01[:, None] + (tc * tc) * v10[:, None]
        u_t1 = (1.0 - tc) * (1.0 - tc) * u01[:, None] - tc * (1.0 - tc) * u10[:, None]
        v_t1 = (1.0 - tc) * (1.0 - tc) * v01[:, None] - tc * (1.0 - tc) * v10[:, None]

        # image planes via ONE transpose; stage-2 warps quantize to the
        # compute dtype exactly as the channel-minor path does
        planes6 = pairs.reshape(BW, H, W_, 6).transpose(0, 3, 1, 2)  # (BW,6,H,W)
        pl0, pl1 = planes6[:, 0:3], planes6[:, 3:6]
        # stage-2 input warps store the consumer's compute dtype directly
        # (f32 accumulation in-kernel; identical values to astype-after,
        # half the output HBM traffic — these are the two largest
        # intermediates of the step at (BW, 3, n_t, H, W))
        w1t = warp_multiflow_planar(pl1.astype(cdt), u_t1, v_t1, out_dtype=cdt)
        w0t = warp_multiflow_planar(pl0.astype(cdt), u_t0, v_t0, out_dtype=cdt)

        # Stage-2 input assembled DIRECTLY in S2D layout: ONE channel-planar
        # concat then ONE reshape+transpose. Channel order [img1(3), w1t(3),
        # est_t1(u,v), est_t0(u,v), w0t(3), img0(3)] matches
        # physics.compute_stage2_inputs.
        bc = lambda x: jnp.broadcast_to(
            x[:, :, None], x.shape[:2] + (n_t,) + x.shape[2:]
        )  # (BW, c, H, W) → (BW, c, n_t, H, W)
        est = jnp.stack([u_t1, v_t1, u_t0, v_t0], axis=1)  # (BW, 4, n_t, H, W)
        Hh, Wh = H // 2, W_ // 2
        if self.spec.v2_assembly:
            # grouped (c, r, s) channel order: the minor dims of the
            # transpose target (c, r, s) end with the SOURCE's minor dim
            # (column phase s), so XLA lowers it as one locality-preserving
            # copy — profiled vs the (r, s, c) target below, which needed a
            # channel-to-minor relayout PLUS a phase-interleave pass
            # (~7 ms/step at 720p). conv1a consumes this order via its
            # in_perm weight permutation (models/unet.py).
            #
            # Round 5: each component is transposed DIRECTLY into its
            # contiguous channel block of the target (component k's
            # channels [c0, c1) occupy minor indices [4·c0, 4·c1) in
            # grouped order — per-block layout (c_local, r, s), globally
            # identical to (c, r, s)), so the (BW, 16, n_t, H, W) ``P``
            # concat never materializes — the transposes write straight
            # into the concat output. SSMTPU_ASM_VIA_P=1 restores the
            # concat-then-one-transpose variant for A/B (trace-time).
            def to_s2d_grouped(x):
                c = x.shape[1]
                return (
                    x.reshape(B, W_n, c, n_t, Hh, 2, Wh, 2)
                    .transpose(0, 3, 1, 4, 6, 2, 5, 7)
                    .reshape(B * n_t, W_n, Hh, Wh, 4 * c)
                )

            import os as _os

            comps = [bc(pl1).astype(cdt), w1t, est.astype(cdt), w0t,
                     bc(pl0).astype(cdt)]
            if _os.environ.get("SSMTPU_ASM_VIA_P", "0") == "1":
                flowI_s2d = to_s2d_grouped(jnp.concatenate(comps, axis=1))
            else:
                flowI_s2d = jnp.concatenate(
                    [to_s2d_grouped(p) for p in comps], axis=-1
                )
        else:
            P = jnp.concatenate(
                [
                    bc(pl1).astype(cdt),
                    w1t,
                    est.astype(cdt),
                    w0t,
                    bc(pl0).astype(cdt),
                ],
                axis=1,
            )  # (BW, 16, n_t, H, W) compute dtype
            # (B, W_n, 16, n_t, Hh, r, Wh, s) → (B, n_t, W_n, Hh, Wh, r, s,
            # 16): one transpose producing the (r, s, c) channel-minor S2D
            # tensor in the stage-2 fold order (t-grid into batch,
            # sample-major)
            flowI_s2d = (
                P.reshape(B, W_n, 16, n_t, Hh, 2, Wh, 2)
                .transpose(0, 3, 1, 4, 6, 5, 7, 2)
                .reshape(B * n_t, W_n, Hh, Wh, 64)
            )

        def tile(x):
            return jnp.broadcast_to(
                x[:, None], (B, n_t) + x.shape[1:]
            ).reshape((B * n_t,) + x.shape[1:])

        enc_t = tile(encoding) if encoding is not None else None
        carry2 = rnn_carry.get("stage2") if rnn_carry else None
        if carry2 is not None:
            carry2 = jax.tree.map(tile, carry2)

        head2_s2d, _, _ = self.stage2(flowI_s2d, enc_t, carry2, True, True)
        if self.spec.v2_fence and _head_fence():
            head2_s2d = jax.lax.optimization_barrier(head2_s2d)
        # (B*n_t, W_n, Hh, Wh, 20); bound over the dflow channels (c in
        # 1..4 per phase) — the same element set as full-res [..., 1:5]
        dmax = jnp.max(
            jnp.abs(head2_s2d.reshape(head2_s2d.shape[:-1] + (4, 5))[..., 1:5])
        )
        bound_ref = boundC + dmax.astype(f32)

        mid = W_n // 2
        p0, p1, p2, p3, p4 = (
            p.astype(f32)
            for p in head_planes(head2_s2d[:, mid], 5, head2_s2d.dtype)
        )  # (B*n_t, H, W), upcast fused into the consumers
        v_1t = 1.0 / (1.0 + jnp.exp(-p0))  # physics.extract_stage2_outputs
        v_0t = 1.0 - v_1t

        grp = lambda x: x.reshape(B, n_t, H, W_)
        mid_est = lambda x: x.reshape(B, W_n, n_t, H, W_)[:, mid]
        u_p_t1 = mid_est(u_t1) + grp(p1)
        v_p_t1 = mid_est(v_t1) + grp(p2)
        u_p_t0 = mid_est(u_t0) + grp(p3)
        v_p_t0 = mid_est(v_t0) + grp(p4)

        # final-image warps in f32 (quality), planar in and out.
        # SSMTPU_BF16_FINAL_WARP=1 (trace-time, default OFF): bf16 planes +
        # bf16 stores — halves the last full-res gather traffic but rounds
        # the warped images to bf16 before the f32 blend (≈0.4% relative;
        # up to ±1 uint8 level post-denorm), so it is a measured-tradeoff
        # knob, NOT a default; the protocol goldens pin the default path.
        import os as _os

        bf16_final = _os.environ.get("SSMTPU_BF16_FINAL_WARP", "0") == "1"
        wdt = cdt if bf16_final else f32
        mp = pairs[:, mid].transpose(0, 3, 1, 2)  # (B, 6, H, W)
        mp0, mp1 = mp[:, 0:3].astype(wdt), mp[:, 3:6].astype(wdt)
        w0 = warp_multiflow_planar(mp0, u_p_t0, v_p_t0, out_dtype=wdt)
        w1 = warp_multiflow_planar(mp1, u_p_t1, v_p_t1, out_dtype=wdt)

        t_g = t_values.astype(f32).reshape(1, 1, n_t, 1, 1)
        v0e = grp(v_0t)[:, None]  # (B, 1, n_t, H, W)
        v1e = grp(v_1t)[:, None]
        weighted = (1.0 - t_g) * (w0 * v0e) + t_g * (w1 * v1e)
        norm = (1.0 - t_g) * v0e + t_g * v1e
        pred = (weighted / norm).transpose(0, 2, 3, 4, 1)  # (B, n_t, H, W, 3)
        return pred, jnp.maximum(boundC, bound_ref)


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
