"""The shared 6-level Super SloMo U-Net (stages 1 and 2).

Topology matches the reference exactly (flow-computation:
scripts/models/flow_computation.py:27-153; flow-interpolation:
scripts/models/flow_interpolation.py:27-157): encoder of 5 conv-pair blocks
with 2x avg-pool between (channels 32/64/128/256/512, kernels 7/5/3/3/3), a
configurable bottleneck at 1/32 resolution (CONV pair, or bidirectional
ConvLSTM / ConvGRU across the temporal window stack), and a decoder of 5
bilinear-2x-upsample + conv-pair blocks with skip concatenations, a fuse conv
at full resolution, and a linear 3x3 head.

TPU-native re-design, not a port:

* NHWC layout; every conv is an ``lax.conv_general_dilated`` XLA tiles onto
  the MXU, with LeakyReLU fused in.
* The reference loops Python-level over the T-1 interpolation windows
  (flow_computation.py:305-311, :318-323). Here the window axis is folded
  into the batch axis for the encoder and decoder — one big conv per layer —
  and only the bottleneck sees time (a ``lax.scan`` for CLSTM/CGRU).
* Encoder blocks 1 AND 2 (7x7 and 5x5 convs at ≤64 channels, the pools
  between them) execute in space-to-depth polyphase form — exact rewrites
  one level down with 4x channels (ops/s2d.py) — because small-channel
  convs at high resolution underfill the MXU's 128 output lanes.
* EVERY decoder block's "bilinear 2x upsample + 3x3 conv" runs as the
  composite half-grid conv of ops/upconv.py: exact, the true MAC count (no
  polyphase zero-inflation), 4x the output channels (full MXU lanes), and
  no upsampled intermediate in HBM — measured 3-7x per-block over the
  literal path at 720p. Blocks 10/11 stay in s2d form through their second
  conv and the fuse/final head.
* The cross-stage skip (stage1 bottleneck encoding → stage2 decoder,
  flow_interpolation.py:98-101, :224-231) is a plain channel concat.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from superslomo_tpu.models.bottleneck import BiConvRNN
from superslomo_tpu.models.layers import ConvLReLU
from superslomo_tpu.ops import avg_pool_2x2
from superslomo_tpu.ops.s2d import (
    S2DConv,
    S2DConvLReLU,
    depth_to_space,
    s2d_concat,
    s2d_pool_mean,
    space_to_depth,
)
from superslomo_tpu.ops.upconv import UpConvLReLU

# (name_a, name_b, features, kernel) per plain mid-resolution encoder block.
_ENCODER_BLOCKS_MID = (
    ("conv3a", "conv3b", 128, 3),
    ("conv4a", "conv4b", 256, 3),
    ("conv5a", "conv5b", 512, 3),
)

# decoder blocks 8-9: composite up-conv → depth_to_space → plain b conv
_DECODER_BLOCKS_MID = (
    ("conv8a", "conv8b", 256),
    ("conv9a", "conv9b", 128),
)


class UNet(nn.Module):
    """One Super SloMo U-Net stage.

    __call__ input: (B, T, H, W, in_channels) window stack. H, W must be
    divisible by 32 (guaranteed by the data layer, as in the reference).

    Returns ``(out, encoding, rnn_carry)``:
      * out: (B, T, H, W, out_channels)
      * encoding: (B, T, H/32, W/32, 512) bottleneck output when
        ``emit_encoding`` (stage 1 with cross-stage skip), else None
      * rnn_carry: recurrent bottleneck state (for hidden-state carry across
        clips) or None for CONV bottlenecks.
    """

    out_channels: int
    bottleneck: str = "CONV"  # CONV | CLSTM | CGRU
    emit_encoding: bool = False  # stage1 w/ cross-stage skip
    accept_encoding: bool = False  # stage2 w/ cross-stage skip
    dtype: Any = jnp.float32
    clstm_merge: str = "concat"  # concat | sum (models/bottleneck.py)
    clstm_gate_order: str = "ifog"
    # LAYOUT_V2 sub-features (config [TPU]; independently gateable since
    # round 5 — ModelSpec.v2_split_decoder / v2_assembly):
    # ``split_decoder``: decoder skip-concats become split convs (exact —
    # conv/upconv are linear in input channels). ``grouped_input``: an s2d
    # input arrives in grouped (c, r, s) channel order consumed via
    # conv1a's in_perm weight permutation. See ops/s2d.py S2DConv /
    # ops/upconv.py upsample_conv_pair for the profiling rationale.
    split_decoder: bool = False
    grouped_input: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cross_encoding: Optional[jnp.ndarray] = None,
        rnn_carry=None,
        s2d_head: bool = False,
        input_is_s2d: bool = False,
    ):
        """``s2d_head``: return the head output in its native S2D form
        (B, T, H/2, W/2, 4·out_channels) without the depth_to_space — the
        fused multi-t epilogue extracts per-channel planes from it directly,
        skipping the 5-channel full-res layout copies (profiled ~7.5 ms per
        720p step). ``input_is_s2d``: x is already S2D (r, s, c) layout,
        (B, T, H/2, W/2, 4·C) — the multi-t path assembles the stage-2
        input in S2D space. Both are trace-time statics (remat marks them
        static_argnums in models/superslomo.py)."""
        if x.ndim != 5:
            raise ValueError(f"expected (B, T, H, W, C), got {x.shape}")
        if input_is_s2d:
            B, T, Hh, Wh, C4 = x.shape
            H, W = 2 * Hh, 2 * Wh
        else:
            B, T, H, W, C = x.shape
        if H % 32 or W % 32:
            raise ValueError(f"H, W must be /32-divisible, got {H}x{W}")

        blk = lambda name, feats, k: ConvLReLU(feats, k, dtype=self.dtype, name=name)
        sblk = lambda name, feats, k: S2DConvLReLU(feats, k, dtype=self.dtype, name=name)
        upblk = lambda name, feats: UpConvLReLU(feats, dtype=self.dtype, name=name)

        # ---- encoder block 1 (full res, polyphase S2D) ---------------------
        if input_is_s2d:
            h = x.reshape(B * T, H // 2, W // 2, x.shape[-1])
        else:
            h = space_to_depth(x.reshape(B * T, H, W, C))
        if input_is_s2d and self.grouped_input:
            # the multi-t assembler emits grouped (c, r, s) channel order
            # (one locality-preserving transpose instead of a multi-pass
            # relayout); conv1a consumes it via the free weight permutation
            # semantic_index = phase(j) * Cin + channel(j), j = c*4 + 2r+s
            c_in = x.shape[-1] // 4
            perm = tuple((j % 4) * c_in + j // 4 for j in range(4 * c_in))
            h = S2DConvLReLU(
                32, 7, dtype=self.dtype, in_perm=perm, name="conv1a"
            )(h)
        else:
            h = sblk("conv1a", 32, 7)(h)
        skip1_s2d = sblk("conv1b", 32, 7)(h)  # S2D of the full-res conv1b out

        # pool2 == mean of the 4 phases of conv1b's S2D form
        h = s2d_pool_mean(skip1_s2d)  # (B*T, H/2, W/2, 32)

        # ---- encoder block 2 (half res, polyphase S2D: 5x5 → 3x3 at 1/4
        # res with 4x channels — 1.44x MACs for ~3x the MXU rate) -----------
        h = space_to_depth(h)
        h = sblk("conv2a", 64, 5)(h)
        skip2_s2d = sblk("conv2b", 64, 5)(h)  # s2d @ H/4 grid (4*64 ch)

        # pool3 == phase mean of conv2b's s2d form
        h = s2d_pool_mean(skip2_s2d)  # (B*T, H/4, W/4, 64)

        # ---- encoder blocks 3-5 (quarter res and below, plain) -------------
        skips = []
        for i, (na, nb, feats, k) in enumerate(_ENCODER_BLOCKS_MID):
            if i > 0:
                h = avg_pool_2x2(h)
            h = blk(na, feats, k)(h)
            h = blk(nb, feats, k)(h)
            skips.append(h)  # conv3b, conv4b, conv5b
        pool6 = avg_pool_2x2(h)  # (B*T, H/32, W/32, 512)

        # ---- bottleneck ----------------------------------------------------
        carry_out = None
        if self.bottleneck == "CONV":
            h = blk("conv6_0", 512, 3)(pool6)
            h = blk("conv6_1", 512, 3)(h)
        elif self.bottleneck in ("CLSTM", "CGRU"):
            seq = pool6.reshape(B, T, H // 32, W // 32, 512)
            h, carry_out = BiConvRNN(
                hidden_channels=512,
                num_layers=2,
                cell=self.bottleneck,
                dtype=self.dtype,
                merge=self.clstm_merge,
                gate_order=self.clstm_gate_order,
                name="conv6",
            )(seq, rnn_carry)
            h = h.reshape(B * T, H // 32, W // 32, 512)
        else:
            raise ValueError(f"unknown bottleneck {self.bottleneck!r}")

        encoding = h.reshape(B, T, H // 32, W // 32, 512) if self.emit_encoding else None

        # ---- decoder (1/32 → full res) -------------------------------------
        # Every decoder block's "bilinear 2x upsample + 3x3 conv" runs as
        # the composite half-grid conv (ops/upconv.py): exact, true MAC
        # count, full MXU lanes, and no upsampled intermediate in HBM.
        # LAYOUT_V2: feed each upconv its concat operands separately (the
        # composite conv splits over input channels — ops/upconv.py
        # upsample_conv_pair) instead of materializing the concat.
        join = (lambda a, b: (a, b)) if self.split_decoder else (
            lambda a, b: jnp.concatenate([a, b], axis=-1)
        )
        if self.accept_encoding:
            if cross_encoding is None:
                raise ValueError("this stage was built with accept_encoding=True")
            ce = cross_encoding.reshape(B * T, H // 32, W // 32, 512).astype(h.dtype)
            h = join(h, ce)  # 1024ch, as conv7a expects
        h = depth_to_space(upblk("conv7a", 512)(h))  # (H/16, 512)
        h = blk("conv7b", 512, 3)(h)

        for (na, nb, feats), skip in zip(_DECODER_BLOCKS_MID, reversed(skips[1:])):
            h = depth_to_space(upblk(na, feats)(join(h, skip)))
            h = blk(nb, feats, 3)(h)

        # ---- decoder block 10: stay in s2d form through conv10b ------------
        h = upblk("conv10a", 64)(join(h, skips[0]))  # conv9b + conv3b @ 1/4
        h = sblk("conv10b", 64, 3)(h)
        h = depth_to_space(h)  # (H/2, 64)

        # ---- decoder block 11 + fuse + head (full res, polyphase S2D) ------
        h = upblk("conv11a", 32)(join(h, depth_to_space(skip2_s2d)))  # + conv2b
        h = sblk("conv11b", 32, 3)(h)
        if self.split_decoder:
            h = sblk("fuse_conv", 32, 3)(h, skip1_s2d)
        else:
            h = s2d_concat(h, skip1_s2d)
            h = sblk("fuse_conv", 32, 3)(h)
        out = _S2DHead(self.out_channels, dtype=self.dtype, name="final_conv")(h)
        if s2d_head:
            return (
                out.reshape(B, T, H // 2, W // 2, 4 * self.out_channels),
                encoding,
                carry_out,
            )
        out = depth_to_space(out)

        return out.reshape(B, T, H, W, self.out_channels), encoding, carry_out


class _S2DHead(nn.Module):
    """Linear 3x3 head in S2D space (child scope 'conv' keeps the
    final_conv/conv/kernel checkpoint path)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_s2d):
        return S2DConv(self.features, 3, dtype=self.dtype, name="conv")(x_s2d)
