"""Recurrent U-Net bottlenecks: bidirectional ConvLSTM / ConvGRU.

The reference consumes these from an un-vendored git submodule
(SreenivasVRao/ConvGRU-ConvLSTM-PyTorch; call sites at
scripts/models/flow_computation.py:73-88 and :208-211):
``ConvBLSTM(in_channels=512, hidden_channels=512, kernel_size=(3,3),
num_layers=2, batch_first=True)`` invoked as ``conv6(x_fwd, x_rev)`` on
B T C H W stacks and returning B T C H W with C = 512.

Reconstructed semantics (the submodule is empty in the reference checkout, so
this is a from-scratch design honoring the call contract): two independent
``num_layers``-deep ConvRNN stacks, one consuming the window sequence forward
and one backward, each with hidden width ``hidden_channels // 2``; the
backward outputs are time-reversed back and concatenated with the forward
outputs on the channel axis, giving ``hidden_channels`` total — which is what
lets the decoder's conv7a keep its 512-channel input.

TPU-native: the time recursion is a single ``lax.scan`` per direction (via
nn.scan), with the gate convolutions left to XLA so they fuse and hit the
MXU; no Python loops over time.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ConvLSTMCell(nn.Module):
    """Peephole-free ConvLSTM cell.

    ``gate_order`` names the channel-block order of the fused gate conv as a
    permutation of "ifog" (input, forget, output, candidate). The default
    (i, f, o, g) matches the common upstream ConvLSTM packing
    (torch.split order in ndrplz-style cells); if the real
    SreenivasVRao/ConvGRU-ConvLSTM-PyTorch submodule packs differently, set
    ``[TPU] CLSTM_GATE_ORDER`` so ported checkpoints load correctly — the
    explicit contract VERDICT/SURVEY §7 hard-part #2 calls for."""

    hidden: int
    kernel: int = 3
    dtype: Any = jnp.float32
    gate_order: str = "ifog"

    @nn.compact
    def __call__(self, carry, x):
        if sorted(self.gate_order) != ["f", "g", "i", "o"]:
            raise ValueError(
                f"gate_order must be a permutation of 'ifog', got {self.gate_order!r}"
            )
        h, c = carry
        p = self.kernel // 2
        z = nn.Conv(
            4 * self.hidden,
            (self.kernel, self.kernel),
            padding=((p, p), (p, p)),
            use_bias=True,
            dtype=self.dtype,
            name="gates",
        )(jnp.concatenate([x, h], axis=-1))
        blocks = jnp.split(z, 4, axis=-1)
        gates = {name: blk for name, blk in zip(self.gate_order, blocks)}
        i = nn.sigmoid(gates["i"])
        f = nn.sigmoid(gates["f"])
        o = nn.sigmoid(gates["o"])
        g = jnp.tanh(gates["g"])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h


class ConvGRUCell(nn.Module):
    """ConvGRU cell: update/reset gates + candidate conv.

    ``gate_order`` names the channel-block order of the fused gate conv as
    a permutation of "zr" (update, reset) — the GRU analogue of the
    ConvLSTM contract above: a ported checkpoint with the opposite packing
    is shape-compatible but semantically permuted, which no shape check can
    catch, so the packing must be an explicit knob
    (``[TPU] CLSTM_GATE_ORDER = ZR | RZ`` when BOTTLENECK = CGRU)."""

    hidden: int
    kernel: int = 3
    dtype: Any = jnp.float32
    gate_order: str = "zr"

    @nn.compact
    def __call__(self, carry, x):
        if sorted(self.gate_order) != ["r", "z"]:
            raise ValueError(
                f"CGRU gate_order must be a permutation of 'zr', got "
                f"{self.gate_order!r}"
            )
        (h,) = carry
        p = self.kernel // 2
        zr = nn.Conv(
            2 * self.hidden,
            (self.kernel, self.kernel),
            padding=((p, p), (p, p)),
            use_bias=True,
            dtype=self.dtype,
            name="gates",
        )(jnp.concatenate([x, h], axis=-1))
        blocks = jnp.split(zr, 2, axis=-1)
        z, r = (blocks[0], blocks[1]) if self.gate_order == "zr" else (
            blocks[1], blocks[0]
        )
        z = nn.sigmoid(z)
        r = nn.sigmoid(r)
        n = jnp.tanh(
            nn.Conv(
                self.hidden,
                (self.kernel, self.kernel),
                padding=((p, p), (p, p)),
                use_bias=True,
                dtype=self.dtype,
                name="candidate",
            )(jnp.concatenate([x, r * h], axis=-1))
        )
        h = (1.0 - z) * h + z * n
        return (h,), h


def _scan_cell(cell_cls, name, hidden, dtype, x, reverse, initial_carry=None):
    """Scan a ConvRNN cell over the time axis of x: (B, T, H, W, C) → same.

    ``initial_carry`` lets callers thread hidden state across successive clips
    (SSM-R hidden-state carry across a long video, BASELINE config 3).
    """
    scan = nn.scan(
        cell_cls,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=1,
        out_axes=1,
        reverse=reverse,
    )
    B, T, H, W, C = x.shape
    if initial_carry is None:
        h0 = jnp.zeros((B, H, W, hidden), dtype=x.dtype)
        base = getattr(cell_cls, "func", cell_cls)  # unwrap functools.partial
        if base is ConvLSTMCell:
            initial_carry = (h0, jnp.zeros_like(h0))
        else:
            initial_carry = (h0,)
    carry, ys = scan(hidden=hidden, dtype=dtype, name=name)(initial_carry, x)
    return carry, ys


class BiConvRNN(nn.Module):
    """Bidirectional multi-layer ConvLSTM/ConvGRU over a window sequence.

    Input/output: (B, T, H, W, C); output channels = ``hidden_channels``.

    ``merge`` selects between the two plausible upstream bidirectional
    layouts (the reference's CLSTM submodule is un-vendored, so the true one
    is unknowable from the checkout — flow_computation.py:73-88 only fixes
    in=hidden=512 and a 512-channel output into conv7a):

    * "concat": hidden_channels // 2 per direction, channel-concatenated
      (the common ConvBLSTM construction; round-1 default);
    * "sum": full hidden_channels per direction, outputs summed.

    A ported checkpoint pins the layout via its gate-conv shapes — the
    weight loader raises with a pointer to ``[TPU] CLSTM_MERGE`` when the
    configured layout disagrees (training/trainer.py).
    """

    hidden_channels: int
    num_layers: int = 2
    cell: str = "CLSTM"  # CLSTM | CGRU
    dtype: Any = jnp.float32
    merge: str = "concat"  # concat | sum
    gate_order: str = "ifog"

    @nn.compact
    def __call__(self, x, carry_in=None):
        if self.merge not in ("concat", "sum"):
            raise ValueError(f"merge must be 'concat' or 'sum', got {self.merge!r}")
        if self.cell == "CLSTM":
            cell_cls = functools.partial(ConvLSTMCell, gate_order=self.gate_order)
        else:
            # The shared gate_order knob carries cell-appropriate semantics:
            # an "ifog" permutation for CLSTM, a "zr" permutation for CGRU.
            # The CLSTM default passes through as the CGRU default; anything
            # else must be a valid CGRU packing or the cell raises.
            gru_order = "zr" if self.gate_order == "ifog" else self.gate_order
            cell_cls = functools.partial(ConvGRUCell, gate_order=gru_order)
        per_dir = (
            self.hidden_channels // 2 if self.merge == "concat" else self.hidden_channels
        )
        carry_out = {}

        outs = []
        for direction, reverse in (("fwd", False), ("rev", True)):
            y = x
            for layer in range(self.num_layers):
                name = f"{direction}_l{layer}"
                init = None if carry_in is None else carry_in.get(name)
                carry, y = _scan_cell(
                    cell_cls, name, per_dir, self.dtype, y, reverse, init
                )
                carry_out[name] = carry
            outs.append(y)

        # fwd outputs + (already time-aligned, since reverse-scan emits
        # outputs at their original positions) rev outputs.
        if self.merge == "concat":
            out = jnp.concatenate(outs, axis=-1)
        else:
            out = outs[0] + outs[1]
        return out, carry_out
