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

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ConvLSTMCell(nn.Module):
    """Peephole-free ConvLSTM cell. Gate order (i, f, o, g) follows the
    upstream ConvLSTM repo so checkpoints remain portable."""

    hidden: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
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
        i, f, o, g = jnp.split(z, 4, axis=-1)
        i = nn.sigmoid(i)
        f = nn.sigmoid(f)
        o = nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h


class ConvGRUCell(nn.Module):
    """ConvGRU cell: update/reset gates + candidate conv."""

    hidden: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
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
        z, r = jnp.split(zr, 2, axis=-1)
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
        if cell_cls is ConvLSTMCell:
            initial_carry = (h0, jnp.zeros_like(h0))
        else:
            initial_carry = (h0,)
    carry, ys = scan(hidden=hidden, dtype=dtype, name=name)(initial_carry, x)
    return carry, ys


class BiConvRNN(nn.Module):
    """Bidirectional multi-layer ConvLSTM/ConvGRU over a window sequence.

    Input/output: (B, T, H, W, C); output channels = ``hidden_channels``.
    """

    hidden_channels: int
    num_layers: int = 2
    cell: str = "CLSTM"  # CLSTM | CGRU
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, carry_in=None):
        cell_cls = ConvLSTMCell if self.cell == "CLSTM" else ConvGRUCell
        per_dir = self.hidden_channels // 2
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
        # outputs at their original positions) rev outputs, channel concat.
        out = jnp.concatenate(outs, axis=-1)
        return out, carry_out
