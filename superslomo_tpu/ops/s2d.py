"""Space-to-depth polyphase execution of the U-Net's full-resolution segment.

The reference's full-resolution layers (block-1 7x7 convs at 32 channels,
decoder block-11 / fuse / final 3x3 convs, the 2x2 pool after block 1 and
the final bilinear upsample — scripts/models/flow_computation.py:36-43,
:133-153) dominate wall time on TPU: at ≤32 output channels they fill ≤25%
of the MXU's output lanes (measured 7 TFLOP/s bf16, 40% of the U-Net's
time). This module runs that whole segment at HALF resolution with 4x the
channels using exact polyphase identities:

* conv:      y = convKxK(x)  ⟺  D2S( convK'xK'( S2D(x), remap(w) ) ),
             K' = K//2 + 2 for K=7 (5), K' = 3 for K=3 — same taps scattered
             into phase-indexed channel blocks; zero positions cost MACs
             (25/16 for 7x7, 9/4 for 3x3) but utilization rises ~4x.
* 2x2 pool:  avg_pool_2x2(x) = mean over the 4 phase channel groups of S2D(x).
* 2x up:     S2D(upsample_2x(z)) = four cheap 2-tap blends of z — no resize.
* concat:    channel concat in full-res space = per-phase concat in S2D space.

Phase/channel layout is (r, s, c) — row phase, column phase, channel.
Derivation for the conv remap: with output phase a and input phase r (rows),
y[2m+a] = Σ_p w[p]·x[2m + a + p - P] and a + p - P = 2δ + r gives
p = 2δ + r - a + P for kernel row kh = δ - δmin. Zero padding (-δmin, δmax)
in S2D space reproduces the original SAME padding exactly.

Parameters keep the original (K, K, Cin, Cout) HWIO shapes, so checkpoints
and the PyTorch converter are untouched; remapping happens inside the traced
computation and is differentiable.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _slice_ops() -> bool:
    """Layout-preserving slice formulations of the S2D shuffles.

    Profiling the 720p B=8 program (2026-08-20 trace, ~263 ms/step of
    'data formatting') showed XLA's layout assignment propagating a
    W-minor {2,3,1,0} layout preference out of the rank-5/6
    reshape-transposes in this module INTO the neighboring convs, each
    boundary inserting a full-tensor relayout copy (the padded W-minor
    form is also 1.2x larger than C-minor). The slice formulations below
    express the same shuffles as channel/strided slices that keep every
    operand C-minor. Gated (default OFF, like SSMTPU_NO_HEAD_FENCE) so
    the default-path HLO — and the warm compile caches the driver's
    bench depends on — stay byte-identical until a measured on-chip win
    flips the consumer (bench.py / eval CLI set this explicitly).

    The env var is read at TRACE time: set it before the first jit trace
    of any consumer; toggling it afterwards silently reuses the old trace
    (same contract as SSMTPU_NO_HEAD_FENCE). benchmarks/layoutv2_probe.py
    sets it pre-import, which is the correct pattern."""
    import os

    return os.environ.get("SSMTPU_S2D_SLICE_OPS", "0") == "1"


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4C), channel layout (r, s, c)."""
    if _slice_ops():
        # out[..., (2r+s)*C:] = x[:, r::2, s::2, :]: strided spatial slices
        # + channel concat — no 6-D transpose, operands stay C-minor.
        return jnp.concatenate(
            [x[:, r::2, s::2, :] for r in (0, 1) for s in (0, 1)], axis=-1
        )
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H/2, W/2, r, s, C
    return x.reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """(B, H/2, W/2, 4C) → (B, H, W, C), inverse of space_to_depth."""
    B, Hh, Wh, C4 = y.shape
    C = C4 // 4
    y = y.reshape(B, Hh, Wh, 2, 2, C)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # B, H/2, r, W/2, s, C
    return y.reshape(B, 2 * Hh, 2 * Wh, C)


def s2d_concat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel concat of two S2D tensors that equals S2D(concat(full-res))."""
    Ba, Ha, Wa, C4a = a.shape
    _, _, _, C4b = b.shape
    if _slice_ops():
        # pure channel-axis slices + one concat (no rank-5 round trip);
        # the B=8 trace charged ~42 ms/step of relayout copies to this op.
        ca, cb = C4a // 4, C4b // 4
        parts = []
        for i in range(4):
            parts.append(a[..., i * ca:(i + 1) * ca])
            parts.append(b[..., i * cb:(i + 1) * cb])
        return jnp.concatenate(parts, axis=-1)
    a4 = a.reshape(Ba, Ha, Wa, 4, C4a // 4)
    b4 = b.reshape(Ba, Ha, Wa, 4, C4b // 4)
    return jnp.concatenate([a4, b4], axis=-1).reshape(Ba, Ha, Wa, C4a + C4b)


def s2d_pool_mean(x: jnp.ndarray) -> jnp.ndarray:
    """avg_pool_2x2 of the full-res image, from its S2D form: the mean of
    the 4 phase groups."""
    B, Hh, Wh, C4 = x.shape
    C = C4 // 4
    if _slice_ops():
        # slice-adds, not reshape+mean. Verified bit-identical to the
        # jnp.mean path on CPU (tests/test_s2d.py); XLA does not
        # contractually fix reduce association across backends, so on TPU
        # the two paths agree within 1 ulp (/4 == *0.25 exactly either way)
        s = ((x[..., :C] + x[..., C:2 * C]) + x[..., 2 * C:3 * C]) + x[..., 3 * C:]
        return s * jnp.asarray(0.25, x.dtype)
    return x.reshape(B, Hh, Wh, 4, C).mean(axis=3)


def s2d_upsample2x(z: jnp.ndarray) -> jnp.ndarray:
    """S2D(upsample_2x_bilinear(z)) computed directly: output phase p is a
    (0.25, 0.75) 2-tap blend per axis with border clamping (matching
    ops/resize.py)."""
    def shifted(x, axis, direction):
        n = x.shape[axis]
        idx = [slice(None)] * x.ndim
        if direction < 0:  # previous element, clamped at 0
            idx[axis] = slice(0, n - 1)
            body = x[tuple(idx)]
            idx[axis] = slice(0, 1)
            return jnp.concatenate([x[tuple(idx)], body], axis=axis)
        idx[axis] = slice(1, n)  # next element, clamped at end
        body = x[tuple(idx)]
        idx[axis] = slice(n - 1, n)
        return jnp.concatenate([body, x[tuple(idx)]], axis=axis)

    rows = {
        0: 0.25 * shifted(z, 1, -1) + 0.75 * z,  # out row 2m
        1: 0.75 * z + 0.25 * shifted(z, 1, +1),  # out row 2m+1
    }
    phases = []
    for a in (0, 1):
        ra = rows[a]
        phases.append(0.25 * shifted(ra, 2, -1) + 0.75 * ra)  # col phase 0
        phases.append(0.75 * ra + 0.25 * shifted(ra, 2, +1))  # col phase 1
    # layout (a, b, c)
    return jnp.concatenate(phases, axis=-1)


@functools.lru_cache(maxsize=None)
def _remap_plan(K: int):
    """Static scatter plan for the polyphase kernel: list of
    (kh, kw, r, s, a, b, p, q) plus (K', padding)."""
    P = K // 2
    entries = []
    deltas = set()
    for a in (0, 1):
        for r in (0, 1):
            for p in range(K):
                alpha = a + p - P
                if (alpha - r) % 2 == 0:
                    deltas.add((alpha - r) // 2)
    dmin, dmax = min(deltas), max(deltas)
    Kp = dmax - dmin + 1
    for a in (0, 1):
        for r in (0, 1):
            for d in range(dmin, dmax + 1):
                p = 2 * d + r - a + P
                if not 0 <= p < K:
                    continue
                for b in (0, 1):
                    for s in (0, 1):
                        for e in range(dmin, dmax + 1):
                            q = 2 * e + s - b + P
                            if not 0 <= q < K:
                                continue
                            entries.append(
                                (d - dmin, e - dmin, r, s, a, b, p, q)
                            )
    return entries, Kp, (-dmin, dmax)


def remap_kernel(w: jnp.ndarray) -> tuple[jnp.ndarray, tuple[int, int]]:
    """(K, K, Cin, Cout) → ((K', K', 4Cin, 4Cout), (pad_lo, pad_hi))."""
    K = w.shape[0]
    cin, cout = w.shape[2], w.shape[3]
    entries, Kp, pad = _remap_plan(K)
    Wp = jnp.zeros((Kp, Kp, 4 * cin, 4 * cout), w.dtype)
    for kh, kw, r, s, a, b, p, q in entries:
        ci = (r * 2 + s) * cin
        co = (a * 2 + b) * cout
        Wp = Wp.at[kh, kw, ci : ci + cin, co : co + cout].set(w[p, q])
    return Wp, pad


class S2DConv(nn.Module):
    """KxK same-padding conv with bias on an S2D tensor → S2D tensor.
    Param shapes/names identical to nn.Conv's HWIO (kernel (K, K, Cin, Cout),
    bias (Cout,)) so checkpoints port unchanged.

    When the caller supplies a ``prepared`` variable collection (built once
    per eval session by ops/prepare.py), the polyphase kernel remap — a
    zeros + ~K'²·16 dynamic-update-slice chain that costs ~10 ms/step on TPU
    when traced into the hot program — is skipped and the pre-remapped
    (K', K', 4Cin, 4Cout) kernel is consumed directly. The remap is a pure
    scatter (no arithmetic), so remap(cast(w)) == cast(remap(w)) and both
    paths are bit-identical. Training (gradients to the original params)
    keeps the in-trace remap.

    LAYOUT_V2 extensions (both exact; both leave param/prepared shapes and
    the single-input trace untouched):

    * ``x2_s2d``: second operand — computes conv(s2d_concat(x, x2)) WITHOUT
      materializing the phase-interleaved concat (profiled as a multi-pass
      relayout copy chain at 720p): conv is linear in input channels, so
      the kernel splits into the two operands' channel blocks and the
      outputs sum (the add fuses into the second conv's epilogue).
    * ``in_perm``: static input-channel permutation — the caller assembled
      the S2D tensor in a different (layout-friendlier) channel order, and
      the kernel's input axis is permuted to match. A conv's input channel
      order is arbitrary modulo this (tiny, hoistable) weight gather.
    """

    features: int
    kernel: int
    dtype: Any = jnp.float32
    in_perm: tuple | None = None  # assembled channel j ← semantic in_perm[j]

    @nn.compact
    def __call__(self, x_s2d, x2_s2d=None):
        cin = x_s2d.shape[-1] // 4
        ca = cin
        if x2_s2d is not None:
            if self.in_perm is not None:
                raise ValueError("in_perm and a second operand are exclusive")
            cin += x2_s2d.shape[-1] // 4
        Wp_b = None
        if not self.is_initializing() and self.has_variable("prepared", "kernel"):
            Wp = self.get_variable("prepared", "kernel").astype(self.dtype)
            bias4 = self.get_variable("prepared", "bias").astype(self.dtype)
            _, _, pad = _remap_plan(self.kernel)
            if x2_s2d is not None:
                # prepared kernel input axis is (r, s, [c_a ++ c_b]); slice
                # each operand's channels out of every phase block
                idx_a = [p * cin + c for p in range(4) for c in range(ca)]
                idx_b = [p * cin + c for p in range(4) for c in range(ca, cin)]
                Wp_b = jnp.take(Wp, jnp.asarray(idx_b), axis=2)
                Wp = jnp.take(Wp, jnp.asarray(idx_a), axis=2)
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (self.kernel, self.kernel, cin, self.features),
                jnp.float32,
            )
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if x2_s2d is not None:
                Wp, pad = remap_kernel(kernel[:, :, :ca].astype(self.dtype))
                Wp_b, _ = remap_kernel(kernel[:, :, ca:].astype(self.dtype))
            else:
                Wp, pad = remap_kernel(kernel.astype(self.dtype))
            bias4 = jnp.tile(bias.astype(self.dtype), 4)
        if self.in_perm is not None:
            Wp = jnp.take(Wp, jnp.asarray(self.in_perm), axis=2)
        Y = jax.lax.conv_general_dilated(
            x_s2d.astype(self.dtype),
            Wp,
            window_strides=(1, 1),
            padding=(pad, pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )
        if x2_s2d is not None:
            Y = Y + jax.lax.conv_general_dilated(
                x2_s2d.astype(self.dtype),
                Wp_b,
                window_strides=(1, 1),
                padding=(pad, pad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype,
            )
        return Y + bias4


class S2DConvLReLU(nn.Module):
    """Polyphase drop-in for ConvLReLU: S2D in, S2D out. Child scope 'conv'
    keeps checkpoint paths identical."""

    features: int
    kernel: int = 3
    dtype: Any = jnp.float32
    in_perm: tuple | None = None

    @nn.compact
    def __call__(self, x_s2d, x2_s2d=None):
        y = S2DConv(
            self.features, self.kernel, dtype=self.dtype,
            in_perm=self.in_perm, name="conv",
        )(x_s2d, x2_s2d)
        return nn.leaky_relu(y, negative_slope=0.1)
