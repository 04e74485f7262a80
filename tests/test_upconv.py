"""Exactness of the composite upsample+conv (ops/upconv.py) against the
literal path (bilinear 2x upsample → 3x3 SAME conv), incl. borders/corners
and degenerate 1-pixel grids."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from superslomo_tpu.ops.resize import upsample_2x_bilinear
from superslomo_tpu.ops.s2d import space_to_depth
from superslomo_tpu.ops.upconv import UpConvLReLU, upsample_conv


@pytest.mark.parametrize(
    "shape",
    [(2, 5, 7, 6, 3), (1, 1, 4, 4, 8), (1, 4, 1, 3, 2), (1, 1, 1, 2, 2), (2, 8, 8, 16, 32)],
)
def test_upsample_conv_exact(shape, rng):
    B, Hh, Wh, Ci, Co = shape
    z = jnp.asarray(rng.standard_normal((B, Hh, Wh, Ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.2, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        upsample_2x_bilinear(z), w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = upsample_conv(z, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(space_to_depth(ref)), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize(
    "shape",
    [
        (2, 5, 7, 6, 2, 3),   # odd sizes, uneven channel split
        (1, 2, 2, 4, 4, 8),   # Hh == Wh == 2: thin strips coincide
        (1, 4, 1, 3, 5, 2),   # Wh == 1: degenerate fallback
        (1, 3, 4, 1, 7, 4),   # 1-channel first operand
    ],
)
def test_upsample_conv_pair_matches_concat(shape, rng):
    """The split-operand composite (LAYOUT_V2 decoder) equals the composite
    on the concatenated input everywhere, including the recomputed border
    ring, corners, and degenerate shapes."""
    from superslomo_tpu.ops.upconv import upsample_conv_pair

    B, Hh, Wh, C1, C2, Co = shape
    z1 = jnp.asarray(rng.standard_normal((B, Hh, Wh, C1)), jnp.float32)
    z2 = jnp.asarray(rng.standard_normal((B, Hh, Wh, C2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C1 + C2, Co)) * 0.2, jnp.float32)
    ref = upsample_conv(jnp.concatenate([z1, z2], axis=-1), w)
    got = upsample_conv_pair(z1, z2, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_s2dconv_split_and_perm(rng):
    """S2DConv's LAYOUT_V2 extensions: (a) two-operand split equals the conv
    of s2d_concat; (b) in_perm consumes a channel-permuted assembly exactly."""
    from superslomo_tpu.ops.s2d import S2DConv, s2d_concat, space_to_depth

    a_full = jnp.asarray(rng.standard_normal((1, 8, 10, 3)), jnp.float32)
    b_full = jnp.asarray(rng.standard_normal((1, 8, 10, 5)), jnp.float32)
    a, b = space_to_depth(a_full), space_to_depth(b_full)

    conv = S2DConv(4, 3)
    params = conv.init(jax.random.PRNGKey(1), s2d_concat(a, b))
    ref = conv.apply(params, s2d_concat(a, b))
    got = conv.apply(params, a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # grouped (c, r, s) order + in_perm == semantic (r, s, c) order
    x = s2d_concat(a, b)  # (1, 4, 5, 32), semantic (r, s, c), cin = 8
    cin = x.shape[-1] // 4
    xg = (
        x.reshape(1, 4, 5, 4, cin).transpose(0, 1, 2, 4, 3).reshape(1, 4, 5, -1)
    )  # grouped: channel j = c*4 + phase
    perm = tuple((j % 4) * cin + j // 4 for j in range(4 * cin))
    convp = S2DConv(4, 3, in_perm=perm)
    got_p = convp.apply(params, xg)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref), atol=1e-5)


def test_upconv_module_params_port(rng):
    """Param tree matches ConvLReLU's ('conv/kernel' (3,3,Ci,Co)) so torch
    checkpoints convert without special-casing decoder layers."""
    m = UpConvLReLU(4)
    z = jnp.asarray(rng.standard_normal((1, 3, 3, 8)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), z)
    assert params["params"]["conv"]["kernel"].shape == (3, 3, 8, 4)
    assert params["params"]["conv"]["bias"].shape == (4,)
    out = m.apply(params, z)
    assert out.shape == (1, 3, 3, 16)

    # equals upsample → conv → bias → LReLU
    w = params["params"]["conv"]["kernel"]
    b = params["params"]["conv"]["bias"]
    ref = jax.lax.conv_general_dilated(
        upsample_2x_bilinear(z), w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    ref = jnp.where(ref >= 0, ref, 0.1 * ref)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(space_to_depth(ref)), atol=1e-5, rtol=1e-5
    )


def test_warp_bf16_values_f32_positions(rng):
    """Mixed-precision warp: bf16 image values with f32 position math stays
    within bf16 quantization of the f32 result (the XLA path; the Pallas
    kernel mirrors it on TPU)."""
    from superslomo_tpu.ops.warp import backward_warp

    img = jnp.asarray(rng.standard_normal((2, 40, 1280, 3)), jnp.float32)
    flow = jnp.asarray((rng.standard_normal((2, 40, 1280, 2)) * 20), jnp.float32)
    ref = np.asarray(backward_warp(img, flow))
    out = np.asarray(backward_warp(img.astype(jnp.bfloat16), flow).astype(jnp.float32))
    # bf16 has ~2-3 decimal digits; positions must NOT be quantized (a bf16
    # position at x~1200 would be off by whole pixels → O(1) errors)
    assert np.abs(out - ref).max() < 0.08
