"""Pallas warp kernel parity tests.

The kernel compiles only for real TPUs (Mosaic dynamic_gather), so these
tests are skipped on the CPU test platform; they run when JAX_PLATFORMS
allows a TPU (e.g. `JAX_PLATFORMS= python -m pytest tests/test_warp_pallas.py`
on a TPU host). CI-equivalent coverage on CPU comes from the pure-JAX warp
parity tests in test_ops.py, which the kernel is verified against here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas warp kernel needs a TPU"
)


@requires_tpu
@pytest.mark.parametrize("shape", [(1, 64, 128, 3), (2, 100, 200, 3)])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_pallas_warp_matches_xla(shape, dtype):
    """f32: exact vs the XLA gather. bf16: values quantized, positions f32 —
    must match the XLA mixed-precision path exactly (same arithmetic)."""
    from superslomo_tpu.ops.warp import backward_warp
    from superslomo_tpu.ops.warp_pallas import backward_warp_pallas

    B, H, W, C = shape
    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal(shape, dtype=np.float32)).astype(dt)
    flow = jnp.asarray((rng.standard_normal((B, H, W, 2)) * 7).astype(np.float32))
    ref = np.asarray(backward_warp(img, flow).astype(jnp.float32))
    out = np.asarray(backward_warp_pallas(img, flow).astype(jnp.float32))
    tol = 1e-5 if dtype == "float32" else 3e-2
    np.testing.assert_allclose(out, ref, atol=tol, rtol=tol)


@requires_tpu
def test_pallas_warp_out_of_band_guard():
    """Flows beyond the kernel's ±128 band must be exact (runtime guard →
    XLA gather fallback), not silently zero."""
    from superslomo_tpu.ops.warp import backward_warp
    from superslomo_tpu.ops.warp_pallas import backward_warp_pallas

    rng = np.random.default_rng(2)
    B, H, W, C = 1, 192, 256, 3
    img = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    flow = jnp.asarray((rng.standard_normal((B, H, W, 2)) * 5).astype(np.float32))
    # push some flows far out of band (|u| up to ~180 px)
    flow = flow.at[:, 10:40, 10:40, 0].add(170.0)
    ref = np.asarray(backward_warp(img, flow))
    out = np.asarray(backward_warp_pallas(img, flow))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
    # sanity: the shifted region really does sample far-away content
    assert np.abs(ref[:, 10:40, 10:40]).sum() > 0


@requires_tpu
def test_pallas_warp_gradients():
    from superslomo_tpu.ops.warp_pallas import backward_warp_pallas

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((1, 64, 128, 2), dtype=np.float32))
    flow = jnp.asarray((rng.standard_normal((1, 64, 128, 2)) * 3).astype(np.float32))

    def loss(f, im):
        return jnp.sum(backward_warp_pallas(im, f) ** 2)

    gf, gi = jax.grad(loss, argnums=(0, 1))(flow, img)
    assert np.isfinite(np.asarray(gf)).all() and float(jnp.abs(gf).sum()) > 0
    assert np.isfinite(np.asarray(gi)).all()


@requires_tpu
def test_planar_multiflow_out_dtype_exact():
    """out_dtype=bf16 must equal astype-after-f32-warp BIT-FOR-BIT: the
    kernel accumulates f32 in VMEM scratch and only the final store rounds
    (round 5 — the stage-2 input warps rely on this identity)."""
    from superslomo_tpu.ops.warp_pallas import backward_warp_multiflow_planar

    rng = np.random.default_rng(3)
    B, C, n, H, W = 1, 3, 4, 96, 160
    planes = jnp.asarray(
        rng.standard_normal((B, C, H, W), dtype=np.float32)
    ).astype(jnp.bfloat16)
    u = jnp.asarray((rng.standard_normal((B, n, H, W)) * 6).astype(np.float32))
    v = jnp.asarray((rng.standard_normal((B, n, H, W)) * 6).astype(np.float32))
    f32_out = backward_warp_multiflow_planar(planes, u, v)
    bf16_out = backward_warp_multiflow_planar(
        planes, u, v, out_dtype=jnp.bfloat16
    )
    assert f32_out.dtype == jnp.float32 and bf16_out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(bf16_out.astype(jnp.float32)),
        np.asarray(f32_out.astype(jnp.bfloat16).astype(jnp.float32)),
    )
