"""Parity tests for core ops against torch ground truth (torch-cpu is in the
image purely as a numerics oracle — the framework itself never imports it).

Covers the reference's hot native ops (SURVEY.md §2.4): grid_sample backward
warp, AvgPool2d, bilinear 2x upsample.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from superslomo_tpu.ops import avg_pool_2x2, backward_warp, upsample_2x_bilinear
from superslomo_tpu.ops.pooling import max_pool_2x2


def torch_warp(x_nchw: np.ndarray, flo_nchw: np.ndarray) -> np.ndarray:
    """The reference warp (scripts/models/layers.py:73-120) reproduced with
    torch ops as an oracle: pixel grid + flow, normalized, grid_sample with
    align_corners=True and zeros padding."""
    x = torch.from_numpy(x_nchw)
    flo = torch.from_numpy(flo_nchw)
    B, C, H, W = x.shape
    xx = torch.arange(0, W).view(1, -1).repeat(H, 1)
    yy = torch.arange(0, H).view(-1, 1).repeat(1, W)
    xx = xx.view(1, 1, H, W).repeat(B, 1, 1, 1)
    yy = yy.view(1, 1, H, W).repeat(B, 1, 1, 1)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid + flo
    u = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    v = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    vgrid = torch.stack([u, v], dim=3)
    out = F.grid_sample(x, vgrid, align_corners=True)
    return out.numpy()


class TestBackwardWarp:
    @pytest.mark.parametrize("shape", [(2, 16, 24, 3), (1, 8, 8, 1), (3, 32, 20, 5)])
    def test_matches_grid_sample(self, rng, shape):
        B, H, W, C = shape
        img = rng.standard_normal((B, H, W, C), dtype=np.float32)
        # flows large enough to push samples out of bounds
        flow = (rng.standard_normal((B, H, W, 2)) * 5.0).astype(np.float32)

        ours = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow)))
        ref = torch_warp(
            img.transpose(0, 3, 1, 2), flow.transpose(0, 3, 1, 2)
        ).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_zero_flow_is_identity(self, rng):
        img = rng.standard_normal((2, 12, 10, 3), dtype=np.float32)
        flow = np.zeros((2, 12, 10, 2), dtype=np.float32)
        out = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(out, img, rtol=1e-6, atol=1e-6)

    def test_integer_shift(self, rng):
        """flow u=+1 means output[x] = img[x+1] (backward warp)."""
        img = rng.standard_normal((1, 4, 6, 1), dtype=np.float32)
        flow = np.zeros((1, 4, 6, 2), dtype=np.float32)
        flow[..., 0] = 1.0
        out = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(out[0, :, :-1, 0], img[0, :, 1:, 0], rtol=1e-6)
        # last column sampled at x=W which is out of bounds -> 0
        np.testing.assert_allclose(out[0, :, -1, 0], 0.0, atol=1e-7)

    def test_gradients_flow(self, rng):
        import jax

        img = jnp.asarray(rng.standard_normal((1, 8, 8, 2), dtype=np.float32))
        flow = jnp.asarray((rng.standard_normal((1, 8, 8, 2)) * 2).astype(np.float32))

        def loss(f, im):
            return jnp.sum(backward_warp(im, f) ** 2)

        gf, gi = jax.grad(loss, argnums=(0, 1))(flow, img)
        assert np.isfinite(np.asarray(gf)).all()
        assert np.isfinite(np.asarray(gi)).all()
        assert float(jnp.abs(gf).sum()) > 0
        assert float(jnp.abs(gi).sum()) > 0


class TestPooling:
    def test_avg_pool_matches_torch(self, rng):
        x = rng.standard_normal((2, 16, 12, 5), dtype=np.float32)
        ours = np.asarray(avg_pool_2x2(jnp.asarray(x)))
        ref = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy()
        np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), rtol=1e-6, atol=1e-6)

    def test_max_pool_matches_torch(self, rng):
        x = rng.standard_normal((2, 16, 12, 5), dtype=np.float32)
        ours = np.asarray(max_pool_2x2(jnp.asarray(x)))
        ref = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy()
        np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), rtol=1e-6, atol=1e-6)


class TestUpsample:
    @pytest.mark.parametrize("shape", [(2, 8, 6, 3), (1, 5, 7, 2), (1, 1, 1, 1)])
    def test_matches_torch_bilinear(self, rng, shape):
        x = rng.standard_normal(shape, dtype=np.float32)
        ours = np.asarray(upsample_2x_bilinear(jnp.asarray(x)))
        ref = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            scale_factor=2,
            mode="bilinear",
            align_corners=False,
        ).numpy()
        np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-6)


class TestWarpMultiflowPlanarWrapper:
    """CPU-path contract of ops.warp_multiflow_planar (the TPU kernel's
    parity is pinned in tests/test_warp_pallas.py)."""

    def test_matches_per_flow_backward_warp(self, rng):
        from superslomo_tpu.ops import backward_warp, warp_multiflow_planar

        B, C, n, H, W = 2, 3, 3, 32, 48
        img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        flows = jnp.asarray(
            (rng.standard_normal((B, n, H, W, 2)) * 4), jnp.float32
        )
        planes = img.transpose(0, 3, 1, 2)
        out = warp_multiflow_planar(planes, flows[..., 0], flows[..., 1])
        assert out.shape == (B, C, n, H, W) and out.dtype == jnp.float32
        for k in range(n):
            ref = backward_warp(img, flows[:, k])
            np.testing.assert_allclose(
                np.asarray(out[:, :, k].transpose(0, 2, 3, 1)),
                np.asarray(ref), atol=1e-6, rtol=0,
            )

    def test_out_dtype_is_astype_of_f32(self, rng):
        """out_dtype=bf16 == astype(bf16) of the f32 result (round 5: the
        stage-2 input warps store the consumer dtype directly)."""
        from superslomo_tpu.ops import warp_multiflow_planar

        B, C, n, H, W = 1, 2, 2, 24, 40
        planes = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((B, n, H, W)) * 3, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, n, H, W)) * 3, jnp.float32)
        f32_out = warp_multiflow_planar(planes, u, v)
        bf_out = warp_multiflow_planar(planes, u, v, out_dtype=jnp.bfloat16)
        assert bf_out.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(bf_out.astype(jnp.float32)),
            np.asarray(f32_out.astype(jnp.bfloat16).astype(jnp.float32)),
        )
