"""LAYOUT_V2 equivalence: the split-conv decoder (conv/upconv are linear in
input channels), the grouped (c, r, s) stage-2 assembly consumed via
conv1a's in_perm weight permutation, and the head layout fence are EXACT
rewrites of the v1 graph — same params, same outputs, same gradients.

The knob exists purely for TPU layout reasons (see config.py [TPU]
LAYOUT_V2); these tests pin the algebra so flipping the default can never
change results.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from superslomo_tpu.config import ModelSpec
from superslomo_tpu.models.superslomo import SuperSloMo

V1 = ModelSpec(n_frames=2)
V2 = ModelSpec(n_frames=2, layout_v2=True)
# Piecemeal gating (round 5): grouped assembly + fence WITHOUT the
# split-conv decoder — the memory-neutral subset that fits the 720p B=8
# headline shape where full v2 OOMs (ARCHITECTURE.md).
V2_ASM = ModelSpec(n_frames=2, lv2_assembly=True, lv2_fence=True)


def _frames(rng, b=1, t=2, h=64, w=64):
    return jnp.asarray(rng.standard_normal((b, t, h, w, 3)), jnp.float32)


def test_forward_equivalence_f32(rng):
    """Training-path __call__: v2 == v1 on every output tensor (the split
    convs only reassociate f32 accumulation)."""
    m1, m2 = SuperSloMo(spec=V1), SuperSloMo(spec=V2)
    frames = _frames(rng, b=2)
    t = jnp.full((2, 1), 0.5, jnp.float32)
    params = m1.init(jax.random.PRNGKey(0), frames, t)
    o1 = m1.apply(params, frames, t)
    o2 = m2.apply(params, frames, t)
    np.testing.assert_allclose(
        np.asarray(o2.flowC_out), np.asarray(o1.flowC_out), atol=2e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(o2.flowI_out), np.asarray(o1.flowI_out), atol=2e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(o2.pred_images), np.asarray(o1.pred_images), atol=2e-5, rtol=0
    )


def test_param_trees_identical(rng):
    """layout_v2 must not move or reshape a single parameter — checkpoints
    and the torch converter are oblivious to it."""
    frames = _frames(rng)
    t = jnp.full((1, 1), 0.5, jnp.float32)
    p1 = SuperSloMo(spec=V1).init(jax.random.PRNGKey(0), frames, t)
    p2 = SuperSloMo(spec=V2).init(jax.random.PRNGKey(0), frames, t)
    s1 = jax.tree.map(lambda x: (x.shape, x.dtype), p1)
    s2 = jax.tree.map(lambda x: (x.shape, x.dtype), p2)
    assert s1 == s2


@pytest.mark.parametrize("batch,spec2", [(1, V2), (2, V2), (1, V2_ASM)])
def test_planar_multi_t_equivalence(rng, batch, spec2):
    """The fused multi-t fast path (grouped-order assembly + in_perm +
    fences + split decoder): v2 pred/bound == v1 — and the assembly-only
    piecemeal spec (no split decoder) likewise."""
    m1, m2 = SuperSloMo(spec=V1), SuperSloMo(spec=spec2)
    frames = _frames(rng, b=batch)
    t_values = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)
    params = m1.init(jax.random.PRNGKey(0), frames, jnp.full((batch, 1), 0.5))
    pred1, bound1 = m1.apply(
        params, frames, t_values, with_bounds=True,
        method=SuperSloMo.interpolate_multi_t,
    )
    pred2, bound2 = m2.apply(
        params, frames, t_values, with_bounds=True,
        method=SuperSloMo.interpolate_multi_t,
    )
    np.testing.assert_allclose(
        np.asarray(pred2), np.asarray(pred1), atol=2e-5, rtol=0
    )
    np.testing.assert_allclose(
        float(bound2), float(bound1), atol=1e-5, rtol=0
    )


def test_planar_multi_t_prepared_equivalence(rng):
    """The prepared-kernel path under v2 (per-phase channel gathers of the
    full remapped kernels) matches the in-trace split remaps exactly."""
    from superslomo_tpu.ops.prepare import with_prepared

    m2 = SuperSloMo(spec=V2)
    frames = _frames(rng)
    t_values = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)
    params = m2.init(jax.random.PRNGKey(0), frames, jnp.full((1, 1), 0.5))
    pred_a, _ = m2.apply(
        params, frames, t_values, with_bounds=True,
        method=SuperSloMo.interpolate_multi_t,
    )
    pred_b, _ = m2.apply(
        with_prepared(params), frames, t_values, with_bounds=True,
        method=SuperSloMo.interpolate_multi_t,
    )
    np.testing.assert_allclose(
        np.asarray(pred_b), np.asarray(pred_a), atol=1e-6, rtol=0
    )


def test_spatial_sharded_forward_matches_v1(rng):
    """LAYOUT_V2 under a (2 data x 2 spatial) mesh == v1 under the SAME
    mesh: the split-conv decoder and head fences must survive SPMD
    partitioning (certifies flipping the default is safe for multi-chip
    training).

    Deliberately sharded-vs-sharded, NOT sharded-vs-unsharded: H-sharding
    changes per-op fp reduction orders, and with random-init weights
    (operator norms > 1, no normalization layers) that ulp-level noise
    amplifies diffusely through the 24 conv layers to ~3e-2 on raw outputs
    for v1 and v2 ALIKE (bisected 2026-08-18: spatially uniform — no
    shard-boundary structure — identical magnitude for both layouts, warp
    exact, loss means unaffected; see test_parallel.py's trainer spatial
    test for the loss-level sharded-vs-unsharded contract)."""
    from superslomo_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    mesh = make_mesh(n_data=2, n_spatial=2, devices=jax.devices()[:4])
    m1, m2 = SuperSloMo(spec=V1), SuperSloMo(spec=V2)
    B, H, W = 2, 64, 64
    frames = _frames(rng, b=B, h=H, w=W)
    t = jnp.full((B, 1), 0.5, jnp.float32)
    params = m1.init(jax.random.PRNGKey(0), frames, t)

    img_sh = batch_sharding(mesh, spatial_dim=2)
    frames_sh = jax.device_put(frames, img_sh)
    t_sh = jax.device_put(t, batch_sharding(mesh))
    outs = {}
    for name, m in (("v1", m1), ("v2", m2)):
        fwd = jax.jit(
            lambda p, f, tt, m=m: m.apply(p, f, tt).pred_images,
            in_shardings=(replicated(mesh), img_sh, batch_sharding(mesh)),
            out_shardings=img_sh,
        )
        outs[name] = np.asarray(fwd(params, frames_sh, t_sh))
    np.testing.assert_allclose(outs["v2"], outs["v1"], atol=2e-5, rtol=0)


def test_grad_equivalence_f32(rng):
    """Gradients through the split decoder match v1 (training can run with
    either layout)."""
    m1, m2 = SuperSloMo(spec=V1), SuperSloMo(spec=V2)
    frames = _frames(rng)
    t = jnp.full((1, 1), 0.5, jnp.float32)
    params = m1.init(jax.random.PRNGKey(0), frames, t)

    def loss(p, m):
        return jnp.sum(m.apply(p, frames, t).pred_images ** 2)

    g1 = jax.grad(lambda p: loss(p, m1))(params)
    g2 = jax.grad(lambda p: loss(p, m2))(params)
    flat1, _ = jax.flatten_util.ravel_pytree(g1)
    flat2, _ = jax.flatten_util.ravel_pytree(g2)
    scale = float(jnp.max(jnp.abs(flat1))) + 1e-8
    np.testing.assert_allclose(
        np.asarray(flat2) / scale, np.asarray(flat1) / scale, atol=3e-5, rtol=0
    )
