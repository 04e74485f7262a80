"""Polyphase space-to-depth ops: exactness vs the plain full-resolution ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from superslomo_tpu.models.layers import ConvLReLU
from superslomo_tpu.ops import avg_pool_2x2, upsample_2x_bilinear
from superslomo_tpu.ops.s2d import (
    S2DConvLReLU,
    depth_to_space,
    s2d_concat,
    s2d_pool_mean,
    s2d_upsample2x,
    space_to_depth,
)


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 3), dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


def test_s2d_layout():
    # channel layout must be (r, s, c)
    x = jnp.arange(2 * 2 * 1, dtype=jnp.float32).reshape(1, 2, 2, 1)
    X = np.asarray(space_to_depth(x))[0, 0, 0]
    np.testing.assert_array_equal(X, [0, 1, 2, 3])  # (r=0,s=0),(0,1),(1,0),(1,1)


@pytest.mark.parametrize("kernel", [7, 3])
def test_polyphase_conv_matches_plain(rng, kernel):
    """Same params through both implementations → same output."""
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 6), dtype=np.float32))
    plain = ConvLReLU(32, kernel)
    s2d = S2DConvLReLU(32, kernel)

    params = plain.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(plain.apply(params, x))
    out = np.asarray(depth_to_space(s2d.apply(params, space_to_depth(x))))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_s2d_pool_mean_matches_avg_pool(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5), dtype=np.float32))
    ref = np.asarray(avg_pool_2x2(x))
    out = np.asarray(s2d_pool_mean(space_to_depth(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_s2d_upsample_matches_bilinear(rng):
    z = jnp.asarray(rng.standard_normal((2, 6, 9, 4), dtype=np.float32))
    ref = np.asarray(upsample_2x_bilinear(z))
    out = np.asarray(depth_to_space(s2d_upsample2x(z)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_s2d_concat_matches_full_concat(rng):
    a = jnp.asarray(rng.standard_normal((1, 6, 8, 3), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((1, 6, 8, 2), dtype=np.float32))
    ref = np.asarray(jnp.concatenate([a, b], axis=-1))
    out = np.asarray(depth_to_space(s2d_concat(space_to_depth(a), space_to_depth(b))))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_slice_ops_bitwise_match_reshape_forms(rng, monkeypatch):
    """SSMTPU_S2D_SLICE_OPS=1 (layout-preserving slice formulations, see
    ops/s2d.py _slice_ops) is bit-identical to the default reshape forms
    for every gated op."""
    from superslomo_tpu.ops import s2d as s2d_mod

    a = jnp.asarray(rng.standard_normal((2, 8, 12, 3), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((2, 8, 12, 5), dtype=np.float32))
    base = {
        "s2d": np.asarray(space_to_depth(a)),
        "concat": np.asarray(s2d_concat(space_to_depth(a), space_to_depth(b))),
        "pool": np.asarray(s2d_pool_mean(space_to_depth(a))),
    }
    monkeypatch.setenv("SSMTPU_S2D_SLICE_OPS", "1")
    assert s2d_mod._slice_ops()
    np.testing.assert_array_equal(np.asarray(space_to_depth(a)), base["s2d"])
    np.testing.assert_array_equal(
        np.asarray(s2d_concat(space_to_depth(a), space_to_depth(b))),
        base["concat"],
    )
    np.testing.assert_array_equal(
        np.asarray(s2d_pool_mean(space_to_depth(a))), base["pool"]
    )


@pytest.mark.compile
def test_slice_ops_full_model_equivalence(rng, monkeypatch):
    """The fused multi-t forward is bitwise unchanged under the slice
    formulations (the whole point: same math, different layout)."""
    import jax as _jax

    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo

    spec = ModelSpec(n_frames=2, compute_dtype="float32")
    model = SuperSloMo(spec=spec)
    frames = jnp.asarray(rng.standard_normal((1, 2, 64, 64, 3), dtype=np.float32))
    t_values = jnp.asarray([0.25, 0.5])
    params = model.init(_jax.random.PRNGKey(0), frames, jnp.full((1, 1), 0.5))

    def run():
        out, bound = model.apply(
            params, frames, t_values, with_bounds=True,
            method=SuperSloMo.interpolate_multi_t,
        )
        return np.asarray(out)

    ref = run()
    monkeypatch.setenv("SSMTPU_S2D_SLICE_OPS", "1")
    np.testing.assert_allclose(run(), ref, rtol=0, atol=1e-6)


def test_polyphase_conv_gradients(rng):
    x = space_to_depth(jnp.asarray(rng.standard_normal((1, 8, 8, 3), dtype=np.float32)))
    m = S2DConvLReLU(8, 7)
    params = m.init(jax.random.PRNGKey(0), x)

    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0
