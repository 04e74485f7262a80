"""Loss tests: shape/order contract, stage-freeze gating, and VGG extractor."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from superslomo_tpu.config import ModelSpec
from superslomo_tpu.models.losses import LossWeights, compute_losses
from superslomo_tpu.models.superslomo import SuperSloMo
from superslomo_tpu.models.vgg import VGG16Features, init_vgg_params

H, W = 32, 32
B = 2


@pytest.fixture(scope="module")
def vgg_apply():
    vgg = VGG16Features()
    vparams = init_vgg_params()
    return lambda img: vgg.apply(vparams, img)


def _outputs(spec):
    m = SuperSloMo(spec=spec)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((B, 2, H, W, 3), dtype=np.float32))
    t = jnp.full((B, 1), 0.5)
    params = m.init(jax.random.PRNGKey(0), frames, t)
    return m.apply(params, frames, t), rng


def test_loss_shape_and_total(vgg_apply):
    spec = ModelSpec(n_frames=2)
    out, rng = _outputs(spec)
    targets = jnp.asarray(rng.standard_normal((B, 1, H, W, 3), dtype=np.float32))
    losses = compute_losses(out, targets, spec, LossWeights(), vgg_apply)
    assert losses.shape == (B, 4)
    l = np.asarray(losses)
    # order: total, recon, warp, perceptual (reference losses.py:242)
    np.testing.assert_allclose(l[:, 0], l[:, 1] + l[:, 2] + l[:, 3], rtol=1e-5)
    assert np.isfinite(l).all() and (l[:, 0] > 0).all()


def test_freeze_gating(vgg_apply):
    """Warp loss drops frozen-stage terms (reference losses.py:159-168)."""
    out, rng = _outputs(ModelSpec(n_frames=2))
    targets = jnp.asarray(rng.standard_normal((B, 1, H, W, 3), dtype=np.float32))
    w = LossWeights()

    both = compute_losses(out, targets, ModelSpec(n_frames=2), w, vgg_apply)
    s1_frozen = compute_losses(
        out, targets, ModelSpec(n_frames=2, stage1_freeze=True), w, vgg_apply
    )
    all_frozen = compute_losses(
        out, targets,
        ModelSpec(n_frames=2, stage1_freeze=True, stage2_freeze=True),
        w, vgg_apply,
    )
    assert np.all(np.asarray(s1_frozen[:, 2]) < np.asarray(both[:, 2]))
    np.testing.assert_allclose(np.asarray(all_frozen[:, 2]), 0.0, atol=1e-7)
    # recon & perceptual are unaffected by freezing
    np.testing.assert_allclose(np.asarray(s1_frozen[:, 1]), np.asarray(both[:, 1]))


def test_vgg_shapes(vgg_apply):
    feats = vgg_apply(jnp.zeros((1, 64, 64, 3)))
    assert feats.shape == (1, 8, 8, 512)  # conv4_3: 1/8 res, 512ch


def test_loss_differentiable(vgg_apply):
    spec = ModelSpec(n_frames=2)
    m = SuperSloMo(spec=spec)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((B, 2, H, W, 3), dtype=np.float32))
    t = jnp.full((B, 1), 0.5)
    params = m.init(jax.random.PRNGKey(0), frames, t)
    targets = jnp.asarray(rng.standard_normal((B, 1, H, W, 3), dtype=np.float32))

    def loss_fn(p):
        out = m.apply(p, frames, t)
        return compute_losses(out, targets, spec, LossWeights(), vgg_apply)[:, 0].mean()

    g = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
