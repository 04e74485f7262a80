"""Prepared-inference-params equivalence: the hoisted weight transforms
(ops/prepare.py) must reproduce the in-trace path bit-for-bit in f32 and to
quantization-noise in bf16, across the standalone U-Net, the full fused
multi-t step, and the upconv border rework."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superslomo_tpu.config import ModelSpec
from superslomo_tpu.models.superslomo import SuperSloMo
from superslomo_tpu.models.unet import UNet
from superslomo_tpu.ops import prepare_inference_params, with_prepared


def test_unet_prepared_matches_raw():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1, 64, 96, 6), dtype=np.float32))
    net = UNet(out_channels=4, emit_encoding=False)
    params = net.init(jax.random.PRNGKey(0), x)
    raw, _, _ = net.apply(params, x)
    prep, _, _ = net.apply(with_prepared(params), x)
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(prep))


def test_prepared_collection_covers_all_transformed_convs():
    x = jnp.zeros((1, 1, 64, 96, 6))
    net = UNet(out_channels=4)
    params = net.init(jax.random.PRNGKey(0), x)
    prep = prepare_inference_params(params)
    names = set(prep.keys())
    # all 8 s2d convs + 5 upconv folds of one U-Net
    assert {"conv1a", "conv1b", "conv2a", "conv2b", "conv10b", "conv11b",
            "fuse_conv", "final_conv", "conv7a", "conv8a", "conv9a",
            "conv10a", "conv11a"} <= names
    # s2d: remapped shape (K', K', 4cin, 4cout); 7x7 conv1a: 6->32
    k1 = prep["conv1a"]["conv"]["kernel"]
    assert k1.shape[2] == 4 * 6 and k1.shape[3] == 4 * 32
    # upconv: folded (3, 3, cin, 4cout)
    kf = prep["conv11a"]["kernel_folded"]
    assert kf.shape[0] == 3 and kf.shape[3] == 4 * 32


@pytest.mark.parametrize("n_frames,bottleneck", [(2, "CONV"), (4, "CLSTM")])
def test_full_model_multi_t_prepared_matches_raw(n_frames, bottleneck):
    rng = np.random.default_rng(1)
    spec = ModelSpec(
        n_frames=n_frames,
        stage1_bottleneck=bottleneck,
        stage2_bottleneck=bottleneck,
    )
    model = SuperSloMo(spec=spec)
    frames = jnp.asarray(
        rng.standard_normal((1, n_frames, 64, 96, 3), dtype=np.float32)
    )
    t_values = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)
    t0 = jnp.full((1, n_frames - 1), 0.5, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), frames, t0)

    run = lambda v: model.apply(
        v, frames, t_values, with_bounds=True,
        method=SuperSloMo.interpolate_multi_t,
    )
    pred_raw, bound_raw = run(params)
    pred_prep, bound_prep = run(with_prepared(params))
    np.testing.assert_allclose(
        np.asarray(pred_raw), np.asarray(pred_prep), atol=1e-6, rtol=0
    )
    np.testing.assert_allclose(float(bound_raw), float(bound_prep), atol=1e-6)


def test_prepared_call_path_single_t():
    """__call__ (training-shaped forward) also honors the collection."""
    rng = np.random.default_rng(2)
    spec = ModelSpec(n_frames=2)
    model = SuperSloMo(spec=spec)
    frames = jnp.asarray(rng.standard_normal((1, 2, 64, 96, 3), dtype=np.float32))
    t = jnp.full((1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), frames, t)
    out_raw = model.apply(params, frames, t)
    out_prep = model.apply(with_prepared(params), frames, t)
    np.testing.assert_array_equal(
        np.asarray(out_raw.pred_images), np.asarray(out_prep.pred_images)
    )
