"""U-Net and composite-model tests: shape walk (mirrors the reference's
__main__ smoke block at unetflow.py:35-51), multi-t fold correctness, and
gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from superslomo_tpu.config import ModelSpec
from superslomo_tpu.models.superslomo import (
    SuperSloMo,
    forward_inference,
    make_pairs,
)
from superslomo_tpu.models.unet import UNet

H, W = 32, 64


def _init(model, *args, **kwargs):
    return model.init(jax.random.PRNGKey(0), *args, **kwargs)


class TestUNet:
    def test_stage1_shapes_conv(self):
        m = UNet(out_channels=4, bottleneck="CONV", emit_encoding=True)
        x = jnp.zeros((1, 1, H, W, 6))
        params = _init(m, x)
        out, enc, carry = m.apply(params, x)
        assert out.shape == (1, 1, H, W, 4)
        assert enc.shape == (1, 1, H // 32, W // 32, 512)
        assert carry is None

    def test_stage2_shapes_cross_skip(self):
        m = UNet(out_channels=5, bottleneck="CONV", accept_encoding=True)
        x = jnp.zeros((1, 1, H, W, 16))
        enc = jnp.zeros((1, 1, H // 32, W // 32, 512))
        params = _init(m, x, enc)
        out, _, _ = m.apply(params, x, enc)
        assert out.shape == (1, 1, H, W, 5)

    @pytest.mark.parametrize("cell", ["CLSTM", "CGRU"])
    def test_recurrent_bottleneck(self, cell):
        m = UNet(out_channels=4, bottleneck=cell, emit_encoding=False)
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((1, 3, H, W, 6), dtype=np.float32)
        )  # 3 windows (N_FRAMES=4)
        params = _init(m, x)
        out, _, carry = m.apply(params, x)
        assert out.shape == (1, 3, H, W, 4)
        assert carry is not None and "fwd_l0" in carry
        # carry can be threaded back in (hidden-state carry across clips)
        out2, _, _ = m.apply(params, x, rnn_carry=jax.tree.map(jnp.asarray, carry))
        assert out2.shape == out.shape
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_param_names_match_reference_layers(self):
        m = UNet(out_channels=4, bottleneck="CONV")
        params = _init(m, jnp.zeros((1, 1, H, W, 6)))["params"]
        for name in ["conv1a", "conv2b", "conv5b", "conv6_0", "conv7a",
                     "conv11b", "fuse_conv", "final_conv"]:
            assert name in params, f"missing {name}"


class TestSuperSloMo:
    def _model(self, **kw):
        spec = ModelSpec(**kw)
        return SuperSloMo(spec=spec)

    def test_forward_n_frames_2(self):
        m = self._model(n_frames=2)
        frames = jnp.asarray(np.random.default_rng(0).standard_normal((2, 2, H, W, 3), dtype=np.float32))
        t = jnp.full((2, 1), 0.5)
        params = _init(m, frames, t)
        out = m.apply(params, frames, t)
        assert out.pred_images.shape == (2, 1, H, W, 3)
        assert out.flowC_out.shape == (2, 1, H, W, 4)
        assert out.flowI_in.shape == (2, 1, H, W, 16)
        assert out.flowI_out.shape == (2, 1, H, W, 5)
        assert np.isfinite(np.asarray(out.pred_images)).all()

    def test_forward_reference_t_shape(self):
        """Accepts the reference's B T-1 1 1 1 t_interp tensor."""
        m = self._model(n_frames=2)
        frames = jnp.zeros((1, 2, H, W, 3))
        t = jnp.full((1, 1, 1, 1, 1), 0.25)
        params = _init(m, frames, t)
        est, inter, carry = forward_inference(m, params, frames, t)
        assert est.shape == (1, H, W, 3)
        assert inter.flowC_01.shape == (1, H, W, 2)
        assert inter.v_0t.shape == (1, H, W, 1)
        assert carry is None

    def test_ssmr_forward_n_frames_4(self):
        m = self._model(n_frames=4, stage1_bottleneck="CLSTM", stage2_bottleneck="CLSTM")
        frames = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, H, W, 3), dtype=np.float32))
        t = jnp.full((1, 3), 0.5)
        params = _init(m, frames, t)
        out = m.apply(params, frames, t)
        assert out.pred_images.shape == (1, 3, H, W, 3)
        assert out.rnn_carry is not None

    def test_multi_t_matches_per_t_forwards(self):
        """The fused t-grid step must equal running the model once per t."""
        m = self._model(n_frames=2)
        rng = np.random.default_rng(2)
        frames = jnp.asarray(rng.standard_normal((1, 2, H, W, 3), dtype=np.float32))
        t_values = jnp.asarray([1 / 8, 4 / 8, 7 / 8], dtype=jnp.float32)
        params = _init(m, frames, jnp.full((1, 1), 0.5))

        fused = m.apply(params, frames, t_values, method=SuperSloMo.interpolate_multi_t)
        assert fused.shape == (1, 3, H, W, 3)

        for k, tv in enumerate(np.asarray(t_values)):
            out = m.apply(params, frames, jnp.full((1, 1), tv))
            diff = np.abs(np.asarray(fused[:, k]) - np.asarray(out.pred_images[:, 0]))
            # Pixels sitting on a bilinear cell boundary can flip their
            # floor() corner under different XLA fusion orders, and the
            # visibility division amplifies that; a real fold bug produces
            # mean diffs around 0.5 (seen during development), so these
            # thresholds still separate signal from noise by >100x.
            assert np.mean(diff) < 2e-3, f"mean diff {np.mean(diff)}"
            assert np.mean(diff > 5e-2) < 0.01, f"{np.mean(diff > 5e-2):%} pixels off"

    def test_pairs(self):
        frames = jnp.arange(2 * 3 * 1 * 1 * 3, dtype=jnp.float32).reshape(2, 3, 1, 1, 3)
        pairs = make_pairs(frames)
        assert pairs.shape == (2, 2, 1, 1, 6)
        np.testing.assert_array_equal(np.asarray(pairs[:, 0, ..., :3]), np.asarray(frames[:, 0]))
        np.testing.assert_array_equal(np.asarray(pairs[:, 0, ..., 3:]), np.asarray(frames[:, 1]))
        np.testing.assert_array_equal(np.asarray(pairs[:, 1, ..., :3]), np.asarray(frames[:, 1]))

    def test_gradients(self):
        m = self._model(n_frames=2)
        frames = jnp.asarray(np.random.default_rng(3).standard_normal((1, 2, H, W, 3), dtype=np.float32))
        t = jnp.full((1, 1), 0.5)
        params = _init(m, frames, t)

        def loss_fn(p):
            out = m.apply(p, frames, t)
            return jnp.mean(out.pred_images ** 2)

        grads = jax.grad(loss_fn)(params)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0


def test_remat_forward_and_grads_match(rng):
    """[TPU] REMAT rematerializes activations without changing values."""
    import jax
    import jax.numpy as jnp

    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo

    frames = jnp.asarray(rng.standard_normal((1, 2, 32, 32, 3)), jnp.float32)
    t = jnp.full((1, 1), 0.5)
    m0 = SuperSloMo(spec=ModelSpec(n_frames=2, remat=False))
    m1 = SuperSloMo(spec=ModelSpec(n_frames=2, remat=True))
    params = m0.init(jax.random.PRNGKey(0), frames, t)

    def loss(m, p):
        return jnp.sum(m.apply(p, frames, t).pred_images ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        g0, g1,
    )


def test_clstm_layout_variants(rng):
    """merge=sum uses full hidden per direction; gate_order permutations run
    and change the function (checkpoint-portability contract)."""
    import jax
    import jax.numpy as jnp

    from superslomo_tpu.models.bottleneck import BiConvRNN

    x = jnp.asarray(rng.standard_normal((1, 3, 2, 2, 8)), jnp.float32)
    concat = BiConvRNN(hidden_channels=8, num_layers=1, cell="CLSTM", merge="concat")
    pc = concat.init(jax.random.PRNGKey(0), x)
    out_c, _ = concat.apply(pc, x)
    assert out_c.shape == (1, 3, 2, 2, 8)
    # concat: 4 hidden per direction → gates conv 4*4=16 out channels
    assert pc["params"]["fwd_l0"]["gates"]["kernel"].shape[-1] == 16

    summed = BiConvRNN(hidden_channels=8, num_layers=1, cell="CLSTM", merge="sum")
    ps = summed.init(jax.random.PRNGKey(0), x)
    out_s, _ = summed.apply(ps, x)
    assert out_s.shape == (1, 3, 2, 2, 8)
    # sum: full 8 hidden per direction → gates conv 32 out channels
    assert ps["params"]["fwd_l0"]["gates"]["kernel"].shape[-1] == 32

    flipped = BiConvRNN(hidden_channels=8, num_layers=1, cell="CLSTM",
                        merge="concat", gate_order="ofig")
    out_f, _ = flipped.apply(pc, x)  # same params, different gate packing
    assert float(jnp.abs(out_f - out_c).max()) > 1e-4


def test_converted_shape_mismatch_is_loud(rng):
    """A checkpoint whose ConvLSTM layout disagrees with the model must fail
    with a pointer to the CLSTM_MERGE knob, not load garbage."""
    import pytest as _pytest

    from superslomo_tpu.training.checkpoint import check_converted_shapes

    template = {"conv6": {"fwd_l0": {"gates": {"kernel": np.zeros((3, 3, 12, 16))}}}}
    loaded = {"conv6": {"fwd_l0": {"gates": {"kernel": np.zeros((3, 3, 16, 32))}}}}
    with _pytest.raises(ValueError, match="CLSTM_MERGE"):
        check_converted_shapes(loaded, template, "stage1")


@pytest.mark.parametrize("batch", [1, 3])
def test_multi_t_with_bounds_matches(rng, batch):
    """The unguarded checked fast path returns the same predictions plus a
    finite flow bound that really bounds every warp's flow — at batch 1 AND
    batch >1 (the driver bench's headline runs the planar path at B=4; a
    fold-order bug in the batched planar assembly would silently corrupt
    every sample but the first)."""
    import jax
    import jax.numpy as jnp

    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo

    model = SuperSloMo(spec=ModelSpec(n_frames=2))
    frames = jnp.asarray(rng.standard_normal((batch, 2, 32, 32, 3)), jnp.float32)
    t_values = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), frames, jnp.full((batch, 1), 0.5))

    plain = model.apply(params, frames, t_values,
                        method=SuperSloMo.interpolate_multi_t)
    pred, bound = model.apply(params, frames, t_values, with_bounds=True,
                              method=SuperSloMo.interpolate_multi_t)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(plain),
                               atol=1e-6, rtol=1e-6)
    assert np.isfinite(float(bound)) and float(bound) >= 0


def test_none_carry_equals_zeros_carry(rng):
    """rnn_carry=None initializes the cell scan to zeros, so an explicit
    zeros carry (built via jax.eval_shape, no compile) is bit-identical —
    bench.py's SSM-R secondary relies on this to compile ONE program
    instead of the None- and dict-carry variants."""
    import jax
    import jax.numpy as jnp

    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo

    m = SuperSloMo(spec=ModelSpec(
        n_frames=4, stage1_bottleneck="CLSTM", stage2_bottleneck="CLSTM"
    ))
    frames = jnp.asarray(rng.standard_normal((1, 4, 32, 32, 3)), jnp.float32)
    t = jnp.full((1, 3), 0.5, jnp.float32)
    params = m.init(jax.random.PRNGKey(0), frames, t)

    out_none = m.apply(params, frames, t)
    carry_shape = jax.eval_shape(
        lambda p, f: m.apply(p, f, t).rnn_carry, params, frames
    )
    zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), carry_shape)
    out_zero = m.apply(params, frames, t, rnn_carry=zeros)
    np.testing.assert_array_equal(
        np.asarray(out_zero.pred_images), np.asarray(out_none.pred_images)
    )


def test_multi_t_with_streamed_carry_matches_per_t(rng):
    """interpolate_multi_t with a streamed-in recurrent carry (batch B,
    broadcast over the folded t-grid) == per-t forwards threading the SAME
    carry — the ADVICE round-2 fix: before it, passing rnn_carry into the
    fused path shape-errored on the B·n_t stage-2 fold."""
    import jax
    import jax.numpy as jnp

    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo

    m = SuperSloMo(spec=ModelSpec(
        n_frames=4, stage1_bottleneck="CLSTM", stage2_bottleneck="CLSTM"
    ))
    clip = jnp.asarray(rng.standard_normal((1, 7, 32, 32, 3)), jnp.float32)
    t_stream = jnp.full((1, 3), 0.5, jnp.float32)
    params = m.init(jax.random.PRNGKey(0), clip[:, 0:4], t_stream)

    # stream window 0 to produce a real carry, then render the t-grid on
    # window 1 with that state
    out0 = m.apply(params, clip[:, 0:4], t_stream)
    carry = out0.rnn_carry
    assert carry is not None
    window1 = clip[:, 3:7]
    t_values = jnp.asarray([0.25, 0.75], jnp.float32)

    fused = m.apply(params, window1, t_values, rnn_carry=carry,
                    method=SuperSloMo.interpolate_multi_t)
    assert fused.shape == (1, 2, 32, 32, 3)
    # the unguarded planar fast path must accept the carry too
    pred_fast, bound = m.apply(params, window1, t_values, rnn_carry=carry,
                               with_bounds=True,
                               method=SuperSloMo.interpolate_multi_t)
    np.testing.assert_allclose(np.asarray(pred_fast), np.asarray(fused),
                               atol=1e-5, rtol=1e-5)
    assert np.isfinite(float(bound))
    for k, tv in enumerate(np.asarray(t_values)):
        out = m.apply(params, window1, jnp.full((1, 3), tv), rnn_carry=carry)
        mid = out.pred_images.shape[1] // 2
        diff = np.abs(np.asarray(fused[:, k]) - np.asarray(out.pred_images[:, mid]))
        assert np.mean(diff) < 2e-3, f"t={tv}: mean diff {np.mean(diff)}"


def test_multi_t_matches_per_t_forwards_ssmr(rng):
    """Fused t-grid == per-t forwards for the RECURRENT 4-frame model too:
    covers the (B, W_n, n_t) → (B·n_t, W_n) regrouping and mid-window
    selection with W_n = 3 windows and a CLSTM bottleneck."""
    import jax
    import jax.numpy as jnp

    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo

    m = SuperSloMo(spec=ModelSpec(
        n_frames=4, stage1_bottleneck="CLSTM", stage2_bottleneck="CLSTM"
    ))
    frames = jnp.asarray(rng.standard_normal((1, 4, 32, 32, 3)), jnp.float32)
    t_values = jnp.asarray([2 / 8, 6 / 8], dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), frames, jnp.full((1, 3), 0.5))

    fused = m.apply(params, frames, t_values,
                    method=SuperSloMo.interpolate_multi_t)
    assert fused.shape == (1, 2, 32, 32, 3)
    # the planar fast path must agree on the recurrent multi-window model too
    pred_fast, bound = m.apply(params, frames, t_values, with_bounds=True,
                               method=SuperSloMo.interpolate_multi_t)
    np.testing.assert_allclose(np.asarray(pred_fast), np.asarray(fused),
                               atol=1e-5, rtol=1e-5)
    assert np.isfinite(float(bound))
    for k, tv in enumerate(np.asarray(t_values)):
        out = m.apply(params, frames, jnp.full((1, 3), tv))
        mid = out.pred_images.shape[1] // 2
        diff = np.abs(np.asarray(fused[:, k]) - np.asarray(out.pred_images[:, mid]))
        assert np.mean(diff) < 2e-3, f"t={tv}: mean diff {np.mean(diff)}"
