"""Reference-EXECUTED golden tests: run the reference's actual PyTorch
modules (imported from /root/reference/scripts, read-only) with random
weights, port the weights through the converter, and require activation
agreement with this framework's modules.

This is stronger than the hand-retyped torch oracle in test_checkpoint.py:
a mis-read of the reference topology there would produce a self-consistent
but wrong golden; here the reference code itself is the authority
(VERDICT round-1 next-step #3b).

The reference's CLSTM imports come from an un-vendored git submodule, so
stub modules are injected for the import to succeed; only the CONV
bottleneck path is exercised (the submodule code does not exist anywhere in
the checkout — see models/bottleneck.py for the reconstructed contract).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SCRIPTS = "/root/reference/scripts"


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference model modules with CLSTM stubbed out."""
    import os

    if not os.path.isdir(REF_SCRIPTS):
        pytest.skip("reference checkout not available")
    if REF_SCRIPTS not in sys.path:
        sys.path.insert(0, REF_SCRIPTS)
    # the (empty) CLSTM submodule: inject import stubs
    for mod, cls in (("convlstm", "ConvBLSTM"), ("convgru", "ConvBGRU")):
        name = f"models.CLSTM.{mod}"
        if name not in sys.modules:
            m = types.ModuleType(name)
            setattr(m, cls, type(cls, (), {}))
            sys.modules[name] = m
    import models.flow_computation as ref_fc
    import models.flow_interpolation as ref_fi

    return ref_fc, ref_fi


@pytest.fixture(scope="module")
def ref_full_model(ref_models):
    """Import the reference's composite FullModel (superslomo_r). Its losses
    module needs torchvision (absent in this image) only for the perceptual
    VGG — stub it with an identity feature stack; the inference path under
    test never touches it."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")

        def _fake_vgg16(pretrained=False, **kw):
            net = torch.nn.Module()
            net.features = torch.nn.Sequential(
                *[torch.nn.Identity() for _ in range(23)]
            )
            return net

        tv_models.vgg16 = _fake_vgg16
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    # the reference hard-codes .cuda() in get_stage2_outputs
    # (superslomo_r.py:211); run it on CPU torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    import models.superslomo_r as ref_ssmr

    return ref_ssmr


def _ref_cfg():
    from superslomo_tpu.config import default_config

    return default_config()


def _to_nhwc(x: torch.Tensor) -> np.ndarray:
    return x.detach().numpy().transpose(0, 2, 3, 1)


def _convert_stage(sd):
    from superslomo_tpu.training.checkpoint import convert_unet_state_dict

    return convert_unet_state_dict({k: v.numpy() for k, v in sd.items()})


@pytest.mark.parametrize("cross_skip", [True, False])
def test_stage1_activations_match_reference(ref_models, cross_skip):
    """FlowComputationModel (reference, executed) == UNet(out=4) through the
    ported weights, including the S2D polyphase full-res segment."""
    import jax
    import jax.numpy as jnp

    from superslomo_tpu.models.unet import UNet

    ref_fc, _ = ref_models
    cfg = _ref_cfg()
    torch.manual_seed(0)
    ref = ref_fc.FlowComputationModel(6, 4, cross_skip, cfg=cfg).eval()

    B, T, H, W = 1, 1, 64, 96
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, 6, H, W)).astype(np.float32)
    with torch.no_grad():
        decodings = ref(torch.from_numpy(x))
    enc_ref, out_ref = decodings[0]

    model = UNet(out_channels=4, emit_encoding=cross_skip)
    x_nhwc = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    template = model.init(jax.random.PRNGKey(0), x_nhwc)
    params = {"params": _convert_stage(ref.state_dict())}
    jax.tree.map(lambda a, b: None, template, params)  # structure match

    out, enc, _ = model.apply(params, x_nhwc)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), _to_nhwc(out_ref), atol=2e-4, rtol=1e-3
    )
    if cross_skip:
        np.testing.assert_allclose(
            np.asarray(enc[:, 0]), _to_nhwc(enc_ref), atol=2e-4, rtol=1e-3
        )


def test_stage2_activations_match_reference(ref_models):
    """FlowInterpolationModel (reference, executed) == UNet(out=5) with the
    1024-wide conv7a cross-stage concat."""
    import jax
    import jax.numpy as jnp

    from superslomo_tpu.models.unet import UNet

    _, ref_fi = ref_models
    cfg = _ref_cfg()
    torch.manual_seed(1)
    ref = ref_fi.FlowInterpolationModel(16, 5, True, cfg=cfg).eval()

    B, T, H, W = 1, 1, 64, 96
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, T, 16, H, W)).astype(np.float32)
    enc = rng.standard_normal((B, 512, H // 32, W // 32)).astype(np.float32) * 0.1
    with torch.no_grad():
        decodings = ref(torch.from_numpy(x), [torch.from_numpy(enc)])
    out_ref = decodings[0]  # stage-2 decoder returns the output tensor only

    model = UNet(out_channels=5, accept_encoding=True)
    x_nhwc = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    enc_nhwc = jnp.asarray(enc.transpose(0, 2, 3, 1))[:, None]  # (B, 1, h, w, 512)
    params = {"params": _convert_stage(ref.state_dict())}
    out, _, _ = model.apply(params, x_nhwc, cross_encoding=enc_nhwc)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), _to_nhwc(out_ref), atol=2e-4, rtol=1e-3
    )


def test_physics_match_reference(ref_models):
    """compute_inputs / extract_outputs / compute_output_image (reference,
    executed — including torch grid_sample warps) == models/physics.py."""
    import jax.numpy as jnp

    from superslomo_tpu.models import physics

    _, ref_fi = ref_models
    cfg = _ref_cfg()
    torch.manual_seed(2)
    ref = ref_fi.FlowInterpolationModel(16, 5, True, cfg=cfg).eval()

    B, H, W = 2, 32, 48
    rng = np.random.default_rng(2)
    img = rng.standard_normal((B, 6, H, W)).astype(np.float32)
    flow = (rng.standard_normal((B, 4, H, W)) * 3).astype(np.float32)
    s2out = rng.standard_normal((B, 5, H, W)).astype(np.float32)
    t = 0.375

    with torch.no_grad():
        fi_in_ref = ref.compute_inputs(
            torch.from_numpy(img), torch.from_numpy(flow), t=t
        )
        img_t_ref = ref.compute_output_image(
            torch.from_numpy(img), fi_in_ref, torch.from_numpy(s2out), t=t
        )

    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    flow_nhwc = jnp.asarray(flow.transpose(0, 2, 3, 1))
    fi_in = physics.compute_stage2_inputs(img_nhwc, flow_nhwc, t)
    np.testing.assert_allclose(
        np.asarray(fi_in), _to_nhwc(fi_in_ref), atol=1e-5, rtol=1e-5
    )

    s2out_nhwc = jnp.asarray(s2out.transpose(0, 2, 3, 1))
    img_t = physics.compute_output_image(img_nhwc, fi_in, s2out_nhwc, t)
    np.testing.assert_allclose(
        np.asarray(img_t), _to_nhwc(img_t_ref), atol=1e-5, rtol=1e-4
    )


def test_full_model_inference_matches_reference(ref_full_model):
    """END-TO-END: the reference FullModel's inference forward (pairing →
    stage-1 → physics at t → stage-2 with cross skip → visibility blend),
    executed, == SuperSloMo.apply through the ported weights. The strongest
    parity evidence available without the published checkpoints."""
    import jax.numpy as jnp

    from superslomo_tpu.config import ModelSpec, default_config
    from superslomo_tpu.models.superslomo import SuperSloMo, forward_inference

    cfg = default_config()  # CONV bottleneck, N_FRAMES=2, CROSS_SKIP=TRUE
    torch.manual_seed(7)
    ref = ref_full_model.FullModel(cfg).eval()

    B, T, H, W = 1, 2, 64, 96
    rng = np.random.default_rng(7)
    frames = rng.standard_normal((B, T, 3, H, W)).astype(np.float32)
    t_val = 0.375
    t_ref = torch.full((B, T - 1, 1, 1, 1), t_val)
    with torch.no_grad():
        est_ref, inter_ref = ref(
            torch.from_numpy(frames), t_ref, inference_mode=True
        )

    params = {
        "params": {
            "stage1": _convert_stage(ref.stage1_model.state_dict()),
            "stage2": _convert_stage(ref.stage2_model.state_dict()),
        }
    }
    model = SuperSloMo(spec=ModelSpec(n_frames=2))
    frames_nhwc = jnp.asarray(frames.transpose(0, 1, 3, 4, 2))
    t_ours = jnp.full((B, T - 1), t_val, jnp.float32)
    est, inter, _ = forward_inference(model, params, frames_nhwc, t_ours)

    np.testing.assert_allclose(
        np.asarray(est), _to_nhwc(est_ref), atol=5e-4, rtol=1e-3
    )
    # intermediates: stage-1 flows + visibility map (reference tuple order:
    # flowC_01, flowC_10, est_flow_t1, est_flow_t0, refined_t1, refined_t0, v_0t)
    for ours, theirs in zip(
        [inter.flowC_01, inter.flowC_10, inter.est_flow_t1, inter.est_flow_t0,
         inter.refined_flow_t1, inter.refined_flow_t0, inter.v_0t],
        inter_ref,
    ):
        np.testing.assert_allclose(
            np.asarray(ours), _to_nhwc(theirs), atol=5e-4, rtol=1e-3
        )
