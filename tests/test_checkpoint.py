"""Weight-porting golden tests: build the reference architecture with raw
torch modules (an independent oracle, mirroring scripts/models/
flow_computation.py:27-153), convert its state_dict with our converter, and
require the JAX U-Net to reproduce its activations. Plus native checkpoint
roundtrip tests."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from superslomo_tpu.models.unet import UNet
from superslomo_tpu.training.checkpoint import (
    convert_torch_opt_state,
    convert_unet_state_dict,
    load_checkpoint,
    save_checkpoint,
)


def conv_block(cin, cout, k):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, padding=k // 2, bias=True), nn.LeakyReLU(0.1)
    )


class TorchUNetOracle(nn.Module):
    """The reference stage-1/2 U-Net topology, torch NCHW."""

    def __init__(self, in_ch, out_ch, cross_skip_in=False):
        super().__init__()
        self.cross_skip_in = cross_skip_in
        self.conv1a = conv_block(in_ch, 32, 7)
        self.conv1b = conv_block(32, 32, 7)
        self.conv2a = conv_block(32, 64, 5)
        self.conv2b = conv_block(64, 64, 5)
        self.conv3a = conv_block(64, 128, 3)
        self.conv3b = conv_block(128, 128, 3)
        self.conv4a = conv_block(128, 256, 3)
        self.conv4b = conv_block(256, 256, 3)
        self.conv5a = conv_block(256, 512, 3)
        self.conv5b = conv_block(512, 512, 3)
        self.conv6 = nn.Sequential(conv_block(512, 512, 3), conv_block(512, 512, 3))
        c7in = 1024 if cross_skip_in else 512
        self.conv7a = conv_block(c7in, 512, 3)
        self.conv7b = conv_block(512, 512, 3)
        self.conv8a = conv_block(1024, 256, 3)
        self.conv8b = conv_block(256, 256, 3)
        self.conv9a = conv_block(512, 128, 3)
        self.conv9b = conv_block(128, 128, 3)
        self.conv10a = conv_block(256, 64, 3)
        self.conv10b = conv_block(64, 64, 3)
        self.conv11a = conv_block(128, 32, 3)
        self.conv11b = conv_block(32, 32, 3)
        self.fuse_conv = conv_block(64, 32, 3)
        self.final_conv = nn.Conv2d(32, out_ch, 3, padding=1, bias=True)

    @staticmethod
    def up(x):
        return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)

    def forward(self, x, cross_enc=None):
        e1 = self.conv1b(self.conv1a(x))
        e2 = self.conv2b(self.conv2a(F.avg_pool2d(e1, 2)))
        e3 = self.conv3b(self.conv3a(F.avg_pool2d(e2, 2)))
        e4 = self.conv4b(self.conv4a(F.avg_pool2d(e3, 2)))
        e5 = self.conv5b(self.conv5a(F.avg_pool2d(e4, 2)))
        h = self.conv6(F.avg_pool2d(e5, 2))
        enc = h
        if self.cross_skip_in:
            h = torch.cat([h, cross_enc], dim=1)
        h = self.conv7b(self.conv7a(self.up(h)))
        h = self.conv8b(self.conv8a(self.up(torch.cat([h, e5], 1))))
        h = self.conv9b(self.conv9a(self.up(torch.cat([h, e4], 1))))
        h = self.conv10b(self.conv10a(self.up(torch.cat([h, e3], 1))))
        h = self.conv11b(self.conv11a(self.up(torch.cat([h, e2], 1))))
        h = self.fuse_conv(torch.cat([h, e1], 1))
        return self.final_conv(h), enc


@pytest.mark.parametrize("cross", [False, True])
def test_unet_matches_torch_oracle(cross):
    torch.manual_seed(0)
    in_ch = 16 if cross else 6
    oracle = TorchUNetOracle(in_ch, 5 if cross else 4, cross_skip_in=cross).eval()

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    stage_params = convert_unet_state_dict(sd)

    H, W = 64, 96
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, in_ch, H, W), dtype=np.float32)
    enc = rng.standard_normal((2, 512, H // 32, W // 32), dtype=np.float32) if cross else None

    with torch.no_grad():
        ref, _ = oracle(torch.from_numpy(x), torch.from_numpy(enc) if cross else None)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    m = UNet(out_channels=5 if cross else 4, bottleneck="CONV", accept_encoding=cross)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))[:, None]  # (B, 1, H, W, C)
    encj = jnp.asarray(enc.transpose(0, 2, 3, 1))[:, None] if cross else None
    out, _, _ = m.apply({"params": stage_params}, xj, encj)
    ours = np.asarray(out[:, 0])

    # fp32 conv reassociation (XLA vs MKL) accumulates ~1e-4 absolute noise
    # over the 24-conv stack; activations are O(0.1).
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=0)
    assert np.mean(np.abs(ours - ref)) < 2e-4


def test_converter_rejects_unknown_keys():
    with pytest.raises(KeyError):
        convert_unet_state_dict({"mystery.weight": np.zeros((4, 4, 3, 3), np.float32)})


def test_converter_recurrent_bottleneck_names():
    """ConvLSTM/GRU weights map to the BiConvRNN param layout
    (conv6.{forward,reverse}_net.cell_list.{L}.conv → conv6/{fwd,rev}_l{L})."""
    sd = {
        "conv6.forward_net.cell_list.0.conv.weight": np.zeros((1024, 768, 3, 3), np.float32),
        "conv6.forward_net.cell_list.0.conv.bias": np.zeros((1024,), np.float32),
        "conv6.reverse_net.cell_list.1.conv.weight": np.ones((1024, 512, 3, 3), np.float32),
        "conv6.reverse_net.cell_list.1.conv_can.weight": np.ones((256, 512, 3, 3), np.float32),
    }
    tree = convert_unet_state_dict(sd)
    assert tree["conv6"]["fwd_l0"]["gates"]["kernel"].shape == (3, 3, 768, 1024)
    assert "bias" in tree["conv6"]["fwd_l0"]["gates"]
    assert tree["conv6"]["rev_l1"]["gates"]["kernel"].shape == (3, 3, 512, 1024)
    assert tree["conv6"]["rev_l1"]["candidate"]["kernel"].shape == (3, 3, 512, 256)


def test_torch_optimizer_state_conversion(tmp_path):
    """Adam moments from a reference-format .pt resume into the optax state
    (main.py:263-284): positional param order = stage1 keys then stage2 keys,
    exp_avg/exp_avg_sq transposed like the weights."""
    import optax

    torch.manual_seed(0)
    stage1 = nn.Sequential()
    stage1.add_module("conv1a", conv_block(6, 4, 3))
    stage2 = nn.Sequential()
    stage2.add_module("fuse_conv", conv_block(4, 4, 3))
    opt = torch.optim.Adam(list(stage1.parameters()) + list(stage2.parameters()), lr=1e-3)
    for _ in range(3):
        opt.zero_grad()
        loss = stage1(torch.randn(1, 6, 8, 8)).square().mean() + stage2(
            torch.randn(1, 4, 8, 8)
        ).abs().mean()
        loss.backward()
        opt.step()

    blob = {
        "epoch": 5,
        "stage1_state_dict": stage1.state_dict(),
        "stage2_state_dict": stage2.state_dict(),
        "self.optimizer": opt.state_dict(),
        "scheduler": {"last_epoch": 5},
    }
    path = str(tmp_path / "ref.pt")
    torch.save(blob, path)

    params = {
        "params": {
            "stage1": convert_unet_state_dict(
                {k: v.numpy() for k, v in stage1.state_dict().items()}
            ),
            "stage2": convert_unet_state_dict(
                {k: v.numpy() for k, v in stage2.state_dict().items()}
            ),
        }
    }
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    template = tx.init(params)

    opt_state, epoch = convert_torch_opt_state(path, params, template)
    assert epoch == 5

    def find_adam(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s
        if isinstance(s, tuple):
            for v in s:
                r = find_adam(v)
                if r is not None:
                    return r
        if hasattr(s, "inner_state"):
            return find_adam(s.inner_state)
        return None

    adam = find_adam(opt_state)
    assert adam is not None and int(adam.count) == 3
    want = opt.state_dict()["state"][0]["exp_avg"].numpy().transpose(2, 3, 1, 0)
    got = np.asarray(adam.mu["params"]["stage1"]["conv1a"]["conv"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    want_nu = opt.state_dict()["state"][2]["exp_avg_sq"].numpy().transpose(2, 3, 1, 0)
    got_nu = np.asarray(adam.nu["params"]["stage2"]["fuse_conv"]["conv"]["kernel"])
    np.testing.assert_allclose(got_nu, want_nu, rtol=1e-6)


def test_native_checkpoint_roundtrip(tmp_path):
    params = {
        "params": {
            "stage1": {"conv1a": {"conv": {"kernel": jnp.ones((3, 3, 6, 32)), "bias": jnp.zeros(32)}}},
            "stage2": {"conv1a": {"conv": {"kernel": jnp.full((3, 3, 16, 32), 2.0), "bias": jnp.ones(32)}}},
        }
    }
    save_checkpoint(str(tmp_path / "ck"), params, opt_state=None, meta={"epoch": 7})
    template = jax.tree.map(jnp.zeros_like, params)
    restored, _, meta = load_checkpoint(str(tmp_path / "ck"), template)
    assert meta["epoch"] == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["stage1"]["conv1a"]["conv"]["kernel"]),
        np.ones((3, 3, 6, 32)),
    )
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["stage2"]["conv1a"]["conv"]["bias"]), np.ones(32)
    )
