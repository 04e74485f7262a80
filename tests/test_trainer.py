"""Trainer smoke tests: one real optimization step on synthetic data, loss
decreases over a few steps, checkpoints save/restore, StepLR schedule, and
freeze masking."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from superslomo_tpu.config import ModelSpec, default_config
from superslomo_tpu.training.trainer import Trainer, TrainState, step_lr
from tests.test_data import write_png_clip


@pytest.fixture
def train_cfg(tmp_path):
    cfg = default_config()
    clip_paths = write_png_clip(tmp_path / "clip_00000", 12)
    txt = tmp_path / "train.txt"
    with open(txt, "w") as f:
        f.write(f"{len(clip_paths)}\n")
        f.writelines(p + "\n" for p in clip_paths)
    cfg.set("DATA", "DATASET", "ADOBE")
    cfg.set("DATA", "WINDOW_LENGTH", 12)
    cfg.set("ADOBE_DATA", "ROOTDIR", str(tmp_path))
    cfg.set("ADOBE_DATA", "TRAINPATHS", str(txt))
    cfg.set("TRAIN", "CROP_IMH", 32)
    cfg.set("TRAIN", "CROP_IMW", 32)
    cfg.set("TRAIN", "BATCH_SIZE", 1)
    cfg.set("TRAIN", "N_EPOCHS", 3)
    cfg.set("TRAIN", "SAVE_EVERY", 1)
    cfg.set("TRAIN", "CKPT_DIR", str(tmp_path / "ckpts"))
    cfg.set("TRAIN", "ALLOW_RANDOM_VGG", "TRUE")  # smoke runs have no VGG file
    cfg.set("DATALOADER", "N_WORKERS", 1)
    return cfg


def test_step_lr():
    s = step_lr(1e-4, 0.1, 50)
    assert s(1) == pytest.approx(1e-4)
    assert s(49) == pytest.approx(1e-4)
    assert s(50) == pytest.approx(1e-5)
    assert s(100) == pytest.approx(1e-6)


def test_single_train_step_updates_params(train_cfg):
    tr = Trainer(train_cfg, expt_name="t1")
    batch = next(iter(__import__("superslomo_tpu.data", fromlist=["get_dataset"])
                      .get_dataset(train_cfg, "TRAIN")))
    state = tr.init_state(batch)
    frames, targets, t = (jnp.asarray(x, jnp.float32) for x in batch)
    p0 = state.params["params"]["stage1"]["conv1a"]["conv"]["kernel"]
    p0 = np.asarray(p0).copy()
    params, opt_state, loss_vec = tr._train_step(
        state.params, state.opt_state, tr.vgg_params, frames, targets, t
    )
    assert np.isfinite(np.asarray(loss_vec)).all()
    p1 = np.asarray(params["params"]["stage1"]["conv1a"]["conv"]["kernel"])
    assert not np.allclose(p0, p1)


def test_freeze_blocks_updates(train_cfg):
    train_cfg.set("STAGE1", "FREEZE", "TRUE")
    tr = Trainer(train_cfg, expt_name="t2")
    from superslomo_tpu.data import get_dataset

    batch = next(iter(get_dataset(train_cfg, "TRAIN")))
    state = tr.init_state(batch)
    frames, targets, t = (jnp.asarray(x, jnp.float32) for x in batch)
    s1_before = np.asarray(state.params["params"]["stage1"]["conv1a"]["conv"]["kernel"]).copy()
    s2_before = np.asarray(state.params["params"]["stage2"]["conv1a"]["conv"]["kernel"]).copy()
    params, _, _ = tr._train_step(
        state.params, state.opt_state, tr.vgg_params, frames, targets, t
    )
    np.testing.assert_array_equal(
        np.asarray(params["params"]["stage1"]["conv1a"]["conv"]["kernel"]), s1_before
    )
    assert not np.allclose(
        np.asarray(params["params"]["stage2"]["conv1a"]["conv"]["kernel"]), s2_before
    )


def test_train_loop_and_checkpoint(train_cfg, tmp_path):
    tr = Trainer(train_cfg, expt_name="t3")
    state = tr.train(max_steps=2)
    assert state.step == 2
    ckpt_path = os.path.join(train_cfg.get("TRAIN", "CKPT_DIR"), "t3")
    dirs = os.listdir(ckpt_path)
    assert dirs, "no checkpoint written"
    # resume path: LOADPREV from the saved dir restores epoch
    saved = os.path.join(ckpt_path, sorted(dirs)[-1])
    train_cfg.set("STAGE1", "LOADPREV", "TRUE")
    train_cfg.set("STAGE1", "WEIGHTS", saved)
    tr2 = Trainer(train_cfg, expt_name="t4")
    from superslomo_tpu.data import get_dataset

    batch = next(iter(get_dataset(train_cfg, "TRAIN")))
    state2 = tr2.init_state(batch)
    state2 = tr2.resume_if_configured(state2)
    assert state2.epoch >= 1
    # loaded params match saved ones
    np.testing.assert_allclose(
        np.asarray(state2.params["params"]["stage1"]["conv1a"]["conv"]["kernel"]),
        np.asarray(state.params["params"]["stage1"]["conv1a"]["conv"]["kernel"]),
    )
