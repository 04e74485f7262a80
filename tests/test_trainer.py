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


@pytest.fixture(autouse=True, scope="module")
def _no_cache_writes():
    """Quarantine persistent-cache WRITES for this module: in a full
    `pytest -m compile` session, serializing this module's train-step
    executable segfaults jaxlib (jax 0.9.0, put_executable_and_time →
    rc=139; reproduced twice 2026-08-21 at the same test) — while the same
    tests standalone write and pass. Reads still hit; the cost is one
    cold ~7-min compile per full-tier session on this host."""
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old)


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


def _translating_pattern(shift: float, H: int = 32, W: int = 32) -> np.ndarray:
    """Smooth 3-channel pattern translated by ``shift`` px in x and
    ``shift/2`` px in y — a constant-flow scene with an exact interpolation
    solution, so training MUST cut the loss quickly if gradients, freeze
    masks, and the optimizer are wired right."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    u = 2 * np.pi * (xs - shift) / 16.0
    v = 2 * np.pi * (ys - 0.5 * shift) / 16.0
    return np.stack(
        [np.sin(u) * np.cos(v), np.cos(u + v), np.sin(v) * np.sin(u + 1.0)],
        axis=-1,
    )


def test_training_converges_on_synthetic_motion(train_cfg):
    """30 jitted steps on deterministic synthetic motion: total loss must
    drop by a healthy margin (catches sign/freeze/schedule bugs that
    finiteness checks can't — the reference's implicit evidence was its
    published training runs, scripts/main.py:168-205). Runs at the
    reference's production LR 1e-4 (superslomo_original.ini): measured
    trajectory 19.0 → 5.5 over 30 steps; LR ≥ 1e-3 diverges to NaN through
    the parity-preserving epsilon-free visibility division."""
    tr = Trainer(train_cfg, expt_name="conv_smoke")
    frames = np.stack([_translating_pattern(0.0), _translating_pattern(2.0)])[None]
    targets = _translating_pattern(1.0)[None, None]
    frames = jnp.asarray(frames, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    t = jnp.full((1, 1), 0.5, jnp.float32)
    state = tr.init_state((frames, targets, t))

    params, opt_state = state.params, state.opt_state
    losses = []
    for _ in range(30):
        params, opt_state, loss_vec = tr._train_step(
            params, opt_state, tr.vgg_params, frames, targets, t
        )
        losses.append(float(np.asarray(loss_vec)[0]))
    assert np.isfinite(losses).all()
    first, last = losses[0], float(np.mean(losses[-5:]))
    assert last < 0.7 * first, (
        f"training failed to converge on an exactly-solvable scene: "
        f"loss {first:.4f} -> {last:.4f} over 30 steps"
    )
    # and the loss at step 30 specifically beats step 1 (monotone-ish trend,
    # not a lucky dip)
    assert losses[-1] < losses[0]


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
