"""End-to-end evaluator tests on synthetic data: the full PSNR/SSIM/IE
pipeline over sliding windows, the EPE evaluator, and the visualizer."""

import os

import numpy as np
import pytest

from superslomo_tpu.cli.common import init_params
from superslomo_tpu.config import default_config
from superslomo_tpu.eval.evaluate_interpolation import Evaluator
from superslomo_tpu.eval.visualize import Interpolator
from tests.test_data import write_png_clip


@pytest.fixture
def eval_cfg(tmp_path):
    import pickle

    cfg = default_config()
    # synthetic "720p-like" clip, but tiny: H_IN=60, W_IN=96 → H_REF=64
    write_png_clip(tmp_path / "clip_00000", 20, h=60, w=96)
    pkl = tmp_path / "val_clips.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"clip_00000"}, f)
    cfg.set("DATA", "DATASET", "ADOBE")
    cfg.set("ADOBE_DATA", "ROOTDIR", str(tmp_path))
    cfg.set("ADOBE_DATA", "VAL_CLIPS", str(pkl))
    cfg.set("ADOBE_DATA", "H_IN", 60)
    cfg.set("ADOBE_DATA", "W_IN", 96)
    cfg.set("VAL", "BATCH_SIZE", 2)
    cfg.set("EVAL", "EVAL_MODE", "TRUE")
    cfg.set("DATALOADER", "T_SAMPLE", "NIL")
    cfg.set("DATALOADER", "N_WORKERS", 1)
    return cfg


class PadTo64Evaluator(Evaluator):
    """The stock Adobe EvalPad is the 720→736 (0,0,8,8) pad; for the tiny
    synthetic clip we pad 60→64 the same way, monkeypatched via reader."""


def test_evaluator_end_to_end(eval_cfg, monkeypatch):
    # make the Adobe eval transform pad 60→64 instead of 720→736
    from superslomo_tpu.data import readers as R
    from superslomo_tpu.data.augmentations import Compose, EvalPad, Normalize, ToFloatArray

    def build_transform(self):
        mean, std = self.cfg.pixel_mean(), self.cfg.pixel_std()
        if self.eval_mode:
            return Compose([Normalize(mean, std), ToFloatArray(),
                            EvalPad(padding=(0, 0, 2, 2))])
        raise AssertionError

    monkeypatch.setattr(R.Reader, "build_transform", build_transform)

    params = init_params(eval_cfg)
    ev = Evaluator(eval_cfg, params)
    results = ev.run(max_batches=1)
    assert results["n_images"] > 0
    assert np.isfinite(results["PSNR"])
    assert -1 <= results["SSIM"] <= 1
    assert results["IE"] >= 0


def test_visualizer_end_to_end(eval_cfg, tmp_path):
    src = tmp_path / "clip_00000"
    out = tmp_path / "out"
    params = init_params(eval_cfg)
    interp = Interpolator(eval_cfg, params, upsample_rate=4)
    n = interp.interpolate_directory(str(src), str(out), max_windows=2)
    pngs = sorted(os.listdir(out))
    assert n == len([p for p in pngs if p.endswith(".png")])
    # 2 windows x (1 original + 3 interpolated) + final frame
    assert n == 2 * 4 + 1

    import cv2

    img = cv2.imread(str(out / pngs[0]))
    assert img.shape == (60, 96, 3)


def test_evaluator_ssmr_four_frames(eval_cfg, monkeypatch):
    """SSM-R eval end-to-end: 4-frame windows, CLSTM bottleneck, fused
    multi-t over the mid window."""
    from superslomo_tpu.data import readers as R
    from superslomo_tpu.data.augmentations import Compose, EvalPad, Normalize, ToFloatArray

    def build_transform(self):
        mean, std = self.cfg.pixel_mean(), self.cfg.pixel_std()
        return Compose([Normalize(mean, std), ToFloatArray(),
                        EvalPad(padding=(0, 0, 2, 2))])

    monkeypatch.setattr(R.Reader, "build_transform", build_transform)

    eval_cfg.set("TRAIN", "N_FRAMES", 4)
    eval_cfg.set("STAGE1", "BOTTLENECK", "CLSTM")
    eval_cfg.set("STAGE2", "BOTTLENECK", "CLSTM")
    params = init_params(eval_cfg)
    ev = Evaluator(eval_cfg, params)
    results = ev.run(max_batches=1)
    assert results["n_images"] > 0
    assert np.isfinite(results["PSNR"])


def test_flow_evaluator(tmp_path):
    """Synthetic Sintel EPE layout: clip pngs + .flo ground truths."""
    from superslomo_tpu.eval.evaluate_flow import evaluate_flow
    from superslomo_tpu.utils.flo import write_flo

    cfg = default_config()
    clip = tmp_path / "final" / "alley_1"
    write_png_clip(clip, 4, h=58, w=96)  # 58+6+6 = 70... must be /32 after pad
    # EvalPad (0,0,6,6) → 58→70 not /32; use h=52 → 64
    for f in clip.glob("*.png"):
        f.unlink()
    write_png_clip(clip, 4, h=52, w=96)
    flow_dir = tmp_path / "flow" / "alley_1"
    os.makedirs(flow_dir)
    rng = np.random.default_rng(0)
    for i in range(3):
        write_flo(rng.standard_normal((52, 96, 2)).astype(np.float32),
                  str(flow_dir / f"frame_{i:04d}.flo"))
    cfg.set("SINTEL_EPE_DATA", "ROOTDIR", str(tmp_path))
    cfg.set("SINTEL_EPE_DATA", "SETTING", "FINAL")
    params = init_params(cfg)
    res = evaluate_flow(cfg, params, max_samples=2)
    assert res["n_samples"] == 2
    assert np.isfinite(res["EPE"])


def test_evaluator_guarded_rerun_on_out_of_band(eval_cfg, monkeypatch):
    """When the returned flow bound exceeds the warp band, the evaluator
    must rerun the batch through the guarded program."""
    import jax.numpy as jnp

    from superslomo_tpu.data import readers as R
    from superslomo_tpu.data.augmentations import Compose, EvalPad, Normalize, ToFloatArray

    def build_transform(self):
        mean, std = self.cfg.pixel_mean(), self.cfg.pixel_std()
        return Compose([Normalize(mean, std), ToFloatArray(),
                        EvalPad(padding=(0, 0, 2, 2))])

    monkeypatch.setattr(R.Reader, "build_transform", build_transform)

    params = init_params(eval_cfg)
    ev = Evaluator(eval_cfg, params)

    fast_calls, safe_calls = [], []
    orig_fast, orig_safe = ev._step, ev._safe_step

    def fake_fast(p, f):
        out, _ = orig_fast(p, f)
        fast_calls.append(1)
        return out, jnp.asarray(999.0)  # force "out of band"

    def spy_safe(p, f):
        safe_calls.append(1)
        return orig_safe(p, f)

    ev._step, ev._safe_step = fake_fast, spy_safe
    results = ev.run(max_batches=1)
    assert fast_calls and safe_calls, "guarded rerun did not trigger"
    assert np.isfinite(results["PSNR"])


def test_eval_loop_is_pipelined(eval_cfg, monkeypatch):
    """run() must dispatch batch k+1's step BEFORE retrieving/scoring batch
    k, so the host round trip and metric computation overlap device compute
    (the async-dispatch pipeline the docstring promises)."""
    from superslomo_tpu.data import readers as R
    from superslomo_tpu.data.augmentations import Compose, EvalPad, Normalize, ToFloatArray

    def build_transform(self):
        mean, std = self.cfg.pixel_mean(), self.cfg.pixel_std()
        return Compose([Normalize(mean, std), ToFloatArray(),
                        EvalPad(padding=(0, 0, 2, 2))])

    monkeypatch.setattr(R.Reader, "build_transform", build_transform)
    eval_cfg.set("VAL", "BATCH_SIZE", 1)

    params = init_params(eval_cfg)
    ev = Evaluator(eval_cfg, params)

    events = []
    orig_submit, orig_score = ev._submit, ev._score

    def spy_submit(*a, **k):
        events.append("submit")
        return orig_submit(*a, **k)

    def spy_score(*a, **k):
        events.append("score")
        return orig_score(*a, **k)

    ev._submit, ev._score = spy_submit, spy_score
    results = ev.run(max_batches=3)
    assert np.isfinite(results["PSNR"])
    assert events[:3] == ["submit", "submit", "score"], events
    assert events.count("submit") == events.count("score") == 3


def test_evaluator_sintel_hfr_31x(tmp_path):
    """Sintel-HFR protocol: 32x interp factor → 31 intermediate frames in
    ONE fused multi-t step (the reference loops 31 full forwards,
    evaluate_interpolation_results.py:234-242)."""
    from superslomo_tpu.cli.common import init_params
    from superslomo_tpu.config import default_config
    from superslomo_tpu.eval.evaluate_interpolation import Evaluator

    # the stock Sintel-HFR EvalPad is (0, 0, 6, 6): 20 → 32 rows
    cfg = default_config()
    cfg.set("DATA", "DATASET", "SINTEL_HFR")
    # REQD_IMAGES_HFR[2] = 33 frames per window at 32x
    write_png_clip(tmp_path / "alley_1", 34, h=20, w=32)
    cfg.set("SINTEL_HFR_DATA", "ROOTDIR", str(tmp_path))
    cfg.set("SINTEL_HFR_DATA", "H_IN", 20)
    cfg.set("SINTEL_HFR_DATA", "W_IN", 32)
    cfg.set("VAL", "BATCH_SIZE", 1)
    cfg.set("EVAL", "EVAL_MODE", "TRUE")
    cfg.set("DATALOADER", "T_SAMPLE", "NIL")
    cfg.set("DATALOADER", "N_WORKERS", 1)

    params = init_params(cfg)
    ev = Evaluator(cfg, params)
    assert ev.interp_factor == 32
    assert ev.t_values.shape[0] == 31
    results = ev.run(max_batches=1)
    assert results["n_images"] > 0
    assert np.isfinite(results["PSNR"])
