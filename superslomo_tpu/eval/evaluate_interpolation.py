"""Interpolation-quality evaluator: PSNR / SSIM / IE over sliding windows
(reference: scripts/evaluate_interpolation_results.py).

Protocol parity: /32-aligned padded dims with centre crop back to the input
size (:76-99, :143-157), per-dataset interp factor (8x; 31 intermediate
frames — 31x for Sintel-HFR; single t=0.5 for Vimeo) (:213-244), edge-window
trimming via per-sample n_avail (:110-141), denormalize → uint8 → skimage-
compatible metrics (:159-202).

TPU-native: all interp_factor-1 t values run in ONE jitted multi-t step per
batch (stage-1 computed once, t-grid folded into batch) instead of the
reference's loop of full forwards per t (:234-242).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from superslomo_tpu.config import Config
from superslomo_tpu.data import get_dataset
from superslomo_tpu.data.augmentations import Normalize
from superslomo_tpu.models.superslomo import SuperSloMo
from superslomo_tpu.utils.metrics import score_image

log = logging.getLogger(__name__)


class Evaluator:
    """``mesh`` (optional jax.sharding.Mesh with a ``data`` axis) shards the
    eval batch across devices — the TPU-native equivalent of the reference
    DataParallel-ing its evaluator (evaluate_interpolation_results.py:65-67).
    Batches that don't divide the data axis are padded with the last sample
    and trimmed after (the reference instead skips them, :251-252)."""

    def __init__(self, cfg: Config, params, mesh=None):
        from superslomo_tpu import ops as _ops

        _ops.apply_warp_config(cfg)  # [TPU] USE_PALLAS_WARP
        self.cfg = cfg
        # hoist the polyphase/upconv weight transforms out of the hot
        # per-batch program: one tiny jitted prepare pass per session
        # (ops/prepare.py; bit-identical — tests/test_prepare.py)
        self.params = _ops.with_prepared(params)
        self.dataset = cfg.get("DATA", "DATASET").upper()
        assert self.dataset in ("SINTEL_HFR", "ADOBE", "SLOWFLOW", "VIMEO"), "Invalid dataset."
        self.model = SuperSloMo(spec=cfg.model_spec())
        self.n_frames = cfg.getint("TRAIN", "N_FRAMES")
        self.interp_factor = 32 if self.dataset == "SINTEL_HFR" else 8
        (self.H_REF, self.W_REF), (self.H_IN, self.W_IN), (self.H_START, self.W_START) = (
            self.get_dims()
        )
        self.normalize = Normalize(cfg.pixel_mean(), cfg.pixel_std())
        self.psnr, self.ssim, self.ie = [], [], []

        if self.dataset == "VIMEO":
            t_values = jnp.asarray([0.5], dtype=jnp.float32)
        else:
            t_values = (
                jnp.arange(1, self.interp_factor, dtype=jnp.float32) / self.interp_factor
            )
        from superslomo_tpu.utils.validators import check_t_interp

        check_t_interp(np.asarray(t_values))  # reference validators.py:108-114
        self.t_values = t_values
        self.mesh = mesh
        self.n_data = 1
        # unguarded-warp exactness threshold for the host-side bound check:
        # the kernel band on a single device; under a spatial mesh, also
        # clamped by the one-hop halo's vertical reach (warp_spmd.halo_reach)
        self.bound_threshold = 128.0

        def run(p, frames, with_bounds):
            return self.model.apply(
                p, frames, self.t_values, with_bounds=with_bounds,
                method=SuperSloMo.interpolate_multi_t,
            )

        if mesh is None:
            # fast path: unguarded warp kernels + the max-|flow| bound
            # returned for a host-side check (the in-graph guard's
            # conditional costs more than the warp kernels at 720p)
            self._step = jax.jit(lambda p, f: run(p, f, True))
            # guarded fallback for the rare out-of-band batch; compiled
            # only if ever needed
            self._safe_step = jax.jit(lambda p, f: run(p, f, False))
        else:
            from superslomo_tpu import ops as _ops
            from superslomo_tpu.parallel.mesh import SPATIAL_AXIS, batch_sharding, replicated
            from superslomo_tpu.parallel.warp_spmd import halo_reach

            self.n_data = int(mesh.shape["data"])
            self._data_sh = batch_sharding(mesh)
            self.bound_threshold = halo_reach(
                int(mesh.shape[SPATIAL_AXIS]), self.H_REF
            )

            def run_sharded(p, frames, with_bounds):
                # trace-time context: warps run as shard_map islands
                with _ops.warp_mesh(mesh):
                    return run(p, frames, with_bounds)

            shardings = dict(in_shardings=(replicated(mesh), self._data_sh))
            self._step = jax.jit(
                lambda p, f: run_sharded(p, f, True),
                out_shardings=(self._data_sh, replicated(mesh)), **shardings
            )
            self._safe_step = jax.jit(
                lambda p, f: run_sharded(p, f, False),
                out_shardings=self._data_sh, **shardings
            )

    def get_dims(self):
        """/32-aligned reference dims + crop offsets
        (evaluate_interpolation_results.py:76-99)."""
        section = self.dataset + "_DATA"
        h_in = self.cfg.getint(section, "H_IN")
        w_in = self.cfg.getint(section, "W_IN")
        h_ref = int(np.ceil(h_in / 32) * 32)
        w_ref = int(np.ceil(w_in / 32) * 32)
        return (h_ref, w_ref), (h_in, w_in), ((h_ref - h_in) // 2, (w_ref - w_in) // 2)

    # ------------------------------------------------------------------ #
    def to_uint8(self, batch: np.ndarray) -> np.ndarray:
        """Crop the /32 pad, denormalize, uint8
        (evaluate_interpolation_results.py:143-163).

        Deliberately NO clipping before the uint8 cast: the reference casts
        unclipped (:163), so out-of-range predictions wrap — and published
        PSNR/SSIM/IE numbers bake that in. Metric parity requires reproducing
        it. Human-viewable output is different: the visualizer clips
        (eval/visualize.py) because wraparound artifacts are visually wrong.
        Metrics = wrap (parity); renderings = clip (quality)."""
        batch = batch[
            :,
            self.H_START : self.H_START + self.H_IN,
            self.W_START : self.W_START + self.W_IN,
            :,
        ]
        return self.normalize.inverse(batch).astype(np.uint8)

    def _submit(self, frames: np.ndarray, targets, n_avail):
        """Dispatch one batch's fused multi-t step WITHOUT blocking: jax
        dispatch is async, so the returned (out, bound) device arrays
        compute while the host scores the previous batch."""
        B = frames.shape[0]
        frames = np.asarray(frames, np.float32)
        if self.n_data > 1 and B % self.n_data:
            # pad to the data-axis size with the last sample; trimmed below
            pad = self.n_data - B % self.n_data
            frames = np.concatenate([frames, np.repeat(frames[-1:], pad, axis=0)])
        if self.mesh is not None:
            frames = jax.device_put(jnp.asarray(frames), self._data_sh)
        frames = jnp.asarray(frames, jnp.float32)
        out, bound = self._step(self.params, frames)
        return (out, bound, frames, targets, n_avail, B)

    def _score(self, pending) -> None:
        """Retrieve + score one previously submitted batch (the blocking
        device_get happens here, overlapped with the NEXT batch's compute)."""
        out, bound, frames, targets, n_avail, B = pending
        out, bound = jax.device_get((out, bound))
        if float(bound) > self.bound_threshold:
            # out-of-band motion: rerun through the guarded program so every
            # warp is exact regardless of magnitude (cond-guarded, with the
            # all-gather fallback under a spatial mesh)
            log.info(
                "flow bound %.1f px > %.0f: guarded rerun",
                float(bound), self.bound_threshold,
            )
            out = np.asarray(self._safe_step(self.params, frames))
        out = np.asarray(out)[:B]  # (B, n_t, H, W, 3)
        # reference validators.py:98-105
        from superslomo_tpu.utils.validators import check_eval_result_count

        check_eval_result_count(out.shape[1], self.interp_factor, self.dataset)

        preds, gts = [], []
        for i, n in enumerate(np.asarray(n_avail).tolist()):
            preds.append(out[i, :n])
            gts.append(targets[i, :n])
        preds = self.to_uint8(np.concatenate(preds, axis=0))
        gts = self.to_uint8(np.concatenate(gts, axis=0))

        for p, g in zip(preds, gts):
            ps, ss, ie = score_image(g, p)
            self.psnr.append(ps)
            self.ssim.append(ss)
            self.ie.append(ie)

    def eval_batch(self, frames: np.ndarray, targets: np.ndarray, n_avail: np.ndarray):
        """One val batch, submit + score back-to-back (the pipelined loop in
        run() overlaps these across batches; reference protocol
        evaluate_interpolation_results.py:110-141)."""
        self._score(self._submit(frames, targets, n_avail))

    def run(self, max_batches: Optional[int] = None):
        """Pipelined eval loop: batch k+1's step is dispatched BEFORE batch
        k's device_get, so k's ~24 ms-RTT transfer + host-side scoring
        overlap k+1's device compute (the reference instead serializes a
        full 7-forward loop per batch, evaluate_interpolation_results.py:
        246-278)."""
        loader = get_dataset(self.cfg, "VAL")
        pending = None
        n_scored = 0
        for i, (frames, targets, n_avail) in enumerate(loader):
            submitted = self._submit(frames, targets, n_avail)
            if pending is not None:
                self._score(pending)
                n_scored += 1
                if (n_scored - 1) % 10 == 0:
                    log.info(
                        "batch %d  PSNR %.3f  IE %.3f  SSIM %.3f",
                        n_scored - 1, np.mean(self.psnr), np.mean(self.ie),
                        np.mean(self.ssim),
                    )
            pending = submitted
            if max_batches is not None and i + 1 >= max_batches:
                break
        if pending is not None:
            self._score(pending)
        results = {
            "PSNR": float(np.mean(self.psnr)),
            "IE": float(np.mean(self.ie)),
            "SSIM": float(np.mean(self.ssim)),
            "n_images": len(self.psnr),
        }
        log.info("Final: %s", results)
        return results
