"""Slow-motion renderer (reference: scripts/visualize_interpolation.py).

Globs a frame directory, optionally decimates 240fps input to 30fps ([::8],
:271-272), slides an N_FRAMES window with edge clamping (:270-288), pads each
frame to /32 dims (:75-88), and writes the original plus (upsample_rate - 1)
interpolated PNGs per pair (:105-221) — here produced by ONE fused multi-t
step per window. Optionally dumps the visibility map and the
estimated/refined flows as Middlebury color PNGs (:90-103, :156-209).
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from superslomo_tpu.config import Config
from superslomo_tpu.data.augmentations import Normalize, eval_padding_for
from superslomo_tpu.models.superslomo import (
    SuperSloMo,
    forward_inference,
    mid_window,
)
from superslomo_tpu.utils.flo import flow_to_image

log = logging.getLogger(__name__)


class Interpolator:
    def __init__(self, cfg: Config, params, upsample_rate: int = 8,
                 dump_intermediates: bool = False):
        from superslomo_tpu import ops as _ops

        _ops.apply_warp_config(cfg)  # [TPU] USE_PALLAS_WARP
        self.cfg = cfg
        # pre-hoisted polyphase/upconv weights (ops/prepare.py)
        self.params = _ops.with_prepared(params)
        self.rate = upsample_rate
        self.dump_intermediates = dump_intermediates
        self.n_frames = cfg.getint("TRAIN", "N_FRAMES")
        self.model = SuperSloMo(spec=cfg.model_spec())
        self.normalize = Normalize(cfg.pixel_mean(), cfg.pixel_std())
        t_values = jnp.arange(1, self.rate, dtype=jnp.float32) / self.rate
        self._multi_t = jax.jit(
            lambda p, frames: self.model.apply(
                p, frames, t_values, method=SuperSloMo.interpolate_multi_t
            )
        )
        self._t_values = t_values

    # -- IO ------------------------------------------------------------ #
    def load_frames(self, paths):
        import cv2

        imgs = [cv2.imread(p)[..., ::-1] for p in paths]
        # raw uint8 decode kept for writing the original frames exactly
        # (the reference writes originals from the unnormalized tensor,
        # visualize_interpolation.py:120-133; a normalize→denormalize round
        # trip can flip a pixel by 1 under the truncating cast)
        self.last_raw = np.stack(imgs)  # (N, H, W, 3) RGB uint8
        frames = self.last_raw.astype(np.float32)
        h, w = frames.shape[1:3]
        self.pad = eval_padding_for(h, w)
        left, right, top, bottom = self.pad
        frames = np.pad(frames, ((0, 0), (top, bottom), (left, right), (0, 0)))
        self.h_in, self.w_in = h, w
        return self.normalize(frames)

    def to_uint8(self, img: np.ndarray) -> np.ndarray:
        left, right, top, bottom = self.pad
        img = img[top : top + self.h_in, left : left + self.w_in]
        return np.clip(self.normalize.inverse(img), 0, 255).astype(np.uint8)

    def _write(self, path, rgb_u8):
        import cv2

        cv2.imwrite(path, rgb_u8[..., ::-1])  # RGB → BGR

    # -- sliding window over the clip ----------------------------------- #
    def sliding_windows(self, n_images: int):
        """Window index lists with edge clamping
        (visualize_interpolation.py:270-288)."""
        half = self.n_frames // 2
        for mid_left in range(n_images - 1):
            idxs = [min(max(i, 0), n_images - 1)
                    for i in range(mid_left - half + 1, mid_left + half + 1)]
            yield idxs

    def interpolate_directory(self, input_dir: str, output_dir: str,
                              decimate: bool = False,
                              max_windows: Optional[int] = None) -> int:
        paths = sorted(
            glob.glob(os.path.join(input_dir, "*.png"))
            + glob.glob(os.path.join(input_dir, "*.jpg"))
        )
        if decimate:  # 240fps → 30fps (visualize_interpolation.py:271-272)
            paths = paths[::8]
        os.makedirs(output_dir, exist_ok=True)
        if self.dump_intermediates:
            for d in ("visibility", "flow_est", "flow_refined"):
                os.makedirs(os.path.join(output_dir, d), exist_ok=True)

        count = 0
        n_out = 0
        for idxs in self.sliding_windows(len(paths)):
            frames = self.load_frames([paths[i] for i in idxs])[None]  # (1, N, H, W, 3)
            # original left frame of the mid window, written from the raw
            # decode (bit-exact, like the reference)
            self._write(
                os.path.join(output_dir, f"{n_out:06d}.png"),
                self.last_raw[self.n_frames // 2 - 1],
            )
            n_out += 1
            preds = np.asarray(self._multi_t(self.params, jnp.asarray(frames)))[0]
            for k in range(preds.shape[0]):
                self._write(
                    os.path.join(output_dir, f"{n_out:06d}.png"),
                    self.to_uint8(preds[k]),
                )
                n_out += 1
            if self.dump_intermediates:
                self._dump_intermediates(frames, output_dir, count)
            count += 1
            if max_windows is not None and count >= max_windows:
                break
        # final original frame (raw decode, bit-exact)
        if paths:
            self.load_frames([paths[-1]])
            self._write(os.path.join(output_dir, f"{n_out:06d}.png"),
                        self.last_raw[0])
            n_out += 1
        return n_out

    def _dump_intermediates(self, frames, output_dir, index):
        t = jnp.full((1, self.n_frames - 1), 0.5, jnp.float32)
        _, inter, _ = forward_inference(self.model, self.params, jnp.asarray(frames), t)
        vis = np.asarray(inter.v_0t[0, ..., 0]) * 255.0
        import cv2

        cv2.imwrite(os.path.join(output_dir, "visibility", f"{index:06d}.png"),
                    vis.astype(np.uint8))
        self._write(os.path.join(output_dir, "flow_est", f"{index:06d}.png"),
                    flow_to_image(np.asarray(inter.est_flow_t0[0])))
        self._write(os.path.join(output_dir, "flow_refined", f"{index:06d}.png"),
                    flow_to_image(np.asarray(inter.refined_flow_t0[0])))
