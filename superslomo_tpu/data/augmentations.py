"""Sample transforms, NHWC numpy (reference:
scripts/utils/dataloaders/augmentations.py).

The reference's ToTensor permutes to NCHW for torch (augmentations.py:193-200);
this framework is NHWC end-to-end, so samples stay (N, H, W, C) float32 and
the device feed is a straight reinterpret — no transpose on the hot path.
"""

from __future__ import annotations

import numbers
from typing import Sequence

import numpy as np


class Compose:
    """Transform pipeline. Stochastic transforms (those with
    ``stochastic = True``) receive the per-item ``rng`` so concurrent loader
    threads never share a generator (NumPy Generators are not thread-safe;
    the reference reseeds per worker process instead, default_reader.py:306)."""

    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, x, rng: np.random.Generator | None = None):
        for t in self.transforms:
            x = t(x, rng=rng) if getattr(t, "stochastic", False) else t(x)
        return x


class RandomCrop:
    """Same random crop across all frames of the sample
    (augmentations.py:67-92)."""

    stochastic = True

    def __init__(self, size, rng: np.random.Generator | None = None):
        if isinstance(size, numbers.Number):
            size = (int(size), int(size))
        self.size = size
        self.rng = rng or np.random.default_rng()

    def __call__(self, frames: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
        rng = rng if rng is not None else self.rng
        n, h, w, c = frames.shape
        th, tw = self.size
        if (h, w) == (th, tw):
            return frames
        y = int(rng.integers(0, h - th))
        x = int(rng.integers(0, w - tw))
        return frames[:, y : y + th, x : x + tw, :]


class RandomMirrorRotate:
    """Horizontal flip 50% + small random rotation about a random center
    (augmentations.py:39-64). Present for completeness; the reference ships
    it commented out of every pipeline (default_reader.py:280)."""

    stochastic = True

    def __init__(self, max_degrees: float = 5.0, rng: np.random.Generator | None = None):
        self.max_degrees = max_degrees
        self.rng = rng or np.random.default_rng()

    def __call__(self, frames: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
        import cv2

        rng = rng if rng is not None else self.rng
        if rng.integers(0, 2) == 1:
            frames = frames[:, :, ::-1, :]
        n, h, w, _ = frames.shape
        cx = int(rng.integers(0, w))
        cy = int(rng.integers(0, h))
        theta = float(rng.uniform(-self.max_degrees, self.max_degrees))
        M = cv2.getRotationMatrix2D((cx, cy), theta, 1)
        out = np.empty_like(frames)
        for i in range(n):
            out[i] = cv2.warpAffine(frames[i], M, (w, h)).reshape(h, w, -1)
        return out


class ResizeCrop:
    """Resize by a ratio then random-crop (augmentations.py:95-138; present
    in the reference but unused by its shipped pipelines)."""

    stochastic = True

    def __init__(self, crop_imh, crop_imw, resize_ratio=0.5,
                 rng: np.random.Generator | None = None):
        self.crop_imh = crop_imh
        self.crop_imw = crop_imw
        self.ratio = resize_ratio
        self.rng = rng or np.random.default_rng()

    def __call__(self, frames: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
        import cv2

        rng = rng if rng is not None else self.rng
        n, h, w, c = frames.shape
        nh, nw = int(h * self.ratio), int(w * self.ratio)
        if nh < self.crop_imh or nw < self.crop_imw:
            scale = max(self.crop_imh / nh, self.crop_imw / nw)
            nh, nw = max(int(nh * scale), self.crop_imh), max(int(nw * scale), self.crop_imw)
        out = np.empty((n, nh, nw, c), dtype=frames.dtype)
        for i in range(n):
            out[i] = cv2.resize(frames[i], (nw, nh)).reshape(nh, nw, c)
        y = int(rng.integers(0, nh - self.crop_imh + 1))
        x = int(rng.integers(0, nw - self.crop_imw + 1))
        return out[:, y : y + self.crop_imh, x : x + self.crop_imw]


class Binarize:
    """Grayscale-threshold ground-truth frames (augmentations.py:10-36;
    unused by the shipped pipelines, kept for capability parity)."""

    def __call__(self, buffers):
        import cv2

        img_buffer, gt_buffer = buffers
        n, h, w, _ = gt_buffer.shape
        out = np.zeros((n, h, w, 1))
        for i in range(n):
            gray = cv2.cvtColor(gt_buffer[i].astype(np.uint8), cv2.COLOR_BGR2GRAY)
            _, binary = cv2.threshold(gray, 1, 255, cv2.THRESH_BINARY)
            out[i, ..., 0] = binary
        return [img_buffer, out / 255.0]


class Normalize:
    """(x / 255 - mean) / std (augmentations.py:181-190).

    Numerics match the reference bit-for-bit — required for the executed-
    reference protocol golden (tests/test_reference_protocol_e2e.py) and
    for metric parity, because the evaluator's unclipped uint8 cast
    truncates, so even 1-ulp drift can flip a ground-truth pixel:

    - forward: the reference normalizes the float64 decode buffer with
      float64 mean/std (default_reader.py:182-207 np.zeros default dtype;
      python-float mean) and only casts to float32 at batch collate
      (``.float()``, evaluate_interpolation_results.py:255) — so mean/std
      are kept float64 here and the cast happens once, at the end.
    - inverse: the reference denormalizes in float32 (torch.tensor(...)
      defaults, evaluate_interpolation_results.py:192-202) — so float32
      constants, and the python-float ``* divisor`` stays float32 under
      numpy's weak scalar promotion.
    """

    def __init__(self, pix_mean, pix_std, divisor: float = 255.0):
        self.mean = np.asarray(pix_mean, dtype=np.float64)
        self.std = np.asarray(pix_std, dtype=np.float64)
        self.mean_f32 = self.mean.astype(np.float32)
        self.std_f32 = self.std.astype(np.float32)
        self.divisor = divisor

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        return (
            (frames.astype(np.float64) / self.divisor - self.mean) / self.std
        ).astype(np.float32)

    def inverse(self, frames: np.ndarray) -> np.ndarray:
        """Denormalize back to 0-255 (evaluate_interpolation_results.py:192-202)."""
        return (
            frames.astype(np.float32) * self.std_f32 + self.mean_f32
        ) * self.divisor


class EvalPad:
    """Zero-pad (N, H, W, C) to model-friendly dims (augmentations.py:141-178).

    Either a fixed (left, right, top, bottom) padding — matching the
    reference's torch.nn.ZeroPad2d argument order — or target (H, W) dims
    split centre-aligned (Slowflow, augmentations.py:149-165).
    """

    def __init__(self, padding=None, target_dims=None):
        self.padding = padding
        self.target_dims = target_dims

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        n, h, w, c = frames.shape
        if self.target_dims is not None:
            ho, wo = self.target_dims
            hp, wp = ho - h, wo - w
            top, left = hp // 2, wp // 2
            bottom, right = hp - top, wp - left
        elif self.padding is not None:
            left, right, top, bottom = self.padding
        else:
            return frames
        return np.pad(
            frames, ((0, 0), (top, bottom), (left, right), (0, 0)), mode="constant"
        )


class ToFloatArray:
    """uint8 frames → float32, staying NHWC (replaces the reference ToTensor's
    NCHW permute, augmentations.py:193-200)."""

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(frames, dtype=np.float32)


def eval_padding_for(h_in: int, w_in: int) -> tuple[int, int, int, int]:
    """Centre-aligned (left, right, top, bottom) zero padding to the next
    /32-divisible dims (evaluate_interpolation_results.py:76-99 convention)."""
    h_ref = int(np.ceil(h_in / 32) * 32)
    w_ref = int(np.ceil(w_in / 32) * 32)
    top = (h_ref - h_in) // 2
    left = (w_ref - w_in) // 2
    return (left, w_ref - w_in - left, top, h_ref - h_in - top)
