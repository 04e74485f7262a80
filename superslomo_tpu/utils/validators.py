"""Runtime shape/range validation helpers (reference:
scripts/utils/validators.py — 9 assertion decorators).

This framework validates eagerly at construction (config.validate()) and at
the data boundary; these helpers cover the remaining runtime checks for
user-facing entry points. They are plain functions rather than decorators so
they stay out of jitted code paths (shape checks under jit are free via
tracing; value checks like t∈(0,1) must run host-side).
"""

from __future__ import annotations

import numpy as np


def check_t_interp(t) -> None:
    """t strictly inside (0, 1) (reference validators.py:108-114)."""
    t = np.asarray(t)
    if not ((t > 0).all() and (t < 1).all()):
        raise ValueError(f"t_interp values out of (0, 1): [{t.min()}, {t.max()}]")


def check_forward_inputs(frames, targets, t_interp, n_frames: int) -> None:
    """Trainer forward-pass contract (reference validators.py:4-15)."""
    if frames.shape[1] != n_frames:
        raise ValueError(f"expected {n_frames} input frames, got {frames.shape[1]}")
    if targets is not None and targets.shape[1] != n_frames - 1:
        raise ValueError(
            f"expected {n_frames - 1} targets, got {targets.shape[1]}"
        )
    if np.asarray(t_interp).shape[1] != n_frames - 1:
        raise ValueError("t_interp must have n_frames-1 windows")
    check_t_interp(t_interp)


def check_eval_dims(h: int, w: int) -> None:
    """The U-Net needs /32-divisible spatial dims."""
    if h % 32 or w % 32:
        raise ValueError(f"H, W must be divisible by 32; got {h}x{w}")


def check_clip_window(
    n_paths: int, window_length: int, reqd_images: int, n_selected: int
) -> None:
    """Clip-window-length contract for random-window sampling (reference
    validators.py:30-38): the clip list entry must match the configured
    DATA.WINDOW_LENGTH, hold at least reqd_images frames, and the selected
    window must be exactly reqd_images long."""
    if n_paths != window_length:
        raise ValueError(
            f"clip has {n_paths} frames but DATA.WINDOW_LENGTH={window_length}"
        )
    if n_paths < reqd_images:
        raise ValueError(f"clip too short: {n_paths} < reqd_images={reqd_images}")
    if n_selected != reqd_images:
        raise ValueError(
            f"incorrect length of input sequence: {n_selected} != {reqd_images}"
        )


def check_eval_result_count(n_outputs: int, interp_factor: int, dataset: str) -> None:
    """Evaluation-interpolation result count (reference validators.py:98-105):
    every non-Vimeo eval batch must produce interp_factor-1 interpolated
    frames per window."""
    if dataset != "VIMEO" and n_outputs != interp_factor - 1:
        raise ValueError(
            f"wrong number of interpolation outputs: {n_outputs} != "
            f"{interp_factor - 1}"
        )
