"""Optical-flow EPE evaluator (reference:
scripts/evaluate_optical_flow_results.py).

Runs the model at t=0.5 on Sintel frame pairs, takes the stage-1 forward
flow F_01 (:53-59), strips the 6-row EvalPad (:65), and scores EPE plus the
>3px error percentage (:18-28) against the ground-truth .flo.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from superslomo_tpu.config import Config
from superslomo_tpu.data.readers import SintelFlowReader
from superslomo_tpu.models.superslomo import SuperSloMo, mid_window
from superslomo_tpu.utils.flo import flow_epe, flow_error_percent

log = logging.getLogger(__name__)


def evaluate_flow(cfg: Config, params, max_samples: Optional[int] = None):
    from superslomo_tpu import ops as _ops

    model = SuperSloMo(spec=cfg.model_spec())
    reader = SintelFlowReader(cfg)
    n_frames = cfg.getint("TRAIN", "N_FRAMES")
    params = _ops.with_prepared(params)  # hoisted weight transforms

    @jax.jit
    def flow_step(p, frames):
        t = jnp.full((frames.shape[0], n_frames - 1), 0.5, jnp.float32)
        out = model.apply(p, frames, t)
        return out.flowC_out[:, mid_window(out), ..., 0:2]  # F_01

    epes, pct3 = [], []
    for i in range(len(reader)):
        frames, gt_flow = reader[i]
        pred = np.asarray(flow_step(params, jnp.asarray(frames[None])))[0]
        pred = pred[6 : 6 + gt_flow.shape[0]]  # strip the 436→448 pad
        epes.append(flow_epe(gt_flow, pred))
        pct3.append(flow_error_percent(gt_flow, pred))
        if i % 50 == 0:
            log.info("sample %d  EPE %.3f  >3px %.2f%%", i, np.mean(epes), np.mean(pct3))
        if max_samples is not None and i + 1 >= max_samples:
            break
    results = {"EPE": float(np.mean(epes)), "gt3px_percent": float(np.mean(pct3)),
               "n_samples": len(epes)}
    log.info("Final: %s", results)
    return results
