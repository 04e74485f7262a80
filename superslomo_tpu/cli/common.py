"""Shared CLI helpers: model parameter loading per the config's
STAGE{1,2} WEIGHTS/LOADPREV semantics (reference: superslomo_r.py:42-71,
unetflow.py:11-32)."""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp

from superslomo_tpu.config import Config
from superslomo_tpu.models.superslomo import SuperSloMo
from superslomo_tpu.training import checkpoint as ckpt

log = logging.getLogger(__name__)


def init_params(cfg: Config, h: int = 64, w: int = 64):
    model = SuperSloMo(spec=cfg.model_spec())
    n = cfg.getint("TRAIN", "N_FRAMES")
    frames = jnp.zeros((1, n, h, w, 3), jnp.float32)
    t = jnp.full((1, n - 1), 0.5, jnp.float32)
    return model.init(jax.random.PRNGKey(cfg.getint("SEED", "VALUE")), frames, t)


def load_model_params(cfg: Config):
    """Initialize then overwrite stages from configured weights. Accepts
    either a native checkpoint directory or a reference torch .pt file."""
    params = init_params(cfg)
    tree = dict(params["params"])
    torch_cache = {}
    for n, stage in ((1, "stage1"), (2, "stage2")):
        if not cfg.getboolean(f"STAGE{n}", "LOADPREV"):
            continue
        path = cfg.get(f"STAGE{n}", "WEIGHTS")
        if not path:
            continue
        if os.path.isdir(path):
            loaded, _, _ = ckpt.load_checkpoint(path, {"params": tree})
            tree[stage] = loaded["params"][stage]
        else:
            if path not in torch_cache:
                torch_cache[path] = ckpt.convert_torch_checkpoint(path)
            conv = torch_cache[path]["params"]
            if stage in conv:
                ckpt.check_converted_shapes(conv[stage], tree[stage], stage)
                tree[stage] = conv[stage]
        log.info("Loaded %s from %s", stage, path)
    return {"params": tree}
