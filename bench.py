"""Benchmark: 720p interpolated frames/sec/chip at 8x interpolation.

Runs the fused multi-t step (stage-1 once + 7-t stage-2 fold, one jitted
program) on a padded 736x1280 Adobe-protocol frame pair on whatever device
jax provides (TPU in CI; CPU locally). Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline`` is the speedup over the reference-equivalent PyTorch-CPU
implementation measured by benchmarks/torch_cpu_baseline.py (the BASELINE.md
north star is ≥10x).
"""

from __future__ import annotations

import json
import os
import time

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo

    on_tpu = jax.devices()[0].platform == "tpu"
    H, W = (736, 1280) if on_tpu else (96, 160)  # CPU fallback keeps it quick
    n_t = 7
    B = 1

    compute_dtype = "bfloat16" if on_tpu else "float32"
    spec = ModelSpec(n_frames=2, compute_dtype=compute_dtype)
    model = SuperSloMo(spec=spec)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((B, 2, H, W, 3), dtype=np.float32))
    t_values = jnp.arange(1, n_t + 1, dtype=jnp.float32) / (n_t + 1)
    params = model.init(jax.random.PRNGKey(0), frames, jnp.full((B, 1), 0.5))

    @jax.jit
    def step(p, f):
        return model.apply(p, f, t_values, method=SuperSloMo.interpolate_multi_t)

    out = step(params, frames)
    out.block_until_ready()  # compile + warmup

    iters = 20 if on_tpu else 3
    t0 = time.time()
    for _ in range(iters):
        out = step(params, frames)
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    fps = B * n_t / dt

    baseline_path = os.path.join(os.path.dirname(__file__), "benchmarks",
                                 "torch_cpu_baseline.json")
    vs = None
    if os.path.exists(baseline_path) and on_tpu:
        with open(baseline_path) as f:
            vs = fps / json.load(f)["fps_720p_8x_cpu"]

    print(json.dumps({
        "metric": "720p_interp_frames_per_sec_8x" if on_tpu else "cpu_smoke_interp_fps",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
