"""Multi-stream throughput benchmark (BASELINE.json config 5): N parallel
1080p (or 720p) streams × 8x interpolation with double-buffered host→HBM
prefetch.

Streams are folded into the batch axis of one jitted multi-t step; the host
feed runs one batch ahead on a background thread (data/pipeline.py
prefetch_to_device), so H2D copies overlap device compute — the TPU-native
replacement for the reference's pinned-memory DataLoader workers
(default_reader.py:289-311).

    python benchmarks/throughput_streams.py --streams 4 --res 720p --batches 8
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

RES = {"720p": (736, 1280), "1080p": (1088, 1920), "tiny": (96, 160)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, default=4)
    p.add_argument("--res", choices=RES, default="720p")
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--n-t", type=int, default=7)
    args = p.parse_args()

    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.data.pipeline import prefetch_to_device
    from superslomo_tpu.models.superslomo import SuperSloMo

    H, W = RES[args.res]
    n_t, S = args.n_t, args.streams
    on_tpu = jax.default_backend() == "tpu"

    spec = ModelSpec(n_frames=2, compute_dtype="bfloat16" if on_tpu else "float32")
    model = SuperSloMo(spec=spec)
    t_values = jnp.arange(1, n_t + 1, dtype=jnp.float32) / (n_t + 1)

    rng = np.random.default_rng(0)
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    raw0 = rng.integers(0, 256, (1, 2, H, W, 3), dtype=np.uint8)
    frames0 = (jnp.asarray(raw0, jnp.float32) / 255.0 - mean) / std
    params = model.init(jax.random.PRNGKey(0), frames0, jnp.full((1, 1), 0.5))

    @jax.jit
    def step(p, raw_u8):
        # decode feed: uint8 frames normalized ON DEVICE — 4x less host→HBM
        # traffic than shipping f32 (the reference normalizes on the host,
        # default_reader.py:250-286)
        f = (raw_u8.astype(jnp.float32) / 255.0 - mean) / std
        return model.apply(p, f, t_values, method=SuperSloMo.interpolate_multi_t)

    # compile + warm
    float(jnp.sum(step(params, jnp.asarray(raw0))))

    def host_batches():
        # one frame-pair per stream per round (simulates decoded video);
        # the fused multi-t step already saturates a chip at batch 1 at
        # 720p/1080p, so streams pipeline through sequential dispatches
        # while the prefetch thread keeps H2D copies off the critical path.
        for i in range(args.batches * S):
            yield raw0

    t0 = time.time()
    acc = None
    for batch in prefetch_to_device(host_batches(), size=3):
        acc = step(params, jnp.asarray(batch))
    float(jnp.sum(acc))  # drain
    dt = time.time() - t0
    fps = args.batches * S * n_t / dt

    print(json.dumps({
        "metric": f"{args.res}_streams{S}_interp_fps_8x",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "sec_per_batch": round(dt / args.batches, 3),
    }))


if __name__ == "__main__":
    main()
