"""Profiling harness: per-component timing + optional jax.profiler trace of
the fused 8x interpolation step (the reference has no profiling tooling at
all — SURVEY §5; this is its TPU-native upgrade).

    python benchmarks/profile_step.py [--trace /tmp/trace] [--h 736 --w 1280]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, iters=10):
    """Median wall time of a device computation, forced via a scalar sum (the
    axon remote platform's block_until_ready is unreliable for timing).
    Includes ~24 ms of fixed dispatch round-trip over the axon tunnel —
    subtract it when comparing against in-graph or traced timings."""
    g = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(g(*args))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.time()
        float(g(*args))
        times.append(time.time() - t0)
    ms = float(np.median(times) * 1e3)
    print(f"{name:38s} {ms:8.2f} ms")
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=736)
    p.add_argument("--w", type=int, default=1280)
    p.add_argument("--n-t", type=int, default=7)
    p.add_argument("--trace", default=None, help="jax.profiler trace output dir")
    p.add_argument("--unguarded", action="store_true",
                   help="profile the production eval fast path (planar "
                        "epilogue, with_bounds=True) instead of the guarded "
                        "step")
    p.add_argument("--skip-components", action="store_true",
                   help="only time/trace the full step (skips the per-"
                        "component compiles)")
    args = p.parse_args()

    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo

    H, W, n_t = args.h, args.w, args.n_t
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    frames = jnp.asarray(rng.standard_normal((1, 2, H, W, 3), dtype=np.float32))
    t_values = jnp.arange(1, n_t + 1, dtype=jnp.float32) / (n_t + 1)

    spec = ModelSpec(n_frames=2, compute_dtype="bfloat16" if on_tpu else "float32")
    model = SuperSloMo(spec=spec)
    params = model.init(jax.random.PRNGKey(0), frames, jnp.full((1, 1), 0.5))
    if args.unguarded:  # match the production eval path exactly
        from superslomo_tpu.ops import with_prepared

        params = with_prepared(params)

    if not args.skip_components:
        _profile_components(rng, H, W, n_t, dt)

    if args.unguarded:
        step = lambda p, f: model.apply(
            p, f, t_values, with_bounds=True,
            method=SuperSloMo.interpolate_multi_t,
        )[0]
    else:
        step = lambda p, f: model.apply(
            p, f, t_values, method=SuperSloMo.interpolate_multi_t
        )
    if args.trace:
        # trace the EXACT bench program (no sum wrapper — reuses the warm
        # compile cache entry); 3 steps so parse_trace.py can average
        jstep = jax.jit(step)
        jax.block_until_ready(jstep(params, frames))  # compile+warm
        t0 = time.time()
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = jstep(params, frames)
            jax.block_until_ready(out)
        print(f"3 traced steps: {(time.time() - t0) / 3 * 1e3:.2f} ms/step")
        print(f"trace written to {args.trace}")
    else:
        ms = timed(f"FULL multi-t step ({n_t} frames)", step, params, frames)
        print(f"{'=> frames/sec/chip':38s} {n_t / (ms / 1e3):8.2f}")


def _profile_components(rng, H, W, n_t, dt):
    from superslomo_tpu.models.unet import UNet
    from superslomo_tpu.ops import warp_auto

    s1 = UNet(out_channels=4, bottleneck="CONV", emit_encoding=True, dtype=dt)
    x1 = jnp.asarray(rng.standard_normal((1, 1, H, W, 6), np.float32))
    p1 = s1.init(jax.random.PRNGKey(0), x1)
    timed("stage1 U-Net (1 pair)", lambda p, x: s1.apply(p, x)[0], p1, x1)

    s2 = UNet(out_channels=5, bottleneck="CONV", accept_encoding=True, dtype=dt)
    x2 = jnp.asarray(rng.standard_normal((n_t, 1, H, W, 16), np.float32))
    enc = jnp.asarray(rng.standard_normal((n_t, 1, H // 32, W // 32, 512), np.float32))
    p2 = s2.init(jax.random.PRNGKey(0), x2[:1], enc[:1])
    timed(f"stage2 U-Net (t-grid {n_t})", lambda p, x, e: s2.apply(p, x, e)[0], p2, x2, enc)

    img = jnp.asarray(rng.standard_normal((n_t, H, W, 3), np.float32))
    flow = jnp.asarray((rng.standard_normal((n_t, H, W, 2)) * 20).astype(np.float32))
    timed(f"backward warp ({n_t} x {H}x{W}x3)", warp_auto, img, flow)


if __name__ == "__main__":
    main()
