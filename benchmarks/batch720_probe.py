"""Probe: batch>=2 at 720p for the fused multi-t step.

Round-2 finding: the fused 7-t 736x1280 program at B=2 crashes the remote
TPU compile helper (HTTP 500, subprocess exit 1) while B=1 compiles fine —
so 720p throughput rides async-pipelined batch-1 dispatches instead of
batching (the reference evaluates at batch 8, configs/superslomo_eval.ini
VAL; our per-chip protocol replaces scripts/
evaluate_interpolation_results.py:234-242). This script isolates WHICH
ingredient trips the compiler. One mode per invocation — a helper crash can
poison the backend, so a driver shell loop runs each probe in a fresh
process:

    for m in fused split nt3 res544 guarded; do
        timeout 4000 python benchmarks/batch720_probe.py $m 2 || true
    done

Modes (argv[1], argv[2]=batch):
    fused    the production unguarded fused multi-t step (reproducer)
    guarded  same but with_bounds=False (channel-minor path, cond guards)
    split    stage-1 and physics+stage-2 as two separate jitted programs
    nt3      fused with n_t=3 instead of 7 (program ~= 45% of the FLOPs)
    res544   fused at 544x960 (program ~= 55% of the 720p bytes)

Every probe prints one line: "PROBE <mode> B=<B>: OK <fps> fps" or
"PROBE <mode> B=<B>: FAILED <exc>". Findings land in NOTES_r3.md /
ARCHITECTURE.md.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superslomo_tpu.config import ModelSpec
from superslomo_tpu.models.superslomo import SuperSloMo


def build(h, w, n_t, batch):
    spec = ModelSpec(n_frames=2, compute_dtype="bfloat16")
    model = SuperSloMo(spec=spec)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.standard_normal((batch, 2, h, w, 3), dtype=np.float32)
    )
    t_values = jnp.arange(1, n_t + 1, dtype=jnp.float32) / (n_t + 1)
    from superslomo_tpu.ops import with_prepared

    params = with_prepared(
        model.init(jax.random.PRNGKey(0), frames[:1], jnp.full((1, 1), 0.5))
    )
    return model, params, frames, t_values


def run_timed(step, params, frames, n_t, batch, iters=10):
    out = step(params, frames)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = step(params, frames)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    return batch * n_t / dt


def probe_fused(batch, h=736, w=1280, n_t=7, guarded=False):
    model, params, frames, t_values = build(h, w, n_t, batch)
    if guarded:
        step = jax.jit(
            lambda p, f: model.apply(
                p, f, t_values, method=SuperSloMo.interpolate_multi_t
            )
        )
    else:
        step = jax.jit(
            lambda p, f: model.apply(
                p, f, t_values, with_bounds=True,
                method=SuperSloMo.interpolate_multi_t,
            )[0]
        )
    return run_timed(step, params, frames, n_t, batch)


def probe_split(batch, h=736, w=1280, n_t=7):
    """Stage-1 and physics+stage-2 as two separately-compiled programs.

    If each half compiles at B=2 but the fused whole does not, the helper
    crash is a program-size wall, not any single op."""
    from superslomo_tpu.models import physics
    from superslomo_tpu.models.superslomo import make_pairs

    model, params, frames, t_values = build(h, w, n_t, batch)

    @jax.jit
    def stage1_step(p, f):
        pairs = make_pairs(f)
        flowC, enc, _ = model.apply(
            p, pairs, None, None, False, False, method=lambda m, *a: m.stage1(*a)
        )
        return pairs, flowC.astype(jnp.float32), enc

    @jax.jit
    def stage2_step(p, pairs, flowC, enc):
        B, W_n, H, W_, _ = pairs.shape
        fold = lambda x: x.reshape((B * W_n,) + x.shape[2:])
        preds = []
        for k in range(t_values.shape[0]):
            t = t_values[k]
            fi = physics.compute_stage2_inputs(
                fold(pairs), fold(flowC), t, warp_dtype=jnp.bfloat16
            ).reshape(B, W_n, H, W_, 16)
            fo, _, _ = model.apply(
                p, fi, enc, None, False, False, method=lambda m, *a: m.stage2(*a)
            )
            preds.append(
                physics.compute_output_image(
                    fold(pairs), fold(fi), fold(fo.astype(jnp.float32)), t
                )
            )
        return jnp.stack(preds, axis=1)

    pairs, flowC, enc = stage1_step(params, frames)
    out = stage2_step(params, pairs, flowC, enc)
    jax.block_until_ready(out)
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        pairs, flowC, enc = stage1_step(params, frames)
        out = stage2_step(params, pairs, flowC, enc)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    return batch * n_t / dt


def probe_noplw(batch):
    """fused with the Pallas warp disabled (pure-XLA gather warps): if this
    compiles where 'fused' crashes, the helper crash is Mosaic compiling
    the multiflow kernel at batch>=2."""
    from superslomo_tpu import ops as _ops

    _ops.set_pallas_warp(False)
    try:
        return probe_fused(batch)
    finally:
        _ops.set_pallas_warp(None)


MODES = {
    "fused": lambda b: probe_fused(b),
    "guarded": lambda b: probe_fused(b, guarded=True),
    "split": lambda b: probe_split(b),
    "nt3": lambda b: probe_fused(b, n_t=3),
    "res544": lambda b: probe_fused(b, h=544, w=960),
    "noplw": probe_noplw,
}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    try:
        fps = MODES[mode](batch)
        print(f"PROBE {mode} B={batch}: OK {fps:.1f} fps", flush=True)
    except Exception as e:  # noqa: BLE001 — the point is to log the crash
        print(
            f"PROBE {mode} B={batch}: FAILED {type(e).__name__}: {str(e)[:300]}",
            flush=True,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
