"""A/B probe for the LAYOUT_V2 rewrites on the real chip.

Times the production fused multi-t step (unguarded + prepared params, the
bench.py headline program) with the v1/v2 decoder layout, optionally
without the head fence, and optionally captures a profiler trace for
benchmarks/parse_trace.py:

    python benchmarks/layoutv2_probe.py --v2 1            # v2, fence on
    python benchmarks/layoutv2_probe.py --v2 1 --fence 0  # v2, no fence
    python benchmarks/layoutv2_probe.py --v2 0            # v1 baseline
    ... --trace /tmp/trace_v2 --iters 12

One JSON line per run:
    {"h":..., "w":..., "nt":..., "batch":..., "v2":..., "fence":...,
     "mean_ms":..., "fps":...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable as `python benchmarks/layoutv2_probe.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=736)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--nt", type=int, default=7)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--v2", type=int, default=1)
    ap.add_argument("--fence", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--slice", type=int, default=0,
                    help="SSMTPU_S2D_SLICE_OPS: layout-preserving slice "
                         "formulations of the S2D shuffles (ops/s2d.py)")
    ap.add_argument("--assembly", type=int, default=None,
                    help="lv2_assembly override (grouped stage-2 assembly "
                         "without the rest of v2); default follows --v2")
    ap.add_argument("--split", type=int, default=None,
                    help="lv2_split_decoder override; default follows --v2")
    ap.add_argument("--bf16warp", type=int, default=0,
                    help="SSMTPU_BF16_FINAL_WARP: bf16 final-image warps "
                         "(quality-tradeoff probe; models/superslomo.py)")
    args = ap.parse_args()

    if not args.fence:
        os.environ["SSMTPU_NO_HEAD_FENCE"] = "1"
    if args.slice:
        os.environ["SSMTPU_S2D_SLICE_OPS"] = "1"
    if args.bf16warp:
        os.environ["SSMTPU_BF16_FINAL_WARP"] = "1"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo
    from superslomo_tpu.ops import with_prepared

    spec = ModelSpec(
        n_frames=2, compute_dtype=args.dtype, layout_v2=bool(args.v2),
        lv2_assembly=None if args.assembly is None else bool(args.assembly),
        lv2_split_decoder=None if args.split is None else bool(args.split),
        # the fence rides --fence for v1-piecemeal runs too: lv2_fence
        # follows (assembly or v2) so a fence-only probe is --v2 0
        # --assembly 0 --fence 1 ... via the env knob path below
        lv2_fence=True if (args.assembly and args.fence) else None,
    )
    model = SuperSloMo(spec=spec)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.standard_normal((args.batch, 2, args.h, args.w, 3), dtype=np.float32)
    )
    t_values = jnp.arange(1, args.nt + 1, dtype=jnp.float32) / (args.nt + 1)
    params = model.init(jax.random.PRNGKey(0), frames[:1], jnp.full((1, 1), 0.5))
    params = with_prepared(params)
    step = jax.jit(
        lambda p, f: model.apply(p, f, t_values, with_bounds=True,
                                 method=SuperSloMo.interpolate_multi_t)[0]
    )

    t0 = time.time()
    step(params, frames).block_until_ready()
    print(f"# compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(args.iters):
        out = step(params, frames)
    out.block_until_ready()
    mean_ms = (time.time() - t0) / args.iters * 1e3

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = step(params, frames)
            out.block_until_ready()

    print(json.dumps({
        "h": args.h, "w": args.w, "nt": args.nt, "batch": args.batch,
        "v2": int(args.v2), "fence": int(args.fence),
        "slice": int(args.slice),
        "assembly": args.assembly, "split": args.split,
        "bf16warp": int(args.bf16warp),
        "mean_ms": round(mean_ms, 2),
        "fps": round(args.batch * args.nt / (mean_ms / 1e3), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
