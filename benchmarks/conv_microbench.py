"""Per-layer microbenchmark of the stage-2 U-Net's convs and glue ops at
736x1280 / batch 7 (the fused 8x step's shapes) — finds where the wall-clock
goes and what utilization each layer achieves.

CAVEAT (measured): each dispatch over the axon tunnel costs ~24 ms of fixed
round-trip, so per-call timings of sub-10 ms ops are dominated by RTT. For
accurate per-op numbers, loop the op in-graph (lax.scan with a carry-based
input perturbation so XLA can't hoist it) and subtract one RTT — or parse a
jax.profiler.trace (see NOTES_r2.md). This script's numbers are upper
bounds, useful for ranking heavyweight layers only.

    python benchmarks/conv_microbench.py [--b 7] [--h 736] [--w 1280] [--dtype bfloat16]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10):
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(g(*args))
    times = []
    for _ in range(iters):
        t0 = time.time()
        float(g(*args))
        times.append(time.time() - t0)
    return float(np.median(times) * 1e3)


def conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)) if isinstance(pad, int) else pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=7)
    p.add_argument("--h", type=int, default=736)
    p.add_argument("--w", type=int, default=1280)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    B, H, W = args.b, args.h, args.w
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    def t_conv(name, h, w, cin, cout, k):
        x = jnp.asarray(rng.standard_normal((B, h, w, cin)), dt)
        wgt = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, dt)
        ms = timed(lambda a, b: conv(a, b, k // 2), x, wgt)
        fl = 2 * B * h * w * k * k * cin * cout
        print(f"{name:28s} {ms:8.2f} ms   {fl/ms/1e9:7.1f} GF/ms ({fl/(ms*1e-3)/1e12:6.1f} TF/s)")
        return ms

    total = 0.0
    print(f"== stage-2 layer convs  B={B} {H}x{W} {dt} ==")
    # S2D full-res segment (runs at H/2 x W/2 with 4x channels)
    total += t_conv("conv1a s2d (7->5, 64->128)", H // 2, W // 2, 64, 128, 5)
    total += t_conv("conv1b s2d (7->5,128->128)", H // 2, W // 2, 128, 128, 5)
    # mid-res encoder
    total += t_conv("conv2a (5x5, 32->64)", H // 2, W // 2, 32, 64, 5)
    total += t_conv("conv2b (5x5, 64->64)", H // 2, W // 2, 64, 64, 5)
    total += t_conv("conv3a (3x3, 64->128)", H // 4, W // 4, 64, 128, 3)
    total += t_conv("conv3b (3x3,128->128)", H // 4, W // 4, 128, 128, 3)
    total += t_conv("conv4a (3x3,128->256)", H // 8, W // 8, 128, 256, 3)
    total += t_conv("conv4b (3x3,256->256)", H // 8, W // 8, 256, 256, 3)
    total += t_conv("conv5a (3x3,256->512)", H // 16, W // 16, 256, 512, 3)
    total += t_conv("conv5b (3x3,512->512)", H // 16, W // 16, 512, 512, 3)
    total += t_conv("conv6x2 (3x3,512->512)", H // 32, W // 32, 512, 512, 3) * 2
    total += t_conv("conv7a (3x3,1024->512)", H // 16, W // 16, 1024, 512, 3)
    total += t_conv("conv7b (3x3,512->512)", H // 16, W // 16, 512, 512, 3)
    total += t_conv("conv8a (3x3,1024->256)", H // 8, W // 8, 1024, 256, 3)
    total += t_conv("conv8b (3x3,256->256)", H // 8, W // 8, 256, 256, 3)
    total += t_conv("conv9a (3x3,512->128)", H // 4, W // 4, 512, 128, 3)
    total += t_conv("conv9b (3x3,128->128)", H // 4, W // 4, 128, 128, 3)
    total += t_conv("conv10a (3x3,256->64)", H // 2, W // 2, 256, 64, 3)
    total += t_conv("conv10b (3x3, 64->64)", H // 2, W // 2, 64, 64, 3)
    # S2D decoder tail
    total += t_conv("conv11a s2d (3x3,512->128)", H // 2, W // 2, 512, 128, 3)
    total += t_conv("conv11b s2d (3x3,128->128)", H // 2, W // 2, 128, 128, 3)
    total += t_conv("fuse s2d (3x3,256->128)", H // 2, W // 2, 256, 128, 3)
    total += t_conv("final s2d (3x3,128->20)", H // 2, W // 2, 128, 20, 3)
    print(f"{'SUM conv-only':28s} {total:8.2f} ms")

    # glue ops
    from superslomo_tpu.ops import avg_pool_2x2, upsample_2x_bilinear
    from superslomo_tpu.ops.s2d import s2d_upsample2x, remap_kernel

    def t_op(name, fn, *xs):
        ms = timed(fn, *xs)
        print(f"{name:28s} {ms:8.2f} ms")
        return ms

    g = 0.0
    g += t_op("upsample 184x320x128", upsample_2x_bilinear,
              jnp.asarray(rng.standard_normal((B, H // 4, W // 4, 128)), dt))
    g += t_op("upsample 92x160x256", upsample_2x_bilinear,
              jnp.asarray(rng.standard_normal((B, H // 8, W // 8, 256)), dt))
    g += t_op("s2d_upsample2x 368x640x128", s2d_upsample2x,
              jnp.asarray(rng.standard_normal((B, H // 2, W // 2, 128)), dt))
    g += t_op("avg_pool 368x640x64", avg_pool_2x2,
              jnp.asarray(rng.standard_normal((B, H // 2, W // 2, 64)), dt))
    g += t_op("remap 7x7x16x32 (x10)", lambda w: sum(
        jnp.sum(remap_kernel(w + i)[0]) for i in range(10)),
        jnp.asarray(rng.standard_normal((7, 7, 16, 32)), dt))
    print(f"{'SUM glue':28s} {g:8.2f} ms")

    # reference comparisons: the same full-res layers without S2D
    print("== no-S2D full-res variants ==")
    t_conv("conv1a full (7x7, 16->32)", H, W, 16, 32, 7)
    t_conv("conv1b full (7x7, 32->32)", H, W, 32, 32, 7)
    t_conv("conv11a full (3x3,128->32)", H, W, 128, 32, 3)
    t_conv("fuse full (3x3, 64->32)", H, W, 64, 32, 3)


if __name__ == "__main__":
    main()
