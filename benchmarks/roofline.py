"""Analytic roofline for the fused multi-t step on TPU v5e.

For every conv layer of the two U-Nets (reference topology,
flow_computation.py:27-153) this computes the larger of its MXU time
(algorithmic MACs at the bf16 peak) and its HBM time (activations in +
activations out + weights at peak bandwidth), then sums stage-1 once plus
n_t stage-2 passes — the compute/bandwidth speed-of-light for the 720p 8x
step, against which the measured step time is judged (ARCHITECTURE.md
"Performance status").

    python benchmarks/roofline.py [--h 736] [--w 1280] [--nt 7]

No JAX needed; pure arithmetic.
"""

from __future__ import annotations

import argparse

PEAK_TFLOPS = 197e12  # v5e bf16
HBM_GBS = 819e9  # v5e HBM bandwidth
BYTES = 2  # bf16 activations/weights


def unet_layers(in_ch: int, conv7a_in: int, out_ch: int):
    """(cin, cout, k, stride-denominator) per conv, encoder to head."""
    return [
        (in_ch, 32, 7, 1), (32, 32, 7, 1),
        (32, 64, 5, 2), (64, 64, 5, 2),
        (64, 128, 3, 4), (128, 128, 3, 4),
        (128, 256, 3, 8), (256, 256, 3, 8),
        (256, 512, 3, 16), (512, 512, 3, 16),
        (512, 512, 3, 32), (512, 512, 3, 32),
        (conv7a_in, 512, 3, 16), (512, 512, 3, 16),
        (1024, 256, 3, 8), (256, 256, 3, 8),
        (512, 128, 3, 4), (128, 128, 3, 4),
        (256, 64, 3, 2), (64, 64, 3, 2),
        (128, 32, 3, 1), (32, 32, 3, 1),
        (64, 32, 3, 1), (32, out_ch, 3, 1),
    ]


# Measured polyphase MAC-inflation factors of an s2d-form conv (NOTES_r2):
# the half-grid equivalent kernel costs 4*K'^2/K^2 of the true MACs.
_S2D_INFLATION = {3: 4.0, 5: 1.44, 7: 2.04}

# layer indices (into unet_layers) that execute in s2d form in
# models/unet.py: conv1a/1b (7x7), conv2a/2b (5x5), conv10b, conv11b,
# fuse_conv, final head (3x3). The upconv folds (7a/8a/9a/10a/11a) run at
# TRUE MACs on the half grid and are not inflated.
_S2D_LAYERS = {0, 1, 2, 3, 19, 21, 22, 23}


def unet_roofline(h: int, w: int, in_ch: int, conv7a_in: int, out_ch: int,
                  lane_model: bool = False, impl: bool = False):
    """Per-U-Net (flop_time_s, mem_time_s, sum-of-max_s, per-layer rows).

    ``lane_model``: derate the MXU peak by output-lane occupancy. XLA packs
    k*k*cin into the contracting dimension (>=128 almost everywhere), but
    the output-channel dimension maps to MXU columns: a cout<128 conv uses
    cout/128 of the array. The implementation lifts small-cout layers with
    S2D polyphase (encoder blocks 1-2: cout x4) and the upsample+conv fold
    (decoder: cout x4), modeled here as effective cout = min(4*cout, ...)
    for those layers; mid layers already have cout>=128."""
    rows = []
    t_flop_total = t_mem_total = t_max_total = 0.0
    for i, (cin, cout, k, s) in enumerate(unet_layers(in_ch, conv7a_in, out_ch)):
        px = (h // s) * (w // s)
        flops = 2.0 * px * k * k * cin * cout
        if impl and i in _S2D_LAYERS:
            flops *= _S2D_INFLATION[k]
        bytes_ = BYTES * (px * cin + px * cout + k * k * cin * cout)
        eff_peak = PEAK_TFLOPS
        if lane_model:
            # s2d/upconv folds quadruple the effective cout of the
            # full-and-half-res layers, matching ops/s2d.py + ops/upconv.py
            eff_cout = cout * 4 if s <= 2 else cout
            eff_peak = PEAK_TFLOPS * min(eff_cout, 128) / 128.0
        t_flop = flops / eff_peak
        t_mem = bytes_ / HBM_GBS
        rows.append((cin, cout, k, s, t_flop, t_mem))
        t_flop_total += t_flop
        t_mem_total += t_mem
        t_max_total += max(t_flop, t_mem)
    return t_flop_total, t_mem_total, t_max_total, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=736)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--nt", type=int, default=7)
    ap.add_argument("--per-layer", action="store_true")
    ap.add_argument("--lane-model", action="store_true",
                    help="derate MXU peak by output-lane occupancy")
    ap.add_argument("--impl", action="store_true",
                    help="count the implementation's polyphase-inflated MACs")
    args = ap.parse_args()

    s1 = unet_roofline(args.h, args.w, 6, 512, 4, args.lane_model, args.impl)
    s2 = unet_roofline(args.h, args.w, 16, 1024, 5, args.lane_model, args.impl)

    for name, (tf, tm, tx, rows) in (("stage1", s1), ("stage2", s2)):
        print(
            f"{name}: flop-bound {tf*1e3:6.2f} ms   mem-bound {tm*1e3:6.2f} ms"
            f"   roofline(sum of per-layer max) {tx*1e3:6.2f} ms"
        )
        if args.per_layer:
            for cin, cout, k, s, t_flop, t_mem in rows:
                bound = "MXU" if t_flop >= t_mem else "HBM"
                print(
                    f"    {cin:5d}->{cout:4d} k{k} /{s:<2d}"
                    f"  flop {t_flop*1e3:6.3f} ms  mem {t_mem*1e3:6.3f} ms  [{bound}]"
                )

    step = s1[2] + args.nt * s2[2]
    flop_only = s1[0] + args.nt * s2[0]
    # non-conv traffic floor: the physics/warp/blend epilogue must stream
    # the 6-ch pair, n_t x (16-ch stage-2 input + 5-ch head + 6-ch warps +
    # 3-ch output) through HBM at least once
    px = args.h * args.w
    epilogue_bytes = BYTES * px * (6 + args.nt * (16 * 2 + 5 + 6 * 2 + 3 * 2))
    t_epi = epilogue_bytes / HBM_GBS
    print(f"\nconv roofline step time: {step*1e3:.2f} ms "
          f"(pure-MXU bound {flop_only*1e3:.2f} ms)")
    print(f"epilogue HBM floor: {t_epi*1e3:.2f} ms")
    print(f"speed-of-light step: {(step+t_epi)*1e3:.2f} ms "
          f"-> {args.nt/(step+t_epi):.1f} fps")


if __name__ == "__main__":
    main()
