"""SSM-R streaming demo/bench (BASELINE.json config 3): recurrent hidden
state carried across a 30-frame clip.

The reference processes long clips as independent sliding windows (each
window re-running the bidirectional ConvLSTM from zero state,
default_reader.py:233-248). Here the `rnn_carry` threading of
models/superslomo.py lets consecutive windows reuse the bottleneck state —
one jitted step per window, state passed device-resident between steps.

Note: only the *forward-direction* recurrent stacks carry meaningfully
across windows (the reverse direction would need future frames); the
carried state is exactly what the model API returns, so behavior matches
re-running with a warm state.

    python benchmarks/recurrent_stream.py --frames 30 --res tiny
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

RES = {"720p": (736, 1280), "tiny": (64, 128), "360p": (384, 640)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--res", choices=RES, default="tiny")
    p.add_argument("--n-frames", type=int, default=4)
    args = p.parse_args()

    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo, mid_window

    H, W = RES[args.res]
    N = args.n_frames
    on_tpu = jax.default_backend() == "tpu"
    spec = ModelSpec(
        n_frames=N,
        stage1_bottleneck="CLSTM",
        stage2_bottleneck="CLSTM",
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    model = SuperSloMo(spec=spec)

    rng = np.random.default_rng(0)
    clip = rng.standard_normal((1, args.frames, H, W, 3)).astype(np.float32)
    t = jnp.full((1, N - 1), 0.5, jnp.float32)

    window0 = jnp.asarray(clip[:, 0:N])
    params = model.init(jax.random.PRNGKey(0), window0, t)

    @jax.jit
    def step(p, frames, carry):
        out = model.apply(p, frames, t, rnn_carry=carry)
        return out.pred_images[:, mid_window(out)], out.rnn_carry

    # warm/compile both carry structures (None vs dict)
    img, carry = step(params, window0, None)
    float(jnp.sum(img))

    n_windows = 0
    t0 = time.time()
    img_sum = 0.0
    for s in range(0, args.frames - N + 1, N - 1):
        frames = jnp.asarray(clip[:, s : s + N])
        img, carry = step(params, frames, carry)
        n_windows += 1
    img_sum = float(jnp.sum(img))
    dt = time.time() - t0

    print(json.dumps({
        "metric": f"ssmr_stream_{args.res}_{args.frames}f",
        "value": round(n_windows / dt, 3),
        "unit": "windows/sec (state carried)",
        "windows": n_windows,
        "checksum_finite": bool(np.isfinite(img_sum)),
    }))


if __name__ == "__main__":
    main()
