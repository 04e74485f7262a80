"""Benchmark: 720p interpolated frames/sec/chip at 8x interpolation, plus
machine-readable secondary metrics (p50/p99 step latency, MFU, 1080p
16-stream throughput, train-step throughput, SSM-R streaming fps).

Runs the fused multi-t step (stage-1 once + 7-t stage-2 fold, one jitted
program) on a padded 736x1280 Adobe-protocol frame pair on whatever device
jax provides (TPU in CI; CPU locally).

Crash-proof output protocol: the headline JSON line is printed AND FLUSHED
the moment the 720p measurement completes; every secondary metric then
re-prints the full (augmented) line. A timeout at any point therefore
loses at most the still-unmeasured secondaries — the driver parses the
LAST complete JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

``BENCH_BUDGET_S`` (env, default 1500) bounds total wall time: secondaries
whose worst-case cost exceeds the remaining budget are skipped (each one is
also individually try/except-guarded, so one failure cannot eat the rest).
The default is sized to finish INSIDE the driver's own kill timeout when
every program is warm-cached (round-3 evidence: the driver killed the
2700-budget run ~30 min in, rc=124 with the headline already on record);
manual warm-up sessions override it (benchmarks/tpu_session.sh uses 7200).

``vs_baseline`` is the speedup over the reference-equivalent PyTorch-CPU
implementation measured by benchmarks/torch_cpu_baseline.py (the BASELINE.md
north star is >=10x; the protocol replaced is the reference's 7-forward
eval loop, scripts/evaluate_interpolation_results.py:234-242). ``mfu``
counts the model's algorithmic conv FLOPs (full-resolution math, NOT the
polyphase implementation's inflated MACs) against the v5e bf16 peak of
197 TF/s.
"""

from __future__ import annotations

import contextlib
import json
import os
import signal
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

_T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # TPU v5e bf16


def remaining_s() -> float:
    return BUDGET_S - (time.time() - _T_START)


@contextlib.contextmanager
def _bounded(seconds: float):
    """Nested SIGALRM bound for ONE sweep point: raises TimeoutError in the
    body after ``seconds``, then restores whatever time the enclosing alarm
    (the per-secondary wall) had left. This is the round-5 fix for the
    round-4 driver run, where one cold 1080p compile consumed the whole
    per-secondary wall and everything after it was budget-skipped
    (BENCH_r04.json): a point that is not warm-cached now times out in
    minutes, is recorded as cold_skipped, and the sweep moves on."""
    prev = signal.alarm(0)
    t0 = time.time()
    signal.alarm(max(1, int(seconds if not prev else min(seconds, prev))))
    try:
        yield
    finally:
        signal.alarm(0)
        if prev:
            signal.alarm(max(1, int(prev - (time.time() - t0))))


def emit(result: dict) -> None:
    """Print the full current result line and flush — called after the
    headline and again after EVERY completed secondary, so a timeout at any
    point leaves the most complete measurement on the last line."""
    print(json.dumps(result), flush=True)


def unet_gmacs(h: int, w: int, in_ch: int, conv7a_in: int, out_ch: int) -> float:
    """Algorithmic conv MACs (in units of 1e9) of one U-Net forward at h x w
    (reference topology, flow_computation.py:27-153)."""
    px = h * w
    layers = [
        (in_ch, 32, 7, 1), (32, 32, 7, 1),
        (32, 64, 5, 2), (64, 64, 5, 2),
        (64, 128, 3, 4), (128, 128, 3, 4),
        (128, 256, 3, 8), (256, 256, 3, 8),
        (256, 512, 3, 16), (512, 512, 3, 16),
        (512, 512, 3, 32), (512, 512, 3, 32),           # conv6 x2
        (conv7a_in, 512, 3, 16), (512, 512, 3, 16),     # block 7
        (1024, 256, 3, 8), (256, 256, 3, 8),            # block 8
        (512, 128, 3, 4), (128, 128, 3, 4),             # block 9
        (256, 64, 3, 2), (64, 64, 3, 2),                # block 10
        (128, 32, 3, 1), (32, 32, 3, 1),                # block 11
        (64, 32, 3, 1), (32, out_ch, 3, 1),             # fuse + final
    ]
    return sum(px // (s * s) * k * k * ci * co for ci, co, k, s in layers) / 1e9


def step_model_tflops(h: int, w: int, n_t: int) -> float:
    """Model TFLOPs of one fused multi-t step (B=1): stage-1 once + n_t
    stage-2 forwards (conv FLOPs only; warps/physics are <1%)."""
    s1 = unet_gmacs(h, w, 6, 512, 4)
    s2 = unet_gmacs(h, w, 16, 1024, 5)
    return 2.0 * (s1 + n_t * s2) / 1e3


def build_multi_t_step(h, w, n_t, compute_dtype, batch=1):
    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo
    from superslomo_tpu.ops import with_prepared

    spec = ModelSpec(n_frames=2, compute_dtype=compute_dtype)
    model = SuperSloMo(spec=spec)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.standard_normal((batch, 2, h, w, 3), dtype=np.float32)
    )
    t_values = jnp.arange(1, n_t + 1, dtype=jnp.float32) / (n_t + 1)
    params = model.init(
        jax.random.PRNGKey(0), frames[:1], jnp.full((1, 1), 0.5)
    )
    # the production eval fast path: unguarded warps + host-checked bound,
    # with the polyphase/upconv weight transforms pre-hoisted (ops/prepare.py)
    params = with_prepared(params)
    step = jax.jit(
        lambda p, f: model.apply(p, f, t_values, with_bounds=True,
                                 method=SuperSloMo.interpolate_multi_t)[0]
    )
    return step, params, frames


def timed_fps(step, params, frames, n_t, iters):
    """Amortized mean (async dispatch pipeline) + per-dispatch p50/p99."""
    out = step(params, frames)
    out.block_until_ready()  # compile + warmup
    t0 = time.time()
    for _ in range(iters):
        out = step(params, frames)
    out.block_until_ready()
    mean_ms = (time.time() - t0) / iters * 1e3

    lat = []
    for _ in range(iters):
        t0 = time.time()
        step(params, frames).block_until_ready()
        lat.append((time.time() - t0) * 1e3)
    return mean_ms, float(np.percentile(lat, 50)), float(np.percentile(lat, 99))


def bench_batched_720p(result, h, w, n_t, compute_dtype, batches=(8, 4, 2),
                       point_wall_s=420.0):
    """Batched-throughput refinement of the headline: batch >= 2 became
    compilable once the vmapped multiflow Pallas kernel was replaced by
    per-image calls (ops/warp_pallas._batched_pallas; isolated by
    benchmarks/batch720_probe.py). The reference evaluates at batch 8
    (configs VAL); frames/sec/chip is the protocol metric, so the headline
    reports the best batch, with B=1's dispatch latency kept as p50/p99.

    B=8 runs FIRST: it is the round-4 headline configuration (61.46 fps,
    benchmarks/records/bench_r4_full_20260820.jsonl) and is warm-cached, so
    fps_720p_b8 lands on the emitted line minutes after the B=1 headline.
    Every point is individually bounded by ``point_wall_s`` — warm points
    finish in <90 s; a point whose program fell out of the compile cache
    times out, is recorded under ``cold_skipped``, and the sweep proceeds
    to the remaining (still-warm) points."""
    # vs_baseline/value is the constant 1/torch_fps, so rescaling from the
    # CURRENT best keeps it exact even across a later cold-sweep call
    base_fps = result["value"]
    for i, B in enumerate(batches):
        if remaining_s() < 120:
            break
        # The FIRST point (B=8, the headline configuration) may use most of
        # the remaining budget, not just the flat per-point wall: it is the
        # single number that moves ``value``, and this session measured its
        # cold compile at ~25 min vs ssmr/train at ~15 — a flat 420 s bound
        # sacrifices the headline to protect points that matter less
        # (2026-08-21 cold-cache run: b8/b4/b2 all cold_skipped at 420 s
        # while warm points need <90 s). ~6 min is held back so warm
        # secondaries can still land after a failed cold attempt.
        wall = point_wall_s if i else max(point_wall_s, remaining_s() - 360)
        try:
            with _bounded(min(wall, max(remaining_s() - 30, 60))):
                step, params, frames = build_multi_t_step(h, w, n_t, compute_dtype, B)
                out = step(params, frames)
                out.block_until_ready()
                iters = 10
                t0 = time.time()
                for _ in range(iters):
                    out = step(params, frames)
                out.block_until_ready()
                fps = B * n_t * iters / (time.time() - t0)
            result[f"fps_720p_b{B}"] = round(fps, 3)
            if fps > result["value"]:
                result["value"] = round(fps, 3)
                result["batch"] = B
                result["mfu"] = round(
                    B * step_model_tflops(h, w, n_t) / (B * n_t / fps)
                    / PEAK_TFLOPS, 4
                )
                if result.get("vs_baseline"):
                    result["vs_baseline"] = round(
                        result["vs_baseline"] * fps / base_fps, 2
                    )
                    base_fps = fps
        except TimeoutError:
            result.setdefault("cold_skipped", []).append(f"b{B}_720p")
        except Exception:
            traceback.print_exc(file=sys.stderr)
            result.setdefault("failed", []).append(f"b{B}_720p")
        emit(result)


def bench_1080p(result, compute_dtype, n_t, batches=(2,), base=True,
                point_wall_s=420.0):
    """1080p 16-stream throughput. Every point (including the batch-1 base)
    is ``_bounded``: in the round-4 driver run the base build hit a cold
    trace+compile, the per-secondary alarm fired mid-trace, and the burned
    wall caused every later secondary to be budget-skipped. Now a cold
    point costs at most ``point_wall_s`` and the rest of the bench runs."""
    n_streams = 16
    if base:
        # 1080p, 16 streams, sequential batch-1 dispatches (async-pipelined)
        try:
            with _bounded(min(point_wall_s, max(remaining_s() - 30, 60))):
                s1080, p1080, f1080 = build_multi_t_step(
                    1088, 1920, n_t, compute_dtype)
                s1080(p1080, f1080).block_until_ready()
                t0 = time.time()
                for _ in range(n_streams):
                    out = s1080(p1080, f1080)
                out.block_until_ready()
            result["fps_1080p_16stream"] = round(
                n_streams * n_t / (time.time() - t0), 3
            )
        except TimeoutError:
            result.setdefault("cold_skipped", []).append("b1_1080p")
        emit(result)
    # same 16 streams, batched dispatches (the batch>=2 unlock); cold sweep
    # points (B=4) run only from bench_cold_sweeps at the very end
    for B in batches:
        if remaining_s() < 120 or "fps_1080p_16stream" not in result:
            return
        try:
            with _bounded(min(point_wall_s, max(remaining_s() - 30, 60))):
                sB, pB, fB = build_multi_t_step(1088, 1920, n_t, compute_dtype, B)
                sB(pB, fB).block_until_ready()
                t0 = time.time()
                for _ in range(n_streams // B):
                    out = sB(pB, fB)
                out.block_until_ready()
                fps = n_streams * n_t / (time.time() - t0)
            if fps > result["fps_1080p_16stream"]:
                result["fps_1080p_16stream"] = round(fps, 3)
                result["batch_1080p"] = B
        except TimeoutError:
            result.setdefault("cold_skipped", []).append(f"b{B}_1080p")
        except Exception:
            traceback.print_exc(file=sys.stderr)
            result.setdefault("failed", []).append(f"b{B}_1080p")
        emit(result)


def bench_cold_sweeps(result, h, w, n_t, compute_dtype):
    """Retry slot for anything that timed out cold earlier, LAST and with a
    generous per-point wall: nothing already measured depends on these
    finishing. B=16 720p and B=4 1080p are NOT swept: probed 2026-08-20
    (and re-bisected round 5), those fused multi-t programs crash the
    chipless AOT compile helper after ~36 min (HTTP 500, subprocess
    exit 1), so sweeping them would burn half the driver's budget on a
    doomed compile."""
    wall = max(remaining_s() - 60, 120)
    for name in list(result.get("cold_skipped", [])):
        if remaining_s() < 180:
            break
        if not (name.startswith("b") and name.count("_") == 1):
            continue  # e.g. "train_352_remat": no batch-sweep retry slot
        b, res = name.split("_")  # e.g. "b8_720p"
        B = int(b[1:])
        result["cold_skipped"].remove(name)
        if res == "720p":
            bench_batched_720p(result, h, w, n_t, compute_dtype,
                               batches=(B,), point_wall_s=wall)
        else:
            bench_1080p(result, compute_dtype, n_t, batches=(B,),
                        base=(B == 1), point_wall_s=wall)


def bench_ssmr_stream(result):
    """SSM-R (CLSTM bottleneck) streaming at 720p: 30-frame clip processed
    as N_FRAMES=4 sliding windows with the recurrent hidden state carried
    device-resident between windows (the reference's headline variant,
    README.org:5-17; streaming protocol of default_reader.py:233-248 minus
    the per-window cold state)."""
    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo, mid_window

    H, W, N, n_frames_clip = 736, 1280, 4, 30
    spec = ModelSpec(
        n_frames=N, stage1_bottleneck="CLSTM", stage2_bottleneck="CLSTM",
        compute_dtype="bfloat16",
    )
    model = SuperSloMo(spec=spec)
    rng = np.random.default_rng(0)
    clip = rng.standard_normal((1, n_frames_clip, H, W, 3)).astype(np.float32)
    t = jnp.full((1, N - 1), 0.5, jnp.float32)
    window0 = jnp.asarray(clip[:, 0:N])
    from superslomo_tpu.ops import with_prepared

    params = with_prepared(model.init(jax.random.PRNGKey(0), window0, t))

    @jax.jit
    def step(p, frames, carry):
        out = model.apply(p, frames, t, rnn_carry=carry)
        return out.pred_images[:, mid_window(out)], out.rnn_carry

    # ONE compiled program: carry=None initializes to zeros inside the
    # cell scan (models/bottleneck.py _scan_cell), so an explicit zeros
    # carry is bit-identical — and eval_shape gets its structure without
    # compiling the separate carry=None program variant (halves the SSM-R
    # cold-compile cost at bench time; one less shot at the compile
    # helper, which a big program has been observed to take down).
    carry_shape = jax.eval_shape(
        lambda p, f: model.apply(p, f, t).rnn_carry, params, window0
    )
    carry0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), carry_shape)
    img, carry = step(params, window0, carry0)  # compile + warmup
    img.block_until_ready()

    # Stage the clip's windows device-resident BEFORE timing (the same
    # methodology as the 720p headline, whose frames are resident): a 45 MB
    # host→device window transfer over the axon tunnel inside the loop
    # measures the tunnel, not the chip. Real streaming double-buffers H2D
    # behind compute.
    starts = list(range(0, n_frames_clip - N + 1, N - 1))
    windows = [jax.device_put(jnp.asarray(clip[:, s:s + N])) for s in starts]
    for w in windows:
        w.block_until_ready()
    carry = carry0
    t0 = time.time()
    for frames in windows:
        img, carry = step(params, frames, carry)
    img.block_until_ready()
    dt = time.time() - t0
    # each window advances N-1 pairs, one interpolated frame per pair
    result["ssmr_stream_fps"] = round(len(starts) * (N - 1) / dt, 3)
    result["ssmr_stream_finite"] = bool(np.isfinite(float(jnp.sum(img))))


def bench_train(result):
    result["train_samples_per_sec_b8_224"] = round(
        train_throughput(8, 224, 224, remat=False), 2
    )
    emit(result)
    if remaining_s() > 300:
        # individually bounded: a cold 352-remat compile must cost this
        # point, not flag the whole secondary failed (2026-08-21 run: the
        # 3x secondary alarm fired mid-compile here and the 224 number —
        # already emitted — was the only train evidence left)
        try:
            with _bounded(max(remaining_s() - 30, 60)):
                result["train_samples_per_sec_b8_352_remat"] = round(
                    train_throughput(8, 352, 352, remat=True), 2
                )
        except TimeoutError:
            result.setdefault("cold_skipped", []).append("train_352_remat")


def train_throughput(batch, h, w, remat, iters=10):
    """samples/s of the full production-shaped train step (Adam + losses
    with random-feature VGG) on one chip."""
    import optax

    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.losses import LossWeights, compute_losses
    from superslomo_tpu.models.superslomo import SuperSloMo
    from superslomo_tpu.models.vgg import VGG16Features, init_vgg_params

    spec = ModelSpec(n_frames=2, compute_dtype="bfloat16", remat=remat)
    model = SuperSloMo(spec=spec)
    vgg = VGG16Features()
    vgg_params = init_vgg_params()
    weights = LossWeights()
    tx = optax.adam(1e-4)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((batch, 2, h, w, 3), dtype=np.float32))
    targets = jnp.asarray(rng.standard_normal((batch, 1, h, w, 3), dtype=np.float32))
    t = jnp.full((batch, 1), 0.5, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), frames[:1], t[:1])
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, frames, targets, t):
        def loss_fn(p):
            out = model.apply(p, frames, t)
            return compute_losses(
                out, targets, spec, weights, lambda img: vgg.apply(vgg_params, img)
            )[:, 0].mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = train_step(params, opt_state, frames, targets, t)
    loss.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss = train_step(params, opt_state, frames, targets, t)
    loss.block_until_ready()
    return batch * iters / (time.time() - t0)


def _emit_stale_fallback(reason: str) -> None:
    """The TPU is reached through a remote-compile helper that can die
    outright (observed 2026-08-17: device init hangs forever, which cost
    round 2 its bench record). When the device path is unreachable, emit
    the last good FULLY-MEASURED bench line — clearly flagged
    ``stale_fallback`` with per-number provenance — instead of nothing."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "records", "last_good_bench.json")
    try:
        with open(path) as f:
            rec = json.load(f)
    except Exception:
        rec = {"metric": "720p_interp_frames_per_sec_8x", "value": None,
               "unit": "frames/sec/chip", "vs_baseline": None,
               "stale_fallback": True}
    rec["fallback_reason"] = reason
    print(json.dumps(rec), flush=True)


def _helper_endpoint_alive(timeout_s: float = 5.0) -> bool:
    """TCP preflight of the axon remote-compile helper. When the helper is
    dead its port refuses instantly, but jax device init then blocks
    FOREVER inside native code — where Python defers signal handlers, so a
    SIGALRM bound never fires (verified 2026-08-18 against the dead
    helper: the alarmed bench produced zero output). Probe the socket
    BEFORE touching jax."""
    # key off the tunnel's own config, NOT JAX_PLATFORMS: the axon site
    # preload ignores JAX_PLATFORMS=cpu, so the env var doesn't tell us
    # whether device init will dial the helper
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
        return True  # no remote-compile tunnel in play: nothing to probe
    if str(getattr(jax.config, "jax_platforms", "") or "").lower().startswith("cpu"):
        return True  # in-process CPU pin (tests/conftest.py): no dial
    import socket

    host, _, port = os.environ.get(
        "SSMTPU_HELPER_ADDR", "127.0.0.1:8103"
    ).rpartition(":")
    try:
        socket.create_connection((host, int(port)), timeout=timeout_s).close()
        return True
    except OSError:
        return False


def _watchdog(seconds: float, reason: str):
    """Emit the fallback line and hard-exit if the main thread is still
    stuck after ``seconds``. A THREAD, not SIGALRM: the observed hangs
    block in GIL-releasing native socket waits, which never return to the
    interpreter to run a signal handler — but a watchdog thread keeps
    running. Call ``.set()`` on the returned event to disarm."""
    import threading

    done = threading.Event()

    def fire():
        if not done.wait(seconds):
            _emit_stale_fallback(reason)
            os._exit(3)

    threading.Thread(target=fire, daemon=True).start()
    return done


def main():
    def _alarm(signum, frame):
        raise TimeoutError("device init / headline wall limit hit")

    n_t = 7
    if not _helper_endpoint_alive():
        _emit_stale_fallback("device path unreachable: remote-compile "
                             "helper TCP endpoint is down")
        return
    # Belt and braces: the endpoint can accept and the init still hang
    # (helper dying mid-handshake) — bound it with a watchdog thread.
    init_s = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "600"))
    ok = _watchdog(init_s, f"device init hung > {init_s:.0f}s")
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception as e:
        ok.set()
        _emit_stale_fallback(f"device init failed: {type(e).__name__}: {e}")
        return
    ok.set()
    compute_dtype = "bfloat16" if on_tpu else "float32"

    # headline: 720p 8x fused multi-t — bounded so a helper death mid-
    # compile still leaves the fallback line on record (SIGALRM as the
    # in-Python bound — compile retry loops sleep in Python where it DOES
    # fire — plus a generously longer watchdog thread for native hangs)
    H, W = (736, 1280) if on_tpu else (96, 160)
    try:
        if on_tpu:
            wall = int(max(min(remaining_s() - 60, BUDGET_S), 120))
            signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(wall)
            ok = _watchdog(wall + 120, f"headline hung > {wall + 120}s")
        step, params, frames = build_multi_t_step(H, W, n_t, compute_dtype)
        iters = 20 if on_tpu else 3
        mean_ms, p50, p99 = timed_fps(step, params, frames, n_t, iters)
    except Exception as e:
        signal.alarm(0)
        _emit_stale_fallback(f"headline failed: {type(e).__name__}: {e}")
        return
    signal.alarm(0)
    if on_tpu:
        ok.set()
    fps = n_t / (mean_ms / 1e3)
    mfu = step_model_tflops(H, W, n_t) / (mean_ms / 1e3) / PEAK_TFLOPS

    result = {
        "metric": "720p_interp_frames_per_sec_8x" if on_tpu else "cpu_smoke_interp_fps",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": None,
        "p50_ms": round(p50, 2),
        "p99_ms": round(p99, 2),
        "mfu": round(mfu, 4),
        "model_tflops_per_step": round(step_model_tflops(H, W, n_t), 3),
    }

    baseline_path = os.path.join(os.path.dirname(__file__), "benchmarks",
                                 "torch_cpu_baseline.json")
    if os.path.exists(baseline_path) and on_tpu:
        with open(baseline_path) as f:
            result["vs_baseline"] = round(fps / json.load(f)["fps_720p_8x_cpu"], 2)

    emit(result)  # the headline is now on record, whatever happens below

    if not on_tpu:
        return

    # secondaries: each guarded and budgeted; result re-emitted after each.
    # Round-5 order (VERDICT r4 item 1): the warm B=8 sweep — the round-4
    # headline configuration — runs FIRST so fps_720p_b8 is on the emitted
    # line within minutes; then the remaining warm programs (SSM-R, train,
    # 1080p); the cold-retry slot is last. Gates are small because every
    # sweep point is now individually _bounded: a cold compile costs one
    # point's wall (~7 min), never the rest of the budget.
    secondaries = [
        # 480 (not 150): the enclosing 3x per-secondary SIGALRM wall caps
        # the nested per-point bounds, and the B=8 first point is allowed
        # to spend most of the remaining budget on a semi-cold compile
        # (see bench_batched_720p) — 3x480 = 1440 s keeps that possible
        # inside the driver's 1500 s budget while still bounding a hang.
        (bench_batched_720p, (result, H, W, n_t, compute_dtype), 480),
        (bench_ssmr_stream, (result,), 420),
        (bench_train, (result,), 240),
        (bench_1080p, (result, compute_dtype, n_t), 150),
        # 1200 (not 180): the retry slot's generous per-point walls were
        # being strangled by its own 3x secondary alarm (2026-08-21 run:
        # 3x180 = 540 s for ALL retries combined — the first ~25 min cold
        # compile ate it and every later retry failed in seconds). 3x1200
        # covers two real cold compiles; the remaining-budget gate still
        # skips the slot entirely in a tight driver run.
        (bench_cold_sweeps, (result, H, W, n_t, compute_dtype), 1200),
    ]

    def _alarm(signum, frame):
        raise TimeoutError("secondary exceeded its wall-clock allowance")

    signal.signal(signal.SIGALRM, _alarm)
    for fn, args, worst_case_s in secondaries:
        if remaining_s() < worst_case_s:
            result.setdefault("skipped", []).append(fn.__name__)
            emit(result)
            continue
        # Two wall limits per secondary: SIGALRM (fires in Python-level
        # compile-retry sleeps — the observed 20+ min backoff against a
        # dead helper) and a watchdog thread at +240 s (fires even when the
        # hang is a native GIL-releasing wait, where signals never run;
        # emits the current result and exits with everything measured so
        # far — the remaining secondaries are unreachable behind a native
        # hang anyway). The SIGALRM wall is 3x the expected warm cost, NOT
        # the remaining budget: a stuck secondary must leave the rest of
        # the sweep runnable (round-4 post-mortem, BENCH_r04.json).
        wall = int(min(max(remaining_s() - 30, 60), 3 * worst_case_s))
        import threading

        done = threading.Event()

        def _wd(done=done, wall=wall, name=fn.__name__):
            if not done.wait(wall + 240):
                print(f"# watchdog: {name} hung natively; emitting partial "
                      "result", file=sys.stderr, flush=True)
                emit(result)
                os._exit(0)

        threading.Thread(target=_wd, daemon=True).start()
        try:
            signal.alarm(wall)
            fn(*args)
        except Exception:
            traceback.print_exc(file=sys.stderr)
            result.setdefault("failed", []).append(fn.__name__)
        finally:
            signal.alarm(0)
            done.set()
        emit(result)


if __name__ == "__main__":
    main()
