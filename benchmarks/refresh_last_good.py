"""Refresh benchmarks/records/last_good_bench.json from a fresh bench log.

bench.py re-emits the full (augmented) result line after every completed
secondary; the LAST JSON line of a run is therefore its most complete
measurement. This tool merges that line into the stale-fallback record —
keeping any metric the new run did NOT measure (with its old provenance)
and stamping per-number provenance for everything it did.

    python benchmarks/refresh_last_good.py /tmp/bench.log \
        --source "bench 2026-08-18T12:00Z full run"

The fallback record is what bench.py emits (flagged ``stale_fallback``)
when the axon device path is unreachable at bench time — see
benchmarks/records/README.md.
"""

from __future__ import annotations

import argparse
import json
import os

RECORD = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "records", "last_good_bench.json"
)

# keys that name measurements (everything else is metadata/provenance)
_MEASUREMENT_KEYS = (
    "value", "p50_ms", "p99_ms", "mfu", "model_tflops_per_step",
    "vs_baseline", "batch", "fps_720p_b2", "fps_720p_b4", "fps_720p_b8",
    "fps_1080p_16stream", "batch_1080p", "train_samples_per_sec_b8_224",
    "train_samples_per_sec_b8_352_remat", "ssmr_stream_fps",
    "ssmr_stream_finite",
)


def last_json_line(path: str) -> dict:
    best = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("metric", "").startswith("720p") and not rec.get(
                "stale_fallback"
            ):
                best = rec
    if best is None:
        raise SystemExit(f"no live (non-fallback) bench JSON line in {path}")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", help="bench run log containing the JSON lines")
    ap.add_argument("--source", required=True,
                    help="provenance string, e.g. 'bench 2026-08-18T12:00Z'")
    args = ap.parse_args()

    fresh = last_json_line(args.log)
    try:
        with open(RECORD) as f:
            rec = json.load(f)
    except FileNotFoundError:
        rec = {}

    old_sources = rec.get("fallback_sources", [])
    kept_old = []
    for k in _MEASUREMENT_KEYS:
        if k in fresh:
            rec[k] = fresh[k]
        elif k in rec:
            kept_old.append(k)
    for k in ("metric", "unit"):
        if k in fresh:
            rec[k] = fresh[k]

    rec["stale_fallback"] = True
    sources = [f"{args.source} ({', '.join(k for k in _MEASUREMENT_KEYS if k in fresh)})"]
    if kept_old and old_sources:
        sources += [f"RETAINED for {', '.join(kept_old)}: " + "; ".join(old_sources)]
    rec["fallback_sources"] = sources
    rec["fallback_note"] = (
        "emitted only when the axon device path is unreachable at bench "
        "time; every number was measured on TPU by the run named in "
        "fallback_sources with bench.py's methodology"
    )
    rec.pop("fallback_reason", None)

    with open(RECORD, "w") as f:
        json.dump(rec, f)
        f.write("\n")
    print(f"refreshed {RECORD}: "
          f"{sum(1 for k in _MEASUREMENT_KEYS if k in fresh)} metrics from "
          f"this run, {len(kept_old)} retained")


if __name__ == "__main__":
    main()
