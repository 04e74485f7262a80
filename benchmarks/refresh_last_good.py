"""Refresh benchmarks/records/last_good_bench.json from a fresh bench log.

bench.py re-emits the full (augmented) result line after every completed
secondary; the LAST JSON line of a run is therefore its most complete
measurement. This tool merges that line into the stale-fallback record,
tracking provenance PER KEY in ``fallback_provenance`` ({metric: source}):
every metric the new run measured is stamped with ``--source``; every
retained metric keeps its own original source verbatim (never the new
run's). ``fallback_sources`` is regenerated as a derived, de-duplicated
view (one line per distinct source naming exactly the keys it measured).

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
import subprocess

RECORD = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "records", "last_good_bench.json"
)

# keys that name measurements (everything else is metadata/provenance)
_MEASUREMENT_KEYS = (
    "value", "p50_ms", "p99_ms", "mfu", "model_tflops_per_step",
    "vs_baseline", "batch", "fps_720p_b2", "fps_720p_b4", "fps_720p_b8",
    # fps_720p_b16 is intentionally absent: bench.py excludes the B=16
    # sweep (it reproducibly crashes the AOT compile helper), so the key
    # can never be produced
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


def _bench_commit() -> str:
    """Short hash of the last commit touching bench.py — pins the
    methodology the numbers were produced with (auditability)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        return subprocess.run(
            ["git", "log", "-1", "--format=%h", "--", "bench.py"],
            cwd=repo, capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def derive_sources(provenance: dict) -> list:
    """Collapse the per-key map into one human line per distinct source,
    newest-first by appearance order of the dict (insertion ordered)."""
    by_source: dict = {}
    for key, src in provenance.items():
        by_source.setdefault(src, []).append(key)
    return [f"{src} ({', '.join(keys)})" for src, keys in by_source.items()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", help="bench run log containing the JSON lines")
    ap.add_argument("--source", required=True,
                    help="provenance string, e.g. 'bench 2026-08-18T12:00Z'")
    ap.add_argument("--hardware", default="TPU v5e (1 chip, axon tunnel)",
                    help="hardware string pinned into fallback_note")
    args = ap.parse_args()

    fresh = last_json_line(args.log)
    try:
        with open(RECORD) as f:
            rec = json.load(f)
    except FileNotFoundError:
        rec = {}

    old_prov = rec.get("fallback_provenance", {})
    legacy_sources = rec.get("fallback_sources", [])
    provenance = {}
    for k in _MEASUREMENT_KEYS:
        if k in fresh:
            rec[k] = fresh[k]
            provenance[k] = args.source
        elif k in rec:
            # carry forward ONLY this key's own original source — never the
            # new run's, never a joined blob of every source
            provenance[k] = old_prov.get(
                k,
                "legacy record (pre per-key provenance): "
                + "; ".join(legacy_sources) if legacy_sources else "unknown",
            )
    for k in ("metric", "unit"):
        if k in fresh:
            rec[k] = fresh[k]

    rec["stale_fallback"] = True
    rec["fallback_provenance"] = provenance
    rec["fallback_sources"] = derive_sources(provenance)
    rec["fallback_note"] = (
        "emitted only when the axon device path is unreachable at bench "
        f"time; every number was measured on {args.hardware} by the run "
        "named per-key in fallback_provenance, with the methodology of "
        f"bench.py as of commit {_bench_commit()}"
    )
    rec.pop("fallback_reason", None)

    with open(RECORD, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    n_fresh = sum(1 for k in _MEASUREMENT_KEYS if k in fresh)
    print(f"refreshed {RECORD}: {n_fresh} metrics from this run, "
          f"{len(provenance) - n_fresh} retained")


if __name__ == "__main__":
    main()
