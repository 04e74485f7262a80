#!/bin/bash
# One-command TPU measurement session for when the axon helper returns.
#
# Run order is chosen so a mid-session helper death loses the least:
#   1. health probe (refuses to start against a dead helper)
#   2. full bench.py  -> warms every driver-bench program at HEAD AND
#      produces the round's live record (log kept)
#   3. refresh the stale-fallback record from that log
#   4. LAYOUT_V2 A/B probe (the one new cold compile; only after the
#      default-path record is safe)
#
# ONE JAX process at a time on the tunnel (concurrent = Fatal Abort):
# this script refuses to start if another python is running.
set -u
cd "$(dirname "$0")/.."

code=$(curl -m 5 -s -o /dev/null -w "%{http_code}" \
        -X POST http://127.0.0.1:8103/remote_compile || true)
if [ "$code" = "000" ]; then
    echo "helper DOWN (curl $code) — not starting"; exit 1
fi
if pgrep -x python >/dev/null 2>&1; then
    echo "another python process is running — refusing to share the tunnel"
    exit 1
fi

STAMP=$(date -u +%Y%m%dT%H%MZ)
LOG=/tmp/bench_session_${STAMP}.log
echo "== full bench (warm + record) -> $LOG"
BENCH_BUDGET_S=${BENCH_BUDGET_S:-7200} timeout 9000 python bench.py \
    >"$LOG" 2>/tmp/bench_session_${STAMP}.err
tail -1 "$LOG"

if grep -q '"stale_fallback": true' <(tail -1 "$LOG"); then
    echo "bench fell back to stale record — helper died mid-run; stopping"
    exit 1
fi

python benchmarks/refresh_last_good.py "$LOG" \
    --source "bench ${STAMP} full run (TPU v5e)"

echo "== LAYOUT_V2 A/B probe (cold compile ~60-90 min first time)"
timeout 7200 python benchmarks/layoutv2_probe.py --v2 1 \
    | tee /tmp/layoutv2_${STAMP}.json
echo "v1 reference point is the bench headline in $LOG"
echo "If v2 wins materially: flip [TPU] LAYOUT_V2 default, re-run this"
echo "script to re-warm + re-record, and only then commit the flip."
