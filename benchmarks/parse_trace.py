"""Aggregate a jax.profiler Chrome trace into per-op-class device time.

Finds the newest ``*.trace.json.gz`` under a profile dir written by
``jax.profiler.trace`` (e.g. benchmarks/profile_step.py --trace DIR), keeps
only events on the TPU device track, and buckets XLA ops by class
(convolution fusions, copies/transposes, pallas kernels, ...) so the
"where did the milliseconds go" question has a one-command answer.

    python benchmarks/parse_trace.py /tmp/trace720 [--top 30] [--steps N]

``--steps``: number of identical steps captured in the trace; totals are
divided by it to report per-step time.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace(root: str) -> str:
    cands = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not cands:
        raise FileNotFoundError(f"no *.trace.json.gz under {root}")
    return cands[-1]


def classify(name: str) -> str:
    n = name.lower()
    if "convolution" in n or "conv" in n and "fusion" not in n:
        return "convolution"
    if n.startswith("copy") or ".copy" in n or "transpose" in n:
        return "copy/transpose"
    if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
        return "pallas/custom-call"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion(elementwise/other)"
    if "dynamic" in n and ("slice" in n or "update" in n):
        return "dynamic-slice/update"
    if "gather" in n or "scatter" in n:
        return "gather/scatter"
    if "reduce" in n:
        return "reduce"
    if "all-gather" in n or "all-reduce" in n or "collective" in n or "permute" in n:
        return "collective"
    if "infeed" in n or "outfeed" in n or "transfer" in n:
        return "transfer"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=1)
    args = ap.parse_args()

    path = find_trace(args.trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # device track pids: metadata events name them "/device:TPU:0" etc.
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "device:" in pname.lower():
                device_pids.add(e["pid"])

    per_op = collections.Counter()
    per_class = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us → ms
        # strip the .NN instance suffix so identical ops aggregate
        base = re.sub(r"[.\-]\d+$", "", name)
        per_op[base] += dur
        per_class[classify(name)] += dur

    total = sum(per_class.values())
    print(f"trace: {path}")
    print(f"total device time: {total:.2f} ms "
          f"({total / max(args.steps, 1):.2f} ms/step over {args.steps} steps)\n")
    print("== by class ==")
    for cls, ms in per_class.most_common():
        print(f"{cls:28s} {ms / args.steps:9.3f} ms  {100 * ms / total:5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for op, ms in per_op.most_common(args.top):
        print(f"{ms / args.steps:9.3f} ms  {op[:100]}")


if __name__ == "__main__":
    main()
