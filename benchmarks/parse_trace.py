"""Aggregate a jax.profiler Chrome trace into per-op-class device time.

Finds the newest ``*.trace.json.gz`` under a profile dir written by
``jax.profiler.trace`` (e.g. benchmarks/profile_step.py --trace DIR), keeps
only events on the TPU device track, and buckets XLA ops by the profiler's
own ``hlo_category`` (convolution fusion / data formatting / loop fusion /
custom-call / ...), falling back to name-pattern classification for traces
that lack it. Parent ``jit_*`` spans are excluded (they duplicate their
children's time).

    python benchmarks/parse_trace.py /tmp/trace720 [--top 30] [--steps N]
    python benchmarks/parse_trace.py /tmp/before --diff /tmp/after --steps 3

``--steps``: number of identical steps captured; totals are divided by it.
``--diff``: compare two traces category-by-category — the ONLY reliable way
to judge an optimization. Per-op *source attribution* in XLA traces is
approximate (fusions carry one representative source line; a round-3
"weight-remap fusion" turned out to be mostly unrelated data work), so
conclusions should rest on category totals and controlled before/after
diffs, never on single-site attributions.
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
    """Name-pattern fallback for traces without hlo_category args."""
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


def load(trace_dir: str):
    """→ (per_class Counter, per_op Counter, per_instance dict, trace_path).

    per_instance maps each distinct HLO instruction name to
    ``[total_ms, count, bytes_accessed, category]`` — the per-instance view
    is what localizes a category total (e.g. 40 ms of "data formatting") to
    the two or three actual relayout instructions worth attacking."""
    path = find_trace(trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "device:" in pname.lower():
                device_pids.add(e["pid"])

    per_op = collections.Counter()
    per_class = collections.Counter()
    per_instance: dict = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):  # parent program span — duplicates children
            continue
        dur = e.get("dur", 0) / 1e3  # us → ms
        base = re.sub(r"[.\-]\d+$", "", name)  # aggregate .NN instances
        per_op[base] += dur
        args = e.get("args", {}) or {}
        cat = args.get("hlo_category") or classify(name)
        per_class[cat] += dur
        inst = per_instance.setdefault(name, [0.0, 0, 0, cat])
        inst[0] += dur
        inst[1] += 1
        try:
            inst[2] = max(inst[2], int(args.get("bytes_accessed", 0)))
        except (TypeError, ValueError):
            pass
    return per_class, per_op, per_instance, path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--diff", default=None,
                    help="second trace dir: print per-category deltas "
                         "(after - before) instead of a single report")
    ap.add_argument("--instances", default=None, metavar="CATEGORY",
                    help="list the top individual HLO instructions of one "
                         "hlo_category (e.g. 'data formatting', 'loop "
                         "fusion', or 'all') with bytes_accessed and "
                         "achieved GB/s")
    args = ap.parse_args()
    n = max(args.steps, 1)

    per_class, per_op, per_instance, path = load(args.trace_dir)
    total = sum(per_class.values())

    if args.instances:
        want = args.instances.lower()
        rows = [
            (ms, cnt, nbytes, cat, name)
            for name, (ms, cnt, nbytes, cat) in per_instance.items()
            if want == "all" or cat.lower() == want
        ]
        rows.sort(reverse=True)
        print(f"trace: {path}")
        print(f"top {args.top} instances of category {args.instances!r} "
              f"(ms/step over {n} steps):")
        for ms, cnt, nbytes, cat, name in rows[: args.top]:
            gbs = (nbytes * cnt / n) / (ms / n * 1e6) if ms else 0.0
            print(f"{ms / n:9.3f} ms  x{cnt // n:<3d} {nbytes / 1e6:8.1f} MB "
                  f"{gbs:7.0f} GB/s  [{cat}]  {name[:80]}")
        return

    if args.diff:
        cls2, _, _, path2 = load(args.diff)
        tot2 = sum(cls2.values())
        print(f"before: {path}\nafter:  {path2}")
        print(f"{'category':30s} {'before':>9s} {'after':>9s} {'delta':>9s}")
        for cls in sorted(set(per_class) | set(cls2),
                          key=lambda c: -per_class.get(c, 0)):
            b, a = per_class.get(cls, 0) / n, cls2.get(cls, 0) / n
            print(f"{cls:30s} {b:8.2f} {a:9.2f} {a - b:+9.2f}  ms/step")
        print(f"{'TOTAL':30s} {total/n:8.2f} {tot2/n:9.2f} "
              f"{(tot2-total)/n:+9.2f}  ms/step")
        return

    print(f"trace: {path}")
    print(f"total device time: {total:.2f} ms "
          f"({total / n:.2f} ms/step over {n} steps)\n")
    print("== by class ==")
    for cls, ms in per_class.most_common():
        print(f"{cls:28s} {ms / n:9.3f} ms  {100 * ms / total:5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for op, ms in per_op.most_common(args.top):
        print(f"{ms / n:9.3f} ms  {op[:100]}")


if __name__ == "__main__":
    main()
