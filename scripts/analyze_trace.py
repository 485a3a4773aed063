"""Summarize a jax.profiler trace: top device ops by accumulated duration.

Usage: python scripts/analyze_trace.py /tmp/trace_dir [--top 40] [--group]

Reads the trace-viewer event stream the profiler writes alongside the
xplane dump (``plugins/profile/<ts>/*.trace.json.gz``) and aggregates
device-lane op durations over the traced steps.
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true",
                    help="aggregate by op-name prefix (fusion/scatter/...)")
    args = ap.parse_args()

    traces = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not traces:
        sys.exit(f"no *.trace.json.gz under {args.trace_dir}")
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    pid_names = {}
    tid_names = defaultdict(dict)
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[e["pid"]][e.get("tid")] = \
                e.get("args", {}).get("name", "")

    # device lanes: TPU core op streams (exclude host python/runtime lanes)
    device = set()
    for pid, name in pid_names.items():
        if re.search(r"TPU|/device", name, re.I):
            device.add(pid)

    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device:
            continue
        tname = tid_names[e["pid"]].get(e.get("tid"), "")
        if "step" in tname.lower():  # XLA Modules/Steps summary lanes
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # us
        by_op[name] += dur
        total += dur

    if args.group:
        grouped = defaultdict(float)
        for name, dur in by_op.items():
            key = re.split(r"[.(]", name)[0]
            key = re.sub(r"_?\d+$", "", key)
            grouped[key] += dur
        by_op = grouped

    lanes = sorted({f"{pid_names[p]}/{t}" for p in device
                    for t in tid_names[p].values()})
    print(f"traced device op time: {total / 1e3:.1f} ms over all traced "
          f"steps; lanes: {lanes[:6]}")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / max(total, 1e-9):5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
