"""Shared perfetto-trace bucketing for the trace_* dev tools."""

from __future__ import annotations

import glob
import gzip
import json
import re
import sys
from collections import defaultdict

_CATS = ("fusion", "convolution", "dot", "copy", "transpose", "custom-call",
         "reduce", "convert", "scatter", "dynamic", "bitcast", "broadcast",
         "all-reduce", "select")


def bucket_trace(logdir: str, steps: int, top: int = 40) -> float:
    """Parse the newest perfetto trace under `logdir`, print per-category
    and per-op device time (normalized to ms/step over `steps`), return
    total device ms/step (0.0 when no trace was found)."""
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, file=sys.stderr)
    if not files:
        print("no perfetto trace found; raw contents:",
              glob.glob(f"{logdir}/**/*", recursive=True), file=sys.stderr)
        return 0.0

    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    print("processes:", pid_names, file=sys.stderr)

    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # ms
        total += dur
        per_op[name] += dur
        base = re.sub(r"[.\d]+$", "", name)
        cat = next((k for k in _CATS if k in base), "other")
        per_cat[cat] += dur
    print(f"total device op time: {total:.1f} ms over {steps} steps "
          f"→ {total/steps:.1f} ms/step")
    print(f"\nby category (ms/step over {steps} steps):")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:14s} {v/steps:9.2f}")
    print(f"\ntop {top} ops (ms over {steps} steps):")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v:8.2f} ms  {k[:110]}")
    return total / steps
