"""Shared helpers for device-trace capture + HLO-category bucketing (dev tool)."""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import jax


def capture(run, arg, logdir="/tmp/pd_trace"):
    """Compile `run(arg)`, then trace one execution with perturbed input."""
    jax.block_until_ready(run(arg))
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        jax.block_until_ready(run(arg + 1e-3))
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise RuntimeError(f"no perfetto trace under {logdir}")
    with gzip.open(files[0], "rt") as f:
        return json.load(f).get("traceEvents", [])


def bucket(events, trips=1, top=40):
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        # container ops (the jit program row and while loops) span their
        # children, which are traced individually — counting both would
        # double every child and overstate measured-vs-floor by ~3×
        if re.match(r"jit_\w+\(|while[.\d]*$", name):
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        total += dur
        per_op[name] += dur
        base = re.sub(r"[.\d]+$", "", name)
        cat = "other"
        for key in ("fusion", "convolution", "dot", "copy", "transpose",
                    "custom-call", "reduce", "convert", "scatter", "dynamic",
                    "bitcast", "broadcast", "all-reduce", "select"):
            if key in base:
                cat = key
                break
        per_cat[cat] += dur
    print(f"total device op time: {total:.1f} ms over {trips} trips → "
          f"{total / trips:.1f} ms/trip")
    print("\nby category (ms):")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:14s} {v:9.2f}")
    print(f"\ntop {top} ops:")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v:8.2f} ms  {k[:110]}")
    return per_cat, per_op
