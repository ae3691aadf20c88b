"""Analyze an existing perfetto trace from tools/trace_step.py (dev tool)."""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict


def main():
    files = sorted(glob.glob("/tmp/pd_trace/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n}

    leaf = defaultdict(float)
    args_by_op = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith(("jit_", "while", "body", "cond")):
            continue
        leaf[name] += e.get("dur", 0) / 1e3
        if name not in args_by_op and e.get("args"):
            args_by_op[name] = e["args"]

    total = sum(leaf.values())
    print(f"leaf total: {total:.1f} ms over 5 steps → {total/5:.2f} ms/step")
    groups = defaultdict(float)
    for k, v in leaf.items():
        groups[k.split(".")[0]] += v
    print("\nby op family (ms/step):")
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {k:28s} {v/5:8.2f}")

    # hlo_category × achieved TF/s
    cat_t = defaultdict(float)
    cat_f = defaultdict(float)
    cat_b = defaultdict(float)
    src_t = defaultdict(float)
    for k, v in leaf.items():
        a = args_by_op.get(k, {})
        c = a.get("hlo_category", "?")
        cat_t[c] += v
        # model_flops / raw_bytes are per-execution; each name executes once
        # per traced step
        cat_f[c] += float(a.get("model_flops", 0) or 0)
        cat_b[c] += float(a.get("raw_bytes_accessed", 0) or 0)
        stack = a.get("source_stack", "")
        model_line = next((ln for ln in stack.split("\n")
                           if "/models/" in ln or "/ops/" in ln), a.get("source", "?"))
        src_t[model_line.strip()] += v
    print("\nby hlo_category (ms/step, TF/s achieved, GB/s achieved):")
    n_occ = 5  # steps traced
    for c, v in sorted(cat_t.items(), key=lambda kv: -kv[1])[:15]:
        step_ms = v / n_occ
        tf = cat_f[c] / (step_ms / 1e3) / 1e12 if step_ms else 0
        gbs = cat_b[c] / (step_ms / 1e3) / 1e9
        print(f"  {c:32s} {step_ms:8.2f}  {tf:7.1f} TF/s  {gbs:7.0f} GB/s")
    print("\nby model source line (ms/step):")
    for s, v in sorted(src_t.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v/n_occ:7.2f}  {s}")
    print("\ntop 45 leaf ops (ms/step) + provenance:")
    for k, v in sorted(leaf.items(), key=lambda kv: -kv[1])[:45]:
        a = args_by_op.get(k, {})
        src = a.get("long_name") or a.get("tf_op") or a.get("hlo_op") or ""
        if isinstance(src, str) and len(src) > 140:
            src = src[:140]
        print(f"  {v/5:7.3f}  {k:18s} {src}")
    # dump all arg keys of one fusion to see what metadata exists
    for k in sorted(leaf, key=lambda kk: -leaf[kk]):
        if k.startswith("fusion"):
            print("\nsample fusion args:", k, json.dumps(args_by_op.get(k, {}))[:2000])
            break


if __name__ == "__main__":
    main()
