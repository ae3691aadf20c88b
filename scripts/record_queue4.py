"""Collect round-4 chip-queue results (/tmp/chipq/q4) into one report.

Reads queue4.status for per-step exit codes, then pulls the payload out of
each step log: bench JSON lines (bench.py emit()), int8-quality verdict
JSON, serving markdown tables, and the tail of probe/trace logs. Output is
markdown-ready so the numbers can be pasted into docs/ROADMAP.md /
docs/SERVING.md / README.md verbatim.

Usage: python scripts/record_queue4.py [--dir /tmp/chipq/q4]
"""

import argparse
import json
import os
import re

BENCH_STEPS = [
    "sd15_int8", "sd15_bf16", "sd3_int8", "sd3_bf16",
    "sd3_t5_int8", "sd3_t5_bf16", "sd15_unipc", "annotate",
    "sd15_geglu", "int8vae",
]
QUALITY_STEPS = ["sd3_regate", "int8vae_q"]
SERVING_STEPS = ["serve_sd15", "serve_sd3"]
PROBE_STEPS = ["attn_sweep", "trace_train"]


def read_status(d):
    path = os.path.join(d, "queue4.status")
    out = {}
    if not os.path.isfile(path):
        return out
    for line in open(path):
        parts = line.split()
        if len(parts) == 2 and parts[0].endswith("_DONE"):
            out[parts[0][: -len("_DONE")]] = int(parts[1])
    return out


def json_lines(path):
    if not os.path.isfile(path):
        return []
    out = []
    for line in open(path, errors="replace"):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out.append(json.loads(line))
            except ValueError:
                pass
    return out


def tail(path, n=25):
    if not os.path.isfile(path):
        return "(missing)"
    lines = open(path, errors="replace").read().splitlines()
    return "\n".join(lines[-n:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/chipq/q4")
    ap.add_argument("--tail", type=int, default=25)
    args = ap.parse_args()
    status = read_status(args.dir)

    print("## Queue-4 step exit codes")
    for k, v in status.items():
        print(f"- {k}: {'ok' if v == 0 else f'EXIT {v}'}")

    print("\n## Bench numbers (bench.py emit lines)")
    print("| step | metric | value | unit | vs_baseline |")
    print("|---|---|---|---|---|")
    for s in BENCH_STEPS:
        for rec in json_lines(os.path.join(args.dir, f"{s}.log")):
            if "metric" in rec:
                print(
                    f"| {s} | {rec['metric']} | {rec.get('value')} "
                    f"| {rec.get('unit')} | {rec.get('vs_baseline')} |"
                )

    print("\n## Quality gates")
    for s in QUALITY_STEPS:
        for rec in json_lines(os.path.join(args.dir, f"{s}.log")):
            print(f"- {s}: {json.dumps(rec)}")

    for s in SERVING_STEPS:
        print(f"\n## Serving: {s}")
        log = os.path.join(args.dir, f"{s}.log")
        if os.path.isfile(log):
            table = [
                ln for ln in open(log, errors="replace")
                if re.match(r"^\|", ln.strip())
            ]
            print("".join(table) or tail(log, args.tail))
        else:
            print("(missing)")

    for s in PROBE_STEPS:
        print(f"\n## Probe tail: {s}")
        print(tail(os.path.join(args.dir, f"{s}.log"), args.tail))


if __name__ == "__main__":
    main()
