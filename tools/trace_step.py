"""Capture a device trace of the ε-step and bucket op time (dev tool).

Writes a jax.profiler trace of ~5 scan steps, then parses the perfetto
trace.json.gz for device-lane op durations, grouped by HLO category.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--logdir", default="/tmp/pd_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from tools.step_probe import build

    unet, cnet, uparams, cparams, (lat, t, ctx, pair, query) = build(
        args.batch, int8=args.int8)
    hint = cnet.apply(cparams, example_pair=pair, query=query, hint_only=True)

    # params travel as jit ARGUMENTS — closing over them bakes the weights
    # into the lowering as constants, which the remote-compile tunnel then
    # serializes (same fix as tools/trace_sd3.py)
    def run_fn(up, cp, x0):
        def step(x, i):
            tt = jnp.full((args.batch,), i, jnp.int32)
            control = cnet.apply(cp, x * 0.999, tt, context=ctx, guided_hint=hint)
            return unet.apply(up, x * 0.999, tt, ctx, control=control), None

        return jax.lax.scan(step, x0, jnp.arange(5))[0]

    run_jit = jax.jit(run_fn)
    run = lambda x0: run_jit(uparams, cparams, x0)
    jax.block_until_ready(run(lat))  # compile outside the trace
    os.system(f"rm -rf {args.logdir}")
    with jax.profiler.trace(args.logdir):
        jax.block_until_ready(run(lat + 1e-3))
    files = glob.glob(f"{args.logdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, file=sys.stderr)
    if not files:
        print("no perfetto trace found; raw contents:",
              glob.glob(f"{args.logdir}/**/*", recursive=True), file=sys.stderr)
        return

    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device lanes (TensorCore)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
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
        cat = "other"
        for key in ("fusion", "convolution", "dot", "copy", "transpose",
                    "custom-call", "reduce", "convert", "scatter", "dynamic",
                    "bitcast", "broadcast", "all-reduce", "select"):
            if key in base:
                cat = key
                break
        per_cat[cat] += dur
    print(f"total device op time: {total:.1f} ms over 5 steps → {total/5:.1f} ms/step")
    print("\nby category (ms over 5 steps):")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:14s} {v:9.2f}")
    print(f"\ntop {args.top} ops:")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {v:8.2f} ms  {k[:110]}")


if __name__ == "__main__":
    main()
