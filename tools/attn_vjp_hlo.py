"""Explain the custom_vjp packed-attention probe anomaly (dev tool).

attn_recheck measured the public `flash_attention_packed` (custom_vjp
wrapper) at 31.8 ms/site inside a jitted scan vs 4.7 ms for the direct
`_packed_forward` — same primal code, 3× the compile time. The SD3 e2e
numbers prove the model path does NOT pay this, so the difference must be
visible in what actually lowers. This tool lowers both scan bodies and
diffs the StableHLO (op histogram + presence/absence of the Pallas
custom_call), no chip time needed; optionally (--compile) compiles both
and compares the optimized HLO op counts.

    python tools/attn_vjp_hlo.py [--compile]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.ops.flash_attention import (
    _packed_forward,
    flash_attention_packed,
)
from tools.attn_sd3_probe import B, N, H, D


def histo(text: str) -> collections.Counter:
    ops = re.findall(r"= \"?([a-zA-Z_.]+)\"?\(", text) or re.findall(
        r"%?\w+ = ([a-z-]+)\(", text)
    return collections.Counter(ops)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--compile", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    scale = D ** -0.5
    x0 = jnp.asarray(rng.normal(size=(B, N, H * D)) * 0.5, jnp.bfloat16)

    def loop(fn):
        def run(x):
            def body(c, _):
                o = fn(c)
                return (c + 1e-6 * o).astype(c.dtype), None
            return jax.lax.scan(body, x, jnp.arange(args.iters))[0]
        return jax.jit(run)

    variants = {
        "custom_vjp": loop(lambda x: flash_attention_packed(x, x, x, H, scale)),
        "direct": loop(lambda x: _packed_forward(x, x, x, H, scale)),
    }
    lowered = {}
    for name, fn in variants.items():
        low = fn.lower(x0)
        text = low.as_text()
        lowered[name] = (low, text)
        h = histo(text)
        interesting = {k: v for k, v in h.items() if any(
            s in k for s in ("custom_call", "dot", "exp", "reduce", "while",
                             "tpu_custom_call", "scan", "transpose"))}
        print(f"\n[{name}] stablehlo: {len(text.splitlines())} lines; "
              f"key ops: {dict(sorted(interesting.items()))}", flush=True)

    if args.compile:
        for name, (low, _) in lowered.items():
            comp = low.compile()
            txt = comp.as_text()
            h = histo(txt)
            interesting = {k: v for k, v in h.items() if any(
                s in k for s in ("custom-call", "fusion", "dot", "while",
                                 "convert", "copy", "transpose"))}
            cost = comp.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            print(f"\n[{name}] optimized HLO: {len(txt.splitlines())} lines; "
                  f"flops={float(cost.get('flops', 0)):.3e} "
                  f"key ops: {dict(sorted(interesting.items()))}", flush=True)


if __name__ == "__main__":
    main()
