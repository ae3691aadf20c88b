"""Resolve the round-4 attn_sweep anomaly (dev tool).

docs/evidence/q4/attn_sweep.log timed `flash_attention_packed` (the
custom_vjp-wrapped public entry) at 32.81 ms/site while `_packed_forward`
with the SAME default block_q_target=256 swept at 4.53 ms — a 7× gap with
no code difference except the custom_vjp wrapper. The int8 entry (no vjp
wrapper on its public path) timed normally (4.05), and the SD3 e2e number
(0.1205 bf16) is arithmetically incompatible with a 32 ms attention site,
so the model path is fine — but the probe discrepancy must be explained
before trusting sweeps. This re-times the two call paths back-to-back in
ONE process, plus the int8 block_q 128-vs-256 decision the sweep flagged
(3.85 vs 4.15 ms/site).

    python tools/attn_recheck.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.ops.flash_attention import (
    _packed_forward,
    flash_attention_packed,
    flash_attention_packed_int8,
)
from tools.attn_sd3_probe import timed, B, N, H, D


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    scale = D ** -0.5
    qp = jnp.asarray(rng.normal(size=(B, N, H * D)) * 0.5, jnp.bfloat16)

    timed("public packed bf16 (custom_vjp)",
          lambda x: flash_attention_packed(x, x, x, H, scale), qp, args.iters)
    timed("_packed_forward bf16 (default 256)",
          lambda x: _packed_forward(x, x, x, H, scale), qp, args.iters)
    # discriminators for the 7× q=k=v anomaly (tools/attn_vjp_hlo.py shows
    # the lowered HLO identical modulo an 84-byte metadata delta): distinct
    # q/k/v tensors — the shape every real model call has
    timed("custom_vjp distinct q/k/v",
          lambda x: flash_attention_packed(x, x * 1.01, x * 0.99, H, scale),
          qp, args.iters)
    timed("_packed_forward distinct q/k/v",
          lambda x: _packed_forward(x, x * 1.01, x * 0.99, H, scale),
          qp, args.iters)
    timed("public packed int8 (default)",
          lambda x: flash_attention_packed_int8(x, x, x, H, scale),
          qp, args.iters)
    timed("packed int8 block_q_target=128",
          lambda x: flash_attention_packed_int8(x, x, x, H, scale,
                                                block_q_target=128),
          qp, args.iters)


if __name__ == "__main__":
    main()
