"""Block-size sweep for the Pallas int8 conv (ops/int8_conv.py).

The shallow SD1.5 level (64², 320ch) measures 130 TF/s vs the 231-269 the
deeper levels reach — below the bf16 conv (141.6). Suspects: row-block
size (hb=16 at the default 2 MB x-target → 16 grid steps × 3 small dots),
the N=320 lane padding on the per-tap dots, and the ×3 im2col HBM traffic.
This sweep times the kernel at the hot shapes across (x-block target,
VMEM budget) settings using the chained-dependency protocol
(tools/int8_probe.py) so the winner can be baked into _pick_blocks.

Usage (real chip): python tools/conv_sweep.py [--n 30]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

import prompt_diffusion_tpu.ops.int8_conv as ic


def timed(fn, args, label, flops, n):
    jfn = jax.jit(fn)
    float(jnp.sum(jfn(*args)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(jfn(*args)))
    dt = time.perf_counter() - t0
    print(f"{label}: {dt / n * 1e3:.3f} ms/op  {flops / dt / 1e12:.1f} TOP/s",
          flush=True)
    return dt / n


def chained(x, w, sa, sw, n):
    def body(xc, _):
        o = ic.conv3x3_int8(xc, sa, w, sw, None, out_dtype=jnp.float32)
        return xc + (jnp.round(o).astype(jnp.int32) & 1).astype(jnp.int8), None
    return jnp.sum(jax.lax.scan(body, x, jnp.arange(n))[0].astype(jnp.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30)
    args = ap.parse_args()
    n = args.n

    shapes = [(4, 64, 64, 320, 320), (4, 64, 64, 960, 320),
              (4, 32, 32, 640, 640), (4, 16, 16, 1280, 1280)]
    targets = [1, 2, 4, 8]  # MB for _X_BLOCK_TARGET
    budgets = [10, 13]      # MB for _VMEM_BUDGET

    for (b, h, w, cin, cout) in shapes:
        rng = np.random.default_rng(0)
        xi = jnp.asarray(rng.integers(-20, 20, (b, h, w, cin)), jnp.int8)
        wi = jnp.asarray(rng.integers(-20, 20, (3, 3, cin, cout)), jnp.int8)
        sa = jnp.ones((b,), jnp.float32)
        sw = jnp.ones((cout,), jnp.float32)
        flops = 2 * b * h * h * cin * cout * 9 * n
        print(f"--- shape B{b} {h}x{w} {cin}->{cout}")
        for tmb in targets:
            for bmb in budgets:
                ic._X_BLOCK_TARGET = tmb * 1024 * 1024
                ic._VMEM_BUDGET = bmb * 1024 * 1024
                blocks = ic._pick_blocks(h, w, cin, cout)
                if blocks is None:
                    print(f"  target={tmb}MB budget={bmb}MB: no legal blocks")
                    continue
                hb, cb = blocks
                try:
                    timed(lambda x, ww: chained(x, ww, sa, sw, n), (xi, wi),
                          f"  target={tmb}MB budget={bmb}MB hb={hb} cb={cb}",
                          flops, n)
                except Exception as e:  # Mosaic compile errors at bad blocks
                    print(f"  target={tmb}MB budget={bmb}MB hb={hb} cb={cb}: "
                          f"FAIL {type(e).__name__}")


if __name__ == "__main__":
    main()
