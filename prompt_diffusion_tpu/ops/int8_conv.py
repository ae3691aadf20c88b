"""Pallas int8 3x3 convolution — the conv half of the W8A8 serving mode.

Why a hand-written kernel: this chip's MXU runs int8 dots at 235 TOP/s
(1.68x bf16), but XLA's int8 *convolution* lowering measures at 118 TF/s —
SLOWER than the bf16 conv (142 TF/s). Measured on the bench's actual hot
shape (tools/int8_probe.py, chained-dependency protocol):

    conv3x3 320ch bf16          141.9 TF/s
    conv3x3 320ch int8 (XLA)    118.6           <- no int8 fast path
    conv3x3 as 9 int8 dots       90.7           <- XLA: 9x slice+add traffic
    conv3x3 im2col int8 dot      63.8           <- XLA: 9x im2col traffic
    dense 320->2560 int8        234.7 TOP/s     <- the MXU CAN do it

The conv FLOPs are ~56% of the SD1.5 512^2 step (docs/ROADMAP.md), so int8
convs at the dense rate are the single biggest lever past the exact-bf16
speed of light.

Decomposition: a SAME 3x3 conv is 3 row-shifted (rows*W, 3Cin) @
(3Cin, Cout) matmuls over an x-direction im2col of factor 3:

    x3[b,i,j] = concat(xp[b,i,j], xp[b,i,j+1], xp[b,i,j+2])    (XLA, int8)
    y[b,i]    = sum_dy x3p[b,i+dy] @ w[dy].reshape(3Cin, Cout) (kernel)

XLA prepares x3 (cheap int8 copies) and stacks it into overlapping
row-blocks with a 2-row halo — Pallas block specs cannot express
overlapping windows, so the halo is materialized: (B, nb, hb+2, W, 3Cin),
a ~(hb+2)/hb int8 duplication. The kernel runs the 3 taps as aligned
int8 MXU dots accumulating in int32 in VMEM, with the dequantize
(s_a * s_w[oc]) + bias epilogue fused on the way out — the int32
accumulator never touches HBM (that round-trip is what sinks the XLA
9-dot variant above).

Grid is (Cout blocks, B, row blocks) — Cout outermost so the activation
block index changes fastest (weights stay VMEM-resident across the whole
batch sweep; Cout blocks are multiples of 128 to satisfy the TPU lane
tiling, or the full Cout when it already fits).

Inference-only (the int8 mode has no training path). Reference
counterpart: none — the reference serves fp16 CUDA convs via torch;
this is the TPU-native production-serving lever.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Variant dispatch, read ONCE at import (participates in tracing — see the
# PD_SD15_INT8_ATTN note in models/layers.py):
#   im2col (default): XLA materializes the x3 im2col in HBM (3x int8
#     activation traffic) — the round-3 measured kernel.
#   xshift (PD_INT8_CONV_XSHIFT=1): the kernel reads the RAW halo'd int8
#     rows and runs the 3x3 as 9 per-tap dots with in-VMEM int32
#     slice-accumulate, killing the 3x HBM round-trip. MEASURED SLOWER
#     at every site (tools/int8_probe.py, 2026-08-19: 119.7 vs 132.5
#     TF/s at 64^2/320, 164 vs 239 at 32^2/640, 167 vs 271 at 16^2/1280)
#     — the 9 narrower MXU dots and the per-tap offset relayouts cost
#     more than the im2col traffic they save; kept as a bit-exact,
#     parity-tested negative result, not a serving path.
_DEFAULT_VARIANT = "xshift" if os.environ.get("PD_INT8_CONV_XSHIFT") else "im2col"

# Per-step VMEM working-set budget (activation block + weight block +
# int32 acc + out block + double-buffering headroom on a ~16 MB core).
_VMEM_BUDGET = 10 * 1024 * 1024
# Target activation row-block size.
_X_BLOCK_TARGET = 2 * 1024 * 1024


def _epilogue(acc, sw_ref, sa_ref, b_ref, o_ref, h, w):
    out = acc.astype(jnp.float32) * (sa_ref[0, 0, 0] * sw_ref[:])  # (hw,cb)*(1,cb)
    out = out + b_ref[:]
    o_ref[0] = out.reshape(h, w, -1).astype(o_ref.dtype)


def _row_shifted_dots(x3, w_ref, h, w):
    """3 row-shifted int8 MXU dots over an (hp, w, 3Cin) x3 slab,
    accumulated in int32 in VMEM."""
    c3 = x3.shape[-1]
    acc = None
    for dy in range(3):
        xs = x3[dy : dy + h].reshape(h * w, c3)
        d = jax.lax.dot_general(
            xs, w_ref[dy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = d if acc is None else acc + d
    return acc


def _conv_kernel(x_ref, w_ref, sw_ref, sa_ref, b_ref, o_ref):
    """One (Cout block, batch row, row block): 3 row-shifted int8 dots,
    int32 accum in VMEM, fused dequant+bias epilogue."""
    hp, w, _ = x_ref.shape[2:]
    h = hp - 2
    acc = _row_shifted_dots(x_ref[0, 0], w_ref, h, w)
    _epilogue(acc, sw_ref, sa_ref, b_ref, o_ref, h, w)


def _conv_kernel_xshift(x_ref, w_ref, sw_ref, sa_ref, b_ref, o_ref):
    """Like _conv_kernel, but the input block is the RAW halo'd int8 rows
    ((hb+2, W+2, Cin) — x-padded, no im2col), cutting the activation HBM
    traffic ~3x. The 3x3 runs as 9 per-tap MXU dots over the full-width
    rows, accumulated in int32 with an x-slice per tap — building the x3
    concat in VMEM instead would need tpu.concatenate over slices with
    mismatched lane offsets, which Mosaic cannot lower (probed on-chip
    2026-08-19: 'result/input offset mismatch on non-concat dimension').
    The input block's width is padded to a multiple of 32 so the
    (h, wp, cin) → (h·wp, cin) row merge is int8-sublane-tile aligned
    (unpadded 66-wide rows fail 'unsupported shape cast')."""
    hp, wp, cin = x_ref.shape[2:]
    h, w = hp - 2, o_ref.shape[2]
    xs = x_ref[0, 0]
    acc = None
    for dy in range(3):
        rows = xs[dy : dy + h].reshape(h * wp, cin)  # contiguous full rows
        for dx in range(3):
            wt = w_ref[dy, dx * cin : (dx + 1) * cin, :]
            yf = jax.lax.dot_general(
                rows, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(h, wp, -1)[:, dx : dx + w, :]
            acc = yf if acc is None else acc + yf
    out = acc.astype(jnp.float32) * (sa_ref[0, 0, 0] * sw_ref[:][None])
    out = out + b_ref[:][None]
    o_ref[0] = out.astype(o_ref.dtype)


def _x_bytes(hb, w, cin, variant):
    if variant == "xshift":
        # raw halo'd int8 input block at the 32-aligned padded width
        return (hb + 2) * (w + 2 + (-(w + 2)) % 32) * cin
    return (hb + 2) * w * 3 * cin  # int8 im2col slab


def _pick_blocks(h, w, cin, cout, variant=None):
    """(row block, Cout block) fitting the VMEM budget, or None.

    Cout blocks must be multiples of 128 (TPU lane tiling) or the full
    Cout; row blocks must divide H. Starts from the largest row block
    whose x slab is within the target and walks both block sizes down
    until the working set fits the budget.
    """
    variant = variant or _DEFAULT_VARIANT
    hbs = [c for c in range(h, 0, -1) if h % c == 0]
    # prefer the largest hb within the x-slab target; fall back to
    # progressively smaller ones if the budget check fails below
    start = next((i for i, c in enumerate(hbs)
                  if _x_bytes(c, w, cin, variant) <= _X_BLOCK_TARGET),
                 len(hbs) - 1)
    cbs = [cout] + [c for c in range(cout - cout % 128, 127, -128)
                    if cout % c == 0]
    for hb in hbs[start:]:
        x_bytes = _x_bytes(hb, w, cin, variant)
        for cb in cbs:
            w_bytes = 3 * 3 * cin * cb       # int8
            acc_bytes = hb * w * cb * 4      # int32 (+ f32 epilogue live range)
            if variant == "xshift":
                # live per-tap int32 dot output at the padded row width
                acc_bytes += hb * (w + 2 + (-(w + 2)) % 32) * cb * 4
            out_bytes = hb * w * cb * 2
            if x_bytes + w_bytes + 2 * acc_bytes + out_bytes <= _VMEM_BUDGET:
                return hb, cb
    return None


def conv3x3_int8_supported(h, w, cin, cout, variant=None) -> bool:
    return w % 8 == 0 and _pick_blocks(h, w, cin, cout, variant) is not None


def conv3x3_int8(xq, s_a, wq, s_w, bias, out_dtype=jnp.bfloat16,
                 interpret: bool | None = None, variant: str | None = None):
    """SAME 3x3 stride-1 int8 convolution with fused dequant epilogue.

    xq   (B, H, W, Cin) int8    quantized activation
    s_a  (B,) f32               per-sample activation scale
    wq   (3, 3, Cin, Cout) int8 quantized weights
    s_w  (Cout,) f32            per-out-channel weight scale
    bias (Cout,) f32 or None
    ->   (B, H, W, Cout) out_dtype, = (int32 exact conv) * s_a*s_w + bias

    Bit-identical to the XLA int8 path in QuantConv (integer accumulation
    is exact; the fp32 epilogue applies the same factors in the same
    order).
    """
    b, h, w, cin = xq.shape
    cout = wq.shape[-1]
    variant = variant or _DEFAULT_VARIANT
    blocks = _pick_blocks(h, w, cin, cout, variant)
    assert blocks is not None, "caller must check conv3x3_int8_supported"
    hb, cb = blocks
    nb = h // hb
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    if variant == "xshift":
        # raw x-padded rows + halo'd row blocks; the 9 taps run in-kernel.
        # Width pads to a multiple of 32 (int8 sublane tile) so the kernel's
        # row merge is layout-legal; the extra zero columns are never
        # selected by the per-tap output slices.
        wp32 = w + 2 + (-(w + 2)) % 32
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, wp32 - w - 1), (0, 0)))
        if nb == 1:
            x3r = xp[:, None]
        else:
            x3r = jnp.stack(
                [xp[:, r * hb : r * hb + hb + 2] for r in range(nb)], axis=1)
        x_block = (1, 1, hb + 2, wp32, cin)
        kernel = _conv_kernel_xshift
    else:
        # x-direction im2col (factor 3) + row padding + halo'd row blocks,
        # all cheap int8 copies in XLA.
        xp = jnp.pad(xq, ((0, 0), (0, 0), (1, 1), (0, 0)))
        x3 = jnp.concatenate([xp[:, :, dx : dx + w] for dx in range(3)], axis=-1)
        x3p = jnp.pad(x3, ((0, 0), (1, 1), (0, 0), (0, 0)))
        if nb == 1:
            x3r = x3p[:, None]
        else:
            x3r = jnp.stack(
                [x3p[:, r * hb : r * hb + hb + 2] for r in range(nb)], axis=1)
        x_block = (1, 1, hb + 2, w, 3 * cin)
        kernel = _conv_kernel
    w3 = wq.reshape(3, 3 * cin, cout)  # dim1 = dx*Cin + ci, matches concat

    # (B, 1, 128): Mosaic block tiling needs the last two dims legal —
    # broadcast the per-sample scalar across one lane tile
    sa2 = jnp.broadcast_to(
        jnp.asarray(s_a, jnp.float32).reshape(b, 1, 1), (b, 1, 128))
    sw2 = jnp.asarray(s_w, jnp.float32).reshape(1, cout)
    b2 = (jnp.zeros((1, cout), jnp.float32) if bias is None
          else jnp.asarray(bias, jnp.float32).reshape(1, cout))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), out_dtype),
        grid=(cout // cb, b, nb),
        in_specs=[
            pl.BlockSpec(x_block,
                         lambda j, i, r: (i, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * cin, cb), lambda j, i, r: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda j, i, r: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda j, i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda j, i, r: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, w, cb), lambda j, i, r: (i, r, 0, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x3r, w3, sw2, sa2, b2)
