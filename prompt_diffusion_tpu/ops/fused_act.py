"""Fused activation→int8 Pallas kernels (serving mode).

After the AdaLN→int8 epilogues (ops/fused_adaln.py), the int8 JointBlock
still has standalone dynamic-quant sites: the post-GELU input of `ff_out`
— the block's WIDEST activation, (B, N, 4·1536) ≈ 100 MB bf16 at the SD3
joint shape — and the attention outputs feeding `to_out`/`to_add_out`.
XLA lowers QuantDense's dynamic per-tensor quant into an amax reduction
pass + a round/clip pass over the HBM-resident tensor; these kernels do
activation + row-max + quantize in ONE VMEM-resident pass (1 read + 1
int8 write), with per-ROW scales (finer than the per-tensor scalar they
replace — same trade as fused_layer_norm_quant).

  fused_gelu_quant(x)  → (int8, (..., 1) fp32 row scales): tanh-GELU, then quant
  fused_quant_rows(x)  → (int8, row scales): plain per-row quantization

Both return pairs consumed directly by tuple-aware QuantDense
(ops/quant.py). Inference-only (the int8 path is a serving mode).
Reference provenance: the sites map to diffusers JointTransformerBlock's
ff / attention out projections (promptdiffusioncontrolnet_sd3.py:135-147).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prompt_diffusion_tpu.ops.fused_layer_norm import row_block8, rowquant

# Test hook: when True, the Pallas path runs in interpret mode even on CPU.
_FORCE_INTERPRET = False




def _gelu_quant_kernel(x_ref, oq_ref, os_ref):
    h = jax.nn.gelu(x_ref[...].astype(jnp.float32), approximate=True)
    oq, s_a = rowquant(h)
    oq_ref[...] = oq
    os_ref[...] = s_a


def _quant_rows_kernel(x_ref, oq_ref, os_ref):
    oq, s_a = rowquant(x_ref[...].astype(jnp.float32))
    oq_ref[...] = oq
    os_ref[...] = s_a


def _jnp_fallback(x, act):
    h = x.astype(jnp.float32)
    if act == "gelu":
        h = jax.nn.gelu(h, approximate=True)
    elif act == "geglu":
        inner = h.shape[-1] // 2
        h = h[..., :inner] * jax.nn.gelu(h[..., inner:], approximate=False)
    return rowquant(h)


def _run(x, kernel, act, out_width=None):
    """Shared scaffolding: flatten to (N, C), pad N to a multiple of 8
    ((rb, 1) scale tiles need rb % 8 == 0 — see row_block8), block rows,
    run `kernel`, slice the pad off. `out_width` narrows the int8 output's
    last dim (GEGLU halves it); None keeps the input width."""
    orig_shape = x.shape
    c = orig_shape[-1]
    ow = c if out_width is None else out_width
    n = 1
    for d in orig_shape[:-1]:
        n *= d
    if jax.default_backend() == "cpu" and not _FORCE_INTERPRET:
        return _jnp_fallback(x, act)
    x2 = x.reshape(n, c)
    n_pad = (-n) % 8
    if n_pad:
        x2 = jnp.pad(x2, ((0, n_pad), (0, 0)))
    np8 = n + n_pad
    rb = row_block8(np8, c, x.dtype.itemsize)
    oq, s_a = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((np8, ow), jnp.int8),
            jax.ShapeDtypeStruct((np8, 1), jnp.float32),
        ],
        grid=(np8 // rb,),
        in_specs=[pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((rb, ow), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_FORCE_INTERPRET,
    )(x2)
    if n_pad:
        oq, s_a = oq[:n], s_a[:n]
    return oq.reshape(orig_shape[:-1] + (ow,)), s_a.reshape(orig_shape[:-1] + (1,))


def fused_gelu_quant(x):
    """tanh-approx GELU → (int8, per-row fp32 scales) in one VMEM pass."""
    return _run(x, _gelu_quant_kernel, "gelu")


def fused_quant_rows(x):
    """Per-row int8 quantization → (int8, scales) in one VMEM pass."""
    return _run(x, _quant_rows_kernel, "none")


# ---------------------------------------------------------------------------
# GEGLU (SD1.5 transformer FF: h · gelu_erf(gate) — attention.py:49-77 uses
# the EXACT erf GELU, unlike the MMDiT's tanh approximation)
# ---------------------------------------------------------------------------


def _erf_as(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7).

    Mosaic has no erf/erfc lowering (lax.erf's TPU-Pallas path raises
    NotImplementedError: erfc — hit on-chip 2026-08-18), so the kernel
    carries its own rational approximation built from exp/reciprocal. The
    1.5e-7 erf error bounds the GELU error ~1e-7·|x| — three orders below
    the int8 quantization step this kernel's output feeds."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _geglu_quant_kernel(x_ref, oq_ref, os_ref):
    x = x_ref[...].astype(jnp.float32)  # (rb, 2·I): [h | gate]
    inner = x.shape[-1] // 2
    gate = x[:, inner:]
    g = 0.5 * gate * (1.0 + _erf_as(gate * (2.0 ** -0.5)))  # exact-erf GELU
    h = x[:, :inner] * g
    oq, s_a = rowquant(h)
    oq_ref[...] = oq
    os_ref[...] = s_a


def fused_geglu_quant(proj):
    """(…, 2·I) GEGLU projection → (int8 (…, I), per-row scales).

    h·gelu_erf(gate) + row-max + quantize in one VMEM pass (the unfused
    int8 path reads the (…, 4C) GEGLU output twice more for amax+quant).
    erf is computed in-kernel via A&S 7.1.26 (see _erf_as — Mosaic cannot
    lower lax.erf); gated by PD_SD15_FUSED_GEGLU at the call site in
    models/layers.py until chip-validated end-to-end."""
    return _run(proj, _geglu_quant_kernel, "geglu",
                out_width=proj.shape[-1] // 2)
