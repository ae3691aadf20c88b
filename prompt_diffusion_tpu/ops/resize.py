"""Separable bilinear resize as MXU matmuls.

XLA lowers `jax.image.resize`/gather-style bilinear interpolation on a
(B, H, W, C) activation into gather or pad/slice/elementwise chains that
walk the whole tensor through HBM several times — measured as the single
largest fusion in the UniFormer seg head (26 ms/trip for the 150-class
logit upsample at batch 16, docs/evidence/q5/trace_ann.log). A separable
bilinear kernel is exactly a left/right multiply by 2-banded
(out, in) interpolation matrices, which the MXU executes at matmul rates
instead.

Two sampling conventions, matching the two consumers:

  * ``align_corners=True`` — torch `F.interpolate(..., align_corners=True)`,
    used by the DPT/MLSD decoders (annotator/midas/midas/blocks.py:305).
  * ``align_corners=False`` — half-pixel centers with edge clamping and
    row renormalization, numerically matching `jax.image.resize(...,
    "bilinear")` (and torch/mmseg `align_corners=False`) — verified to
    ≤1e-6 in tests/test_resize_ops.py.

fp32 inputs force HIGHEST matmul precision (the JAX default silently runs
bf16 passes even for fp32, which would sink CPU parity tests); bf16 inputs
run native MXU bf16 with fp32 accumulation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def bilinear_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) fp32 interpolation matrix: row i holds the (≤2) source
    weights for output sample i."""
    if align_corners and n_out > 1:
        xs = np.linspace(0.0, n_in - 1.0, n_out)
    else:
        # half-pixel centers: the jax.image.resize / torch default
        xs = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    x0 = np.floor(xs)
    w = (xs - x0).astype(np.float64)
    j0 = np.clip(x0, 0, n_in - 1).astype(np.int64)
    j1 = np.clip(x0 + 1, 0, n_in - 1).astype(np.int64)
    m = np.zeros((n_out, n_in), np.float64)
    m[np.arange(n_out), j0] += 1.0 - w
    m[np.arange(n_out), j1] += w
    # edge clamping accumulates both taps onto the boundary sample, so every
    # row already sums to 1 (the same result as jax.image.resize's
    # out-of-range-zeroing + row renormalization)
    return m.astype(np.float32)


def resize_bilinear(x: jnp.ndarray, new_h: int, new_w: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of (B, H, W, C) via two interpolation matmuls.
    Output dtype == input dtype; accumulation is fp32."""
    b, h, w, c = x.shape
    if (h, w) == (new_h, new_w):
        return x
    wy = jnp.asarray(bilinear_matrix(h, new_h, align_corners), x.dtype)
    wx = jnp.asarray(bilinear_matrix(w, new_w, align_corners), x.dtype)
    if x.dtype == jnp.float32:
        # fp32 parity path: forbid the silent bf16-pass default
        kw = dict(preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    else:
        # bf16: the MXU accumulates fp32 internally regardless; forcing an
        # fp32 OUTPUT doubles the materialized intermediate (the 512²×150
        # logit upsample writes 2.5 GB fp32 instead of 1.26 GB bf16 — the
        # dominant fusion in the first uniformer trace)
        kw = {}
    out = jnp.einsum("oy,byxc->boxc", wy, x, **kw)
    out = jnp.einsum("ox,bgxc->bgoc", wx, out.astype(x.dtype), **kw)
    return out.astype(x.dtype)
