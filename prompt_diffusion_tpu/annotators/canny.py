"""Batched Canny edge detection as a jittable JAX op.

TPU-native replacement for `annotator/canny/__init__.py` (cv2.Canny):
the classic pipeline — 5×5 Gaussian, Sobel, non-maximum suppression over
quantized gradient directions, double threshold, hysteresis by iterated
3×3 dilation — expressed with batched convs + elementwise ops so a whole
batch of images runs on-device (BASELINE.json config 3: batched condition
extraction).

Matches cv2.Canny semantics (L1 gradient norm by default) closely enough
for conditioning use; exact pixel equality with cv2 is not guaranteed
(cv2's hysteresis is a flood fill; ours converges to the same fixpoint
given enough iterations).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


_GAUSS5 = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float32) / 256.0
_SOBEL_X = np.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = np.asarray([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)


def _depthwise(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """(B,H,W) ⊛ kernel with SAME padding."""
    k = jnp.asarray(kernel)[:, :, None, None]
    return jax.lax.conv_general_dilated(
        x[..., None], k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[..., 0]


@functools.partial(
    jax.jit, static_argnames=("low", "high", "hysteresis_iters", "l2_gradient", "blur")
)
def canny(
    images: jnp.ndarray,  # (B,H,W) or (B,H,W,3) float [0,255] or uint8
    low: float = 100.0,
    high: float = 200.0,
    hysteresis_iters: int = 16,
    l2_gradient: bool = False,
    blur: bool = False,  # cv2.Canny applies no smoothing; opt-in 5×5 Gaussian
) -> jnp.ndarray:
    """Returns (B,H,W) float32 edge maps in {0, 255}."""
    x = images.astype(jnp.float32)
    if x.ndim == 4:
        # cv2 grayscale conversion weights (BGR in cv2; inputs here are RGB)
        x = x @ jnp.asarray([0.299, 0.587, 0.114], jnp.float32)

    if blur:
        x = _depthwise(x, _GAUSS5)
    gx = _depthwise(x, _SOBEL_X)
    gy = _depthwise(x, _SOBEL_Y)
    mag = jnp.abs(gx) + jnp.abs(gy) if not l2_gradient else jnp.sqrt(gx**2 + gy**2)

    # non-max suppression: quantize direction to {0°,45°,90°,135°}
    angle = jnp.arctan2(gy, gx)  # [-π, π]
    deg = jnp.rad2deg(angle) % 180.0
    sector = (
        ((deg < 22.5) | (deg >= 157.5)) * 0
        + ((deg >= 22.5) & (deg < 67.5)) * 1
        + ((deg >= 67.5) & (deg < 112.5)) * 2
        + ((deg >= 112.5) & (deg < 157.5)) * 3
    )

    def shift(a, dy, dx):
        return jnp.roll(a, (dy, dx), axis=(1, 2))

    n0a, n0b = shift(mag, 0, 1), shift(mag, 0, -1)  # horizontal gradient
    n1a, n1b = shift(mag, 1, -1), shift(mag, -1, 1)  # 45°
    n2a, n2b = shift(mag, 1, 0), shift(mag, -1, 0)  # vertical
    n3a, n3b = shift(mag, 1, 1), shift(mag, -1, -1)  # 135°
    na = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3], [n0a, n1a, n2a, n3a])
    nb = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3], [n0b, n1b, n2b, n3b])
    # strict > on one side breaks plateau ties (1px edges, like cv2)
    is_max = (mag > na) & (mag >= nb)
    mag = jnp.where(is_max, mag, 0.0)

    strong = mag >= high
    weak = (mag >= low) & ~strong

    def body(_, edges):
        grown = _depthwise(edges.astype(jnp.float32), np.ones((3, 3), np.float32)) > 0
        return edges | (grown & weak)

    edges = jax.lax.fori_loop(0, hysteresis_iters, body, strong)
    return edges.astype(jnp.float32) * 255.0
