"""Image utilities for condition extraction.

Host-side equivalents of `annotator/util.py` (HWC3 :9-20, resize_image
:23-41) plus batched on-device resize — the reference resizes with cv2
per-image on the host; here resizing is jittable and batched.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp


def hwc3(x: np.ndarray) -> np.ndarray:
    """Coerce HxW / HxWx1 / HxWx3 / HxWx4 uint8 to HxWx3 (annotator/util.py:9-20)."""
    assert x.dtype == np.uint8
    if x.ndim == 2:
        x = x[:, :, None]
    h, w, c = x.shape
    assert c in (1, 3, 4)
    if c == 3:
        return x
    if c == 1:
        return np.concatenate([x] * 3, axis=2)
    color = x[:, :, :3].astype(np.float32)
    alpha = x[:, :, 3:].astype(np.float32) / 255.0
    y = color * alpha + 255.0 * (1.0 - alpha)
    return y.clip(0, 255).astype(np.uint8)


def resize_image(x: np.ndarray, resolution: int) -> np.ndarray:
    """Resize so the short side is `resolution`, dims rounded to ×64
    (annotator/util.py:23-41 semantics)."""
    h, w = x.shape[:2]
    k = float(resolution) / min(h, w)
    H = int(np.round(h * k / 64.0)) * 64
    W = int(np.round(w * k / 64.0)) * 64
    arr = jnp.asarray(x, dtype=jnp.float32)
    out = jax.image.resize(arr, (H, W) + arr.shape[2:], method="lanczos3" if k > 1 else "linear")
    return np.asarray(jnp.clip(jnp.round(out), 0, 255)).astype(np.uint8)


def batched_resize(x: jnp.ndarray, height: int, width: int, method: str = "linear") -> jnp.ndarray:
    """(B,H,W,C) → (B,height,width,C), jittable."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, height, width, c), method=method)


def normalize_m11(x: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] → [-1,1] (notebook cell 4 query normalization)."""
    return x.astype(jnp.float32) / 127.5 - 1.0


def normalize_01(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32) / 255.0
