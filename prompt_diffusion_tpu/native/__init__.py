"""Native (C++) data-loader bindings.

Builds `loader.cpp` into `libpdloader.so` on first use (g++ + libjpeg/
libpng, both baked into the image) and exposes

    load_batch(paths, res, to_m11=False, n_threads=0) → (N, res, res, 3) f32

Falls back to PIL transparently when the toolchain or libraries are
missing, so the pure-Python path keeps working everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libpdloader.so")
_SRC = os.path.join(_HERE, "loader.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return ctypes.CDLL(_SO)
    cmd = ["g++", "-O3", "-funroll-loops", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-ljpeg", "-lpng", "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return ctypes.CDLL(_SO)
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.pd_decode_resize_batch.restype = ctypes.c_int
                lib.pd_decode_resize_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                    ctypes.c_int, ctypes.POINTER(ctypes.c_int),
                ]
            globals()["_lib"] = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_batch(
    paths: Sequence[str], res: int, to_m11: bool = False, n_threads: int = 8,
    dct_scale: bool = True,
) -> np.ndarray:
    """Decode+resize+normalize a batch of image files to (N,res,res,3) f32.

    n_threads defaults to 8 — cgroup-limited VMs report
    hardware_concurrency()==1 while having more usable cores.
    dct_scale decodes large JPEGs at a reduced n/8 DCT scale (measured
    ~1.6× faster than PIL for 1024²→512² on one core); disable for exact
    PIL-resampling parity.
    """
    lib = get_lib()
    if lib is None:
        return _load_batch_pil(paths, res, to_m11)
    n = len(paths)
    out = np.empty((n, res, res, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    flags = np.zeros(n, np.int32)
    rc = lib.pd_decode_resize_batch(
        arr, n, res, int(to_m11),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
        int(dct_scale), flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:
        # per-file PIL fallback: formats the native decoder doesn't speak
        # (e.g. WebP/BMP bytes behind a .jpg name — PIL sniffs content).
        # Genuinely corrupt files raise from PIL with the file name.
        bad = np.nonzero(flags)[0]
        out[bad] = _load_batch_pil([paths[i] for i in bad], res, to_m11)
    return out


def _load_batch_pil(paths, res, to_m11):
    from PIL import Image

    out = np.empty((len(paths), res, res, 3), np.float32)
    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB").resize((res, res), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        out[i] = arr * 2 - 1 if to_m11 else arr
    return out
