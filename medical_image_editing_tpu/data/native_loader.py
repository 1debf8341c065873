"""ctypes binding for the native host-IO library (native/medimg_io.cpp).

Loads a batch of per-slice `.npy` files into one float32 (B,H,W) buffer on a
C++ thread pool (GIL-free), optionally fusing the HU windowing of
`ops/windowing.normalize`. Auto-builds the .so with make on first use if the
toolchain is available; callers fall back to numpy when unavailable
(`is_available()`).
"""

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libmedimg_io.so")

_lib = None
_tried = False


def _load_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and os.path.exists(
        os.path.join(_NATIVE_DIR, "Makefile")
    ):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.medimg_load_npy_batch.restype = ctypes.c_int
    lib.medimg_load_npy_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_int,
    ]
    lib.medimg_load_npy_batch_windowed.restype = ctypes.c_int
    lib.medimg_load_npy_batch_windowed.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load_lib() is not None


def load_npy_batch(
    paths: Sequence[str],
    rows: int,
    cols: int,
    window: Optional[tuple] = None,
    n_threads: int = 0,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Load len(paths) fixed-size 2-D npy slices → (B, rows, cols) float32.

    window: optional (width, center, scale) for fused HU windowing.
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native medimg_io library unavailable")
    n = len(paths)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    offsets = np.zeros(n, np.int64)
    pos = 0
    for i, p in enumerate(paths):
        offsets[i] = pos
        pos += len(p.encode()) + 1
    if out is None:
        out = np.empty((n, rows, cols), np.float32)
    assert out.shape == (n, rows, cols) and out.dtype == np.float32

    off_ptr = offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long))
    out_ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    if window is None:
        rc = lib.medimg_load_npy_batch(blob, off_ptr, n, out_ptr, rows, cols, n_threads)
    else:
        w, c, s = window
        rc = lib.medimg_load_npy_batch_windowed(
            blob, off_ptr, n, out_ptr, rows, cols,
            float(w), float(c), float(s), n_threads,
        )
    if rc != 0:
        err, idx = -(-rc // 1000), (-rc) % 1000
        raise IOError(
            f"medimg_io error {-err} loading {paths[idx]!r} (code {rc})"
        )
    return out
