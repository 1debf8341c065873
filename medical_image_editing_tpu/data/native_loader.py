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
    try:
        lib.medimg_load_npy_batch_ep.restype = ctypes.c_int
        lib.medimg_load_npy_batch_ep.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_int,
        ]
    except AttributeError:  # stale .so from before the epilogue API
        lib.medimg_load_npy_batch_ep = None
    _lib = lib
    return _lib


#: epilogue kinds understood by the native library (medimg_io.cpp)
EP_NONE, EP_WINDOW, EP_INTENSITY = 0, 1, 2


def is_available() -> bool:
    return _load_lib() is not None


def load_npy_batch(
    paths: Sequence[str],
    rows: int,
    cols: int,
    window: Optional[tuple] = None,
    epilogue: Optional[tuple] = None,
    n_threads: int = 0,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Load len(paths) fixed-size 2-D npy slices → (B, rows, cols) float32.

    window: optional (width, center, scale) for fused HU windowing.
    epilogue: optional (kind, p0, p1, p2) — generic per-slice elementwise
    post-processing fused into the worker threads (EP_WINDOW/EP_INTENSITY).
    Mutually exclusive with `window` (which is EP_WINDOW shorthand).
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native medimg_io library unavailable")
    if window is not None:
        assert epilogue is None, "pass either window or epilogue"
        w, c, s = window
        epilogue = (EP_WINDOW, float(w), float(c), float(s))
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
    if epilogue is None:
        rc = lib.medimg_load_npy_batch(blob, off_ptr, n, out_ptr, rows, cols, n_threads)
    else:
        kind, p0, p1, p2 = (list(epilogue) + [0.0, 0.0, 0.0])[:4]
        ep_fn = getattr(lib, "medimg_load_npy_batch_ep", None)
        if ep_fn is None:  # stale .so: only the windowed entrypoint exists
            if int(kind) != EP_WINDOW:
                raise RuntimeError("native library too old for epilogue kind "
                                   f"{kind}; rebuild native/libmedimg_io.so")
            rc = lib.medimg_load_npy_batch_windowed(
                blob, off_ptr, n, out_ptr, rows, cols,
                float(p0), float(p1), float(p2), n_threads,
            )
        else:
            rc = ep_fn(
                blob, off_ptr, n, out_ptr, rows, cols,
                int(kind), float(p0), float(p1), float(p2), n_threads,
            )
    if rc != 0:
        err, idx = -(-rc // 1000), (-rc) % 1000
        raise IOError(
            f"medimg_io error {-err} loading {paths[idx]!r} (code {rc})"
        )
    return out
