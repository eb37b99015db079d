"""ctypes binding for the native (C++) image preprocessor.

Compiles ``native/preprocess.cc`` on first use with the system g++ (cached
next to the source); falls back to the PIL host path if no compiler is
available. See native/preprocess.cc for why this exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "..", "native", "preprocess.cc")
    src = os.path.abspath(src)
    so = os.path.join(os.path.dirname(src), "libpreprocess.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                 "-pthread", src, "-o", so],
                check=True, capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.preprocess_batch.restype = None
    return lib


def native_available() -> bool:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
    return _LIB is not None


def preprocess_images_native(
    raw: np.ndarray,  # (B, H, W, 3) uint8 RGB
    image_size: int,
    num_threads: int = 0,
) -> np.ndarray:
    """Resize(bicubic, antialiased) + 1/255 + normalize(0.5) + CHW.

    Returns (B, 3, image_size, image_size) float32. Raises RuntimeError if
    the native library is unavailable (callers fall back to the PIL path).
    """
    if not native_available():
        raise RuntimeError("native preprocessor unavailable (no g++?)")
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    b, h, w, c = raw.shape
    assert c == 3, "expected RGB"
    out = np.empty((b, 3, image_size, image_size), np.float32)
    if num_threads <= 0:
        num_threads = min(b, os.cpu_count() or 1)
    _LIB.preprocess_batch(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        image_size, num_threads,
    )
    return out
