"""ctypes bindings for the native feature-pack reader (native/feature_pack.cpp).

Builds the shared library on first use (g++, ~1s) and falls back to the pure
numpy memmap path in FeatureStore when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "feature_pack.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libfeature_pack.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB):
            if not os.path.exists(_SRC) or not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        lib.pack_open.restype = ctypes.c_void_p
        lib.pack_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.pack_gather.restype = None
        lib.pack_gather.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.pack_close.restype = None
        lib.pack_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativePack:
    """Batched feature gathers over an mmap'd pack file."""

    def __init__(self, path: str, n_items: int, item_shape, dtype: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native feature_pack library unavailable")
        self.lib = lib
        self.item_shape = tuple(item_shape)
        self.item_elems = int(np.prod(item_shape))
        dtype_code = 1 if np.dtype(dtype) == np.float32 else 0
        self.handle = lib.pack_open(
            path.encode(), n_items, self.item_elems, dtype_code
        )
        if not self.handle:
            raise RuntimeError(f"failed to open pack {path}")

    def gather(self, indices: np.ndarray, n_threads: int = 4) -> np.ndarray:
        """indices (N,) int64 (negative => zeros) -> (N, *item_shape) float32."""
        indices = np.ascontiguousarray(indices, np.int64)
        out = np.empty((len(indices), *self.item_shape), np.float32)
        self.lib.pack_gather(
            self.handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(indices),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n_threads,
        )
        return out

    def close(self):
        if self.handle:
            self.lib.pack_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
