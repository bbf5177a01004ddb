"""ctypes binding + on-demand build of the C++ image engine.

The shared library is compiled once per machine (g++ -O3 against
libjpeg/libpng) into the package directory; datasets fall back to PIL when
the toolchain or libraries are missing, so the Python path always works.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from mafed_tpu.core.logging import LOGGER

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "image_engine.cpp")
_LIB = os.path.join(_THIS_DIR, "libmafed_data.so")
_lock = threading.Lock()
_engine: Optional["NativeImageEngine"] = None
_engine_failed = False


def _build_library() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB, "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception as exc:
        LOGGER.warning("native image engine build failed: %s", exc)
        return False


class NativeImageEngine:
    def __init__(self, lib_path: str = _LIB) -> None:
        self._lib = ctypes.CDLL(lib_path)
        self._lib.mafed_engine_version.restype = ctypes.c_int
        self._lib.mafed_decode_file.restype = ctypes.c_int
        self._lib.mafed_decode_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        assert self._lib.mafed_engine_version() == 1

    def decode(self, path: str, target: int, crop_pct: float = 0.9) -> np.ndarray:
        scale_size = int(math.floor(target / crop_pct))
        out = np.empty((target, target, 3), np.uint8)
        rc = self._lib.mafed_decode_file(
            path.encode(), target, scale_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise IOError(f"native decode failed ({rc}) for {path}")
        return out


def get_engine() -> Optional[NativeImageEngine]:
    """Build+load the engine once; None if unavailable."""
    global _engine, _engine_failed
    if _engine is not None or _engine_failed:
        return _engine
    with _lock:
        if _engine is not None or _engine_failed:
            return _engine
        if not os.path.exists(_LIB) and not _build_library():
            _engine_failed = True
            return None
        try:
            _engine = NativeImageEngine()
            LOGGER.info("native image engine loaded (%s)", _LIB)
        except Exception as exc:
            LOGGER.warning("native image engine unavailable: %s", exc)
            _engine_failed = True
    return _engine


def native_available() -> bool:
    return get_engine() is not None
