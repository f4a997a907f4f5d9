"""Native (C++) data-loader core.

Builds `frame_loader.cpp` into a shared library on first use (g++ +
libjpeg, both part of the toolchain) and exposes it via ctypes. Falls back
cleanly when the toolchain or libjpeg is unavailable — callers check
`available()` and use the Python decode path otherwise.
"""

from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "src", "frame_loader.cpp")
_LIB_PATH = osp.join(_HERE, "libfaceoff_frame_loader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH, "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        detail = getattr(e, "stderr", b"")
        print(
            "faceoff_tpu.native: build failed, using Python loader "
            f"({detail[:200] if detail else e})"
        )
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not osp.exists(_LIB_PATH) or (
            osp.getmtime(_LIB_PATH) < osp.getmtime(_SRC)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            print(f"faceoff_tpu.native: load failed ({e})")
            _build_failed = True
            return None
        lib.fo_load_frames.restype = ctypes.c_int
        lib.fo_load_frames.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


def load_frames(
    paths: List[str], resolution: int = 256, n_threads: int = 0
) -> np.ndarray:
    """Decode + pad-to-square + resize a list of JPEGs into one contiguous
    (N, res, res, 3) uint8 RGB array. Raises on decode failure."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native frame loader unavailable")
    n = len(paths)
    out = np.empty((n, resolution, resolution, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.fo_load_frames(
        arr, n, resolution,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n_threads,
    )
    if rc != 0:
        raise IOError(f"failed to decode frame: {paths[rc - 1]}")
    return out
