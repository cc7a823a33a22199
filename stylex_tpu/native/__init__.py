"""Native (C++) host-side pixel pipeline, loaded via ctypes.

Compiled on demand with g++ (cached next to the source); every entry point
has a pure-Python/PIL fallback so the package works without a toolchain.
Use :func:`available` to check, :func:`resize_crop_normalize` to call.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "resize_crop_normalize", "normalize_u8"]

_HERE = Path(__file__).parent
_SRC = _HERE / "pixel_ops.cpp"
_SO = _HERE / "_pixel_ops.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(_SO), str(_SRC)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.resize_crop_normalize_u8.restype = ctypes.c_int
        lib.resize_crop_normalize_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_int, f32p,
        ]
        lib.normalize_u8.restype = ctypes.c_int
        lib.normalize_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_int, f32p,
        ]
        return lib
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        with _lock:
            if _lib is None and not _tried:
                _lib = _build()
                _tried = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _f32p(arr: Optional[np.ndarray]):
    if arr is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_crop_normalize(
    src: np.ndarray,
    out_size: Tuple[int, int],
    crop_size: Tuple[int, int],
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    hflip: bool = False,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Fused antialiased resize + center crop + [0,1] normalise.

    Args:
      src: (H, W, C) uint8 image (C-contiguous).
      out_size: (out_h, out_w) resize target (PIL-BILINEAR-compatible).
      crop_size: (crop_h, crop_w) center crop taken from the resized image.
      out: optional (crop_h, crop_w, C) float32 destination (e.g. a batch
        row) — the point of the native path: no intermediate copies.
    """
    lib = _get_lib()
    src = np.ascontiguousarray(src, np.uint8)
    h, w, c = src.shape
    ch, cw = crop_size
    if out is None:
        out = np.empty((ch, cw, c), np.float32)
    if lib is None:
        raise RuntimeError("native pixel ops unavailable (g++ build failed)")
    mean_arr = None if mean is None else np.ascontiguousarray(mean, np.float32)
    std_arr = None if std is None else np.ascontiguousarray(std, np.float32)
    rc = lib.resize_crop_normalize_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out_size[0], out_size[1], ch, cw,
        _f32p(mean_arr), _f32p(std_arr), int(hflip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"resize_crop_normalize_u8 failed with code {rc}")
    return out


def normalize_u8(
    src: np.ndarray,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    hflip: bool = False,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    lib = _get_lib()
    src = np.ascontiguousarray(src, np.uint8)
    h, w, c = src.shape
    if out is None:
        out = np.empty((h, w, c), np.float32)
    if lib is None:
        raise RuntimeError("native pixel ops unavailable (g++ build failed)")
    mean_arr = None if mean is None else np.ascontiguousarray(mean, np.float32)
    std_arr = None if std is None else np.ascontiguousarray(std, np.float32)
    rc = lib.normalize_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        _f32p(mean_arr), _f32p(std_arr), int(hflip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"normalize_u8 failed with code {rc}")
    return out
