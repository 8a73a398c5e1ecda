"""ctypes bindings for the native host-runtime library (native/host_ops.cc).

Auto-builds the .so on first import if a toolchain is present; every entry
point has a pure-Python fallback so the framework works without it. Use
``native.available()`` to check which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libosmosis_host.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("OSMOSIS_TPU_NO_NATIVE"):
        return None
    # rebuild when missing OR stale (source newer than the .so) — the binary
    # is gitignored, so every checkout compiles its own from host_ops.cc
    src = os.path.join(_NATIVE_DIR, "host_ops.cc")
    stale = not os.path.exists(_SO_PATH) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
    )
    if stale:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-sB"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            if not os.path.exists(_SO_PATH):
                return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.preprocess_rgb_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p
    ]
    lib.percentile_minmax_norm.argtypes = [
        f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, f32p,
    ]
    lib.apply_colormap_lut.argtypes = [f32p, ctypes.c_int, f32p, f32p]
    lib.png_write_rgb8.argtypes = [
        ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int
    ]
    lib.png_write_rgb8.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def preprocess_rgb_u8(img: np.ndarray, size: int) -> Optional[np.ndarray]:
    """u8 [H,W,3] → f32 [size,size,3] in [-1,1]; None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty((size, size, 3), dtype=np.float32)
    lib.preprocess_rgb_u8(img, img.shape[0], img.shape[1], size, out)
    return out


def percentile_minmax_norm(
    arr: np.ndarray, p_low: float, p_high: float,
    vmin: float = 0.0, vmax: float = 1.0,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(arr, dtype=np.float32).ravel()
    out = np.empty_like(flat)
    lib.percentile_minmax_norm(flat, flat.size, p_low, p_high, vmin, vmax, out)
    return out.reshape(arr.shape)


_VIRIDIS_LUT: Optional[np.ndarray] = None


def _viridis_lut() -> np.ndarray:
    global _VIRIDIS_LUT
    if _VIRIDIS_LUT is None:
        import matplotlib

        cm = matplotlib.colormaps["viridis"]
        _VIRIDIS_LUT = np.ascontiguousarray(
            cm(np.arange(256) / 255.0)[:, :3].astype(np.float32)
        )
    return _VIRIDIS_LUT


def depth_to_color(depth01: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(depth01, dtype=np.float32).ravel()
    out = np.empty((flat.size, 3), dtype=np.float32)
    lib.apply_colormap_lut(flat, flat.size, _viridis_lut(), out)
    return out.reshape(depth01.shape + (3,))


def png_write_rgb8(path: str, rgb: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    assert rgb.ndim == 3 and rgb.shape[2] == 3
    rc = lib.png_write_rgb8(path.encode(), rgb, rgb.shape[0], rgb.shape[1])
    return rc == 0
