"""ctypes binding for the native mesh toolkit (builds on first use;
falls back to the numpy implementations in uhc_tpu.smpl.mesh)."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libmeshtools.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.stl_read.restype = ctypes.c_int
    lib.mass_properties.restype = None
    lib.farthest_point_sample.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_stl(path: str):
    """Binary STL -> (n,3,3) float64 triangles, or None to use the fallback."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    arr = np.frombuffer(buf, np.uint8)
    n = lib.stl_tri_count(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                          ctypes.c_long(len(buf)))
    if n < 0:
        return None  # ASCII STL: numpy fallback
    out = np.empty((n, 9), np.float32)
    lib.stl_read(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                 ctypes.c_long(len(buf)),
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out.reshape(n, 3, 3).astype(np.float64)


def mass_properties(tris: np.ndarray, density: float = 1000.0):
    lib = _load()
    if lib is None:
        return None
    t = np.ascontiguousarray(tris.reshape(-1, 9), np.float32)
    out = np.zeros(10, np.float64)
    lib.mass_properties(t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        ctypes.c_int(len(t)), ctypes.c_double(density),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    mass = out[0]
    com = out[1:4].copy()
    I = np.array([[out[4], out[7], out[8]],
                  [out[7], out[5], out[9]],
                  [out[8], out[9], out[6]]])
    return mass, com, I


def farthest_point_sample(pts: np.ndarray, k: int):
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, np.float32)
    idx = np.zeros(k, np.int32)
    lib.farthest_point_sample(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(len(p)), ctypes.c_int(k),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return idx
