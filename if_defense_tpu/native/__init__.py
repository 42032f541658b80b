"""Native geometry kernels (C++ via ctypes).

Replaces the reference's Cython extensions (`ONet/im2mesh/utils/libmcubes`,
`libmise`, `libsimplify`): occupancy evaluation stays on TPU; the
host-side isosurface pass is `isosurface.cpp`, compiled on first use with
g++ (no pybind11 dependency).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "isosurface.cpp")
_SO = os.path.join(_DIR, "libisosurface.so")
_lib = None


def build(force: bool = False) -> str:
    """Compile the native library if missing (g++ -O3 -shared)."""
    if force or not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True,
        )
    return _SO


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.mt_extract.restype = ctypes.c_int
        lib.mt_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def marching_isosurface(volume: np.ndarray, iso: float):
    """Extract the isosurface of a dense value grid.

    Args:
        volume: [nx, ny, nz] float array; "inside" is value > iso.
        iso: isovalue.
    Returns:
        (vertices [V, 3] float32 in grid-index coordinates,
         triangles [T, 3] int64)
    """
    lib = _load()
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    nx, ny, nz = vol.shape
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.mt_extract(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(iso),
        ctypes.byref(vp), ctypes.byref(nv),
        ctypes.byref(tp), ctypes.byref(nt),
    )
    if rc != 0:
        raise RuntimeError("isosurface extraction failed (alloc)")
    try:
        verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy() \
            if nt.value else np.zeros((0, 3), np.int64)
    finally:
        lib.mt_free(vp)
        lib.mt_free(tp)
    return verts, tris
