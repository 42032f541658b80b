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
_SRCS = [os.path.join(_DIR, "isosurface.cpp"),
         os.path.join(_DIR, "simplify.cpp"),
         os.path.join(_DIR, "assemble.cpp"),
         os.path.join(_DIR, "sample.cpp")]
_SO = os.path.join(_DIR, "libgeometry.so")
_lib = None


def build(force: bool = False) -> str:
    """Compile the native library if missing (g++ -O3 -shared)."""
    stale = force or not os.path.exists(_SO) or any(
        os.path.getmtime(_SO) < os.path.getmtime(src) for src in _SRCS
    )
    if stale:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, *_SRCS],
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
        lib.qem_simplify.restype = ctypes.c_int
        lib.qem_simplify.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.qem_free.argtypes = [ctypes.c_void_p]
        lib.assemble_fine.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.assemble_fine_vox.argtypes = lib.assemble_fine.argtypes
        lib.mt_sample_f32.restype = ctypes.c_int
        lib.mt_sample_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.mt_sample_i8.restype = ctypes.c_int
        lib.mt_sample_i8.argtypes = [
            ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double),
        ]
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


def sample_isosurface(volume: np.ndarray, iso: float, n: int,
                      seed: int = 0) -> np.ndarray:
    """Fused marching-tetrahedra + area-weighted surface sampling.

    Same surface geometry as `marching_isosurface` + `sample_surface`, in
    one native pass with no indexed mesh (see native/sample.cpp). int8
    volumes are marched directly in the quantised domain (iso ignored —
    quantize_wire_int8 puts the isovalue at q == 0).

    Args:
        volume: [nx, ny, nz] float32 logits or int8 quantised logits.
        iso: isovalue (float volumes only).
        n: number of samples.
    Returns:
        [n, 3] float32 points in grid-index coordinates.
    Raises:
        ValueError on an empty/degenerate surface — callers fall back
        like `ONet/remesh_defense.py:159-170`.
    """
    lib = _load()
    out = np.empty((n, 3), np.float32)
    area = ctypes.c_double()
    if volume.dtype == np.int8:
        vol = np.ascontiguousarray(volume)
        rc = lib.mt_sample_i8(
            vol.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            *vol.shape, n, ctypes.c_uint64(seed),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(area),
        )
    else:
        vol = np.ascontiguousarray(volume, np.float32)
        rc = lib.mt_sample_f32(
            vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            *vol.shape, ctypes.c_float(iso), n, ctypes.c_uint64(seed),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(area),
        )
    if rc != 0:
        raise ValueError("empty or degenerate isosurface")
    return out


def simplify_mesh(
    vertices: np.ndarray,
    triangles: np.ndarray,
    target_faces: int,
    aggressiveness: float = 5.0,
):
    """Quadric-error-metric simplification toward `target_faces`.

    Role of the reference's `libsimplify.simplify_mesh` (used by the mesh
    generator when `simplify_nfaces` is configured).

    Returns:
        (vertices [V', 3] float32, triangles [T', 3] int64)
    """
    lib = _load()
    verts = np.ascontiguousarray(vertices, np.float32)
    tris = np.ascontiguousarray(triangles, np.int64)
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.qem_simplify(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(tris),
        target_faces, ctypes.c_double(aggressiveness),
        ctypes.byref(vp), ctypes.byref(nv),
        ctypes.byref(tp), ctypes.byref(nt),
    )
    if rc != 0:
        raise RuntimeError("mesh simplification failed (alloc)")
    try:
        out_v = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        out_t = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy() \
            if nt.value else np.zeros((0, 3), np.int64)
    finally:
        lib.qem_free(vp)
        lib.qem_free(tp)
    return out_v, out_t


def assemble_fine_grid(
    coarse: np.ndarray, upsample: int,
    flat_idx: np.ndarray, values: np.ndarray,
) -> np.ndarray:
    """Dense fine grid = nearest-upsampled coarse + scattered refined values.

    Args:
        coarse: [R0+1, R0+1, R0+1] float32 coarse logits (one cloud).
        upsample: fine cells per coarse cell.
        flat_idx: [n] int64 raveled indices into the (R0*u+1)^3 fine grid.
        values: [n] float32 refined logits.
    Returns:
        [Rf+1, Rf+1, Rf+1] float32 fine grid.
    """
    lib = _load()
    coarse = np.ascontiguousarray(coarse, np.float32)
    r0 = coarse.shape[0] - 1
    rf = r0 * upsample + 1
    flat_idx = np.ascontiguousarray(flat_idx, np.int64)
    values = np.ascontiguousarray(values, np.float32)
    out = np.empty((rf, rf, rf), np.float32)
    lib.assemble_fine(
        coarse.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        r0, upsample,
        flat_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(values),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def assemble_fine_grid_vox(
    coarse: np.ndarray, upsample: int,
    vox_ids: np.ndarray, values: np.ndarray,
) -> np.ndarray:
    """Voxel-addressed fine-grid assembly (no host-side index tensors).

    Args:
        coarse: [R0+1, R0+1, R0+1] float32 coarse logits (one cloud).
        upsample: fine cells per coarse cell.
        vox_ids: [n] int64 flat ACTIVE coarse-voxel ids (x*R0^2 + y*R0 + z).
        values: [n, (u+1)^3] float32 refined logits in ox-oy-oz offset
            order (meshgrid indexing='ij').
    Returns:
        [Rf+1, Rf+1, Rf+1] float32 fine grid.
    """
    lib = _load()
    coarse = np.ascontiguousarray(coarse, np.float32)
    r0 = coarse.shape[0] - 1
    rf = r0 * upsample + 1
    vox_ids = np.ascontiguousarray(vox_ids, np.int64)
    values = np.ascontiguousarray(values, np.float32)
    assert values.shape == (len(vox_ids), (upsample + 1) ** 3)
    out = np.empty((rf, rf, rf), np.float32)
    lib.assemble_fine_vox(
        coarse.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        r0, upsample,
        vox_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(vox_ids),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
