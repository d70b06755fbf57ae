"""ctypes bindings for the native meshkit runtime (with NumPy fallbacks).

Build:  make -C rdcfes_tpu/native   (or `python -m rdcfes_tpu.native.build`)

The library accelerates the host-side critical path (Gmsh parsing, sparsity
construction, partitioning) for production-scale meshes; every function here
transparently falls back to the pure-NumPy implementation when the shared
library is absent, so the package has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libmeshkit.so")
_lib: Optional[ctypes.CDLL] = None


class _GmshMesh(ctypes.Structure):
    _fields_ = [
        ("n_nodes", ctypes.c_int64),
        ("coords", ctypes.POINTER(ctypes.c_double)),
        ("n_vol", ctypes.c_int64),
        ("vol_type", ctypes.c_int32),
        ("vol_conn", ctypes.POINTER(ctypes.c_int32)),
        ("vol_phys", ctypes.POINTER(ctypes.c_int32)),
        ("n_surf", ctypes.c_int64),
        ("surf_type", ctypes.c_int32),
        ("surf_conn", ctypes.POINTER(ctypes.c_int32)),
        ("surf_phys", ctypes.POINTER(ctypes.c_int32)),
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.meshkit_read_gmsh.argtypes = [ctypes.c_char_p, ctypes.POINTER(_GmshMesh)]
    lib.meshkit_read_gmsh.restype = ctypes.c_int
    lib.meshkit_build_sparsity.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.meshkit_build_sparsity.restype = ctypes.c_int64
    lib.meshkit_partition_rcb.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.meshkit_free.argtypes = [ctypes.c_void_p]
    try:
        # newer symbol: a libmeshkit.so built before the Benes router
        # landed must not break the (previously working) older entry
        # points — edge_color_batch falls back to pure Python instead
        lib.meshkit_benes_color_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.meshkit_benes_color_batch.restype = ctypes.c_int32
        lib._has_benes = True
    except AttributeError:
        lib._has_benes = False
    _lib = lib
    return lib


def benes_color_batch(src: np.ndarray, dst: np.ndarray, seg_ptr: np.ndarray,
                      n_left: int, n_right: int, degree: int):
    """Native batched bipartite edge coloring (the Benes-router hot path,
    fem/benes.py).  Returns (E,) int32 colors, or None when the shared
    library is absent (callers fall back to the pure-Python walker)."""
    lib = _load()
    if lib is None or not getattr(lib, "_has_benes", False):
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    seg_ptr = np.ascontiguousarray(seg_ptr, dtype=np.int64)
    colors = np.empty(len(src), dtype=np.int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.meshkit_benes_color_batch(
        src.ctypes.data_as(i64p), dst.ctypes.data_as(i64p),
        seg_ptr.ctypes.data_as(i64p), len(seg_ptr) - 1, n_left, n_right,
        degree, colors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise RuntimeError("meshkit_benes_color_batch failed")
    return colors


def available() -> bool:
    return _load() is not None


_GMSH_VOL = {4: ("TET4", 4), 5: ("HEX8", 8)}
_GMSH_SURF = {2: ("TRI3", 3), 3: ("QUAD4", 4)}


def read_gmsh_native(path: str):
    """Parse a Gmsh 2.x file with the native parser; returns a Mesh, or None
    if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from ..mesh.core import Mesh
    from ..mesh.gmsh import _attach_boundary_ids

    out = _GmshMesh()
    rc = lib.meshkit_read_gmsh(path.encode(), ctypes.byref(out))
    if rc != 0:
        raise ValueError(f"meshkit_read_gmsh({path}) failed with code {rc}")
    try:
        N = out.n_nodes
        coords = np.ctypeslib.as_array(out.coords, shape=(N, 3)).copy()
        name, k = _GMSH_VOL[out.vol_type]
        conn = np.ctypeslib.as_array(out.vol_conn, shape=(out.n_vol, k)).copy()
        phys = np.ctypeslib.as_array(out.vol_phys, shape=(out.n_vol,)).copy()
        mesh = Mesh(coords=coords, connectivity=conn, elem_type=name,
                    subdomain_id=phys)
        if out.n_surf:
            _, kf = _GMSH_SURF[out.surf_type]
            sconn = np.ctypeslib.as_array(
                out.surf_conn, shape=(out.n_surf, kf)).copy()
            sphys = np.ctypeslib.as_array(
                out.surf_phys, shape=(out.n_surf,)).copy()
            _attach_boundary_ids(mesh, sconn, sphys)
        return mesh
    finally:
        for ptr in (out.coords, out.vol_conn, out.vol_phys, out.surf_conn,
                    out.surf_phys):
            if ptr:
                lib.meshkit_free(ptr)


def build_sparsity_native(connectivity: np.ndarray, n_nodes: int):
    """Native block-CSR sparsity; returns (rows, cols, slots, nnz) or None."""
    lib = _load()
    if lib is None:
        return None
    conn = np.ascontiguousarray(connectivity, dtype=np.int32)
    E, K = conn.shape
    slots = np.empty((E, K, K), dtype=np.int32)
    rows_p = ctypes.POINTER(ctypes.c_int32)()
    cols_p = ctypes.POINTER(ctypes.c_int32)()
    nnz = lib.meshkit_build_sparsity(
        conn.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), E, K, n_nodes,
        ctypes.byref(rows_p), ctypes.byref(cols_p),
        slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if nnz < 0:
        raise RuntimeError("meshkit_build_sparsity failed")
    rows = np.ctypeslib.as_array(rows_p, shape=(nnz,)).copy()
    cols = np.ctypeslib.as_array(cols_p, shape=(nnz,)).copy()
    lib.meshkit_free(rows_p)
    lib.meshkit_free(cols_p)
    return rows, cols, slots, int(nnz)


def partition_rcb(centers: np.ndarray, n_parts: int) -> np.ndarray:
    """Locality-preserving element partition.  Native RCB when available,
    otherwise a NumPy recursive bisection with identical semantics."""
    centers = np.ascontiguousarray(centers, dtype=np.float64)
    E = centers.shape[0]
    lib = _load()
    if lib is not None:
        part = np.empty(E, dtype=np.int32)
        lib.meshkit_partition_rcb(
            centers.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), E,
            n_parts, part.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return part

    part = np.empty(E, dtype=np.int32)

    def rec(ids, lo, n):
        if n == 1 or len(ids) <= 1:
            part[ids] = lo
            return
        box = centers[ids]
        axis = int(np.argmax(box.max(0) - box.min(0)))
        left_n = n // 2
        split = len(ids) * left_n // n
        order = ids[np.argpartition(centers[ids, axis], max(split - 1, 0))]
        rec(order[:split], lo, left_n)
        rec(order[split:], lo + left_n, n - left_n)

    rec(np.arange(E), 0, n_parts)
    return part
