"""Minimal ExodusII (.ex2) mesh writer.

Covers the reference's ExodusII export surface (`ExodusII_IO(msh).write`,
src/process_mesh.C:169): an unstructured mesh — one element block per
type (ExodusII's native multi-block layout, so MixedMesh exports
directly) — with optional nodal variables.  ExodusII is NetCDF-3 classic
underneath; this writer emits the standard dimension/variable layout
through `scipy.io.netcdf_file` (no libnetcdf/exodus dependency),
readable by ParaView / `exodus.py` / any NetCDF tool.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..mesh.core import Mesh

_ELEM_TYPE_NAME = {"TET4": "TETRA4", "HEX8": "HEX8",
                   "PRISM6": "WEDGE6", "PYRAMID5": "PYRAMID5",
                   "TET10": "TETRA10"}


def write_exodus(
    path: str,
    mesh: Mesh,
    nodal_fields: Sequence[Tuple[str, np.ndarray]] = (),
    title: str = "rdcfes_tpu export",
) -> None:
    try:
        from scipy.io import netcdf_file
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "ExodusII export needs scipy (NetCDF-3 backend); install scipy "
            "or use the Gmsh/VTU writers instead"
        ) from e

    f = netcdf_file(path, "w", version=1)
    try:
        # ---- global attributes -------------------------------------------
        f.title = title.encode()
        f.api_version = np.float32(5.22)
        f.version = np.float32(5.22)
        f.floating_point_word_size = np.int32(8)
        f.file_size = np.int32(1)

        # one element block per type (single-type meshes export one)
        if getattr(mesh, "elem_type", None) == "MIXED":
            blocks = [(b.elem_type, b.connectivity) for b in mesh.blocks]
        else:
            blocks = [(mesh.elem_type, mesh.connectivity)]

        # ---- dimensions (the unlimited one must come first in scipy) ------
        f.createDimension("time_step", None)  # unlimited
        f.createDimension("len_string", 33)
        f.createDimension("len_line", 81)
        f.createDimension("four", 4)
        f.createDimension("num_dim", 3)
        f.createDimension("num_nodes", mesh.n_nodes)
        f.createDimension("num_elem", mesh.n_elems)
        f.createDimension("num_el_blk", len(blocks))
        for i, (_, conn) in enumerate(blocks, 1):
            f.createDimension(f"num_el_in_blk{i}", conn.shape[0])
            f.createDimension(f"num_nod_per_el{i}", conn.shape[1])

        # ---- element blocks -------------------------------------------------
        eb_status = f.createVariable("eb_status", "i", ("num_el_blk",))
        eb_status[:] = np.ones(len(blocks), dtype=np.int32)
        eb_prop = f.createVariable("eb_prop1", "i", ("num_el_blk",))
        eb_prop[:] = np.arange(1, len(blocks) + 1, dtype=np.int32)
        eb_prop.name = b"ID"

        for i, (etype, conn) in enumerate(blocks, 1):
            connect = f.createVariable(
                f"connect{i}", "i",
                (f"num_el_in_blk{i}", f"num_nod_per_el{i}")
            )
            connect[:] = (conn + 1).astype(np.int32)  # 1-based
            connect.elem_type = _ELEM_TYPE_NAME[etype].encode()

        # ---- coordinates --------------------------------------------------
        coord = f.createVariable("coord", "d", ("num_dim", "num_nodes"))
        coord[:] = mesh.coords.T

        names = f.createVariable(
            "coor_names", "c", ("num_dim", "len_string")
        )
        names[:] = np.zeros((3, 33), dtype="S1")
        for i, nm in enumerate((b"x", b"y", b"z")):
            names[i, 0] = nm

        # ---- optional nodal variables (one time step) ---------------------
        if nodal_fields:
            f.createDimension("num_nod_var", len(nodal_fields))
            vnames = f.createVariable(
                "name_nod_var", "c", ("num_nod_var", "len_string")
            )
            vnames[:] = np.zeros((len(nodal_fields), 33), dtype="S1")
            for i, (nm, _) in enumerate(nodal_fields):
                b = nm.encode()[:32]
                for j, ch in enumerate(b):
                    vnames[i, j] = bytes([ch])
            t = f.createVariable("time_whole", "d", ("time_step",))
            t[0] = 0.0
            for i, (_, vals) in enumerate(nodal_fields):
                v = f.createVariable(
                    f"vals_nod_var{i + 1}", "d", ("time_step", "num_nodes")
                )
                v[0, :] = np.asarray(vals, dtype=np.float64)
    finally:
        f.close()
