"""ParaView VTU / PVD writers.

Output-format parity with the reference's Paraview_IO (src/paraview.h:12-248):

* ASCII .vtu with Points ("position"), PointData (node_ID then every field),
  CellData (element_ID, region_ID, processor_ID), Cells
  (connectivity/offsets/types with the VTK type map, src/paraview.h:210-234)
* values with |x| <= 1e-24 flushed to 0 (src/paraview.h:96)
* a .pvd collection file accumulating <DataSet timestep=.../> entries
  (src/paraview.h:157-198)

Field list = all system variables in registration order, which is what
libMesh's build_solution_vector produces for the reference; CONSTANT MONOMIAL
(per-element) variables are projected to nodes by averaging adjacent element
values, matching libMesh's nodal projection of monomials.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..mesh.core import Mesh

SMALLEST_NUMBER = 1.0e-24

_VTK_TYPE = {"TET4": 10, "HEX8": 12, "TRI3": 5, "QUAD4": 9,
             "PRISM6": 13, "PYRAMID5": 14, "TET10": 24,
             # quadratic IO-breadth types (src/paraview.h:215-230):
             # VTK_QUADRATIC_{QUAD,HEXAHEDRON} and
             # VTK_BIQUADRATIC_QUAD / VTK_TRIQUADRATIC_HEXAHEDRON
             "QUAD8": 23, "QUAD9": 28, "HEX20": 25, "HEX27": 29}

# gmsh -> VTK node permutations for the quadratic hex types, derived by
# matching edge (node-pair) and face (corner-set) ROLES instead of
# hand-written index lists.  gmsh hexahedron edges/faces per the Gmsh
# reference manual; VTK edges per vtkQuadraticHexahedron (bottom ring,
# top ring, verticals) and faces per vtkHexahedron::GetFace.
_GMSH_HEX_EDGES = [(0, 1), (0, 3), (0, 4), (1, 2), (1, 5), (2, 3),
                   (2, 6), (3, 7), (4, 5), (4, 7), (5, 6), (6, 7)]
_VTK_HEX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6),
                  (6, 7), (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
_GMSH_HEX_FACES = [(0, 3, 2, 1), (0, 1, 5, 4), (0, 4, 7, 3),
                   (1, 2, 6, 5), (2, 3, 7, 6), (4, 5, 6, 7)]
_VTK_HEX_FACES = [(0, 4, 7, 3), (1, 2, 6, 5), (0, 1, 5, 4),
                  (3, 7, 6, 2), (0, 3, 2, 1), (4, 5, 6, 7)]


def _hex_perm(n27: bool):
    """Column permutation taking a gmsh-ordered HEX20/27 row to VTK."""
    ge = {frozenset(e): 8 + i for i, e in enumerate(_GMSH_HEX_EDGES)}
    perm = list(range(8))
    perm += [ge[frozenset(e)] for e in _VTK_HEX_EDGES]
    if n27:
        gf = {frozenset(f): 20 + i for i, f in enumerate(_GMSH_HEX_FACES)}
        perm += [gf[frozenset(f)] for f in _VTK_HEX_FACES]
        perm.append(26)
    return perm


def elemental_to_nodal(mesh: Mesh, values: np.ndarray) -> np.ndarray:
    """Arithmetic average of adjacent element values at each node (the
    nodal projection applied to CONSTANT MONOMIAL fields on output)."""
    values = np.asarray(values)
    total = np.zeros(mesh.n_nodes)
    count = np.zeros(mesh.n_nodes)
    if getattr(mesh, "elem_type", None) == "MIXED":
        off = 0
        for b in mesh.blocks:
            conn = b.connectivity
            v = values[off:off + b.n_elems]
            np.add.at(total, conn.ravel(), np.repeat(v, conn.shape[1]))
            np.add.at(count, conn.ravel(), 1.0)
            off += b.n_elems
    else:
        conn = mesh.connectivity
        np.add.at(total, conn.ravel(), np.repeat(values, conn.shape[1]))
        np.add.at(count, conn.ravel(), 1.0)
    return total / np.maximum(count, 1.0)


def _cell_arrays(mesh) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat connectivity, offsets, vtk types) for single-type or MIXED
    meshes (the VTK type map of the reference, src/paraview.h:210-234)."""
    if getattr(mesh, "elem_type", None) == "MIXED":
        conns, sizes, types = [], [], []
        for b in mesh.blocks:
            conns.append(b.connectivity.ravel())
            sizes.append(np.full(b.n_elems, b.connectivity.shape[1]))
            types.append(np.full(b.n_elems, _VTK_TYPE[b.elem_type]))
        return (np.concatenate(conns), np.cumsum(np.concatenate(sizes)),
                np.concatenate(types))
    E, K = mesh.n_elems, mesh.nodes_per_elem
    conn = mesh.connectivity
    if mesh.elem_type == "TET10":
        # VTK_QUADRATIC_TETRA orders edges (0,1),(1,2),(0,2),(0,3),
        # (1,3),(2,3); gmsh swaps the last two
        conn = conn[:, [0, 1, 2, 3, 4, 5, 6, 7, 9, 8]]
    elif mesh.elem_type in ("HEX20", "HEX27"):
        conn = conn[:, _hex_perm(mesh.elem_type == "HEX27")]
    # QUAD8/QUAD9 node orders coincide in gmsh and VTK
    return (conn.ravel(), K * np.arange(1, E + 1),
            np.full(E, _VTK_TYPE[mesh.elem_type]))


def _fmt(x: float) -> str:
    return f"{x:g}"


def write_vtu(
    path: str,
    mesh: Mesh,
    point_fields: Sequence[Tuple[str, np.ndarray]],
    cell_fields: Sequence[Tuple[str, np.ndarray]] = (),
    coords: Optional[np.ndarray] = None,
    processor_id: Optional[np.ndarray] = None,
) -> None:
    """Write one ASCII .vtu frame.

    point_fields: (name, (N,) array) in output order; elemental fields the
    caller wants exported as PointData should be pre-projected with
    `elemental_to_nodal`.
    cell_fields: extra (name, (E,) int array) CellData after the standard
    element_ID/region_ID/processor_ID triple.
    """
    coords = mesh.coords if coords is None else np.asarray(coords)
    E = mesh.n_elems
    N = mesh.n_nodes
    proc = processor_id if processor_id is not None else np.zeros(E, dtype=int)
    cells_flat, offsets, types = _cell_arrays(mesh)

    with open(path, "w") as f:
        w = f.write
        w('<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">\n')
        w("  <UnstructuredGrid>\n")
        w(f'    <Piece  NumberOfPoints="{N}" NumberOfCells="{E}">\n')
        w("      <Points>\n")
        w('        <DataArray type="Float64" Name="position" NumberOfComponents="3" format="ascii">\n')
        w(" " + " ".join(_fmt(v) for v in coords.ravel()))
        w("\n        </DataArray>\n      </Points>\n")
        w("      <PointData>\n")
        w('        <DataArray type="Int32" Name="node_ID" NumberOfComponents="1" format="ascii">\n')
        w(" " + " ".join(str(i + 1) for i in range(N)))
        w("\n        </DataArray>\n")
        for name, vals in point_fields:
            vals = np.asarray(vals, dtype=np.float64)
            flushed = np.where(np.abs(vals) <= SMALLEST_NUMBER, 0.0, vals)
            w(f'        <DataArray type="Float64" Name="{name}" NumberOfComponents="1" format="ascii">\n')
            w(" " + " ".join(_fmt(v) for v in flushed))
            w("\n        </DataArray>\n")
        w("      </PointData>\n")
        w("      <CellData>\n")
        for name, vals in (
            ("element_ID", np.arange(1, E + 1)),
            ("region_ID", mesh.subdomain_id),
            ("processor_ID", proc),
        ):
            w(f'        <DataArray type="Int32" Name="{name}" NumberOfComponents="1" format="ascii">\n')
            w(" " + " ".join(str(int(v)) for v in vals))
            w("\n        </DataArray>\n")
        for name, vals in cell_fields:
            w(f'        <DataArray type="Float64" Name="{name}" NumberOfComponents="1" format="ascii">\n')
            w(" " + " ".join(_fmt(float(v)) for v in vals))
            w("\n        </DataArray>\n")
        w("      </CellData>\n")
        w("      <Cells>\n")
        w('        <DataArray type="Int32" Name="connectivity" NumberOfComponents="1" format="ascii">\n')
        w(" " + " ".join(str(int(v)) for v in cells_flat))
        w("\n        </DataArray>\n")
        w('        <DataArray type="Int32" Name="offsets" NumberOfComponents="1" format="ascii">\n')
        w(" " + " ".join(str(int(v)) for v in offsets))
        w("\n        </DataArray>\n")
        w('        <DataArray type="Int32" Name="types" NumberOfComponents="1" format="ascii">\n')
        w(" " + " ".join(str(int(v)) for v in types))
        w("\n        </DataArray>\n")
        w("      </Cells>\n    </Piece>\n  </UnstructuredGrid>\n</VTKFile>\n")


class ParaviewWriter:
    """Time-series writer: open_pvd / update_pvd / close_pvd parity
    (src/paraview.h:157-198)."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self._pvd = None
        self._base = None

    def open_pvd(self, base: str, resume: bool = False) -> None:
        """resume=True preserves the DataSet entries of an existing .pvd
        (checkpoint/resume into the same results directory must not
        truncate pre-crash time points)."""
        assert self._pvd is None, "pvd already open"
        self._base = base
        prior = []
        if resume and os.path.exists(base + ".pvd"):
            with open(base + ".pvd") as f:
                prior = [ln for ln in f if "<DataSet" in ln]
        self._pvd = open(base + ".pvd", "w")
        self._pvd.write(
            '<?xml version="1.0"?>\n'
            '<VTKFile type="Collection" version="0.1" byte_order="LittleEndian">\n'
            "  <Collection>\n"
        )
        for ln in prior:
            self._pvd.write(ln)
        self._pvd.flush()

    def update_pvd(
        self,
        point_fields,
        t: int = 0,
        cell_fields=(),
        coords: Optional[np.ndarray] = None,
        processor_id: Optional[np.ndarray] = None,
    ) -> str:
        assert self._pvd is not None, "open_pvd first"
        vtu = f"{self._base}-{t}.vtu"
        write_vtu(vtu, self.mesh, point_fields, cell_fields, coords, processor_id)
        fname = os.path.basename(vtu)
        self._pvd.write(
            f'    <DataSet timestep="{t}" group="" part="0" file="{fname}"/>\n'
        )
        self._pvd.flush()
        return vtu

    def close_pvd(self) -> None:
        if self._pvd is None:
            return
        self._pvd.write("  </Collection>\n</VTKFile>\n")
        self._pvd.close()
        self._pvd = None

    def __del__(self):
        try:
            self.close_pvd()
        except Exception:
            pass
