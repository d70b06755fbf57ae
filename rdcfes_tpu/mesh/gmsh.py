"""Gmsh 2.x ASCII mesh reader / writer.

Replaces the `GmshIO(mesh).read/write` surface used by every driver
(reference src/pihna.C:44-47) and the hand-rolled Gmsh 2.2 writer of the mesh
utility (src/process_mesh.C:3-84).  Format details mirror the reference's
writer exactly: `$MeshFormat 2.2 0 8`, 1-based node ids, elements carrying two
integer tags (physical id, 0), boundary side elements listed before volume
elements with their boundary-condition id as the physical tag.

Node/element ids are compacted to 0-based contiguous indices preserving FILE
ORDER — this is the IC-file contract of the reference (nodal/elemental `.dat`
files are read in mesh iteration order, src/pihna.C:287-310; see SURVEY.md
section 3.4 for the `skip_renumber` semantics, which for the contiguous
meshes shipped with the reference reduce to exactly this).
"""

from __future__ import annotations

import io
from typing import Dict, Optional, TextIO, Union

import numpy as np

from .core import ELEMENT_FACES, MeshBlock, Mesh, MixedMesh

# Gmsh element type codes (the subset the reference handles,
# src/process_mesh.C:52-72, plus the first-order mixed-mesh transition
# types libMesh reads — reference surface src/paraview.h:210-234)
_GMSH_EDGE2 = 1
_GMSH_TRI3 = 2
_GMSH_QUAD4 = 3
_GMSH_TET4 = 4
_GMSH_HEX8 = 5
_GMSH_PRISM6 = 6
_GMSH_PYRAMID5 = 7
_GMSH_TRI6 = 9
_GMSH_QUAD9 = 10
_GMSH_TET10 = 11
_GMSH_HEX27 = 12
_GMSH_EDGE3 = 8
_GMSH_QUAD8 = 16
_GMSH_HEX20 = 17

_VOLUME_TYPES = {_GMSH_TET4: ("TET4", 4), _GMSH_HEX8: ("HEX8", 8),
                 _GMSH_PRISM6: ("PRISM6", 6),
                 _GMSH_PYRAMID5: ("PYRAMID5", 5),
                 _GMSH_TET10: ("TET10", 10),
                 _GMSH_HEX20: ("HEX20", 20),
                 _GMSH_HEX27: ("HEX27", 27)}
_GMSH_CODE = {name: code for code, (name, _) in _VOLUME_TYPES.items()}
# 2D meshes: TRI3/QUAD4 (and quadratic QUAD8/QUAD9) are the volume
# elements, EDGE2/EDGE3 the boundary (classified after parsing — a file
# with any 3D volume element keeps the 2D rows as boundary surfaces)
_GMSH_CODE.update({"TRI3": _GMSH_TRI3, "QUAD4": _GMSH_QUAD4,
                   "QUAD8": _GMSH_QUAD8, "QUAD9": _GMSH_QUAD9,
                   "TRI6": _GMSH_TRI6, "EDGE2": _GMSH_EDGE2,
                   "EDGE3": _GMSH_EDGE3})
_SURFACE_TYPES = {_GMSH_TRI3: ("TRI3", 3), _GMSH_QUAD4: ("QUAD4", 4),
                  _GMSH_TRI6: ("TRI6", 6), _GMSH_QUAD8: ("QUAD8", 8),
                  _GMSH_QUAD9: ("QUAD9", 9)}
_GMSH_NNODES = {1: 2, 2: 3, 3: 4, 4: 4, 5: 8, 6: 6, 7: 5, 8: 3, 9: 6,
                10: 9, 11: 10, 12: 27, 15: 1, 16: 8, 17: 20}


def read(path_or_file: Union[str, TextIO]) -> Mesh:
    """Read a Gmsh 2.x ASCII mesh into a Mesh.

    File paths go through the native meshkit parser when it is built
    (identical output, much faster on large meshes); streams and the
    fallback path use the pure-Python parser below."""
    if isinstance(path_or_file, str):
        with open(path_or_file, "r") as f:
            head = f.read(64)
        if "$MeshFormat\n2" in head:  # well-formed 2.x header -> native path
            try:
                from ..native import read_gmsh_native

                mesh = read_gmsh_native(path_or_file)
                if mesh is not None:
                    return mesh
            except Exception:
                pass  # fall through to the pure-Python parser
        with open(path_or_file, "r") as f:
            text = f.read()
    else:
        text = path_or_file.read()
    try:
        return _read_lines(iter(text.splitlines()))
    except StopIteration:
        raise ValueError("truncated Gmsh file") from None


def _read_lines(lines) -> Mesh:

    def seek(section: str):
        for line in lines:
            if line.strip() == section:
                return True
        return False

    if not seek("$MeshFormat"):
        raise ValueError("not a Gmsh file: missing $MeshFormat")
    fmt = next(lines).split()
    if not fmt[0].startswith("2"):
        raise ValueError(f"only Gmsh 2.x ASCII supported, got version {fmt[0]}")

    if not seek("$Nodes"):
        raise ValueError("missing $Nodes")
    n_nodes = int(next(lines))
    node_ids = np.empty(n_nodes, dtype=np.int64)
    coords = np.empty((n_nodes, 3), dtype=np.float64)
    for i in range(n_nodes):
        parts = next(lines).split()
        node_ids[i] = int(parts[0])
        coords[i] = [float(parts[1]), float(parts[2]), float(parts[3])]
    id_map: Dict[int, int] = {int(g): i for i, g in enumerate(node_ids)}

    if not seek("$Elements"):
        raise ValueError("missing $Elements")
    n_elems_total = int(next(lines))
    # per-type blocks in first-seen order; a single TET4/HEX8 block
    # compacts to the classic Mesh, anything else becomes a MixedMesh
    # (libMesh reads arbitrary mixed meshes; reference surface
    # src/paraview.h:210-234)
    by_type: Dict[str, list] = {}
    order: list = []
    surf_conn = []
    surf_bcid = []
    edge_conn = []
    edge_bcid = []
    for _ in range(n_elems_total):
        parts = next(lines).split()
        etype = int(parts[1])
        ntags = int(parts[2])
        tags = [int(t) for t in parts[3 : 3 + ntags]]
        nodes = [id_map[int(g)] for g in parts[3 + ntags :]]
        physical = tags[0] if tags else 0
        if etype in _VOLUME_TYPES:
            name, k = _VOLUME_TYPES[etype]
            assert len(nodes) == k
            if name not in by_type:
                by_type[name] = []
                order.append(name)
            by_type[name].append((nodes, physical))
        elif etype in _SURFACE_TYPES:
            name, k = _SURFACE_TYPES[etype]
            assert len(nodes) == k
            surf_conn.append(nodes)
            surf_bcid.append(physical)
        elif etype in (_GMSH_EDGE2, _GMSH_EDGE3):
            # boundary candidates of a 2D mesh (ignored when the file
            # turns out to contain 3D volume elements)
            edge_conn.append(nodes)
            edge_bcid.append(physical)
        else:
            # points carry no information the reference uses
            continue
    if not by_type:
        # no 3D volume elements: a 2D mesh whose volume elements are the
        # TRI3/QUAD4 rows and whose boundary sides are the EDGE2 rows
        _2d = {3: "TRI3", 4: "QUAD4", 8: "QUAD8", 9: "QUAD9"}
        bad = sorted({len(f) for f in surf_conn} - set(_2d))
        if bad:
            # e.g. a TRI6 surface-only file: TRI3/QUAD4 (and quadratic
            # QUAD8/QUAD9) are the supported 2D volume elements
            raise ValueError(
                f"unsupported 2D volume element ({bad[0]}-node surface "
                "row; TRI3/QUAD4/QUAD8/QUAD9 2D meshes are supported)")
        kinds = sorted({_2d[len(f)] for f in surf_conn})
        if not kinds:
            raise ValueError("mesh contains no supported volume elements")
        if len(kinds) > 1:
            raise ValueError("mixed-type 2D meshes are not supported")
        mesh = Mesh(
            coords=coords,
            connectivity=np.asarray(surf_conn, dtype=np.int32),
            elem_type=kinds[0],
            subdomain_id=np.asarray(surf_bcid, dtype=np.int32),
        )
        if edge_conn:
            _attach_boundary_ids(mesh, edge_conn, edge_bcid)
        return mesh

    if len(order) == 1 and order[0] in ("TET4", "HEX8", "TET10",
                                        "HEX20", "HEX27"):
        rows = by_type[order[0]]
        mesh = Mesh(
            coords=coords,
            connectivity=np.asarray([r[0] for r in rows], dtype=np.int32),
            elem_type=order[0],
            subdomain_id=np.asarray([r[1] for r in rows], dtype=np.int32),
        )
        if surf_conn:
            _attach_boundary_ids(mesh, surf_conn, surf_bcid)
        return mesh

    blocks = [
        MeshBlock(name,
                  np.asarray([r[0] for r in by_type[name]], dtype=np.int32),
                  np.asarray([r[1] for r in by_type[name]], dtype=np.int32))
        for name in order
    ]
    mesh = MixedMesh(coords=coords, blocks=blocks)
    if surf_conn:
        _attach_boundary_ids_mixed(mesh, surf_conn, surf_bcid)
    return mesh


def _attach_boundary_ids(mesh: Mesh, surf_faces, surf_ids) -> None:
    """Assign boundary-condition ids from file surface elements to the
    topologically extracted boundary faces (matching by sorted node key)."""
    bfaces = mesh.boundary_faces
    key_of = {tuple(sorted(f)): i for i, f in enumerate(bfaces)}
    for f, bid in zip(surf_faces, surf_ids):
        i = key_of.get(tuple(sorted(int(x) for x in f)))
        if i is not None:
            mesh.boundary_id[i] = bid


def _attach_boundary_ids_mixed(mesh: MixedMesh, surf_faces,
                               surf_ids) -> None:
    """MixedMesh variant: boundary faces are -1-padded to 4 nodes."""
    key_of = {tuple(sorted(f)): i
              for i, f in enumerate(mesh.boundary_faces.tolist())}
    for f, bid in zip(surf_faces, surf_ids):
        key = sorted(int(x) for x in f)
        if len(key) == 3:
            key = [-1] + key
        i = key_of.get(tuple(key))
        if i is not None:
            mesh.boundary_id[i] = bid


def write(mesh: Mesh, path_or_file: Union[str, TextIO]) -> None:
    """Write Gmsh 2.2 ASCII, byte-format-compatible with the reference's
    writer (src/process_mesh.C:22-83): side elements first (physical tag =
    boundary id), then volume elements (physical tag = subdomain id)."""
    out: TextIO
    close = False
    if isinstance(path_or_file, str):
        out = open(path_or_file, "w")
        close = True
    else:
        out = path_or_file
    try:
        w = out.write
        w("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        w("$Nodes\n")
        w(f"{mesh.n_nodes}\n")
        for i, (x, y, z) in enumerate(mesh.coords):
            w(f"{i + 1} {_fmt(x)} {_fmt(y)} {_fmt(z)}\n")
        w("$EndNodes\n")
        n_faces = 0 if mesh.boundary_faces is None else len(mesh.boundary_faces)
        w("$Elements\n")
        w(f"{n_faces + mesh.n_elems}\n")
        index = 1
        if mesh.elem_type == "MIXED":
            if n_faces:
                for f, bid in zip(mesh.boundary_faces, mesh.boundary_id):
                    nodes = [int(n) for n in f if n >= 0]
                    code = _GMSH_TRI3 if len(nodes) == 3 else _GMSH_QUAD4
                    w(f"{index} {code} 2 {bid} 0 "
                      + " ".join(str(n + 1) for n in nodes) + "\n")
                    index += 1
            for b in mesh.blocks:
                code = _GMSH_CODE[b.elem_type]
                for e in range(b.n_elems):
                    nodes = " ".join(str(n + 1) for n in b.connectivity[e])
                    w(f"{index} {code} 2 {b.subdomain_id[e]} 0 {nodes}\n")
                    index += 1
            w("$EndElements\n")
            return
        gmsh_face = {"TET4": _GMSH_TRI3, "HEX8": _GMSH_QUAD4,
                     "TET10": _GMSH_TRI6, "TRI3": _GMSH_EDGE2,
                     "QUAD4": _GMSH_EDGE2, "HEX20": _GMSH_QUAD8,
                     "HEX27": _GMSH_QUAD9, "QUAD8": _GMSH_EDGE3,
                     "QUAD9": _GMSH_EDGE3}[mesh.elem_type]
        if n_faces:
            for f, bid in zip(mesh.boundary_faces, mesh.boundary_id):
                nodes = " ".join(str(n + 1) for n in f)
                w(f"{index} {gmsh_face} 2 {bid} 0 {nodes}\n")
                index += 1
        gmsh_vol = _GMSH_CODE[mesh.elem_type]
        for e in range(mesh.n_elems):
            nodes = " ".join(str(n + 1) for n in mesh.connectivity[e])
            w(f"{index} {gmsh_vol} 2 {mesh.subdomain_id[e]} 0 {nodes}\n")
            index += 1
        w("$EndElements\n")
    finally:
        if close:
            out.close()


def _fmt(x: float) -> str:
    """C++ ostream default formatting (6 significant digits)."""
    return f"{x:.6g}"


def dumps(mesh: Mesh) -> str:
    buf = io.StringIO()
    write(mesh, buf)
    return buf.getvalue()
