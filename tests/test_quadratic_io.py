"""Quadratic IO-breadth types (VERDICT r4 item 10): EDGE3, QUAD8, QUAD9,
HEX20, HEX27 — Gmsh round-trip, VTU node-ordering by geometric role, and
nodal-basis sanity (reference VTK table src/paraview.h:215-230)."""

import io
import re

import numpy as np
import pytest

from rdcfes_tpu.fem import elements as el
from rdcfes_tpu.io.vtu import write_vtu
from rdcfes_tpu.mesh import gmsh
from rdcfes_tpu.mesh.core import Mesh

QUADRATIC = ("QUAD8", "QUAD9", "HEX20", "HEX27")


def _single_elem_mesh(t, skew=True):
    nodes, _ = el._NODAL_TYPES[t]
    X = np.asarray(nodes, float)
    if X.shape[1] == 2:
        X = np.concatenate([X, np.zeros((len(X), 1))], axis=1)
    if skew:  # affine map: volume stays exact for the quadrature rule
        A = np.array([[1.2, 0.1, 0.0], [0.0, 0.9, 0.2], [0.05, 0.0, 1.1]])
        X = X @ A.T + np.array([3.0, -1.0, 2.0])
    m = Mesh(X, np.arange(len(X), dtype=np.int32)[None], t, None)
    return m


def _elevate_hex(mesh, n27):
    """Linear HEX8 mesh -> HEX20/27 by inserting edge (face, body) nodes."""
    conn = mesh.connectivity
    coords = [mesh.coords]
    key2id = {}
    nid = mesh.n_nodes

    def node_at(key, pt):
        nonlocal nid
        if key not in key2id:
            key2id[key] = nid
            coords.append(pt[None])
            nid += 1
        return key2id[key]

    edges = [(0, 1), (0, 3), (0, 4), (1, 2), (1, 5), (2, 3),
             (2, 6), (3, 7), (4, 5), (4, 7), (5, 6), (6, 7)]
    faces = [(0, 3, 2, 1), (0, 1, 5, 4), (0, 4, 7, 3),
             (1, 2, 6, 5), (2, 3, 7, 6), (4, 5, 6, 7)]
    rows = []
    for e in conn:
        row = list(e)
        for a, b in edges:
            key = tuple(sorted((e[a], e[b])))
            row.append(node_at(key, (mesh.coords[e[a]] + mesh.coords[e[b]]) / 2))
        if n27:
            for f in faces:
                ids = tuple(sorted(int(e[i]) for i in f))
                row.append(node_at(ids, mesh.coords[list(e[list(f)])].mean(0)))
            row.append(node_at(tuple(sorted(map(int, e))),
                               mesh.coords[e].mean(0)))
        rows.append(row)
    return Mesh(np.concatenate(coords), np.asarray(rows, np.int32),
                "HEX27" if n27 else "HEX20", mesh.subdomain_id.copy())


@pytest.mark.parametrize("t", QUADRATIC)
def test_gmsh_roundtrip(t):
    m = _single_elem_mesh(t)
    m.boundary_id[:] = np.arange(len(m.boundary_id)) + 1
    buf = io.StringIO()
    gmsh.write(m, buf)
    buf.seek(0)
    m2 = gmsh.read(buf)
    assert m2.elem_type == t
    np.testing.assert_array_equal(m2.connectivity, m.connectivity)
    np.testing.assert_allclose(m2.coords, m.coords, rtol=0, atol=5e-6)
    # boundary ids survive the round trip (matched through face keys)
    k = lambda f: tuple(sorted(map(int, f)))
    ids1 = {k(f): int(b) for f, b in zip(m.boundary_faces, m.boundary_id)}
    ids2 = {k(f): int(b) for f, b in zip(m2.boundary_faces, m2.boundary_id)}
    assert ids1 == ids2 and set(ids1.values()) == set(
        range(1, len(m.boundary_id) + 1))


@pytest.mark.parametrize("n27", [False, True])
def test_hex_quadratic_two_elem_boundary(n27):
    from rdcfes_tpu.mesh import box_hex_mesh

    m8 = box_hex_mesh(2, 1, 1, bounds=((0, 2.0), (0, 1.0), (0, 1.0)))
    m = _elevate_hex(m8, n27)
    # 2 hexes share one face: 10 boundary faces remain
    assert len(m.boundary_faces) == 10
    assert abs(m.element_volumes().sum() - 2.0) < 1e-12
    buf = io.StringIO()
    gmsh.write(m, buf)
    buf.seek(0)
    m2 = gmsh.read(buf)
    assert m2.elem_type == m.elem_type and m2.n_elems == 2
    np.testing.assert_array_equal(m2.connectivity, m.connectivity)


@pytest.mark.parametrize("n27", [False, True])
def test_vtu_hex_quadratic_node_roles(tmp_path, n27):
    """The gmsh->VTK permutation lands every mid-edge node on the VTK
    edge it belongs to GEOMETRICALLY (and HEX27 face centres on their
    VTK faces) — checked against the VTK spec orderings written out in
    io/vtu.py, not against our own writer (no circularity)."""
    t = "HEX27" if n27 else "HEX20"
    m = _single_elem_mesh(t)
    path = str(tmp_path / "q.vtu")
    write_vtu(path, m, [("f", np.zeros(m.n_nodes))])
    txt = open(path).read()
    pts = re.search(r'Name="position".*?>(.*?)</DataArray>', txt,
                    re.S).group(1).split()
    pts = np.asarray(pts, float).reshape(-1, 3)
    conn = re.search(r'Name="connectivity".*?>(.*?)</DataArray>', txt,
                     re.S).group(1).split()
    conn = np.asarray(conn, int)
    ctype = int(re.search(r'Name="types".*?>(.*?)</DataArray>', txt,
                          re.S).group(1).split()[0])
    assert ctype == (29 if n27 else 25)
    X = pts[conn]  # VTK-ordered element nodes
    from rdcfes_tpu.io.vtu import _VTK_HEX_EDGES, _VTK_HEX_FACES

    for i, (a, b) in enumerate(_VTK_HEX_EDGES):
        np.testing.assert_allclose(X[8 + i], (X[a] + X[b]) / 2,
                                   rtol=0, atol=1e-4)
    if n27:
        for j, f in enumerate(_VTK_HEX_FACES):
            np.testing.assert_allclose(X[20 + j], X[list(f)].mean(0),
                                       rtol=0, atol=1e-4)
        np.testing.assert_allclose(X[26], X[:8].mean(0), rtol=0, atol=1e-4)


def test_quad_quadratic_2d_volume_and_edge3_boundary():
    """A QUAD9 2D mesh round-trips with EDGE3 boundary rows."""
    m = _single_elem_mesh("QUAD9", skew=False)
    assert m.dim == 2
    assert len(m.boundary_faces) == 4 and m.boundary_faces.shape[1] == 3
    assert abs(m.element_volumes()[0] - 4.0) < 1e-12
    m.boundary_id[:] = [5, 6, 7, 8]
    buf = io.StringIO()
    gmsh.write(m, buf)
    # boundary rows carry the gmsh EDGE3 code (8)
    assert re.search(r"^\d+ 8 2 ", buf.getvalue(), re.M)
    buf.seek(0)
    m2 = gmsh.read(buf)
    assert m2.elem_type == "QUAD9"
    k = lambda f: tuple(sorted(map(int, f)))
    ids2 = {k(f): int(b) for f, b in zip(m2.boundary_faces, m2.boundary_id)}
    ids1 = {k(f): int(b) for f, b in zip(m.boundary_faces, m.boundary_id)}
    assert ids1 == ids2


@pytest.mark.parametrize("t", QUADRATIC + ("EDGE3",))
def test_nodal_basis_roles(t):
    """Kronecker-delta at the gmsh reference nodes, partition of unity,
    and finite-difference gradient consistency."""
    nodes, _ = el._NODAL_TYPES[t]
    nodes = np.asarray(nodes, float)
    np.testing.assert_allclose(el.shape_functions(t, nodes),
                               np.eye(len(nodes)), rtol=0, atol=1e-11)
    pts, wts = el.quadrature(t)
    np.testing.assert_allclose(el.shape_functions(t, pts).sum(1), 1.0,
                               rtol=0, atol=1e-12)
    g = el.shape_gradients(t, pts)
    np.testing.assert_allclose(g.sum(1), 0.0, rtol=0, atol=1e-11)
    h = 1e-6
    for r in range(pts.shape[1]):
        pp = pts.copy()
        pp[:, r] += h
        pm = pts.copy()
        pm[:, r] -= h
        fd = (el.shape_functions(t, pp) - el.shape_functions(t, pm)) / (2 * h)
        assert np.abs(fd - g[:, :, r]).max() < 1e-8
