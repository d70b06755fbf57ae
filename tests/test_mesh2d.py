"""2D volume meshes (TRI3/QUAD4 elements, EDGE2 boundary sides).

The reference reads arbitrary-dimension libMesh meshes (its writer maps
the full VTK element table, src/paraview.h:210-234); every shipped deck
is 3D, so this is the 2D slice of that surface: geometry factors with
z-padded gradients, boundary-edge extraction with outward normals,
Gmsh/VTU IO, and the generic transient system end-to-end.
"""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from rdcfes_tpu.fem import elements
from rdcfes_tpu.fem.geometry import face_geometry_factors, geometry_factors
from rdcfes_tpu.mesh import box_quad_mesh, box_tri_mesh, gmsh
from rdcfes_tpu.systems import TransientRDCSystem

from test_transient import logistic_rd_physics


@pytest.mark.parametrize("mesh_fn,n_elems", [(box_tri_mesh, 2 * 12),
                                             (box_quad_mesh, 12)])
def test_areas_and_boundary(mesh_fn, n_elems):
    m = mesh_fn(4, 3, bounds=((0.0, 2.0), (0.0, 1.5)))
    assert m.dim == 2
    assert m.n_elems == n_elems
    areas = m.element_volumes()
    assert (areas > 0).all()
    np.testing.assert_allclose(areas.sum(), 2.0 * 1.5, rtol=1e-12)
    # boundary edges: 2*(nx + ny) of them, each on exactly one side
    assert len(m.boundary_faces) == 2 * (4 + 3)
    assert m.boundary_faces.shape[1] == 2
    assert set(np.unique(m.boundary_id)) == {1, 2, 3, 4}


def test_edge2_quadrature_and_basis():
    pts, wts = elements.quadrature("EDGE2")
    # 2-point Gauss: exact for cubics on [-1, 1]
    for deg, exact in ((0, 2.0), (1, 0.0), (2, 2.0 / 3.0), (3, 0.0)):
        np.testing.assert_allclose((wts * pts[:, 0] ** deg).sum(), exact,
                                   atol=1e-14)
    phi = elements.shape_functions("EDGE2", pts)
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-14)
    dN = elements.shape_gradients("EDGE2", pts)
    np.testing.assert_allclose(dN.sum(axis=1), 0.0, atol=1e-14)


@pytest.mark.parametrize("mesh_fn", [box_tri_mesh, box_quad_mesh])
def test_geometry_factors_2d(mesh_fn):
    m = mesh_fn(3, 2, bounds=((0.0, 1.0), (0.0, 2.0)))
    phi, JxW, dphi = geometry_factors(jnp.asarray(m.coords),
                                      jnp.asarray(m.connectivity),
                                      m.elem_type)
    # quadrature measure adds up to the domain area
    np.testing.assert_allclose(float(JxW.sum()), 2.0, rtol=1e-12)
    # gradients are in-plane 3-vectors with zero z-component
    assert dphi.shape[2] == 3
    np.testing.assert_allclose(np.asarray(dphi[:, :, 2, :]), 0.0)
    # the physical gradient of a linear field is recovered exactly
    f = 3.0 * m.coords[:, 0] - 2.0 * m.coords[:, 1] + 1.0
    fe = f[m.connectivity]                                # (E, K)
    gx = np.einsum("qke,ek->qe", np.asarray(dphi[:, :, 0, :]), fe)
    gy = np.einsum("qke,ek->qe", np.asarray(dphi[:, :, 1, :]), fe)
    np.testing.assert_allclose(gx, 3.0, atol=1e-12)
    np.testing.assert_allclose(gy, -2.0, atol=1e-12)


@pytest.mark.parametrize("mesh_fn", [box_tri_mesh, box_quad_mesh])
def test_boundary_edge_normals_outward(mesh_fn):
    m = mesh_fn(3, 3, bounds=((0.0, 1.0), (0.0, 1.0)))
    psi, JxW, xyz, normals = face_geometry_factors(
        jnp.asarray(m.coords), jnp.asarray(m.boundary_faces), "EDGE2")
    # total boundary length of the unit square
    np.testing.assert_allclose(float(JxW.sum()), 4.0, rtol=1e-12)
    # outward: n . (x - center) > 0 at every boundary quadrature point
    center = np.array([0.5, 0.5, 0.0])
    dots = np.einsum("fqd,fqd->fq", np.asarray(normals),
                     np.asarray(xyz) - center)
    assert (dots > 0).all()
    np.testing.assert_allclose(np.asarray(normals)[..., 2], 0.0)


@pytest.mark.parametrize("mesh_fn", [box_tri_mesh, box_quad_mesh])
def test_logistic_uniform_matches_ode_2d(mesh_fn):
    """The generic transient system runs 2D meshes end-to-end: uniform IC
    + Neumann BCs stays uniform and follows the linearized-CN logistic
    recurrence exactly (the 3D test's 2D twin)."""
    m = mesh_fn(3, 3)
    sys = TransientRDCSystem(m, 1, logistic_rd_physics(D=0.1, rho=2.0))
    dt = 0.05
    u0 = 0.1
    state = sys.initial_state(np.full((m.n_nodes, 1), u0))
    u_ref = u0
    for _ in range(8):
        state, iters, res = sys.step(state, params={"dt": dt})
        u_ref = (u_ref + 0.5 * dt * 2.0 * u_ref * (1 - u_ref)) / (
            1.0 - 0.5 * dt * 2.0 * (1 - 2 * u_ref)
        )
        u = np.asarray(state["u"])
        assert np.ptp(u) < 1e-9
        np.testing.assert_allclose(u.mean(), u_ref, rtol=1e-9)


def test_diffusion_decays_2d():
    m = box_tri_mesh(6, 6)
    sys = TransientRDCSystem(m, 1, logistic_rd_physics(D=0.5, rho=0.0))
    x = m.coords
    u0 = 1.0 + np.cos(np.pi * x[:, 0])
    state = sys.initial_state(u0[:, None])
    dev0 = np.abs(u0 - 1.0).max()
    for _ in range(5):
        state, _, _ = sys.step(state, params={"dt": 0.02})
    u = np.asarray(state["u"])[:, 0]
    assert np.abs(u - 1.0).max() < 0.8 * dev0
    assert u.min() > 0.0


@pytest.mark.parametrize("mesh_fn", [box_tri_mesh, box_quad_mesh])
def test_gmsh_roundtrip_2d(mesh_fn):
    m = mesh_fn(3, 2)
    text = gmsh.dumps(m)
    m2 = gmsh.read(io.StringIO(text))
    assert m2.elem_type == m.elem_type
    np.testing.assert_allclose(m2.coords, m.coords, atol=1e-6)
    np.testing.assert_array_equal(m2.connectivity, m.connectivity)
    # boundary ids survive the EDGE2 side elements
    key = lambda mm: {tuple(sorted(f)): b for f, b in
                      zip(mm.boundary_faces.tolist(), mm.boundary_id.tolist())}
    assert key(m2) == key(m)


def test_vtu_write_2d(tmp_path):
    from rdcfes_tpu.io.vtu import write_vtu

    m = box_quad_mesh(2, 2)
    path = tmp_path / "mesh2d.vtu"
    write_vtu(str(path), m,
              point_fields=[("u", np.arange(m.n_nodes, dtype=float))])
    text = path.read_text()
    assert 'type="UnstructuredGrid"' in text
    # every cell is VTK_QUAD = 9
    types = text.split('Name="types"')[1].split(">")[1].split("<")[0].split()
    assert set(types) == {"9"}


def test_tri6_only_file_rejected():
    """A 2D file whose surface rows are TRI6 (second-order) must fail
    with a clear unsupported-type error, not be misread as 6-node
    QUAD4 (advisor r4 finding)."""
    txt = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
6
1 0 0 0
2 1 0 0
3 0 1 0
4 0.5 0 0
5 0.5 0.5 0
6 0 0.5 0
$EndNodes
$Elements
1
1 9 2 1 1 1 2 3 4 5 6
$EndElements
"""
    with pytest.raises(ValueError, match="unsupported 2D volume element"):
        gmsh.read(io.StringIO(txt))


def test_kelly_2d_unsupported():
    """Kelly error indicator fails clearly on 2D volume meshes instead of
    crashing in the 3x3 Jacobian inverse (advisor r4 finding)."""
    from rdcfes_tpu.fem.amr import kelly_error_indicator

    m = box_tri_mesh(3, 3)
    u = np.random.default_rng(0).random((m.n_nodes, 1))
    with pytest.raises(NotImplementedError, match="3D volume meshes"):
        kelly_error_indicator(m, u, [0])
