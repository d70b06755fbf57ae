"""Second-order TET10 elements on the RDC path.

Every reference deck is FIRST/LAGRANGE (pihna.C:30-34); TET10 is the
capability upgrade covering libMesh's second-order surface
(src/paraview.h:210-234 maps TET10 as VTK type 24).  Scope: transient
RDC single- and multi-chip, solid mechanics (TRI6 penalty faces,
single- and multi-chip), Gmsh/VTU IO, generators.  AMR stays
first-order with a clear error.
"""

import collections
from math import factorial

import numpy as np
import pytest

from rdcfes_tpu.fem import elements as el
from rdcfes_tpu.mesh import box_tet_mesh, gmsh, tet4_to_tet10


@pytest.fixture
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_tet10_reference_tables():
    """Kronecker at nodes, partition of unity, FD-checked gradients, and
    degree-5 quadrature exactness (the P2 mass matrix needs degree 4)."""
    pts, wts = el.quadrature("TET10")
    assert np.isclose(wts.sum(), 1.0 / 6.0)
    assert (wts > 0).all()  # all-positive Keast rule

    def exact(a, b, c):
        return (factorial(a) * factorial(b) * factorial(c)
                / factorial(a + b + c + 3))

    for a in range(6):
        for b in range(6 - a):
            for c in range(6 - a - b):
                got = np.sum(wts * pts[:, 0]**a * pts[:, 1]**b
                             * pts[:, 2]**c)
                assert abs(got - exact(a, b, c)) < 1e-15, (a, b, c)

    nodes = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                      [.5, 0, 0], [.5, .5, 0], [0, .5, 0],
                      [0, 0, .5], [0, .5, .5], [.5, 0, .5]], float)
    phi = el.shape_functions("TET10", nodes)
    assert np.allclose(phi, np.eye(10), atol=1e-14)

    rng = np.random.default_rng(0)
    P = rng.uniform(0.05, 0.25, (7, 3))
    assert np.allclose(el.shape_functions("TET10", P).sum(1), 1.0)
    g = el.shape_gradients("TET10", P)
    assert np.allclose(g.sum(1), 0.0, atol=1e-13)
    h = 1e-6
    for d in range(3):
        Pp, Pm = P.copy(), P.copy()
        Pp[:, d] += h
        Pm[:, d] -= h
        fd = (el.shape_functions("TET10", Pp)
              - el.shape_functions("TET10", Pm)) / (2 * h)
        assert np.allclose(g[:, :, d], fd, atol=1e-6)


def test_tet10_quadratic_field_exact():
    """P2 completeness end-to-end through geometry + interpolation: a
    quadratic field and its gradient are reproduced EXACTLY at the
    quadrature points of a TET10 mesh (P1/TET4 cannot do this)."""
    import jax.numpy as jnp

    from rdcfes_tpu.fem.assembly import interpolate_at_qp
    from rdcfes_tpu.fem.geometry import geometry_factors

    m = tet4_to_tet10(box_tet_mesh(3, 3, 3, bounds=((0, 2.0),) * 3))
    x, y, z = m.coords.T
    u = (x * x + 2 * y * y + 3 * z * z - x * y + 0.5 * z)[None]  # (1, N)
    phi, JxW, dphi = geometry_factors(
        jnp.asarray(m.coords), jnp.asarray(m.connectivity), "TET10")
    # total volume through the isoparametric map
    assert np.isclose(float(np.asarray(JxW).sum()), 8.0)
    u_qp, grad_qp = interpolate_at_qp(
        jnp.asarray(u), jnp.asarray(m.connectivity.T), phi, dphi)
    # quadrature-point coordinates from the same interpolation
    xyz_qp, _ = interpolate_at_qp(
        jnp.asarray(m.coords.T), jnp.asarray(m.connectivity.T), phi, dphi)
    xq, yq, zq = np.asarray(xyz_qp)
    ref = xq * xq + 2 * yq * yq + 3 * zq * zq - xq * yq + 0.5 * zq
    assert np.abs(np.asarray(u_qp)[0] - ref).max() < 1e-12
    g = np.asarray(grad_qp)[0]  # (Q, 3, E)
    assert np.abs(g[:, 0] - (2 * xq - yq)).max() < 1e-12
    assert np.abs(g[:, 1] - (4 * yq - xq)).max() < 1e-12
    assert np.abs(g[:, 2] - (6 * zq + 0.5)).max() < 1e-12


def _pihna_params():
    from rdcfes_tpu.models.pihna import default_params

    Kk = 2.39e5
    p = default_params()
    p.update(dt=0.1, cells_min_capacity=1.0, cells_max_capacity=Kk,
             cells_max_capacity_exponent=3.0, cytokines_max_capacity=1e-8,
             necrosis_c=500 / Kk, necrosis_h=200 / Kk, necrosis_v=300 / Kk,
             produce_c=-2.5, switch_c2h=1.0, switch_h2c=1.82,
             switch_h2n=0.5, diffuse_c=0.5, taxis_c=2e-5, diffuse_h=1.0,
             taxis_h=4e-5, diffuse_v=0.5, taxis_v=1e-4, produce_v=10.0,
             secrete_a_c=2.77e-13, secrete_a_h=5.22e-10, uptake_a_v=1e-3,
             decay_a=5678.4)
    return {k: float(v) for k, v in p.items()}


def test_tet10_rdc_step_matches_direct_solve():
    """One PIHNA step on a TET10 mesh equals the equilibrated dense solve
    of the assembled P2 operator (scipy assembly straight from the
    element matrices)."""
    import jax.numpy as jnp
    import scipy.sparse as sps

    from rdcfes_tpu.fem.assembly import interpolate_at_qp
    from rdcfes_tpu.fem.geometry import geometry_factors
    from rdcfes_tpu.fem.weakform import element_matrices, element_vectors
    from rdcfes_tpu.models.pihna import pihna_physics
    from rdcfes_tpu.systems import TransientRDCSystem

    mesh = tet4_to_tet10(box_tet_mesh(3, 3, 3, bounds=((0, 30.0),) * 3))
    p = _pihna_params()
    N, V = mesh.n_nodes, 5
    rng = np.random.default_rng(0)
    u0 = np.abs(rng.random((N, V))) * np.array([1., 100., 50., 500., 1e-10])

    sys_ = TransientRDCSystem(mesh, V, pihna_physics, precision="mixed")
    st, iters, res = sys_.step(sys_.initial_state(u0), params=p)
    assert float(res) < 1e-10
    u_raw = np.asarray(st["u_raw"])

    # independent scipy assembly of the same linearized-CN operator
    phi, JxW, dphi = geometry_factors(
        jnp.asarray(mesh.coords), jnp.asarray(mesh.connectivity), "TET10")
    u_qp, grad_qp = interpolate_at_qp(
        jnp.asarray(u0.T), jnp.asarray(mesh.connectivity.T), phi, dphi)
    wf = pihna_physics(u_qp, grad_qp, {}, p)
    Ke = np.asarray(element_matrices(wf, phi, JxW, dphi))
    Fe = np.asarray(element_vectors(wf, phi, JxW, dphi))
    conn = mesh.connectivity
    E, K = conn.shape
    rows = np.repeat(conn, K, axis=1).reshape(-1)
    cols = np.tile(conn, (1, K)).reshape(-1)
    A = sps.bmat([[sps.csr_matrix(
        (Ke[v, w].transpose(2, 0, 1).reshape(-1), (rows, cols)),
        shape=(N, N)) for w in range(V)] for v in range(V)],
        format="csr")
    b = np.zeros((V, N))
    for v in range(V):
        np.add.at(b[v], conn.reshape(-1), Fe[v].T.reshape(-1))

    svar = np.abs(u0).max(axis=0) + 1e-30
    Scol = np.concatenate([np.full(N, s) for s in svar])
    Ad = A.toarray() * Scol[None, :]
    rrow = 1.0 / (np.abs(Ad).max(axis=1) + 1e-300)
    y = np.linalg.solve(Ad * rrow[:, None], b.reshape(-1) * rrow)
    u_ref = (y * Scol).reshape(V, N).T
    scale = np.abs(u_ref).max(axis=0) + 1e-30
    rel = np.abs(u_raw - u_ref).max(axis=0) / scale
    assert rel.max() < 1e-8, rel


def test_tet10_multichip_matches_single_chip():
    """The halo-exchange machinery is arity-generic: a TET10 mesh
    node-partitions, exchanges, and solves identically to single-chip."""
    import jax
    from jax.sharding import Mesh as DeviceMesh

    from rdcfes_tpu.models.pihna import pihna_physics
    from rdcfes_tpu.parallel.halo import HaloShardedSystem
    from rdcfes_tpu.systems import TransientRDCSystem

    mesh = tet4_to_tet10(box_tet_mesh(4, 4, 4, bounds=((0, 30.0),) * 3))
    p = _pihna_params()
    N, V = mesh.n_nodes, 5
    rng = np.random.default_rng(1)
    u0 = np.abs(rng.random((N, V))) * np.array([1., 100., 50., 500., 1e-10])

    ref = TransientRDCSystem(mesh, V, pihna_physics, precision="mixed")
    st_r = ref.initial_state(u0)
    dmesh = DeviceMesh(np.array(jax.devices()), ("d",))
    sys_ = HaloShardedSystem(mesh, V, pihna_physics, dmesh)
    assert sys_.plan.No_max < mesh.n_nodes // 2  # O(N/D) slabs
    st = sys_.initial_state(u0)
    for _ in range(2):
        st, it, res = sys_.step(st, params=p)
        st_r, _, _ = ref.step(st_r, params=p)
        assert float(res) < 1e-8
    a, b = sys_.gather(st["u"]), np.asarray(st_r["u"])
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 1e-8, f"TET10 halo divergence {rel:.3e}"


def test_tet10_gmsh_roundtrip_and_vtu(tmp_path):
    """Gmsh code 11 / TRI6 code 9 round-trip with boundary ids; VTU cells
    are VTK_QUADRATIC_TETRA (24) with the VTK 8/9 edge-node swap."""
    m = tet4_to_tet10(box_tet_mesh(2, 2, 2))
    assert set(np.unique(m.boundary_id)) == {0, 1, 2, 3, 4, 5}
    path = str(tmp_path / "t10.msh")
    gmsh.write(m, path)
    m2 = gmsh.read(path)
    assert m2.elem_type == "TET10"
    assert m2.n_nodes == m.n_nodes and m2.n_elems == m.n_elems
    assert (collections.Counter(m.boundary_id.tolist())
            == collections.Counter(m2.boundary_id.tolist()))

    from rdcfes_tpu.io.vtu import write_vtu

    vp = str(tmp_path / "t10.vtu")
    write_vtu(vp, m, [("f", np.arange(m.n_nodes, dtype=float))])
    txt = open(vp).read()
    types = set(txt.split('Name="types"')[1].split(">")[1]
                .split("<")[0].split())
    assert types == {"24"}
    cells = np.array(txt.split('Name="connectivity"')[1].split(">")[1]
                     .split("<")[0].split(), dtype=int).reshape(-1, 10)
    # VTK node 8 is the (1,3) mid-edge: its coordinates are the midpoint
    # of vertices 1 and 3 in every cell
    mid = 0.5 * (m.coords[cells[:, 1]] + m.coords[cells[:, 3]])
    np.testing.assert_allclose(m.coords[cells[:, 8]], mid, atol=1e-14)


def test_tet10_driver_end_to_end(in_tmp):
    """PIHNA driver on a generated order-2 case."""
    import glob
    import os

    from rdcfes_tpu import cases
    from rdcfes_tpu.drivers import pihna

    cases.make_pihna_case(".", n=3, n_steps=2, order=2)
    deck = open("input.dat").read().replace("output_step = 10",
                                            "output_step = 2")
    open("input.dat", "w").write(deck)
    out = pihna.run("input.dat")
    csv = open(os.path.join(out, "output.csv")).read().splitlines()
    vals = np.array(csv[-1].split(","), dtype=float)
    assert np.isfinite(vals).all() and (vals >= 0).all()
    vtu = sorted(glob.glob(os.path.join(out, "*.vtu")))
    txt = open(vtu[-1]).read()
    assert '"types"' in txt and "24" in txt.split(
        'Name="types"')[1].split(">")[1].split("<")[0].split()


def test_tet10_out_of_scope_guards():
    """MixedMesh blocks reject TET10 with an actionable error (second
    order is a single-type capability)."""
    from rdcfes_tpu.mesh import MeshBlock, MixedMesh

    m = tet4_to_tet10(box_tet_mesh(2, 2, 2))
    with pytest.raises(ValueError, match="single-type"):
        MixedMesh(coords=m.coords, blocks=[
            MeshBlock("TET10", m.connectivity,
                      np.zeros(m.n_elems, np.int32))])


def test_tri6_reference_tables():
    """TRI6 face tables (the TET10 boundary): Kronecker at nodes,
    partition of unity, and degree-5 Dunavant exactness (the P2 penalty
    mass matrix psi_i psi_j is degree 4)."""
    pts, wts = el.quadrature("TRI6")
    assert np.isclose(wts.sum(), 0.5)
    assert (wts > 0).all()

    def exact(a, b):
        return factorial(a) * factorial(b) / factorial(a + b + 2)

    for a in range(6):
        for b in range(6 - a):
            got = np.sum(wts * pts[:, 0]**a * pts[:, 1]**b)
            assert abs(got - exact(a, b)) < 1e-15, (a, b)
    nodes = np.array([[0, 0], [1, 0], [0, 1],
                      [.5, 0], [.5, .5], [0, .5]], float)
    assert np.allclose(el.shape_functions("TRI6", nodes), np.eye(6),
                       atol=1e-14)
    assert np.allclose(el.shape_functions("TRI6", pts).sum(axis=1), 1.0)
    assert np.allclose(el.shape_gradients("TRI6", pts).sum(axis=1), 0.0)


def _solid_newton_opts():
    from rdcfes_tpu.solvers.newton import NewtonOptions

    return NewtonOptions(
        max_nonlinear_iterations=12, relative_step_tolerance=1e-10,
        relative_residual_tolerance=1e-10,
        absolute_residual_tolerance=1e-10,
        max_linear_iterations=50000, initial_linear_tolerance=1e-3)


def test_tet10_solid_uniaxial():
    """Second-order solid mechanics: TET10 uniaxial compression (the
    hyperelastic constitutive path is order-agnostic, penalty BCs ride
    TRI6 faces).  Newton converges and the compressed face lands on the
    prescribed plane; post-processing stays finite."""
    import jax.numpy as jnp

    from rdcfes_tpu.systems.solid import SolidSystem

    m10 = tet4_to_tet10(box_tet_mesh(3, 3, 3))
    sys_ = SolidSystem(
        m10, materials={0: {"young": 1.0e3, "poisson": 0.3}},
        bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.3)},
        penalty=1.0e8, newton=_solid_newton_opts())
    res = sys_.run_solver(sys_.initial_positions(), 0.5)
    assert bool(res.converged)
    x = np.asarray(res.x)
    top = np.unique(m10.boundary_faces[m10.boundary_id == 5])
    np.testing.assert_allclose(x[top, 2], 1.0 - 0.5 * 0.3, atol=1e-3)
    p, vm, _ = sys_.post_process(jnp.asarray(x), 0.5)
    assert np.isfinite(np.asarray(p)).all()
    assert np.isfinite(np.asarray(vm)).all()


def test_tet10_solid_multichip_matches_single_chip():
    """TET10 on the node-partitioned halo Newton (arity-generic element
    and TRI6 face tables) matches the single-chip solve."""
    import jax
    from jax.sharding import Mesh as DeviceMesh

    from rdcfes_tpu.systems.solid import SolidSystem

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    m10 = tet4_to_tet10(box_tet_mesh(3, 3, 3))
    kw = dict(materials={0: {"young": 1.0e3, "poisson": 0.3}},
              bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.3)},
              penalty=1.0e8, newton=_solid_newton_opts())
    ref = SolidSystem(m10, **kw)
    r1 = ref.run_solver(ref.initial_positions(), 0.5)
    dmesh = DeviceMesh(np.array(jax.devices()), ("d",))
    s8 = SolidSystem(m10, device_mesh=dmesh, **kw)
    r8 = s8.run_solver(s8.initial_positions(), 0.5)
    assert bool(r1.converged) and bool(r8.converged)
    a, b = np.asarray(r1.x), np.asarray(r8.x)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 1e-8, f"TET10 multichip solid divergence {rel:.3e}"


def test_tet10_adpm_driver_and_exodus(in_tmp, tmp_path):
    """ADPM (elemental tracts) on an order-2 case through the real
    driver; ExodusII exports TET10 as the TETRA10 block type."""
    import glob
    import os

    from scipy.io import netcdf_file

    from rdcfes_tpu import cases
    from rdcfes_tpu.drivers import adpm
    from rdcfes_tpu.io.exodus import write_exodus
    from rdcfes_tpu.mesh import box_tet_mesh

    cases.make_adpm_case(".", n=3, n_steps=2, order=2)
    deck = open("input.dat").read().replace("output_step = 20",
                                            "output_step = 2")
    open("input.dat", "w").write(deck)
    out = adpm.run("input.dat")
    csv = open(os.path.join(out, "output.csv")).read().splitlines()
    vals = np.array(csv[-1].split(","), dtype=float)
    assert np.isfinite(vals).all()
    assert glob.glob(os.path.join(out, "*.vtu"))

    m = tet4_to_tet10(box_tet_mesh(2, 2, 2))
    p = str(tmp_path / "t10.ex2")
    write_exodus(p, m, [("f", np.ones(m.n_nodes))])
    f = netcdf_file(p, "r")
    assert f.variables["connect1"].elem_type == b"TETRA10"
    f.close()


def test_tet10_proteas_and_ripf_drivers(in_tmp):
    """PROTEAS (qp-sampled nodal aux incl. the reference sampling quirk)
    and RIPF (per-step TD/RT qp fields) run order-2 cases end-to-end."""
    import glob
    import os
    import shutil

    from rdcfes_tpu import cases
    from rdcfes_tpu.drivers import proteas, ripf

    cases.make_proteas_case(".", n=3, n_steps=2, order=2)
    out = proteas.run("input.dat")
    assert glob.glob(os.path.join(out, "*.vtu"))
    for f in os.listdir("."):
        if os.path.isdir(f):
            shutil.rmtree(f)
        else:
            os.unlink(f)

    cases.make_ripf_case(".", n=3, n_steps=2, order=2)
    deck = open("input.dat").read().replace(
        "output_time_points = ' 10 30 60 90 120 '",
        "output_time_points = ' 2 '")
    open("input.dat", "w").write(deck)
    out = ripf.run("input.dat")
    csv = open(os.path.join(out, "output.csv")).read().splitlines()
    vals = np.array(csv[-1].split(","), dtype=float)
    assert np.isfinite(vals).all()
