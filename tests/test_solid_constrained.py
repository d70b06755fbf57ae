"""Hanging-node constraints in the solid Newton path (VERDICT r4 item 7).

The reference's adaptive_remeshing is mesh-generic (src/solid.C:330-369):
libMesh's DofMap condenses hanging-node constraints inside FEMSystem's
solve.  Our solid Newton applies the same algebra matrix-free
(C^T K C, solvers/newton.py) — these tests gate it against a dense
reduced Newton, the same acceptance bar test_adapt_ext.py uses for the
RDC path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rdcfes_tpu.mesh import box_mixed_mesh
from rdcfes_tpu.mesh.adapt_ext import MixedConstrained
from rdcfes_tpu.solvers.newton import NewtonOptions
from rdcfes_tpu.systems.solid import SolidSystem

BCS = {0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.05)}


def _center_flags(coords, conn, frac=0.3):
    cent = coords[conn[:, :4]].mean(axis=1)
    mid = coords.mean(axis=0)
    r = np.linalg.norm(cent - mid, axis=1)
    return r <= np.quantile(r, frac)


def _refined_mixed_with_constraints():
    mm = box_mixed_mesh(4, 2, 2, bounds=((0, 1.0),) * 3)
    mc = MixedConstrained.from_mesh(mm)
    flags = _center_flags(
        mm.coords,
        np.concatenate([b.connectivity[:, :4] for b in mm.blocks]))
    out = mc.refine_and_coarsen(flags, np.zeros(mm.n_elems, bool))
    assert out is not None and len(out.constraints)
    return out.mesh, out.constraints


def _dense_constrained_newton(system, x0, pt, cons, max_iters=30):
    """Reference: dense reduced Newton on C^T K C using the SAME jitted
    assembly — isolates the matrix-free constraint algebra + updates."""
    import scipy.sparse as sps

    N = system.sp.n_nodes
    rows, cols = system.sp.rows, system.sp.cols
    Cn = sps.lil_matrix((N, N))
    master = np.ones(N, bool)
    master[cons[:, 0]] = False
    for i in np.nonzero(master)[0]:
        Cn[i, i] = 1.0
    for hh, aa, bb in cons:
        Cn[hh, aa] = 0.5
        Cn[hh, bb] = 0.5
    C = sps.block_diag([Cn.tocsr()] * 3, format="csr").toarray()
    hang_dofs = np.concatenate([v * N + cons[:, 0] for v in range(3)])

    x = np.asarray(x0, np.float64).copy()  # (N, 3)
    r0 = None
    for _ in range(max_iters):
        R, values = system._assemble_jit(jnp.asarray(x.T), pt)
        R = np.asarray(R)              # (3, N), dof = v*N + n
        values = np.asarray(values)    # (3, 3, nnz)
        Rf = C.T @ R.reshape(3 * N)
        rn = float(np.linalg.norm(Rf))
        if r0 is None:
            r0 = rn if rn > 0 else 1.0
        if rn <= 1e-8 or rn / r0 <= 1e-10:
            break
        A = np.zeros((3 * N, 3 * N))
        for v in range(3):
            for w in range(3):
                A[v * N + rows, w * N + cols] = values[v, w]
        Ac = C.T @ A @ C
        Ac[hang_dofs, hang_dofs] = 1.0
        b = -Rf
        b[hang_dofs] = 0.0
        dy = np.linalg.solve(Ac, b)
        x += (C @ dy).reshape(3, N).T
    return x, rn / r0


@pytest.mark.smoke
def test_solid_constrained_newton_matches_dense_reduced():
    mesh, cons = _refined_mixed_with_constraints()
    system = SolidSystem(
        mesh, materials={0: {"young": 1.0e3, "poisson": 0.3}},
        bcs=BCS, penalty=1.0e6,
        newton=NewtonOptions(max_nonlinear_iterations=30,
                             relative_residual_tolerance=1e-10,
                             relative_step_tolerance=1e-12),
        constraints=cons,
    )
    pt = jnp.asarray(0.5, jnp.float64)
    res = system.run_solver(system.initial_positions(), 0.5)
    assert res.converged
    x = np.asarray(res.x)

    # the solved positions satisfy every hanging constraint exactly
    hh, aa, bb = cons[:, 0], cons[:, 1], cons[:, 2]
    np.testing.assert_allclose(x[hh], 0.5 * (x[aa] + x[bb]),
                               rtol=0, atol=1e-12)

    x_ref, rel_ref = _dense_constrained_newton(
        system, np.asarray(mesh.coords), pt, cons)
    assert rel_ref <= 1e-10
    dscale = np.abs(x_ref - np.asarray(mesh.coords)).max()
    rel = np.abs(x - x_ref).max() / dscale
    # both Newtons stop on tolerance; compare at the Newton-tolerance class
    assert rel < 1e-6, rel


def test_solid_driver_mixed_remeshing(tmp_path, monkeypatch):
    """End-to-end: a MIXED-mesh solid deck with remeshing refines (the
    round-4 print-and-skip gate is gone) and the constrained Newton
    converges on the refined non-conforming mesh."""
    import os

    from rdcfes_tpu.drivers import solid as solid_driver
    from rdcfes_tpu.mesh import gmsh

    monkeypatch.chdir(tmp_path)
    mesh = box_mixed_mesh(4, 2, 2, bounds=((0, 1.0),) * 3)
    gmsh.write(mesh, str(tmp_path / "input.msh"))
    (tmp_path / "input.dat").write_text("""
directory = simulation
input_GMSH = input.msh
output_PARAVIEW = out
loading_step = 0.5
output_time_points = ' 2 '
remeshing_step = 1
mesh/AMR/max_steps = 1
solver/nonlinear/max_nonlinear_iterations = 20
BCs = ' 0 5 '
BC/0/displacement/0 = +0.000
BC/0/displacement/1 = +0.000
BC/0/displacement/2 = +0.000
BC/5/displacement/0 = NAN
BC/5/displacement/1 = NAN
BC/5/displacement/2 = -0.10
BCs/displacement_penalty = 1.e+6
materials = ' 0 '
material/0/Hyperelastic/Young = 1.0e+4
material/0/Hyperelastic/Poisson = 0.3
""")
    import io
    import sys as _sys

    err = io.StringIO()
    old = _sys.stderr
    _sys.stderr = err
    try:
        outdir = solid_driver.run("input.dat")
    finally:
        _sys.stderr = old
    assert "do not refine" not in err.getvalue()
    assert "single-chip only" not in err.getvalue()
    assert os.path.exists(os.path.join(outdir, "out-2.vtu"))
    # the refined mesh really grew (remeshing acted)
    vtu = open(os.path.join(outdir, "out-2.vtu")).read()
    import re

    m = re.search(r'NumberOfCells="(\d+)"', vtu)
    assert m and int(m.group(1)) > mesh.n_elems


def test_coupled_hcc_driver_mixed_remeshing(tmp_path, monkeypatch):
    """Coupled HCC on a MIXED mesh with remeshing: the RDC side solves
    C^T A C and the solid side the constrained Newton after refinement
    (reference src/coupled_hcc.C:733-780 is mesh-generic)."""
    import os

    from rdcfes_tpu.drivers import coupled_hcc
    from rdcfes_tpu.mesh import gmsh

    monkeypatch.chdir(tmp_path)
    mesh = box_mixed_mesh(4, 2, 2, bounds=((0, 1.0),) * 3)
    gmsh.write(mesh, str(tmp_path / "input.msh"))
    u0 = np.stack([
        np.full(mesh.n_nodes, 0.4),
        0.2 * np.exp(-10 * ((mesh.coords - 0.5) ** 2).sum(axis=1)),
        np.full(mesh.n_nodes, 0.01),
    ], axis=1)
    np.savetxt(str(tmp_path / "input.nodal"), u0)
    (tmp_path / "input.dat").write_text("""
directory = simulation
input_GMSH = input.msh
input_nodal = input.nodal
output_PARAVIEW = out
time_step = 0.01
number_of_time_steps = 4
number_of_loading_steps = 2
output_step = 4
remeshing_step = 2
mesh/AMR/max_steps = 1
cells/min_capacity = 0.0
cells/max_capacity = 1.0
cells/max_capacity/exponent = 3
produce/c = 0.5
diffuse/c = 0.05
necrosis/l = 0.1
necrosis/c = 0.1
BCs = ' 0 '
BC/0/displacement/0 = +0.000
BC/0/displacement/1 = +0.000
BC/0/displacement/2 = +0.000
BCs/displacement_penalty = 1.e+6
materials = ' 0 '
material/0/Hyperelastic/Young = 2.0e+3
material/0/Hyperelastic/Poisson = 0.4
material/0/Hyperelastic/VolumetricStretchRatio/rate_0 = 3.0e-1
material/0/Hyperelastic/VolumetricStretchRatio/rate_1 = 3.0e-1
material/0/Hyperelastic/VolumetricStretchRatio/rate_2 = 3.0e-1
""")
    outdir = coupled_hcc.run("input.dat")
    vtu = open(os.path.join(outdir, "out-4.vtu")).read()
    import re

    m = re.search(r'NumberOfCells="(\d+)"', vtu)
    assert m and int(m.group(1)) > mesh.n_elems
    # fields finite on the refined mesh
    assert "nan" not in vtu.lower().replace('name="', "")


def test_solid_constrained_mixed_precision_agrees():
    """The mixed-precision linear stage rides the same constraint algebra
    (mv32 is wrapped too) — its equilibrium must match the f64 stage."""
    mesh, cons = _refined_mixed_with_constraints()

    def make(precision):
        return SolidSystem(
            mesh, materials={0: {"young": 1.0e3, "poisson": 0.3}},
            bcs=BCS, penalty=1.0e6,
            newton=NewtonOptions(max_nonlinear_iterations=30,
                                 relative_residual_tolerance=1e-10,
                                 relative_step_tolerance=1e-12,
                                 linear_precision=precision),
            constraints=cons,
        )

    x64 = np.asarray(make("f64").run_solver(
        jnp.asarray(mesh.coords), 0.5).x)
    xmx = np.asarray(make("mixed").run_solver(
        jnp.asarray(mesh.coords), 0.5).x)
    dscale = np.abs(x64 - np.asarray(mesh.coords)).max()
    assert np.abs(xmx - x64).max() / dscale < 1e-5
    hh, aa, bb = cons[:, 0], cons[:, 1], cons[:, 2]
    np.testing.assert_allclose(xmx[hh], 0.5 * (xmx[aa] + xmx[bb]),
                               rtol=0, atol=1e-12)
