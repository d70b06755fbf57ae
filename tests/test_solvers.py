import jax.numpy as jnp
import numpy as np
import pytest

from rdcfes_tpu.fem import (
    WeakForm,
    assemble_matrix,
    assemble_vector,
    build_sparsity,
    element_matrices,
    element_vectors,
    geometry_factors,
    bcsr_matvec,
)
from rdcfes_tpu.mesh import box_tet_mesh
from rdcfes_tpu.solvers import bicgstab, cg, gmres, solve_bcsr


def _dense_from_bcsr(values, sp, V):
    """values (V, W, nnz) -> dense node-major."""
    A = np.zeros((sp.n_nodes * V, sp.n_nodes * V))
    vals = np.asarray(values)
    for s in range(sp.nnz):
        r, c = sp.rows[s], sp.cols[s]
        A[r * V : (r + 1) * V, c * V : (c + 1) * V] = vals[:, :, s]
    return A


@pytest.fixture(scope="module")
def small_system():
    """Mass + Laplace operator (1 var) on a small tet mesh."""
    m = box_tet_mesh(3, 3, 3)
    sp = build_sparsity(m.connectivity, m.n_nodes)
    conn = jnp.asarray(m.connectivity)
    phi, JxW, dphi = geometry_factors(jnp.asarray(m.coords), conn, m.elem_type)
    Q, E = JxW.shape
    one = jnp.ones((1, 1, Q, E))
    wf = WeakForm(C=one, E=0.1 * one)  # M + 0.1 L  (SPD)
    Ke = element_matrices(wf, phi, JxW, dphi)
    values = assemble_matrix(Ke, jnp.asarray(sp.slots_flat_cf()), sp.nnz)
    return m, sp, values, phi, JxW, dphi, conn


def test_mass_matrix_row_sums(small_system):
    """Row sums of the mass matrix = nodal lumped volumes; total = volume."""
    m, sp, values, phi, JxW, dphi, conn = small_system
    wfM = WeakForm(C=jnp.ones((1, 1) + JxW.shape))
    KeM = element_matrices(wfM, phi, JxW, dphi)
    valsM = assemble_matrix(KeM, jnp.asarray(sp.slots_flat_cf()), sp.nnz)
    A = _dense_from_bcsr(valsM, sp, 1)
    np.testing.assert_allclose(A.sum(), 1.0, rtol=1e-12)  # total volume
    assert np.allclose(A, A.T, atol=1e-14)


def test_laplacian_annihilates_linear_fields(small_system):
    """Interior rows of the stiffness matrix applied to a linear field are 0."""
    m, sp, values, phi, JxW, dphi, conn = small_system
    wfL = WeakForm(E=jnp.ones((1, 1) + JxW.shape))
    KeL = element_matrices(wfL, phi, JxW, dphi)
    valsL = assemble_matrix(KeL, jnp.asarray(sp.slots_flat_cf()), sp.nnz)
    u = (1.0 + 2.0 * m.coords[:, 0] - 0.5 * m.coords[:, 1])[None, :]
    y = np.asarray(
        bcsr_matvec(valsL, jnp.asarray(sp.rows), jnp.asarray(sp.cols),
                    jnp.asarray(u), sp.n_nodes)
    )
    boundary_nodes = set(np.asarray(m.boundary_faces).ravel().tolist())
    interior = np.array([n for n in range(m.n_nodes) if n not in boundary_nodes])
    assert len(interior) > 0
    np.testing.assert_allclose(y[0, interior], 0.0, atol=1e-12)


@pytest.mark.parametrize("method", ["bicgstab", "cg", "gmres"])
def test_krylov_matches_dense(small_system, method):
    m, sp, values, phi, JxW, dphi, conn = small_system
    rng = np.random.default_rng(42)
    b = jnp.asarray(rng.standard_normal((1, sp.n_nodes)))
    res = solve_bcsr(values, sp, b, method=method, rtol=1e-13, maxiter=2000)
    A = _dense_from_bcsr(values, sp, 1)
    x_dense = np.linalg.solve(A, np.asarray(b).ravel())
    np.testing.assert_allclose(np.asarray(res.x).ravel(), x_dense, rtol=1e-8, atol=1e-10)
    assert float(res.residual) < 1e-12


def test_block_system_5vars():
    """5-variable coupled block system (PIHNA-sized blocks) vs dense solve."""
    m = box_tet_mesh(2, 2, 2)
    sp = build_sparsity(m.connectivity, m.n_nodes)
    conn = jnp.asarray(m.connectivity)
    phi, JxW, dphi = geometry_factors(jnp.asarray(m.coords), conn, m.elem_type)
    Q, E = JxW.shape
    rng = np.random.default_rng(3)
    V = 5
    # mass blocks on the diagonal + small random couplings: well conditioned
    C = 0.05 * rng.standard_normal((V, V, 1, 1)) * np.ones((V, V, Q, E))
    C[np.arange(V), np.arange(V)] += 1.0
    wf = WeakForm(C=jnp.asarray(C), E=0.01 * jnp.asarray(np.eye(V))[:, :, None, None] * jnp.ones((V, V, Q, E)))
    Ke = element_matrices(wf, phi, JxW, dphi)
    values = assemble_matrix(Ke, jnp.asarray(sp.slots_flat_cf()), sp.nnz)
    b = jnp.asarray(rng.standard_normal((V, sp.n_nodes)))
    res = solve_bcsr(values, sp, b, method="bicgstab", rtol=1e-13)
    A = _dense_from_bcsr(values, sp, V)
    # dense node-major flatten of the channel-first solution
    x_nm = np.asarray(res.x).T.ravel()
    x_dense = np.linalg.solve(A, np.asarray(b).T.ravel())
    np.testing.assert_allclose(x_nm, x_dense, rtol=1e-7, atol=1e-9)


def test_left_preconditioned_solve_penalty_scaled_rows():
    """Regression for the solid Newton stall on fine meshes: with penalty-BC
    rows ~1e8x larger than interior rows, a raw-residual criterion stalls;
    the left-preconditioned iteration (solvers/newton.py linear stage)
    converges.  Verified against a dense solve."""
    import jax.numpy as jnp

    from rdcfes_tpu.fem.assembly import build_sparsity
    from rdcfes_tpu.fem.bcsr import bcsr_matvec
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.solvers.krylov import (
        apply_block_jacobi, bicgstab, block_jacobi_inverse)

    mesh = box_tet_mesh(4, 4, 4)
    sp = build_sparsity(mesh.connectivity, mesh.n_nodes)
    rng = np.random.default_rng(3)
    n = sp.n_nodes
    # SPD-ish graph Laplacian + diagonal dominance, then penalty-scale the
    # rows of the boundary nodes by 1e8 (what penalty Dirichlet BCs do)
    values = np.zeros((1, 1, sp.nnz))
    values[0, 0] = rng.random(sp.nnz) * 0.1
    deg = np.zeros(n)
    np.add.at(deg, sp.rows, values[0, 0])
    values[0, 0, sp.diag_slots] = deg[0:n] + 1.0
    bnodes = np.unique(mesh.boundary_faces)
    scale = np.ones(n)
    scale[bnodes] = 1e8
    values[0, 0] *= scale[sp.rows]
    values = jnp.asarray(values)
    b = jnp.asarray(rng.standard_normal((1, n)))

    rows = jnp.asarray(sp.rows)
    cols = jnp.asarray(sp.cols)
    matvec = lambda x: bcsr_matvec(values, rows, cols, x, n_nodes=n)
    Dinv = block_jacobi_inverse(values, jnp.asarray(sp.diag_slots))
    M = lambda r: apply_block_jacobi(Dinv, r)
    res = bicgstab(lambda y: M(matvec(y)), M(b), rtol=1e-12, maxiter=2000)
    A = np.zeros((n, n))
    A[sp.rows, sp.cols] = np.asarray(values)[0, 0]
    x_ref = np.linalg.solve(A, np.asarray(b).ravel())
    np.testing.assert_allclose(np.asarray(res.x).ravel(), x_ref,
                               rtol=1e-8, atol=1e-12 * np.abs(x_ref).max())


def test_refine_mixed_f64_fallback():
    """The mixed-precision refinement rescues itself with an f64 solve
    when the f32 inner sweeps stagnate (advection-dominated operators /
    extreme conditioning — the reference's f64 PETSc KSP converges there,
    so silent non-convergence would be a behavioral regression; caught
    live on a mixed-mesh ADPM case where step 1 returned residual 0.3)."""
    import jax

    from rdcfes_tpu.models.hcc import hcc_physics
    from rdcfes_tpu.systems import TransientRDCSystem

    sys_ = TransientRDCSystem(box_tet_mesh(2, 2, 2), 3, hcc_physics,
                              precision="mixed")

    rng = np.random.default_rng(0)
    n = 64
    # strongly non-normal triangular operator with 1e7 diagonal range:
    # f32 BiCGStab stalls around cond * eps_f32 ~ 1e-1 relative
    A = np.triu(0.5 * rng.standard_normal((n, n)))
    A[np.diag_indices(n)] = np.logspace(0, 7, n)
    x_true = rng.standard_normal(n)
    b = A @ x_true
    A64, b64 = jnp.asarray(A), jnp.asarray(b)
    A32 = A64.astype(jnp.float32)
    mv64 = lambda x: A64 @ x
    mv32 = lambda x: A32 @ x

    x, iters, res = jax.jit(
        lambda: sys_._refine_mixed(mv32, mv64, b64, jnp.zeros(n),
                                   f64_fallback=True))()
    assert float(res) < 1e-10
    # forward error is bounded by cond * residual (~1e-3 here); check the
    # residual identity instead of the ill-conditioned solution itself
    rr = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert rr < 1e-9, rr

    # without the fallback the same refinement stalls — this guards the
    # test itself against the operator being accidentally easy
    _, _, res0 = jax.jit(
        lambda: sys_._refine_mixed(mv32, mv64, b64, jnp.zeros(n)))()
    assert float(res0) > 1e-8
