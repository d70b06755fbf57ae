"""Shared test utilities: Jacobian-consistency oracle.

The reference's element Jacobians are the exact analytic derivatives of its
RHS almost everywhere (SURVEY.md section 2.4), so for each model we can
verify the transcribed 25/9-block Jacobian against jax autodiff of the
transcribed RHS:  K(u) == 2 M - d F(u) / d u,  where M is the mass matrix
(F = M u_old + dt/2 f(u_old),  K = M - dt/2 J,  J = df/du).

This catches any transcription error in either the RHS or the Jacobian,
because the two sides are written from different expressions.

Dense comparisons use node-major dof ordering (dof = node * V + var);
the framework's channel-first device layouts are transposed at this
boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rdcfes_tpu.fem import (
    WeakForm,
    assemble_matrix,
    assemble_vector,
    build_sparsity,
    element_matrices,
    element_vectors,
    geometry_factors,
)


def dense_from_bcsr(values, sp, V):
    """values (V, W, nnz) -> dense (N*V, N*V), node-major."""
    A = np.zeros((sp.n_nodes * V, sp.n_nodes * V))
    vals = np.asarray(values)
    for s in range(sp.nnz):
        r, c = sp.rows[s], sp.cols[s]
        A[r * V : (r + 1) * V, c * V : (c + 1) * V] = vals[:, :, s]
    return A


def assemble_dense(mesh, n_vars, physics, fields, params, u):
    """Assemble (K_dense, F_flat, M_dense, dF_dense) for a model at nodal
    state u (N, V)."""
    sp = build_sparsity(mesh.connectivity, mesh.n_nodes)
    conn = jnp.asarray(mesh.connectivity)
    conn_T = jnp.asarray(mesh.connectivity.T)
    conn_flat = jnp.asarray(mesh.connectivity.T.reshape(-1))
    slots_flat = jnp.asarray(sp.slots_flat_cf())
    phi, JxW, dphi = geometry_factors(jnp.asarray(mesh.coords), conn, mesh.elem_type)

    from rdcfes_tpu.fem.assembly import interpolate_at_qp

    def rhs_flat(u_flat):
        u_T = u_flat.reshape(mesh.n_nodes, n_vars).T
        u_qp, g_qp = interpolate_at_qp(u_T, conn_T, phi, dphi)
        wf = physics(u_qp, g_qp, fields, params)
        Fe = element_vectors(wf, phi, JxW, dphi)
        return assemble_vector(Fe, conn_flat, mesh.n_nodes).T.reshape(-1)

    u_T = jnp.asarray(u).T
    u_qp, g_qp = interpolate_at_qp(u_T, conn_T, phi, dphi)
    wf = physics(u_qp, g_qp, fields, params)
    Ke = element_matrices(wf, phi, JxW, dphi)
    values = assemble_matrix(Ke, slots_flat, sp.nnz)
    K = dense_from_bcsr(values, sp, n_vars)
    F = np.asarray(rhs_flat(jnp.asarray(u).reshape(-1)))

    # mass matrix
    Q, E = JxW.shape
    eyeC = jnp.broadcast_to(
        jnp.eye(n_vars)[:, :, None, None], (n_vars, n_vars, Q, E)
    )
    KeM = element_matrices(WeakForm(C=eyeC), phi, JxW, dphi)
    valsM = assemble_matrix(KeM, slots_flat, sp.nnz)
    M = dense_from_bcsr(valsM, sp, n_vars)

    jac = jax.jacfwd(rhs_flat)(jnp.asarray(u).reshape(-1))
    return K, F, M, np.asarray(jac)


def assemble_extra(mesh, n_vars, extra_wf_fn, fields, params, u):
    """Assemble a dense correction matrix from a WeakForm-producing callable
    (used to encode the reference's deliberate Jacobian deviations)."""
    from rdcfes_tpu.fem.assembly import interpolate_at_qp

    sp = build_sparsity(mesh.connectivity, mesh.n_nodes)
    conn = jnp.asarray(mesh.connectivity)
    conn_T = jnp.asarray(mesh.connectivity.T)
    slots_flat = jnp.asarray(sp.slots_flat_cf())
    phi, JxW, dphi = geometry_factors(jnp.asarray(mesh.coords), conn, mesh.elem_type)
    u_qp, g_qp = interpolate_at_qp(jnp.asarray(u).T, conn_T, phi, dphi)
    wf = extra_wf_fn(u_qp, g_qp, fields, params)
    Ke = element_matrices(wf, phi, JxW, dphi)
    values = assemble_matrix(Ke, slots_flat, sp.nnz)
    return dense_from_bcsr(values, sp, n_vars)


def check_jacobian_consistency(mesh, n_vars, physics, fields, params, u,
                               rtol=1e-12, extra=None):
    """Assert K == 2M - dF/du (+ extra known deviations, e.g. the PIHNA
    K[3][3] missing-production-term quirk or the HCC anomalies).

    Comparison is per (v, w) block with a tolerance relative to that block's
    own magnitude — parameter scales differ by ~1e16 across blocks (e.g.
    cytokine saturation derivatives ~1/Kappa_a vs cell densities ~Kappa_k).
    """
    K, F, M, dF = assemble_dense(mesh, n_vars, physics, fields, params, u)
    expected = 2.0 * M - dF
    if extra is not None:
        expected = expected + extra
    N = mesh.n_nodes
    Kb = K.reshape(N, n_vars, N, n_vars)
    Eb = expected.reshape(N, n_vars, N, n_vars)
    global_atol = 1e-13 * max(np.abs(K).max(), np.abs(expected).max())
    for v in range(n_vars):
        for w in range(n_vars):
            scale = max(np.abs(Eb[:, v, :, w]).max(), np.abs(Kb[:, v, :, w]).max(), 1e-30)
            err = np.abs(Kb[:, v, :, w] - Eb[:, v, :, w]).max()
            assert err <= rtol * scale + global_atol, (
                f"jacobian block ({v},{w}) mismatch: abs {err:.3e}, "
                f"rel {err / scale:.3e}"
            )
    return K, F, M
