"""Solid load-step oracle: nested-loop NumPy Newton on HEX8.

Independent single-core stand-in for the reference's solid stack
(src/solid_system.C:146-392: element loop -> calculate_stress at every
quadrature point -> B^T D B material + geometric stiffness -> penalty BC
faces -> NewtonSolver/KSP) built for BASELINE TIMING (bench.py's
solid_vs_baseline) and cross-checks.  Constitutive math is
`hyperelastic_numpy.calculate_stress`, the line-for-line transcription of
hyperlastic_inline.h; assembly is a plain Python element loop with scipy
sparse matrices — the same algorithmic class (and similar per-element
cost) as the reference's per-element C++ assembly.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .hyperelastic_numpy import calculate_stress

_VOIGT = ((0, 0), (1, 1), (2, 2), (0, 1), (1, 2), (0, 2))


def _hex8_tab():
    import sys

    sys.path.insert(0, "/root/repo")
    from rdcfes_tpu.fem import elements

    phi, dN, w = elements.tabulate("HEX8")
    psi, dN2, w2 = elements.tabulate("QUAD4")
    return phi, dN, w, psi, dN2, w2


class SolidOracle:
    """One pseudo-time load step (Newton to equilibrium), HEX8 mesh."""

    def __init__(self, mesh, young=1.0e3, poisson=0.3, penalty=1.0e6,
                 bcs=None):
        self.mesh = mesh
        self.young, self.poisson, self.penalty = young, poisson, penalty
        self.phi, self.dN, self.w, self.psi, self.dN2, self.w2 = _hex8_tab()
        self.X0 = np.asarray(mesh.coords)
        self.conn = np.asarray(mesh.connectivity)
        self.N = mesh.n_nodes
        # boundary faces for penalty BCs {boundary_id: (ux, uy, uz), NaN=free}
        self.bcs = bcs or {}
        self.bc_faces = []
        for bid, disp in self.bcs.items():
            sel = np.asarray(mesh.boundary_id) == bid
            for f in np.asarray(mesh.boundary_faces)[sel]:
                self.bc_faces.append((f, np.asarray(disp, float)))

    # ------------------------------------------------------------------
    def assemble(self, x, pseudo_time):
        N = self.N
        trip_r, trip_c, trip_v = [], [], []
        R = np.zeros(3 * N)
        Q = self.phi.shape[0]
        Fp = np.eye(3)
        A = np.zeros(3)
        for e in range(self.conn.shape[0]):
            nodes = self.conn[e]
            Xe = x[nodes]          # current (K, 3)
            X0e = self.X0[nodes]   # undeformed
            Ke = np.zeros((24, 24))
            Fe_ = np.zeros(24)
            for q in range(Q):
                J = Xe.T @ self.dN[q]            # dx/dxi (3, 3)
                Jinv = np.linalg.inv(J)
                dphi = self.dN[q] @ Jinv         # (K, 3) grads wrt x
                JxW = abs(np.linalg.det(J)) * self.w[q]
                grad_X = X0e.T @ dphi            # dX0/dx (3, 3)
                F = np.linalg.inv(grad_X)        # dx/dX0
                sigma, tang = calculate_stress(
                    F, Fp, A, self.young, self.poisson, 0.0,
                    calculate_tangent=True)
                # residual: internal forces
                for i in range(8):
                    Fe_[3 * i:3 * i + 3] += JxW * (sigma @ dphi[i])
                # material stiffness B^T tang B + geometric stiffness
                B = np.zeros((6, 24))
                for i in range(8):
                    gx, gy, gz = dphi[i]
                    B[0, 3 * i] = gx
                    B[1, 3 * i + 1] = gy
                    B[2, 3 * i + 2] = gz
                    B[3, 3 * i] = gy
                    B[3, 3 * i + 1] = gx
                    B[4, 3 * i + 1] = gz
                    B[4, 3 * i + 2] = gy
                    B[5, 3 * i] = gz
                    B[5, 3 * i + 2] = gx
                Ke += JxW * (B.T @ tang @ B)
                G = dphi @ sigma @ dphi.T        # (8, 8)
                for i in range(8):
                    for j in range(8):
                        Ke[3 * i, 3 * j] += JxW * G[i, j]
                        Ke[3 * i + 1, 3 * j + 1] += JxW * G[i, j]
                        Ke[3 * i + 2, 3 * j + 2] += JxW * G[i, j]
            dof = (3 * nodes[:, None] + np.arange(3)).ravel()
            R[dof] += Fe_
            trip_r.append(np.repeat(dof, 24))
            trip_c.append(np.tile(dof, 24))
            trip_v.append(Ke.ravel())

        # penalty Dirichlet faces (solid_system.C:273-371)
        ratio = pseudo_time * 1.000001
        Qf = self.psi.shape[0]
        for f, disp in self.bc_faces:
            Xf = x[f]
            X0f = self.X0[f]
            mask = ~np.isnan(disp)
            target = np.nan_to_num(disp) * ratio
            for q in range(Qf):
                T = Xf.T @ self.dN2[q]            # (3, 2) tangents
                n = np.cross(T[:, 0], T[:, 1])
                JxWf = np.linalg.norm(n) * self.w2[q]
                xyz = self.psi[q] @ Xf
                orig = self.psi[q] @ X0f
                diff = (xyz - orig - target) * mask
                for i in range(4):
                    dof = 3 * f[i] + np.arange(3)
                    R[dof] += self.penalty * JxWf * self.psi[q, i] * diff
                    for j in range(4):
                        pen = (self.penalty * JxWf
                               * self.psi[q, i] * self.psi[q, j])
                        for v in range(3):
                            if mask[v]:
                                trip_r.append(np.array([3 * f[i] + v]))
                                trip_c.append(np.array([3 * f[j] + v]))
                                trip_v.append(np.array([pen]))
        K = sp.coo_matrix(
            (np.concatenate(trip_v),
             (np.concatenate(trip_r), np.concatenate(trip_c))),
            shape=(3 * N, 3 * N)).tocsr()
        return R, K

    # ------------------------------------------------------------------
    def load_step(self, x0, pseudo_time, rel_tol=1e-6, max_newton=20):
        """Newton to equilibrium at the given pseudo-time; returns
        (x, n_iters, |R|)."""
        x = x0.copy()
        R, K = self.assemble(x, pseudo_time)
        r0 = np.linalg.norm(R) or 1.0
        for k in range(max_newton):
            rnorm = np.linalg.norm(R)
            if rnorm / r0 <= rel_tol:
                return x, k, rnorm
            dx = spla.spsolve(K, -R)
            x = x + dx.reshape(-1, 3)
            R, K = self.assemble(x, pseudo_time)
        return x, max_newton, np.linalg.norm(R)
