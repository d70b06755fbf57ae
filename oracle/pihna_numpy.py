"""PIHNA step oracle: independent NumPy/scipy transcription of pihna.C.

This file is a SECOND, independent transcription of the reference PIHNA
assembly (reference src/pihna.C:318-758), its linearized-CN time step
(src/pihna.C:66-93) and post-solve clamp (src/pihna.C:760-803).  It shares
no code with rdcfes_tpu: geometry, quadrature, the 5 RHS blocks and the 25
Jacobian blocks below were written from the C source directly, block by
block, in the same i/j/block structure.  The global system is assembled as
a scipy.sparse CSR matrix (dof = var*N + node) and solved with SuperLU
(direct) — so a disagreement with rdcfes_tpu localizes a transcription or
solver error on one of the two sides.

Quadrature: libMesh QGauss(3, THIRD) on TET4 = the standard 5-point
degree-3 Keast rule (centroid weight -2/15, four points at
(1/6,1/6,1/6)-type positions with weight 3/40, reference volume 1/6).
Both sides must use the same rule: the coefficients (Tau, Ve, Ua,
thresholds) are non-polynomial, so the sampled qp set is part of the
numerical contract.

Documented deviation shared with rdcfes_tpu (models/pihna.py): the
reference computes Ve = v/(c+h+v) by raw division (src/pihna.C:477), NaN
when the denominator is zero; both implementations return the physical
limit Ve = 0 there instead.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

# 5-point degree-3 rule on the reference tetrahedron (volume 1/6)
_QP = np.array(
    [
        [0.25, 0.25, 0.25],
        [1 / 6, 1 / 6, 1 / 6],
        [1 / 6, 1 / 6, 0.5],
        [1 / 6, 0.5, 1 / 6],
        [0.5, 1 / 6, 1 / 6],
    ]
)
_QW = np.array([-2 / 15, 3 / 40, 3 / 40, 3 / 40, 3 / 40])
# P1 barycentric shape functions at the quadrature points: (Q, 4)
_PHI = np.stack(
    [1 - _QP[:, 0] - _QP[:, 1] - _QP[:, 2], _QP[:, 0], _QP[:, 1], _QP[:, 2]],
    axis=1,
)
# reference-coordinate gradients (4, 3) — constant on the tet
_DN = np.array(
    [[-1.0, -1.0, -1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
)


class PihnaOracle:
    """One linearized-CN PIHNA step on a TET4 mesh, assembled with scipy.

    Parameters use the same flat names as rdcfes_tpu's deck loader
    (necrosis_* already divided by Kappa_k, matching src/pihna.C:364-366),
    purely so both implementations can be driven from one dict; every
    formula below is transcribed from the C source.
    """

    def __init__(self, coords: np.ndarray, conn: np.ndarray, params: dict):
        self.coords = np.asarray(coords, dtype=np.float64)
        self.conn = np.asarray(conn, dtype=np.int64)
        assert self.conn.shape[1] == 4, "oracle supports TET4 only"
        self.N = self.coords.shape[0]
        self.E = self.conn.shape[0]
        self.p = dict(params)

        # per-element geometry: Jacobian J[e] = dX/dxi (3,3) from vertex
        # coordinates; physical shape gradients dphi[e,k,:] = _DN @ J^-1
        X = self.coords[self.conn]  # (E, 4, 3)
        J = np.einsum("ki,ekd->eid", _DN, X)  # J[e,i,d] = dx_d/dxi_i
        detJ = np.linalg.det(J)
        Jinv = np.linalg.inv(J)  # Jinv[e,d,i] = dxi_i/dx_d ... as inv of J
        # dphi/dx_d = sum_i dN/dxi_i * dxi_i/dx_d; with J[i,d] = dx_d/dxi_i
        # the x->xi derivative matrix is inv(J)[d,i]
        self.dphi = np.einsum("ki,edi->ekd", _DN, Jinv)  # (E, 4, 3)
        # JxW[e,q] = |detJ| * w_q  (libMesh JxW is positive for valid elems)
        self.JxW = np.abs(detJ)[:, None] * _QW[None, :]  # (E, Q)

        # global COO pattern for the 5x5 nodal blocks: dof = var*N + node
        K = 4
        rows = np.empty((self.E, 5, K, 5, K), dtype=np.int64)
        cols = np.empty_like(rows)
        for vi in range(5):
            for vj in range(5):
                rows[:, vi, :, vj, :] = (
                    vi * self.N + self.conn[:, :, None]
                )
                cols[:, vi, :, vj, :] = (
                    vj * self.N + self.conn[:, None, :]
                )
        self._rows = rows.ravel()
        self._cols = cols.ravel()

    # ------------------------------------------------------------------
    def _coefficients(self, u_qp):
        """Per-qp coefficient set (src/pihna.C:444-509).  u_qp: (5, E, Q)."""
        p = self.p
        n_o, c_o, h_o, v_o, a_o = u_qp
        Kk = p["cells_max_capacity"]
        ek = p["cells_max_capacity_exponent"]
        Ka = p["cytokines_max_capacity"]
        Lk = p["cells_min_capacity"]

        # crowding factor Tau (src/pihna.C:444-472)
        Te = (n_o + c_o + h_o + v_o) / Kk
        interior = (Te > 0.0) & (Te < 1.0)
        base = np.where(interior, 1.0 - Te, 1.0)
        Tau = np.where(Te <= 0.0, 1.0, np.where(interior, base**ek, 0.0))
        Tau_d = np.where(interior, (-ek / Kk) * base ** (ek - 1.0), 0.0)

        # vascular fraction Ve (src/pihna.C:474-499); guarded division is
        # the documented deviation (reference raw-divides, NaN at sum==0)
        s = c_o + h_o + v_o
        safe = np.where(s == 0.0, 1.0, s)
        Ve_ = v_o / safe
        vint = (Ve_ > 0.0) & (Ve_ < 1.0)
        Ve = np.clip(Ve_, 0.0, 1.0)
        Ve_dch = np.where(vint, -Ve_ / safe, 0.0)
        Ve_dv = np.where(vint, (1.0 - Ve_) / safe, 0.0)

        # angiogenic saturation Ua (src/pihna.C:501-502)
        Ua = a_o / (a_o + Ka)
        Ua_da = 1.0 / (a_o + Ka) - Ua / (a_o + Ka)

        # threshold gating (src/pihna.C:504-509)
        dif_c = np.where(c_o > Lk, p["diffuse_c"], 0.0)
        tax_c = np.where(c_o > Lk, p["taxis_c"], 0.0)
        dif_h = np.where(h_o > Lk, p["diffuse_h"], 0.0)
        tax_h = np.where(h_o > Lk, p["taxis_h"], 0.0)
        dif_v = np.where(v_o > Lk, p["diffuse_v"], 0.0)
        tax_v = np.where(v_o > Lk, p["taxis_v"], 0.0)
        return (Tau, Tau_d, Ve, Ve_dch, Ve_dv, Ua, Ua_da,
                dif_c, tax_c, dif_h, tax_h, dif_v, tax_v)

    # ------------------------------------------------------------------
    def assemble(self, u_old: np.ndarray):
        """(K, F) of the linearized-CN step from u_old (N, 5)."""
        p = self.p
        DT2 = p["dt"] / 2.0
        nec_c, nec_h, nec_v = p["necrosis_c"], p["necrosis_h"], p["necrosis_v"]
        pro_c, pro_v = p["produce_c"], p["produce_v"]
        s_c2h, s_h2c, s_h2n = p["switch_c2h"], p["switch_h2c"], p["switch_h2n"]
        sec_c, sec_h = p["secrete_a_c"], p["secrete_a_h"]
        upt_v, dec_a = p["uptake_a_v"], p["decay_a"]

        conn = self.conn
        E, N, K, Q = self.E, self.N, 4, len(_QW)
        ue = u_old[conn]  # (E, 4, 5)
        # qp interpolation: values (5, E, Q) and gradients (5, E, Q, 3)
        u_qp = np.einsum("ekv,qk->veq", ue, _PHI)
        g_qp = np.einsum("ekv,ekd->ved", ue, self.dphi)[:, :, None, :]
        g_qp = np.broadcast_to(g_qp, (5, E, Q, 3))
        n_o, c_o, h_o, v_o, a_o = u_qp
        Gc, Gh, Gv, Ga = g_qp[1], g_qp[2], g_qp[3], g_qp[4]

        (Tau, Tau_d, Ve, Ve_dch, Ve_dv, Ua, Ua_da,
         dif_c, tax_c, dif_h, tax_h, dif_v, tax_v) = self._coefficients(u_qp)

        # test/trial function tables per qp:
        #   phi_i -> _PHI[q, i]; dphi_i -> self.dphi[e, i, :] (q-invariant)
        # integrand pieces are built per (E, Q) then contracted with the
        # (i, j) shape-function tensors below
        JxW = self.JxW  # (E, Q)

        # --- mass-type scalar coefficients m[i-block][j-block] (E, Q) -----
        # K_ij entries of the form coeff * phi_j * phi_i
        one = np.ones_like(Tau)
        zero = np.zeros_like(Tau)
        m = [[zero] * 5 for _ in range(5)]
        # Ke[0][*] (src/pihna.C:571-597)
        m[0][0] = one - DT2 * (nec_c * c_o + nec_h * h_o + nec_v * v_o)
        m[0][1] = -DT2 * (nec_c * n_o + s_h2n * (-Ve_dch) * h_o)
        m[0][2] = -DT2 * (nec_h * n_o + s_h2n * (-Ve_dch) * h_o
                          + s_h2n * (1.0 - Ve))
        m[0][3] = -DT2 * (nec_v * n_o + s_h2n * (-Ve_dv) * h_o)
        # Ke[1][*] mass parts (src/pihna.C:599-641)
        m[1][0] = -DT2 * (pro_c * Tau_d * c_o - nec_c * c_o)
        m[1][1] = one - DT2 * (
            pro_c * Tau + pro_c * Tau_d * c_o
            - s_c2h * (1.0 - Ve) - s_c2h * (-Ve_dch) * c_o
            + s_h2c * Ve_dch * h_o - nec_c * n_o
        )
        m[1][2] = -DT2 * (
            pro_c * Tau_d * c_o - s_c2h * (-Ve_dch) * c_o
            + s_h2c * Ve_dch * h_o + s_h2c * Ve
        )
        m[1][3] = -DT2 * (
            pro_c * Tau_d * c_o - s_c2h * (-Ve_dv) * c_o
            + s_h2c * Ve_dv * h_o
        )
        # Ke[2][*] mass parts (src/pihna.C:643-684)
        m[2][0] = -DT2 * (-nec_h * h_o)
        m[2][1] = -DT2 * (
            s_c2h * (1.0 - Ve) + s_c2h * (-Ve_dch) * c_o
            - s_h2c * Ve_dch * h_o - s_h2n * (-Ve_dch) * h_o
        )
        m[2][2] = one - DT2 * (
            s_c2h * (-Ve_dch) * c_o - s_h2c * Ve_dch * h_o - s_h2c * Ve
            - nec_h * n_o - s_h2n * (-Ve_dch) * h_o - s_h2n * (1.0 - Ve)
        )
        m[2][3] = -DT2 * (
            s_c2h * (-Ve_dv) * c_o - s_h2c * Ve_dv * h_o
            - s_h2n * (-Ve_dv) * h_o
        )
        # Ke[3][*] mass parts (src/pihna.C:686-724); note Ke[3][3] carries
        # only the Tau__dv production derivative — the reference omits the
        # produce_v*Tau*Ua capacity-derivative term its Ke[1][1] analogue
        # has (the documented Ke[3][3] quirk)
        m[3][0] = -DT2 * (pro_v * Tau_d * Ua * v_o - nec_v * v_o)
        m[3][1] = -DT2 * (pro_v * Tau_d * Ua * v_o)
        m[3][2] = -DT2 * (pro_v * Tau_d * Ua * v_o)
        m[3][3] = one - DT2 * (pro_v * Tau_d * Ua * v_o - nec_v * n_o)
        m[3][4] = -DT2 * (pro_v * Tau * Ua_da * v_o)
        # Ke[4][*] (src/pihna.C:726-747); [4][0] is never touched
        m[4][1] = -DT2 * sec_c * one
        m[4][2] = -DT2 * sec_h * one
        m[4][3] = -DT2 * (-upt_v * a_o)
        m[4][4] = one - DT2 * (-upt_v * v_o - dec_a)

        # --- advection-type coefficients a[i][j] (E, Q, 3): entries of the
        # form  vec . dphi_i * phi_j  (test-gradient, trial-value) ---------
        adv = [[None] * 5 for _ in range(5)]
        adv[1][0] = -DT2 * (-(dif_c * Tau_d)[..., None] * Gc
                            - (tax_c * Tau_d * c_o)[..., None] * Gv)
        adv[1][1] = -DT2 * (-(dif_c * Tau_d)[..., None] * Gc
                            - (tax_c * Tau_d * c_o)[..., None] * Gv
                            - (tax_c * Tau)[..., None] * Gv)
        adv[1][2] = -DT2 * (-(dif_c * Tau_d)[..., None] * Gc
                            - (tax_c * Tau_d * c_o)[..., None] * Gv)
        adv[1][3] = -DT2 * (-(dif_c * Tau_d)[..., None] * Gc
                            - (tax_c * Tau_d * c_o)[..., None] * Gv)
        adv[2][0] = -DT2 * (-(dif_h * Tau_d)[..., None] * Gh
                            - (tax_h * Tau_d * h_o)[..., None] * Gv)
        adv[2][1] = -DT2 * (-(dif_h * Tau_d)[..., None] * Gh
                            - (tax_h * Tau_d * h_o)[..., None] * Gv)
        adv[2][2] = -DT2 * (-(dif_h * Tau_d)[..., None] * Gh
                            - (tax_h * Tau_d * h_o)[..., None] * Gv
                            - (tax_h * Tau)[..., None] * Gv)
        adv[2][3] = -DT2 * (-(dif_h * Tau_d)[..., None] * Gh
                            - (tax_h * Tau_d * h_o)[..., None] * Gv)
        adv[3][0] = -DT2 * (-(dif_v * Tau_d)[..., None] * Gv
                            - (tax_v * Tau_d * v_o)[..., None] * Ga)
        adv[3][1] = -DT2 * (-(dif_v * Tau_d)[..., None] * Gv
                            - (tax_v * Tau_d * v_o)[..., None] * Ga)
        adv[3][2] = -DT2 * (-(dif_v * Tau_d)[..., None] * Gv
                            - (tax_v * Tau_d * v_o)[..., None] * Ga)
        adv[3][3] = -DT2 * (-(dif_v * Tau_d)[..., None] * Gv
                            - (tax_v * Tau_d * v_o)[..., None] * Ga
                            - (tax_v * Tau)[..., None] * Ga)

        # --- diffusion-type coefficients d[i][j] (E, Q): entries of the
        # form  coeff * (dphi_j . dphi_i) --------------------------------
        dif = [[None] * 5 for _ in range(5)]
        dif[1][1] = -DT2 * (-dif_c * Tau)
        dif[1][3] = -DT2 * (-tax_c * Tau * c_o)
        dif[2][2] = -DT2 * (-dif_h * Tau)
        dif[2][3] = -DT2 * (-tax_h * Tau * h_o)
        dif[3][3] = -DT2 * (-dif_v * Tau)
        dif[3][4] = -DT2 * (-tax_v * Tau * v_o)

        # --- RHS blocks (src/pihna.C:514-566) ----------------------------
        # f[i] (E, Q) multiplies phi_i; fg[i] (E, Q, 3) multiplies dphi_i
        f = [None] * 5
        fg = [None] * 5
        f[0] = n_o + DT2 * (nec_c * c_o * n_o + nec_h * h_o * n_o
                            + nec_v * v_o * n_o + s_h2n * (1.0 - Ve) * h_o)
        f[1] = c_o + DT2 * (pro_c * Tau * c_o - s_c2h * (1.0 - Ve) * c_o
                            + s_h2c * Ve * h_o - nec_c * c_o * n_o)
        fg[1] = DT2 * (-(dif_c * Tau)[..., None] * Gc
                       - (tax_c * Tau * c_o)[..., None] * Gv)
        f[2] = h_o + DT2 * (s_c2h * (1.0 - Ve) * c_o - s_h2c * Ve * h_o
                            - nec_h * h_o * n_o - s_h2n * (1.0 - Ve) * h_o)
        fg[2] = DT2 * (-(dif_h * Tau)[..., None] * Gh
                       - (tax_h * Tau * h_o)[..., None] * Gv)
        f[3] = v_o + DT2 * (pro_v * Tau * Ua * v_o - nec_v * v_o * n_o)
        fg[3] = DT2 * (-(dif_v * Tau)[..., None] * Gv
                       - (tax_v * Tau * v_o)[..., None] * Ga)
        f[4] = a_o + DT2 * (sec_c * c_o + sec_h * h_o - upt_v * v_o * a_o
                            - dec_a * a_o)

        # --- contract with shape-function tensors -------------------------
        # mass:      sum_q JxW * coeff * phi_j[q] * phi_i[q]
        # advection: sum_q JxW * (vec . dphi_i) * phi_j[q]
        # diffusion: sum_q JxW * coeff * (dphi_j . dphi_i)
        PP = np.einsum("qi,qj->qij", _PHI, _PHI)  # (Q, 4, 4)
        GG = np.einsum("eid,ejd->eij", self.dphi, self.dphi)  # (E, 4, 4)
        Ke = np.zeros((E, 5, K, 5, K))
        Fe = np.zeros((E, 5, K))
        for vi in range(5):
            Fe[:, vi, :] += np.einsum("eq,qi->ei", JxW * f[vi], _PHI)
            if fg[vi] is not None:
                Fe[:, vi, :] += np.einsum(
                    "eqd,eid->ei", JxW[..., None] * fg[vi], self.dphi
                )
            for vj in range(5):
                blk = np.einsum("eq,qij->eij", JxW * m[vi][vj], PP)
                if adv[vi][vj] is not None:
                    blk += np.einsum(
                        "eqd,eid,qj->eij",
                        JxW[..., None] * adv[vi][vj], self.dphi, _PHI,
                    )
                if dif[vi][vj] is not None:
                    blk += np.einsum("eq,eij->eij", JxW * dif[vi][vj], GG)
                Ke[:, vi, :, vj, :] += blk

        Kmat = sp.coo_matrix(
            (Ke.ravel(), (self._rows, self._cols)), shape=(5 * N, 5 * N)
        ).tocsr()
        F = np.zeros(5 * N)
        np.add.at(
            F,
            (np.arange(5)[None, :, None] * N + conn[:, None, :]).ravel(),
            Fe.ravel(),
        )
        return Kmat, F

    # ------------------------------------------------------------------
    def step(self, u_old: np.ndarray, solver: str = "direct"):
        """One step: assemble at u_old, solve, clamp (src/pihna.C:66-93,
        760-803).  Returns (u_new (N,5), u_raw (N,5))."""
        Kmat, F = self.assemble(u_old)
        if solver == "direct":
            x = spla.spsolve(Kmat, F)
        elif solver == "jacobi-bicgstab":
            # Krylov path for wall-clock baseline measurements: the same
            # solver class as the reference's PETSc KSP.  Jacobi scaling
            # handles the deck's ~13-orders-of-magnitude variable scales
            # (cells ~ 2.4e5 vs cytokines ~ 1e-8), where ILU pivots vanish.
            d = Kmat.diagonal()
            d = np.where(d == 0.0, 1.0, d)
            M = spla.LinearOperator(Kmat.shape, lambda r: r / d)
            x, info = spla.bicgstab(Kmat, F, M=M, rtol=1e-10, atol=0.0,
                                    maxiter=2000)
            if info != 0:
                x = spla.spsolve(Kmat, F)
        else:
            raise ValueError(solver)
        u_raw = x.reshape(5, self.N).T
        u_new = np.maximum(u_raw, 0.0)
        return u_new, u_raw
