"""ADPM step oracle: independent NumPy/scipy transcription of adpm.C.

Second, independent transcription of the reference ADPM assembly
(reference src/adpm.C:324-652), its response functions
(src/utils.h:100-187) and the linearized-CN step — scipy.sparse CSR
(dof = var*N + node), SuperLU direct solve, per-step nonnegativity clamp
(src/adpm.C:654-688).  Shares no code with rdcfes_tpu; same quadrature
contract as the PIHNA oracle (see pihna_numpy.py).

The reference's Jacobian keeps only the terms of src/adpm.C:532-591 —
notably NO Ke[1][2]/Ke[2][1] blocks and no derivatives of the tract gating
or of the Pi_ pulse gates (piecewise-constant a.e.) — transcribed as-is.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .pihna_numpy import _DN, _PHI, _QW


# ---- response functions (src/utils.h:100-187), fresh transcription ------
def _pi(C, p):
    cM, c0, c1 = p
    if cM <= 0.0:
        return np.zeros_like(C)
    return np.where((C >= c0) & (C < c1), cM, 0.0)


def _sd(C, p):
    cM, c0, c1 = p
    if cM <= 0.0:
        return np.zeros_like(C)
    return np.where(C < c0, cM,
                    np.where(C < c1, cM * (c1 - C) / (c1 - c0), 0.0))


def _dsd(C, p):
    cM, c0, c1 = p
    if cM <= 0.0:
        return np.zeros_like(C)
    return np.where((C >= c0) & (C < c1), -cM / (c1 - c0), 0.0)


def _tr(C, p):
    cM, c0, c1, c2, c3 = p
    if cM <= 0.0:
        return np.zeros_like(C)
    return np.where(
        C < c0, 0.0,
        np.where(C < c1, cM * (C - c0) / (c1 - c0),
                 np.where(C < c2, cM,
                          np.where(C < c3, cM * (c3 - C) / (c3 - c2), 0.0))))


def _dtr(C, p):
    cM, c0, c1, c2, c3 = p
    if cM <= 0.0:
        return np.zeros_like(C)
    return np.where(
        C < c0, 0.0,
        np.where(C < c1, cM / (c1 - c0),
                 np.where(C < c2, 0.0,
                          np.where(C < c3, -cM / (c3 - c2), 0.0))))


class AdpmOracle:
    """One linearized-CN ADPM step on a TET4 mesh, scipy-assembled.

    `tracts` is the (E, 3) per-element fibre field (the reference samples
    the elemental Tracts system at dof 0, src/adpm.C:453-458).  Parameter
    names follow rdcfes_tpu's flat deck mapping purely for test-harness
    convenience; formulas are from the C source."""

    def __init__(self, coords, conn, tracts, params):
        self.coords = np.asarray(coords, dtype=np.float64)
        self.conn = np.asarray(conn, dtype=np.int64)
        assert self.conn.shape[1] == 4, "oracle supports TET4 only"
        self.tracts = np.asarray(tracts, dtype=np.float64)
        self.N = self.coords.shape[0]
        self.E = self.conn.shape[0]
        self.p = dict(params)

        X = self.coords[self.conn]
        J = np.einsum("ki,ekd->eid", _DN, X)
        detJ = np.linalg.det(J)
        Jinv = np.linalg.inv(J)
        self.dphi = np.einsum("ki,edi->ekd", _DN, Jinv)  # (E, 4, 3)
        self.JxW = np.abs(detJ)[:, None] * _QW[None, :]  # (E, Q)

        K = 4
        rows = np.empty((self.E, 3, K, 3, K), dtype=np.int64)
        cols = np.empty_like(rows)
        for vi in range(3):
            for vj in range(3):
                rows[:, vi, :, vj, :] = vi * self.N + self.conn[:, :, None]
                cols[:, vi, :, vj, :] = vj * self.N + self.conn[:, None, :]
        self._rows = rows.ravel()
        self._cols = cols.ravel()

    # ------------------------------------------------------------------
    def assemble(self, u_old: np.ndarray, time: float):
        p = self.p
        DT2 = p["dt"] / 2.0
        gamma = p["decay_PrP_time_exponent"]
        decay_PrP = (p["decay_PrP"] * time**gamma,
                     p["decay_PrP_pulse0"], p["decay_PrP_pulse1"])
        tri = lambda s: (p[s], p[s + "_pulse0"], p[s + "_pulse1"])
        sig = lambda s: (p[s], p[s + "_s0"], p[s + "_s1"])
        tz = lambda s: (p[s], p[s + "_t0"], p[s + "_t1"], p[s + "_t2"],
                        p[s + "_t3"])
        diffuse_Ab, taxis1_Ab, taxis2_Ab = (tri("diffuse_A_b"),
                                            tri("taxis1_A_b"),
                                            tri("taxis2_A_b"))
        produce_Ab, transform_Ab = sig("produce_A_b"), tz("transform_A_b")
        decay_Ab = tri("decay_A_b")
        diffuse_Ta, taxis1_Ta, taxis2_Ta = (tri("diffuse_Tau"),
                                            tri("taxis1_Tau"),
                                            tri("taxis2_Tau"))
        produce_Ta, transform_Ta = sig("produce_Tau"), tz("transform_Tau")
        decay_Ta = tri("decay_Tau")
        omega_Ab, omega_Ta = p["omega_A_b"], p["omega_Tau"]

        conn = self.conn
        E, N, K, Q = self.E, self.N, 4, len(_QW)
        ue = u_old[conn]  # (E, 4, 3)
        u_qp = np.einsum("ekv,qk->veq", ue, _PHI)        # (3, E, Q)
        g = np.einsum("ekv,ekd->ved", ue, self.dphi)     # (3, E, 3)
        PrP, Ab, Ta = u_qp
        GAb = np.broadcast_to(g[1][:, None, :], (E, Q, 3))
        GTa = np.broadcast_to(g[2][:, None, :], (E, Q, 3))
        tracts = np.broadcast_to(self.tracts[:, None, :], (E, Q, 3))

        # tract gating (src/adpm.C:473-492): +/- tract when the unit
        # gradient aligns within the tolerance cosine, zero otherwise or
        # when the gradient vanishes
        def gate(G, omega):
            norm = np.linalg.norm(G, axis=-1, keepdims=True)
            unit = np.where(norm > 0.0, G / np.where(norm == 0, 1, norm), 0.0)
            d = (unit * tracts).sum(-1, keepdims=True)
            t = np.where(d > omega, tracts,
                         np.where(d < -omega, -tracts, 0.0))
            return np.where(norm > 0.0, t, 0.0)

        tract_Ab = gate(GAb, omega_Ab)
        tract_Ta = gate(GTa, omega_Ta)

        # coefficients at qp, all (E, Q)
        PrPq, Abq, Taq = PrP, Ab, Ta
        Tr_Ab, Tr_Ta = _tr(Abq, transform_Ab), _tr(Taq, transform_Ta)
        dTr_Ab, dTr_Ta = _dtr(Abq, transform_Ab), _dtr(Taq, transform_Ta)
        SD_Ab, SD_Ta = _sd(Abq, produce_Ab), _sd(Taq, produce_Ta)
        dSD_Ab, dSD_Ta = _dsd(Abq, produce_Ab), _dsd(Taq, produce_Ta)
        Pi_dec_P = _pi(PrPq, decay_PrP)
        Pi_dec_Ab, Pi_dec_Ta = _pi(Abq, decay_Ab), _pi(Taq, decay_Ta)
        Pi_dif_Ab, Pi_dif_Ta = _pi(Abq, diffuse_Ab), _pi(Taq, diffuse_Ta)
        Pi_t1_Ab, Pi_t2_Ab = _pi(Abq, taxis1_Ab), _pi(Taq, taxis2_Ab)
        Pi_t1_Ta, Pi_t2_Ta = _pi(Taq, taxis1_Ta), _pi(Abq, taxis2_Ta)

        JxW = self.JxW
        one = np.ones_like(PrPq)

        # mass coefficients m[i][j] (E, Q): coeff * phi_j * phi_i
        z = np.zeros_like(PrPq)
        m = [[z] * 3 for _ in range(3)]
        m[0][0] = one - DT2 * (-Tr_Ab - Tr_Ta - Pi_dec_P)
        m[0][1] = -DT2 * (-dTr_Ab * PrPq)
        m[0][2] = -DT2 * (-dTr_Ta * PrPq)
        m[1][0] = -DT2 * Tr_Ab
        m[1][1] = one - DT2 * (SD_Ab + dSD_Ab * Abq + dTr_Ab * PrPq
                               - Pi_dec_Ab)
        m[2][0] = -DT2 * Tr_Ta
        m[2][2] = one - DT2 * (SD_Ta + dSD_Ta * Taq + dTr_Ta * PrPq
                               - Pi_dec_Ta)

        # advection coefficients a[i][j] (E, Q, 3): vec . dphi_i * phi_j
        adv = [[None] * 3 for _ in range(3)]
        adv[1][1] = -DT2 * (-Pi_t1_Ab[..., None] * tract_Ab
                            + Pi_t2_Ab[..., None] * tract_Ta)
        adv[2][2] = -DT2 * (-Pi_t1_Ta[..., None] * tract_Ta
                            + Pi_t2_Ta[..., None] * tract_Ab)

        # diffusion coefficients d[i][j] (E, Q): coeff * dphi_j . dphi_i
        dif = [[None] * 3 for _ in range(3)]
        dif[1][1] = -DT2 * (-Pi_dif_Ab)
        dif[2][2] = -DT2 * (-Pi_dif_Ta)

        # RHS (src/adpm.C:497-530)
        f = [
            PrPq + DT2 * (-Tr_Ab * PrPq - Tr_Ta * PrPq - Pi_dec_P * PrPq),
            Abq + DT2 * (SD_Ab * Abq + Tr_Ab * PrPq - Pi_dec_Ab * Abq),
            Taq + DT2 * (SD_Ta * Taq + Tr_Ta * PrPq - Pi_dec_Ta * Taq),
        ]
        fg = [
            None,
            DT2 * (-Pi_dif_Ab[..., None] * GAb
                   - (Pi_t1_Ab * Abq)[..., None] * tract_Ab
                   + (Pi_t2_Ab * Abq)[..., None] * tract_Ta),
            DT2 * (-Pi_dif_Ta[..., None] * GTa
                   - (Pi_t1_Ta * Taq)[..., None] * tract_Ta
                   + (Pi_t2_Ta * Taq)[..., None] * tract_Ab),
        ]

        PP = np.einsum("qi,qj->qij", _PHI, _PHI)
        GG = np.einsum("eid,ejd->eij", self.dphi, self.dphi)
        Ke = np.zeros((E, 3, K, 3, K))
        Fe = np.zeros((E, 3, K))
        for vi in range(3):
            Fe[:, vi, :] += np.einsum("eq,qi->ei", JxW * f[vi], _PHI)
            if fg[vi] is not None:
                Fe[:, vi, :] += np.einsum(
                    "eqd,eid->ei", JxW[..., None] * fg[vi], self.dphi)
            for vj in range(3):
                blk = np.einsum("eq,qij->eij", JxW * m[vi][vj], PP)
                if adv[vi][vj] is not None:
                    blk += np.einsum(
                        "eqd,eid,qj->eij",
                        JxW[..., None] * adv[vi][vj], self.dphi, _PHI)
                if dif[vi][vj] is not None:
                    blk += np.einsum("eq,eij->eij", JxW * dif[vi][vj], GG)
                Ke[:, vi, :, vj, :] += blk

        Kmat = sp.coo_matrix(
            (Ke.ravel(), (self._rows, self._cols)), shape=(3 * N, 3 * N)
        ).tocsr()
        F = np.zeros(3 * N)
        np.add.at(
            F,
            (np.arange(3)[None, :, None] * N + conn[:, None, :]).ravel(),
            Fe.ravel(),
        )
        return Kmat, F

    # ------------------------------------------------------------------
    def step(self, u_old: np.ndarray, time: float, solver: str = "direct"):
        """Assemble at u_old, solve, clamp >= 0 (src/adpm.C:654-688).

        solver="jacobi-bicgstab" is the Krylov path used for wall-clock
        baseline measurement — same solver class as the reference's PETSc
        KSP (see pihna_numpy.PihnaOracle.step)."""
        Kmat, F = self.assemble(u_old, time)
        if solver == "direct":
            x = spla.spsolve(Kmat, F)
        elif solver == "jacobi-bicgstab":
            d = Kmat.diagonal()
            d = np.where(d == 0.0, 1.0, d)
            M = spla.LinearOperator(Kmat.shape, lambda r: r / d)
            x, info = spla.bicgstab(Kmat, F, M=M, rtol=1e-10, atol=0.0,
                                    maxiter=2000)
            if info != 0:
                x = spla.spsolve(Kmat, F)
        else:
            raise ValueError(solver)
        u_raw = x.reshape(3, self.N).T
        return np.maximum(u_raw, 0.0), u_raw
