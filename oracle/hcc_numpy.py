"""Coupled-HCC RDC-step oracle: independent transcription of coupled_hcc.C.

Second, independent transcription of the reference HCC assembly
(reference src/coupled_hcc.C:414-649) — the transport system of the
coupled RDC/solid driver — with its KNOWN ANOMALIES transcribed exactly:

  * Ke[0][1], Ke[0][2] and Ke[1][0] each carry a spurious
    `phi_j * phi_i` capacity term (src/coupled_hcc.C:577-597)
  * Ke[1][1] is accumulated TWICE (the second accumulation at :611 looks
    intended as Ke[1][2]): the [1][1] block receives a doubled capacity
    term plus both DT_2 bundles, and [1][2] stays empty
  * the mechanotaxis GRAD_sigma is identically zero (src/coupled_hcc.C:508)

Geometry is rebuilt from caller-supplied coordinates each call because
the coupled driver assembles on the CURRENT deformed configuration
(src/coupled_hcc.C:114 via fe->reinit on the moved mesh).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .pihna_numpy import _DN, _PHI, _QW


class HccOracle:
    """One linearized-CN HCC transport step on a TET4 mesh."""

    def __init__(self, conn, params):
        self.conn = np.asarray(conn, dtype=np.int64)
        assert self.conn.shape[1] == 4, "oracle supports TET4 only"
        self.N = int(self.conn.max()) + 1
        self.E = self.conn.shape[0]
        self.p = dict(params)

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
    def assemble(self, coords, u_old):
        p = self.p
        DT2 = p["dt"] / 2.0
        Lk = p["cells_min_capacity"]
        Kk = p["cells_max_capacity"]
        ek = p["cells_max_capacity_exponent"]
        pro_l, pro_c = p["produce_l"], p["produce_c"]
        dif_c_, mec_c_ = p["diffuse_c"], p["mechano_c"]
        nec_l, nec_c = p["necrosis_l"], p["necrosis_c"]

        conn = self.conn
        E, N, K, Q = self.E, self.N, 4, len(_QW)
        # geometry on the CURRENT configuration
        X = np.asarray(coords, dtype=np.float64)[conn]
        J = np.einsum("ki,ekd->eid", _DN, X)
        detJ = np.linalg.det(J)
        Jinv = np.linalg.inv(J)
        dphi = np.einsum("ki,edi->ekd", _DN, Jinv)
        JxW = np.abs(detJ)[:, None] * _QW[None, :]

        ue = u_old[conn]
        u_qp = np.einsum("ekv,qk->veq", ue, _PHI)
        g = np.einsum("ekv,ekd->ved", ue, dphi)
        l_o, c_o, n_o = u_qp
        Gc = np.broadcast_to(g[1][:, None, :], (E, Q, 3))
        # GRAD_sigma is identically zero (inert scaffold)

        Te = (l_o + c_o + n_o) / Kk
        interior = (Te > 0.0) & (Te < 1.0)
        base = np.where(interior, 1.0 - Te, 1.0)
        Tau = np.where(Te <= 0.0, 1.0, np.where(interior, base**ek, 0.0))
        dTau = np.where(interior, (-ek / Kk) * base ** (ek - 1.0), 0.0)

        dif_c = np.where(c_o > Lk, dif_c_, 0.0)
        # mechano_c gated the same way but multiplies GRAD_sigma == 0

        one = np.ones_like(l_o)
        z = np.zeros_like(l_o)

        # RHS (src/coupled_hcc.C:540-564)
        f = [
            l_o + DT2 * (pro_l * Tau * l_o - nec_l * l_o * n_o),
            c_o + DT2 * (pro_c * Tau * c_o - nec_c * c_o * n_o),
            n_o + DT2 * (nec_l * l_o * n_o + nec_c * c_o * n_o),
        ]
        fg = [None, DT2 * (-(dif_c * Tau)[..., None] * Gc), None]

        # Jacobian with the anomalous capacity terms and the doubled [1][1]
        m = [[z] * 3 for _ in range(3)]
        m[0][0] = one - DT2 * (pro_l * Tau + pro_l * dTau * l_o
                               - nec_l * n_o)
        m[0][1] = one - DT2 * (pro_l * dTau * l_o)          # spurious "one"
        m[0][2] = one - DT2 * (pro_l * dTau * l_o - nec_l * l_o)  # spurious
        m[1][0] = one - DT2 * (pro_c * dTau * c_o)          # spurious "one"
        # Ke[1][1] accumulated twice (:599-619): doubled capacity + both
        # DT2 bundles
        m[1][1] = (one - DT2 * (pro_c * Tau + pro_c * dTau * c_o
                                - nec_c * n_o)) \
            + (one - DT2 * (pro_c * dTau * c_o - nec_c * c_o))
        m[2][0] = -DT2 * (nec_l * n_o)
        m[2][1] = -DT2 * (nec_c * n_o)
        m[2][2] = one - DT2 * (nec_l * l_o + nec_c * c_o)

        adv = [[None] * 3 for _ in range(3)]
        adv[1][0] = -DT2 * (-(dif_c * dTau)[..., None] * Gc)
        # both [1][1] accumulations carry a dTau grad term (dc and dn)
        adv[1][1] = -DT2 * (-(dif_c * dTau)[..., None] * Gc) * 2.0

        difm = [[None] * 3 for _ in range(3)]
        difm[1][1] = -DT2 * (-dif_c * Tau)

        PP = np.einsum("qi,qj->qij", _PHI, _PHI)
        GG = np.einsum("eid,ejd->eij", dphi, dphi)
        Ke = np.zeros((E, 3, K, 3, K))
        Fe = np.zeros((E, 3, K))
        for vi in range(3):
            Fe[:, vi, :] += np.einsum("eq,qi->ei", JxW * f[vi], _PHI)
            if fg[vi] is not None:
                Fe[:, vi, :] += np.einsum(
                    "eqd,eid->ei", JxW[..., None] * fg[vi], dphi)
            for vj in range(3):
                blk = np.einsum("eq,qij->eij", JxW * m[vi][vj], PP)
                if adv[vi][vj] is not None:
                    blk += np.einsum(
                        "eqd,eid,qj->eij",
                        JxW[..., None] * adv[vi][vj], dphi, _PHI)
                if difm[vi][vj] is not None:
                    blk += np.einsum("eq,eij->eij", JxW * difm[vi][vj], GG)
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
    def step(self, coords, u_old):
        """Assemble on the given configuration, direct-solve, clamp >= 0
        (check_solution, src/coupled_hcc.C:695-731)."""
        Kmat, F = self.assemble(coords, u_old)
        x = spla.spsolve(Kmat, F)
        u_raw = x.reshape(3, self.N).T
        return np.maximum(u_raw, 0.0), u_raw
