"""PROTEAS step oracle: independent NumPy/scipy transcription of proteas.C.

Second, independent transcription of the reference PROTEAS assembly
(reference src/proteas.C:338-705) and its linearized-CN step —
scipy.sparse CSR (dof = var*N + node), SuperLU direct solve.  Shares no
code with rdcfes_tpu; same quadrature contract as the PIHNA oracle.

Reference quirks transcribed as-is:
  * Ke[1][1] keeps only the D_c terms (no D_c_h cross-diffusion
    derivatives, src/proteas.C:605-615)
  * Ke[3][1] keeps only the dKappa part of d(vsc_prol)/d(tum)
    (src/proteas.C:661-665)
  * Kappa is clamped to [0, 1] but dKappa is the UNCONDITIONAL -1/T_max
    (src/proteas.C:489-491)
AUX sampling: this oracle interpolates the nodal RTD variable fully
(the framework's correct-by-default mode); the reference's node-0/1
sampling quirk is covered by the driver tests.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .pihna_numpy import _DN, _PHI, _QW


def _heaviside(x):
    return np.where(x > 0.0, 1.0, 0.0)


class ProteasOracle:
    """One linearized-CN PROTEAS step on a TET4 mesh, scipy-assembled.

    `aux` is the (N, 2) nodal (HU, RTD) field; RTD is interpolated at
    quadrature points (HU and both AUX gradients are computed by the
    reference but never used in the weak form)."""

    def __init__(self, coords, conn, aux, params):
        self.coords = np.asarray(coords, dtype=np.float64)
        self.conn = np.asarray(conn, dtype=np.int64)
        assert self.conn.shape[1] == 4, "oracle supports TET4 only"
        self.aux = np.asarray(aux, dtype=np.float64)
        self.N = self.coords.shape[0]
        self.E = self.conn.shape[0]
        self.p = dict(params)

        X = self.coords[self.conn]
        J = np.einsum("ki,ekd->eid", _DN, X)
        detJ = np.linalg.det(J)
        Jinv = np.linalg.inv(J)
        self.dphi = np.einsum("ki,edi->ekd", _DN, Jinv)
        self.JxW = np.abs(detJ)[:, None] * _QW[None, :]
        # full interpolation of RTD at qp: (E, Q)
        self.RTD = np.einsum("qk,ek->eq", _PHI, self.aux[self.conn, 1])

        K = 4
        rows = np.empty((self.E, 5, K, 5, K), dtype=np.int64)
        cols = np.empty_like(rows)
        for vi in range(5):
            for vj in range(5):
                rows[:, vi, :, vj, :] = vi * self.N + self.conn[:, :, None]
                cols[:, vi, :, vj, :] = vj * self.N + self.conn[:, None, :]
        self._rows = rows.ravel()
        self._cols = cols.ravel()

    # ------------------------------------------------------------------
    def assemble(self, u_old: np.ndarray):
        p = self.p
        DT2 = p["dt"] / 2.0
        T_max = p["cells_total_capacity"]
        RT_max = p["radiotherapy_max_dosage"]
        rho_h, u_h = p["host_proliferation"], p["host_vsc_threshold"]
        delta_h = p["host_RT_death_rate"]
        a_h, b_h = p["host_RT_exp_a"], p["host_RT_exp_b"]
        nu_h = p["host_necrosis_rate"]
        D_c, D_c_h = p["tumour_diffusion"], p["tumour_diffusion_host"]
        rho_c, u_c = p["tumour_proliferation"], p["tumour_vsc_threshold"]
        delta_c = p["tumour_RT_death_rate"]
        a_c, b_c = p["tumour_RT_exp_a"], p["tumour_RT_exp_b"]
        nu_c = p["tumour_necrosis_rate"]
        psi_n, k_n, u_n = (p["necrosis_clearance"], p["necrosis_slope"],
                           p["necrosis_vsc_threshold"])
        rho_v, nu_v = (p["vascular_proliferation"],
                       p["vascular_necrosis_rate"])
        D_e, rho_e, u_e = (p["oedema_diffusion"], p["oedema_proliferation"],
                           p["oedema_vsc_threshold"])
        xi_e, p_RT, psi_e = (p["oedema_RT_coeff"], p["oedema_RT_exp"],
                             p["oedema_reabsorption_rate"])

        conn = self.conn
        E, N, K, Q = self.E, self.N, 4, len(_QW)
        ue = u_old[conn]  # (E, 4, 5)
        u_qp = np.einsum("ekv,qk->veq", ue, _PHI)      # (5, E, Q)
        g = np.einsum("ekv,ekd->ved", ue, self.dphi)   # (5, E, 3)
        hos, tum, nec, vsc, oed = u_qp
        Ghos = np.broadcast_to(g[0][:, None, :], (E, Q, 3))
        Gtum = np.broadcast_to(g[1][:, None, :], (E, Q, 3))
        Goed = np.broadcast_to(g[4][:, None, :], (E, Q, 3))
        RTD = self.RTD

        T = hos + tum + nec + vsc
        Kappa = np.clip(1.0 - T / T_max, 0.0, 1.0)
        dKappa = -1.0 / T_max   # unconditional (src/proteas.C:491)

        host_prol = rho_h * Kappa * _heaviside(vsc - u_h)
        dhost_prol = rho_h * dKappa * _heaviside(vsc - u_h)
        host_RT = delta_h * (1.0 - np.exp(-a_h * RTD - b_h * RTD**2))
        host_nec = nu_h * nec

        tum_prol = rho_c * Kappa * _heaviside(vsc - u_c)
        dtum_prol = rho_c * dKappa * _heaviside(vsc - u_c)
        tum_RT = delta_c * (1.0 - np.exp(-a_c * RTD - b_c * RTD**2))
        tum_nec = nu_c * nec

        nec_prol = nu_h * hos + nu_c * tum + nu_v * vsc
        nec_clear = psi_n * (1.0 - np.tanh(k_n * vsc - u_n))
        dnec_clear = psi_n * -k_n / np.cosh(k_n * vsc - u_n) ** 2

        vsc_prol = rho_v * Kappa * tum
        dvsc_prol = rho_v * dKappa * tum
        vsc_nec = nu_v * nec

        oed_prol = rho_e * tum * (1.0 - tum)
        doed_prol = rho_e * (1.0 - 2.0 * tum)
        oed_RT = xi_e * (RTD / RT_max) ** p_RT
        oed_clear = psi_e * (1.0 - _heaviside(vsc - u_e))

        one = np.ones_like(hos)
        z = np.zeros_like(hos)

        # ---- RHS (src/proteas.C:517-564) --------------------------------
        f = [
            hos + DT2 * (host_prol * hos * (1 - hos) - host_RT * hos
                         - host_nec * hos),
            tum + DT2 * (tum_prol * tum - tum_RT * tum - tum_nec * tum),
            nec + DT2 * (nec_prol * nec - nec_clear * nec),
            vsc + DT2 * (vsc_prol * vsc - vsc_nec * vsc),
            oed + DT2 * (oed_prol * oed - oed_RT * oed - oed_clear * oed),
        ]
        fg = [None] * 5
        fg[1] = DT2 * (-(D_c * Kappa)[..., None] * Gtum
                       - (D_c_h * Kappa * tum)[..., None] * Ghos)
        fg[4] = DT2 * (-D_e) * Goed

        # ---- Jacobian (src/proteas.C:566-697) ----------------------------
        hh = dhost_prol * hos * (1 - hos)
        m = [[z] * 5 for _ in range(5)]
        m[0][0] = one - DT2 * (hh + host_prol * (1 - 2 * hos)
                               - host_RT - host_nec)
        m[0][1] = -DT2 * hh
        m[0][2] = -DT2 * (hh - nu_h * hos)
        m[0][3] = -DT2 * hh
        m[1][0] = -DT2 * (dtum_prol * tum)
        m[1][1] = one - DT2 * (dtum_prol * tum + tum_prol - tum_RT - tum_nec)
        m[1][2] = -DT2 * (dtum_prol * tum - nu_c * tum)
        m[1][3] = -DT2 * (dtum_prol * tum)
        m[2][0] = -DT2 * (nu_h * nec)
        m[2][1] = -DT2 * (nu_c * nec)
        m[2][2] = one - DT2 * (nec_prol - nec_clear)
        m[2][3] = -DT2 * (nu_v * nec - dnec_clear * nec)
        m[3][0] = -DT2 * (dvsc_prol * vsc)
        m[3][1] = -DT2 * (dvsc_prol * vsc)   # rho_v*Kappa*vsc omitted (ref)
        m[3][2] = -DT2 * (dvsc_prol * vsc - nu_v * vsc)
        m[3][3] = one - DT2 * (dvsc_prol * vsc + vsc_prol - vsc_nec)
        m[4][1] = -DT2 * (doed_prol * oed)
        m[4][4] = one - DT2 * (oed_prol - oed_RT - oed_clear)

        adv = [[None] * 5 for _ in range(5)]
        Dk_t = -DT2 * (-(D_c * dKappa * one)[..., None] * Gtum
                       - (D_c_h * dKappa * tum)[..., None] * Ghos)
        adv[1][0] = Dk_t
        adv[1][1] = -DT2 * (-(D_c * dKappa * one)[..., None] * Gtum)
        adv[1][2] = Dk_t
        adv[1][3] = Dk_t

        dif = [[None] * 5 for _ in range(5)]
        dif[1][0] = -DT2 * (-D_c_h * Kappa * tum)
        dif[1][1] = -DT2 * (-D_c * Kappa)
        dif[4][4] = -DT2 * (-D_e * one)

        PP = np.einsum("qi,qj->qij", _PHI, _PHI)
        GG = np.einsum("eid,ejd->eij", self.dphi, self.dphi)
        JxW = self.JxW
        Ke = np.zeros((E, 5, K, 5, K))
        Fe = np.zeros((E, 5, K))
        for vi in range(5):
            Fe[:, vi, :] += np.einsum("eq,qi->ei", JxW * f[vi], _PHI)
            if fg[vi] is not None:
                Fe[:, vi, :] += np.einsum(
                    "eqd,eid->ei", JxW[..., None] * fg[vi], self.dphi)
            for vj in range(5):
                blk = np.einsum("eq,qij->eij", JxW * m[vi][vj], PP)
                if adv[vi][vj] is not None:
                    blk += np.einsum(
                        "eqd,eid,qj->eij",
                        JxW[..., None] * adv[vi][vj], self.dphi, _PHI)
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
    def step(self, u_old: np.ndarray):
        """Assemble at u_old, direct-solve, clamp every species >= 0
        (check_solution, src/proteas.C:732-743)."""
        Kmat, F = self.assemble(u_old)
        x = spla.spsolve(Kmat, F)
        u_raw = x.reshape(5, self.N).T
        return np.maximum(u_raw, 0.0), u_raw
