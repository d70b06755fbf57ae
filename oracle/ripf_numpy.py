"""RIPF step oracle: independent NumPy/scipy transcription of ripf.C.

Second, independent transcription of the reference RIPF assembly
(reference src/ripf.C:337-673) and its linearized-CN step — scipy.sparse
CSR (dof = var*N + node), SuperLU direct solve, HU-bounds + nonnegativity
clamp (src/ripf.C:700-737).  Shares no code with rdcfes_tpu; same
quadrature contract as the PIHNA oracle.

Inputs per step: the nodal solution, the nodal finite-difference
time-derivative field TD (the driver's check_solution bookkeeping,
src/ripf.C:739-741) and the nodal total RT dose; the oracle interpolates
them at quadrature points itself (TD via the main system's shape
functions, RT via the RT system's — both P1, src/ripf.C:467-479) and
normalizes the RT gradient (src/ripf.C:480-484).

Transcribed exactly, including the Lombda branch pair
`HU > lambda_HU_r && HU < 0` / `HU < lambda_HU_r` (src/ripf.C:532-545)
and the Tau flush below volume_fraction/min_vacant (src/ripf.C:508-513).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .pihna_numpy import _DN, _PHI, _QW


class RipfOracle:
    """One linearized-CN RIPF step on a TET4 mesh, scipy-assembled.

    Parameter names follow rdcfes_tpu's flat mapping (lambda_RT_r /
    omicro_RT_r already resolved by the caller, as the driver does per
    the deck-0 -> int(max total dose) fallback, src/ripf.C:397-403)."""

    def __init__(self, coords, conn, params):
        self.coords = np.asarray(coords, dtype=np.float64)
        self.conn = np.asarray(conn, dtype=np.int64)
        assert self.conn.shape[1] == 4, "oracle supports TET4 only"
        self.N = self.coords.shape[0]
        self.E = self.conn.shape[0]
        self.p = dict(params)

        X = self.coords[self.conn]
        J = np.einsum("ki,ekd->eid", _DN, X)
        detJ = np.linalg.det(J)
        Jinv = np.linalg.inv(J)
        self.dphi = np.einsum("ki,edi->ekd", _DN, Jinv)
        self.JxW = np.abs(detJ)[:, None] * _QW[None, :]

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
    def assemble(self, u_old, td, rt_total):
        p = self.p
        DT2 = p["dt"] / 2.0
        conn = self.conn
        E, N, K, Q = self.E, self.N, 4, len(_QW)

        ue = u_old[conn]                                   # (E, 4, 3)
        u_qp = np.einsum("ekv,qk->veq", ue, _PHI)
        g = np.einsum("ekv,ekd->ved", ue, self.dphi)
        HU, cc, fb = u_qp
        GHU = np.broadcast_to(g[0][:, None, :], (E, Q, 3))
        Gfb = np.broadcast_to(g[2][:, None, :], (E, Q, 3))

        # TD fields at qp via the main system's shape functions
        tde = td[conn]                                     # (E, 4, 3)
        td_qp = np.einsum("ekv,qk->veq", tde, _PHI)
        cc_dt, fb_dt = td_qp[1], td_qp[2]
        # RT total dose at qp (P1 interpolation) + unit gradient
        rte = rt_total[conn]                               # (E, 4)
        RT = np.einsum("ek,qk->eq", rte, _PHI)
        GRT = np.einsum("ek,ekd->ed", rte, self.dphi)      # (E, 3)
        nrm = np.linalg.norm(GRT, axis=-1, keepdims=True)
        GRT = np.where(nrm > 0.0, GRT / np.where(nrm == 0, 1, nrm), 0.0)
        GRT = np.broadcast_to(GRT[:, None, :], (E, Q, 3))

        kappa_RT = p["cc_kappa"] * np.exp(-p["cc_kappa_RT_c"] * RT)
        delta_RT = p["cc_delta"] * (
            1.0 - np.exp(-p["cc_delta_RT_a"] * RT - p["cc_delta_RT_b"] * RT**2))
        lam_RT = p["fb_lambda"] * (RT / p["lambda_RT_r"])
        x = RT / p["omicro_RT_r"]
        omi_RT = p["fb_omicro"] * np.maximum(0.0, 4.0 * (x - x**2))

        tol = p["phi_tolerance"]
        eps_cc = np.where(cc_dt > tol, p["phi_cc_build"],
                          np.where(cc_dt < -tol, p["phi_cc_decay"], 0.0))
        eps_fb = np.where(fb_dt > tol, p["phi_fb_build"],
                          np.where(fb_dt < -tol, p["phi_fb_decay"], 0.0))

        # vacant-volume factor Tau (src/ripf.C:498-514)
        VT = p["volfr_stroma"] + p["volfr_parenchyma"] + cc + fb
        e = p["volfr_exponent"]
        base = np.where(VT < 1.0, 1.0 - VT, 1.0)
        tau_raw = np.where(VT < 1.0, base**e, 0.0)
        dtau_raw = np.where(VT < 1.0, -e * base ** (e - 1.0), 0.0)
        small = tau_raw < p["volfr_min_vacant"]
        Tau = np.where(VT < 1.0, np.where(small, 0.0, tau_raw), 0.0)
        dTau = np.where(VT < 1.0, np.where(small, 0.0, dtau_raw), 0.0)

        # Koppa (src/ripf.C:516-523)
        in01 = (cc >= 0.0) & (cc < 1.0)
        Koppa = np.where(in01, 4.0 * (cc - cc**2), 0.0)
        dKoppa = np.where(in01, 4.0 - 8.0 * cc, 0.0)

        # Lombda / Omecro (src/ripf.C:525-561); lambda_HU_r < 0 by contract
        r = p["lambda_HU_r"]
        fb01 = (fb >= 0.0) & (fb < 1.0)
        mid = (HU > r) & (HU < 0.0)
        lo = HU < r
        Lombda = np.where(fb01 & mid, (1.0 - fb**2) * (HU / r),
                          np.where(fb01 & lo, 1.0 - fb**2, 0.0))
        Lombda_dHU = np.where(fb01 & mid, (1.0 - fb**2) / r, 0.0)
        Lombda_dfb = np.where(fb01 & mid, -(2.0 * fb) * (HU / r),
                              np.where(fb01 & lo, -(2.0 * fb), 0.0))
        b = p["omicro_fb_b"]
        Omecro = np.where(fb01,
                          np.where(fb <= b, 4.0 * (b - b**2),
                                   4.0 * (fb - fb**2)), 0.0)
        Omecro_dfb = np.where(fb01 & (fb > b), 4.0 - 8.0 * fb, 0.0)

        omega = p["fb_omega"]
        dif = p["fb_diffusion"]
        hap = p["fb_haptotaxis"]
        rad = p["fb_radiotaxis"]

        one = np.ones_like(HU)
        z = np.zeros_like(HU)

        # RHS (src/ripf.C:566-594)
        f = [
            HU + DT2 * (eps_cc * cc + eps_fb * fb
                        + p["phi_cc_rate"] * cc_dt + p["phi_fb_rate"] * fb_dt),
            cc + DT2 * (kappa_RT * Tau * Koppa - delta_RT * cc),
            fb + DT2 * (lam_RT * Tau * Lombda + omi_RT * Tau * Omecro
                        - omega * fb),
        ]
        fg = [None, None,
              DT2 * (-(dif * Tau)[..., None] * Gfb
                     - (hap * Tau * fb)[..., None] * GHU
                     - (rad * Tau * fb)[..., None] * GRT)]

        # Jacobian (src/ripf.C:596-662)
        m = [[z] * 3 for _ in range(3)]
        m[0][0] = one
        m[0][1] = -DT2 * eps_cc
        m[0][2] = -DT2 * eps_fb
        m[1][1] = one - DT2 * (kappa_RT * dTau * Koppa
                               + kappa_RT * Tau * dKoppa - delta_RT)
        m[1][2] = -DT2 * (kappa_RT * dTau * Koppa)
        m[2][0] = -DT2 * (lam_RT * Tau * Lombda_dHU)
        m[2][1] = -DT2 * (lam_RT * dTau * Lombda + omi_RT * dTau * Omecro)
        m[2][2] = one - DT2 * (lam_RT * dTau * Lombda
                               + lam_RT * Tau * Lombda_dfb
                               + omi_RT * dTau * Omecro
                               + omi_RT * Tau * Omecro_dfb - omega)

        adv = [[None] * 3 for _ in range(3)]
        taxis_common = (-(dif * dTau)[..., None] * Gfb
                        - (hap * dTau * fb)[..., None] * GHU
                        - (rad * dTau * fb)[..., None] * GRT)
        adv[2][1] = -DT2 * taxis_common
        adv[2][2] = -DT2 * (taxis_common - (hap * Tau)[..., None] * GHU
                            - (rad * Tau)[..., None] * GRT)

        difm = [[None] * 3 for _ in range(3)]
        difm[2][0] = -DT2 * (-hap * Tau * fb)
        difm[2][2] = -DT2 * (-dif * Tau)

        PP = np.einsum("qi,qj->qij", _PHI, _PHI)
        GG = np.einsum("eid,ejd->eij", self.dphi, self.dphi)
        JxW = self.JxW
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
    def step(self, u_old, td, rt_total, hu_min, hu_max):
        """Assemble, direct-solve, clamp HU to [hu_min, hu_max] and
        cc/fb >= 0 (src/ripf.C:718-721).  Returns (clamped, raw)."""
        Kmat, F = self.assemble(u_old, td, rt_total)
        x = spla.spsolve(Kmat, F)
        u_raw = x.reshape(3, self.N).T
        u = u_raw.copy()
        u[:, 0] = np.clip(u[:, 0], hu_min, hu_max)
        u[:, 1:] = np.maximum(u[:, 1:], 0.0)
        return u, u_raw
