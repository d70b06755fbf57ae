"""PIHNA: 5-species glioma growth model (the north-star case).

Pointwise weak-form physics for the reference's PIHNA driver
(src/pihna.C:318-758): species n (necrotic), c (normoxic tumor),
h (hypoxic tumor), v (vasculature), a (angiogenic factor), with

* crowding factor Tau = (1 - (n+c+h+v)/Kappa_k)^ek, clamped with zero
  derivative outside (0, 1) (src/pihna.C:444-472)
* vascular fraction Ve = v/(c+h+v), clamped to [0,1] with its exact interior
  derivatives (src/pihna.C:474-499)
* angiogenic saturation Ua = a/(a+Kappa_a) (src/pihna.C:501-502)
* per-species threshold gating of diffusion/taxis at Lambda_k
  (src/pihna.C:504-509)
* hypoxic<->normoxic switching scaled by (1-Ve)/Ve, necrosis couplings, and
  the full 25-block analytic Jacobian (src/pihna.C:511-747)

Deviation (documented): where the reference computes Ve = v/(c+h+v) with
c+h+v == 0 it produces NaN (raw division, src/pihna.C:477); we return the
physical limit Ve = 0 instead.

Reference quirk (preserved for parity): Ke[3][3] omits the
`produce_v*Tau*Ua` mass-derivative term that the analogous Ke[1][1] includes
(src/pihna.C:708-718 vs :607-621) — i.e. the vascular-production Jacobian is
incomplete in the reference.  We reproduce the incomplete block exactly;
tests/test_pihna.py verifies every other entry against autodiff of the RHS
and encodes this one as a known correction.

`params` keys (all scalars; `necrosis/*` already divided by Kappa_k by the
deck loader, matching src/pihna.C:364-366):
  dt, cells_min_capacity, cells_max_capacity, cells_max_capacity_exponent,
  cytokines_max_capacity, necrosis_c, necrosis_h, necrosis_v,
  diffuse_c, taxis_c, diffuse_h, taxis_h, produce_c, switch_c2h, switch_h2c,
  switch_h2n, diffuse_v, taxis_v, produce_v, secrete_a_c, secrete_a_h,
  uptake_a_v, decay_a
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.weakform import WeakForm

PIHNA_VARS = ("n", "c", "h", "v", "a")


def crowding_factor(total_over_kappa, kappa_k, ek):
    """(Tau, dTau/d rho_i) with the reference's clamped branches
    (src/pihna.C:446-472).  The derivative is identical for every species."""
    Te = total_over_kappa
    base = jnp.clip(1.0 - Te, 1e-300, 1.0)
    interior = jnp.logical_and(Te > 0.0, Te < 1.0)
    tau = jnp.where(Te <= 0.0, 1.0, jnp.where(interior, base**ek, 0.0))
    dtau = jnp.where(interior, (-ek / kappa_k) * base ** (ek - 1.0), 0.0)
    return tau, dtau


def vascular_fraction(c, h, v):
    """(Ve, dVe/dc=dVe/dh, dVe/dv) with clamped branches (src/pihna.C:476-499)."""
    s = c + h + v
    safe_s = jnp.where(s == 0.0, 1.0, s)
    Ve_ = v / safe_s
    interior = jnp.logical_and(Ve_ > 0.0, Ve_ < 1.0)
    Ve = jnp.clip(Ve_, 0.0, 1.0)
    dVe_dch = jnp.where(interior, -Ve_ / safe_s, 0.0)
    dVe_dv = jnp.where(interior, (1.0 - Ve_) / safe_s, 0.0)
    return Ve, dVe_dch, dVe_dv


def pihna_physics(u_qp, grad_qp, fields, params):
    p = params
    dt2 = p["dt"] / 2.0
    Lk = p["cells_min_capacity"]
    Kk = p["cells_max_capacity"]
    Ka = p["cytokines_max_capacity"]
    ek = p["cells_max_capacity_exponent"]
    nec_c, nec_h, nec_v = p["necrosis_c"], p["necrosis_h"], p["necrosis_v"]
    prod_c, sw_c2h, sw_h2c, sw_h2n = (
        p["produce_c"], p["switch_c2h"], p["switch_h2c"], p["switch_h2n"],
    )
    prod_v = p["produce_v"]
    sec_ac, sec_ah, upt_av, dec_a = (
        p["secrete_a_c"], p["secrete_a_h"], p["uptake_a_v"], p["decay_a"],
    )

    n, c, h, v, a = u_qp[0], u_qp[1], u_qp[2], u_qp[3], u_qp[4]
    Gc, Gh, Gv, Ga = grad_qp[1], grad_qp[2], grad_qp[3], grad_qp[4]

    tau, dtau = crowding_factor((n + c + h + v) / Kk, Kk, ek)
    Ve, Ve_dc, Ve_dv = vascular_fraction(c, h, v)
    Ve_dh = Ve_dc
    Ua = a / (a + Ka)
    Ua_da = 1.0 / (a + Ka) - Ua / (a + Ka)

    # per-species threshold gating (src/pihna.C:504-509)
    dif_c = jnp.where(c > Lk, p["diffuse_c"], 0.0)
    tax_c = jnp.where(c > Lk, p["taxis_c"], 0.0)
    dif_h = jnp.where(h > Lk, p["diffuse_h"], 0.0)
    tax_h = jnp.where(h > Lk, p["taxis_h"], 0.0)
    dif_v = jnp.where(v > Lk, p["diffuse_v"], 0.0)
    tax_v = jnp.where(v > Lk, p["taxis_v"], 0.0)

    zero = jnp.zeros_like(n)
    zero3 = jnp.zeros_like(Gc)

    # ---------------- RHS: A (mass) and B (flux) coefficients -------------
    A = jnp.stack(
        [
            n + dt2 * (nec_c * c * n + nec_h * h * n + nec_v * v * n
                       + sw_h2n * (1.0 - Ve) * h),
            c + dt2 * (prod_c * tau * c - sw_c2h * (1.0 - Ve) * c
                       + sw_h2c * Ve * h - nec_c * c * n),
            h + dt2 * (sw_c2h * (1.0 - Ve) * c - sw_h2c * Ve * h
                       - nec_h * h * n - sw_h2n * (1.0 - Ve) * h),
            v + dt2 * (prod_v * tau * Ua * v - nec_v * v * n),
            a + dt2 * (sec_ac * c + sec_ah * h - upt_av * v * a - dec_a * a),
        ]
    )
    B = jnp.stack(
        [
            zero3,
            dt2 * (-(dif_c * tau)[..., None, :] * Gc - (tax_c * tau * c)[..., None, :] * Gv),
            dt2 * (-(dif_h * tau)[..., None, :] * Gh - (tax_h * tau * h)[..., None, :] * Gv),
            dt2 * (-(dif_v * tau)[..., None, :] * Gv - (tax_v * tau * v)[..., None, :] * Ga),
            zero3,
        ]
    )

    # ---------------- Jacobian blocks (src/pihna.C:571-747) ---------------
    # C[v][w]: phi_j phi_i coefficients; D[v][w]: (D . dphi_i) phi_j;
    # E[v][w]: dphi_i . dphi_j
    one = jnp.ones_like(n)
    C00 = one - dt2 * (nec_c * c + nec_h * h + nec_v * v)
    C01 = -dt2 * (nec_c * n + sw_h2n * (-Ve_dc) * h)
    C02 = -dt2 * (nec_h * n + sw_h2n * (-Ve_dh) * h + sw_h2n * (1.0 - Ve))
    C03 = -dt2 * (nec_v * n + sw_h2n * (-Ve_dv) * h)

    C10 = -dt2 * (prod_c * dtau * c - nec_c * c)
    D10 = -dt2 * (-(dif_c * dtau)[..., None, :] * Gc - (tax_c * dtau * c)[..., None, :] * Gv)
    C11 = one - dt2 * (prod_c * tau + prod_c * dtau * c
                       - sw_c2h * (1.0 - Ve) - sw_c2h * (-Ve_dc) * c
                       + sw_h2c * Ve_dc * h - nec_c * n)
    D11 = -dt2 * (-(dif_c * dtau)[..., None, :] * Gc
                  - (tax_c * dtau * c)[..., None, :] * Gv
                  - (tax_c * tau)[..., None, :] * Gv)
    E11 = dt2 * dif_c * tau
    C12 = -dt2 * (prod_c * dtau * c - sw_c2h * (-Ve_dh) * c
                  + sw_h2c * Ve_dh * h + sw_h2c * Ve)
    D12 = D10
    C13 = -dt2 * (prod_c * dtau * c - sw_c2h * (-Ve_dv) * c + sw_h2c * Ve_dv * h)
    D13 = D10
    E13 = dt2 * tax_c * tau * c

    C20 = -dt2 * (-nec_h * h)
    D20 = -dt2 * (-(dif_h * dtau)[..., None, :] * Gh - (tax_h * dtau * h)[..., None, :] * Gv)
    C21 = -dt2 * (sw_c2h * (1.0 - Ve) + sw_c2h * (-Ve_dc) * c
                  - sw_h2c * Ve_dc * h - sw_h2n * (-Ve_dc) * h)
    D21 = D20
    C22 = one - dt2 * (sw_c2h * (-Ve_dh) * c - sw_h2c * Ve_dh * h - sw_h2c * Ve
                       - nec_h * n - sw_h2n * (-Ve_dh) * h - sw_h2n * (1.0 - Ve))
    D22 = -dt2 * (-(dif_h * dtau)[..., None, :] * Gh
                  - (tax_h * dtau * h)[..., None, :] * Gv
                  - (tax_h * tau)[..., None, :] * Gv)
    E22 = dt2 * dif_h * tau
    C23 = -dt2 * (sw_c2h * (-Ve_dv) * c - sw_h2c * Ve_dv * h - sw_h2n * (-Ve_dv) * h)
    D23 = D20
    E23 = dt2 * tax_h * tau * h

    C30 = -dt2 * (prod_v * dtau * Ua * v - nec_v * v)
    D30 = -dt2 * (-(dif_v * dtau)[..., None, :] * Gv - (tax_v * dtau * v)[..., None, :] * Ga)
    C31 = -dt2 * (prod_v * dtau * Ua * v)
    D31 = D30
    C32 = C31
    D32 = D30
    C33 = one - dt2 * (prod_v * dtau * Ua * v - nec_v * n)
    D33 = -dt2 * (-(dif_v * dtau)[..., None, :] * Gv
                  - (tax_v * dtau * v)[..., None, :] * Ga
                  - (tax_v * tau)[..., None, :] * Ga)
    E33 = dt2 * dif_v * tau
    C34 = -dt2 * (prod_v * tau * Ua_da * v)
    E34 = dt2 * tax_v * tau * v

    C41 = -dt2 * sec_ac * one
    C42 = -dt2 * sec_ah * one
    C43 = -dt2 * (-upt_av * a)
    C44 = one - dt2 * (-upt_av * v - dec_a)

    C = jnp.stack(
        [
            jnp.stack([C00, C01, C02, C03, zero]),
            jnp.stack([C10, C11, C12, C13, zero]),
            jnp.stack([C20, C21, C22, C23, zero]),
            jnp.stack([C30, C31, C32, C33, C34]),
            jnp.stack([zero, C41, C42, C43, C44]),
        ]
    )
    D = jnp.stack(
        [
            jnp.stack([zero3, zero3, zero3, zero3, zero3]),
            jnp.stack([D10, D11, D12, D13, zero3]),
            jnp.stack([D20, D21, D22, D23, zero3]),
            jnp.stack([D30, D31, D32, D33, zero3]),
            jnp.stack([zero3, zero3, zero3, zero3, zero3]),
        ]
    )
    E = jnp.stack(
        [
            jnp.stack([zero, zero, zero, zero, zero]),
            jnp.stack([zero, E11, zero, E13, zero]),
            jnp.stack([zero, zero, E22, E23, zero]),
            jnp.stack([zero, zero, zero, E33, E34]),
            jnp.stack([zero, zero, zero, zero, zero]),
        ]
    )
    return WeakForm(A=A, B=B, C=C, D=D, E=E)


def default_params():
    """Parameter defaults of the PIHNA input() (src/pihna.C:193-234),
    with the necrosis/* -> /Kappa_k scaling applied."""
    return {
        "dt": 1.0e-9,
        "cells_min_capacity": 0.0,
        "cells_max_capacity": 1.0,
        "cells_max_capacity_exponent": 1.0,
        "cytokines_max_capacity": 1.0,
        "necrosis_c": 0.0,
        "necrosis_h": 0.0,
        "necrosis_v": 0.0,
        "diffuse_c": 0.0,
        "taxis_c": 0.0,
        "diffuse_h": 0.0,
        "taxis_h": 0.0,
        "produce_c": 0.0,
        "switch_c2h": 0.0,
        "switch_h2c": 0.0,
        "switch_h2n": 0.0,
        "diffuse_v": 0.0,
        "taxis_v": 0.0,
        "produce_v": 0.0,
        "secrete_a_c": 0.0,
        "secrete_a_h": 0.0,
        "uptake_a_v": 0.0,
        "decay_a": 0.0,
    }
