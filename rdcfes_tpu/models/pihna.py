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

from ..fem.weakform import WeakForm, WeakFormBlocks  # noqa: F401

PIHNA_VARS = ("n", "c", "h", "v", "a")


def crowding_factor(total_over_kappa, kappa_k, ek):
    """(Tau, dTau/d rho_i) with the reference's clamped branches
    (src/pihna.C:446-472).  The derivative is identical for every species.

    One pow instead of two: tau = base**ek = base**(ek-1) * base — pow is
    the dominant transcendental of the coefficient build (measured), and
    the factored form is exact (pow(b, e) is itself exp(e log b), so
    b**(e-1) * b and b**e agree to round-off; the oracle parity test keeps
    this honest)."""
    Te = total_over_kappa
    base = jnp.clip(1.0 - Te, 1e-300, 1.0)
    interior = jnp.logical_and(Te > 0.0, Te < 1.0)
    e1 = ek - 1.0
    if isinstance(e1, float) and e1.is_integer() and 0.0 <= e1 <= 8.0:
        # deck exponents are small integers (shipped deck: ek = 3); the
        # trace-time strength reduction turns the f64 pow (software
        # exp*log on TPU) into an integer_pow multiply chain — agreement
        # to round-off, held to the oracle parity bar
        pe1 = base ** int(e1)
    else:
        pe1 = base ** e1
    tau = jnp.where(Te <= 0.0, 1.0, jnp.where(interior, pe1 * base, 0.0))
    dtau = jnp.where(interior, (-ek / kappa_k) * pe1, 0.0)
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


def _z(x) -> bool:
    """Structural zero: a Python scalar 0.0 (deck parameter known at trace
    time) — the block-sparsity signal (fem.weakform.WeakFormBlocks)."""
    return isinstance(x, (int, float)) and x == 0.0


def _mul(*fs):
    """Zero-propagating product of scalars/arrays."""
    for f in fs:
        if _z(f):
            return 0.0
    acc = fs[0]
    for f in fs[1:]:
        acc = acc * f
    return acc


def _add(*terms):
    """Sum skipping structural zeros."""
    live = [t for t in terms if not _z(t)]
    if not live:
        return 0.0
    acc = live[0]
    for t in live[1:]:
        acc = acc + t
    return acc


def _neg(x):
    return 0.0 if _z(x) else -x


def _gate(value, cond):
    """Threshold gating (src/pihna.C:504-509) that stays a structural zero
    when the deck turns the coefficient off."""
    if _z(value):
        return 0.0
    return jnp.where(cond, value, 0.0)


def _bvec(coef, G):
    """(Q, E) coefficient x (Q, 3, E) gradient -> (Q, 3, E) flux term."""
    if _z(coef) :
        return 0.0
    return coef[..., None, :] * G


def pihna_blocks(u_qp, grad_qp, fields, params):
    """Block-sparse weak form (fem.weakform.WeakFormBlocks) for PIHNA.

    Every formula is the reference's (src/pihna.C:444-747); blocks whose
    scalar prefactors are ALL structural zeros (deck parameters passed as
    plain Python floats, e.g. the shipped run/PIHNA deck's diffuse/c = 0,
    taxis/* = 0) are dropped from the compiled program entirely — the
    values are unchanged, only provably-zero work disappears.  When
    parameters arrive as tracers every block stays live."""
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
    dif_c = _gate(p["diffuse_c"], c > Lk)
    tax_c = _gate(p["taxis_c"], c > Lk)
    dif_h = _gate(p["diffuse_h"], h > Lk)
    tax_h = _gate(p["taxis_h"], h > Lk)
    dif_v = _gate(p["diffuse_v"], v > Lk)
    tax_v = _gate(p["taxis_v"], v > Lk)

    one = jnp.ones_like(n)

    # ---------------- RHS: A (mass) and B (flux) ---------------------------
    A = (
        _add(n, _mul(dt2, _add(_mul(nec_c, c, n), _mul(nec_h, h, n),
                               _mul(nec_v, v, n), _mul(sw_h2n, 1.0 - Ve, h)))),
        _add(c, _mul(dt2, _add(_mul(prod_c, tau, c),
                               _neg(_mul(sw_c2h, 1.0 - Ve, c)),
                               _mul(sw_h2c, Ve, h),
                               _neg(_mul(nec_c, c, n))))),
        _add(h, _mul(dt2, _add(_mul(sw_c2h, 1.0 - Ve, c),
                               _neg(_mul(sw_h2c, Ve, h)),
                               _neg(_mul(nec_h, h, n)),
                               _neg(_mul(sw_h2n, 1.0 - Ve, h))))),
        _add(v, _mul(dt2, _add(_mul(prod_v, tau, Ua, v),
                               _neg(_mul(nec_v, v, n))))),
        _add(a, _mul(dt2, _add(_mul(sec_ac, c), _mul(sec_ah, h),
                               _neg(_mul(upt_av, v, a)),
                               _neg(_mul(dec_a, a))))),
    )
    B = (
        0.0,
        _mul(dt2, _add(_neg(_bvec(_mul(dif_c, tau), Gc)),
                       _neg(_bvec(_mul(tax_c, tau, c), Gv)))),
        _mul(dt2, _add(_neg(_bvec(_mul(dif_h, tau), Gh)),
                       _neg(_bvec(_mul(tax_h, tau, h), Gv)))),
        _mul(dt2, _add(_neg(_bvec(_mul(dif_v, tau), Gv)),
                       _neg(_bvec(_mul(tax_v, tau, v), Ga)))),
        0.0,
    )

    # ---------------- Jacobian blocks (src/pihna.C:571-747) ----------------
    nd = lambda x: _neg(_mul(dt2, x))  # the common "-DT_2 * (...)" wrapper
    C00 = _add(one, nd(_add(_mul(nec_c, c), _mul(nec_h, h), _mul(nec_v, v))))
    C01 = nd(_add(_mul(nec_c, n), _mul(sw_h2n, -Ve_dc, h)))
    C02 = nd(_add(_mul(nec_h, n), _mul(sw_h2n, -Ve_dh, h),
                  _mul(sw_h2n, 1.0 - Ve)))
    C03 = nd(_add(_mul(nec_v, n), _mul(sw_h2n, -Ve_dv, h)))

    C10 = nd(_add(_mul(prod_c, dtau, c), _neg(_mul(nec_c, c))))
    D10 = nd(_add(_neg(_bvec(_mul(dif_c, dtau), Gc)),
                  _neg(_bvec(_mul(tax_c, dtau, c), Gv))))
    C11 = _add(one, nd(_add(_mul(prod_c, tau), _mul(prod_c, dtau, c),
                            _neg(_mul(sw_c2h, 1.0 - Ve)),
                            _neg(_mul(sw_c2h, -Ve_dc, c)),
                            _mul(sw_h2c, Ve_dc, h),
                            _neg(_mul(nec_c, n)))))
    D11 = nd(_add(_neg(_bvec(_mul(dif_c, dtau), Gc)),
                  _neg(_bvec(_mul(tax_c, dtau, c), Gv)),
                  _neg(_bvec(_mul(tax_c, tau), Gv))))
    E11 = _mul(dt2, dif_c, tau)
    C12 = nd(_add(_mul(prod_c, dtau, c), _neg(_mul(sw_c2h, -Ve_dh, c)),
                  _mul(sw_h2c, Ve_dh, h), _mul(sw_h2c, Ve)))
    D12 = D10
    C13 = nd(_add(_mul(prod_c, dtau, c), _neg(_mul(sw_c2h, -Ve_dv, c)),
                  _mul(sw_h2c, Ve_dv, h)))
    D13 = D10
    E13 = _mul(dt2, tax_c, tau, c)

    C20 = nd(_neg(_mul(nec_h, h)))
    D20 = nd(_add(_neg(_bvec(_mul(dif_h, dtau), Gh)),
                  _neg(_bvec(_mul(tax_h, dtau, h), Gv))))
    C21 = nd(_add(_mul(sw_c2h, 1.0 - Ve), _mul(sw_c2h, -Ve_dc, c),
                  _neg(_mul(sw_h2c, Ve_dc, h)),
                  _neg(_mul(sw_h2n, -Ve_dc, h))))
    D21 = D20
    C22 = _add(one, nd(_add(_mul(sw_c2h, -Ve_dh, c),
                            _neg(_mul(sw_h2c, Ve_dh, h)),
                            _neg(_mul(sw_h2c, Ve)),
                            _neg(_mul(nec_h, n)),
                            _neg(_mul(sw_h2n, -Ve_dh, h)),
                            _neg(_mul(sw_h2n, 1.0 - Ve)))))
    D22 = nd(_add(_neg(_bvec(_mul(dif_h, dtau), Gh)),
                  _neg(_bvec(_mul(tax_h, dtau, h), Gv)),
                  _neg(_bvec(_mul(tax_h, tau), Gv))))
    E22 = _mul(dt2, dif_h, tau)
    C23 = nd(_add(_mul(sw_c2h, -Ve_dv, c), _neg(_mul(sw_h2c, Ve_dv, h)),
                  _neg(_mul(sw_h2n, -Ve_dv, h))))
    D23 = D20
    E23 = _mul(dt2, tax_h, tau, h)

    C30 = nd(_add(_mul(prod_v, dtau, Ua, v), _neg(_mul(nec_v, v))))
    D30 = nd(_add(_neg(_bvec(_mul(dif_v, dtau), Gv)),
                  _neg(_bvec(_mul(tax_v, dtau, v), Ga))))
    C31 = nd(_mul(prod_v, dtau, Ua, v))
    D31 = D30
    C32 = C31
    D32 = D30
    C33 = _add(one, nd(_add(_mul(prod_v, dtau, Ua, v),
                            _neg(_mul(nec_v, n)))))
    D33 = nd(_add(_neg(_bvec(_mul(dif_v, dtau), Gv)),
                  _neg(_bvec(_mul(tax_v, dtau, v), Ga)),
                  _neg(_bvec(_mul(tax_v, tau), Ga))))
    E33 = _mul(dt2, dif_v, tau)
    C34 = nd(_mul(prod_v, tau, Ua_da, v))
    E34 = _mul(dt2, tax_v, tau, v)

    C41 = nd(_mul(sec_ac, one))
    C42 = nd(_mul(sec_ah, one))
    C43 = nd(_neg(_mul(upt_av, a)))
    C44 = _add(one, nd(_add(_neg(_mul(upt_av, v)), _neg(_mul(dec_a, one)))))

    z = 0.0
    C = (
        (C00, C01, C02, C03, z),
        (C10, C11, C12, C13, z),
        (C20, C21, C22, C23, z),
        (C30, C31, C32, C33, C34),
        (z, C41, C42, C43, C44),
    )
    D = (
        (z, z, z, z, z),
        (D10, D11, D12, D13, z),
        (D20, D21, D22, D23, z),
        (D30, D31, D32, D33, z),
        (z, z, z, z, z),
    )
    E = (
        (z, z, z, z, z),
        (z, E11, z, E13, z),
        (z, z, E22, E23, z),
        (z, z, z, E33, E34),
        (z, z, z, z, z),
    )
    return WeakFormBlocks(A=A, B=B, C=C, D=D, E=E)


def pihna_physics(u_qp, grad_qp, fields, params):
    """Dense WeakForm (legacy stacked API) derived from the block form —
    identical values, zeros materialized."""
    return pihna_blocks(u_qp, grad_qp, fields, params).to_dense()


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
