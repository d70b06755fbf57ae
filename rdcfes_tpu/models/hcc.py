"""HCC: 3-species hepatocellular-carcinoma transport model (RDC half of the
two-way coupled driver).

Pointwise weak-form physics for the reference's coupled_hcc RDS assembly
(src/coupled_hcc.C:414-649): species l (liver/host), c (tumour), n
(necrotic), assembled every step on the CURRENT DEFORMED geometry (the
geometry factors are recomputed from the moved coordinates by the coupled
orchestrator; in the reference this happens implicitly through fe->reinit on
the moved mesh).

* crowding Tau = (1 - (l+c+n)/Kappa_k)^ek with clamped branches, identical
  in form to PIHNA's (src/coupled_hcc.C:510-532)
* threshold gating of tumour diffusion/mechanotaxis at Lambda_k
  (src/coupled_hcc.C:534-535)
* mechano-taxis drift along GRAD_sigma — scaffolded but inert in the
  reference (GRAD_sigma is always the zero vector, src/coupled_hcc.C:508);
  we accept it as the optional field "grad_sigma" (default zeros) so a
  future live coupling slots in without touching the physics.

Reference ANOMALIES preserved exactly for parity (SURVEY.md section 2.1;
verified block-by-block in tests/test_hcc.py):
  * Ke[0][1], Ke[0][2], Ke[1][0] each carry a spurious phi_j*phi_i capacity
    term (src/coupled_hcc.C:577-597)
  * the second Ke[1][1] accumulation at src/coupled_hcc.C:611-619 (clearly
    intended as Ke[1][2]) lands in Ke[1][1], duplicating its capacity term
    and adding the d/dn coupling terms to the c-c block, leaving Ke[1][2]
    empty

BEHAVIORAL CONSEQUENCE of the anomalies (observed, faithful): for generic
ICs the tumour row of the linear system reads l' + 2 c' ~ c_old (spurious
unit couplings dominate the O(dt) physics), so the solve drives c negative
and the post-solve clamp floors it to ~0 within one step.  The reference
produces the same dynamics; do not "fix" this without breaking parity.

`params` keys: dt, cells_min_capacity, cells_max_capacity,
cells_max_capacity_exponent, produce_l, diffuse_c, mechano_c, produce_c,
necrosis_l, necrosis_c, necrosis_pressure (the necrosis_* values already
divided by Kappa_k, matching src/coupled_hcc.C:459-461; necrosis_pressure is
loaded but unused in assembly, as in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.weakform import WeakForm, WeakFormBlocks
from .pihna import _add, _bvec, _gate, _mul, _neg, crowding_factor

HCC_VARS = ("l", "c", "n")


def hcc_physics(u_qp, grad_qp, fields, params):
    p = params
    dt2 = p["dt"] / 2.0
    Lk = p["cells_min_capacity"]
    Kk = p["cells_max_capacity"]
    ek = p["cells_max_capacity_exponent"]
    prod_l, prod_c = p["produce_l"], p["produce_c"]
    nec_l, nec_c = p["necrosis_l"], p["necrosis_c"]

    l, c, n = u_qp[0], u_qp[1], u_qp[2]
    Gc = grad_qp[1]
    Gsig = fields.get("grad_sigma", jnp.zeros_like(Gc))

    tau, dtau = crowding_factor((l + c + n) / Kk, Kk, ek)
    dif_c = jnp.where(c > Lk, p["diffuse_c"], 0.0)
    mech_c = jnp.where(c > Lk, p["mechano_c"], 0.0)

    zero = jnp.zeros_like(l)
    zero3 = jnp.zeros_like(Gc)
    one = jnp.ones_like(l)

    # ---------------- RHS (src/coupled_hcc.C:539-564) ---------------------
    A = jnp.stack(
        [
            l + dt2 * (prod_l * tau * l - nec_l * l * n),
            c + dt2 * (prod_c * tau * c - nec_c * c * n),
            n + dt2 * (nec_l * l * n + nec_c * c * n),
        ]
    )
    B = jnp.stack(
        [
            zero3,
            dt2 * (-(dif_c * tau)[..., None, :] * Gc
                   - (mech_c * tau * c)[..., None, :] * Gsig),
            zero3,
        ]
    )

    # ---------------- Jacobian with anomalies (src/coupled_hcc.C:566-637) -
    C00 = one - dt2 * (prod_l * tau + prod_l * dtau * l - nec_l * n)
    C01 = one - dt2 * (prod_l * dtau * l)              # spurious capacity term
    C02 = one - dt2 * (prod_l * dtau * l - nec_l * l)  # spurious capacity term

    Dtau_c = -dt2 * (-(dif_c * dtau)[..., None, :] * Gc
                     - (mech_c * dtau * c)[..., None, :] * Gsig)
    C10 = one - dt2 * (prod_c * dtau * c)              # spurious capacity term
    D10 = Dtau_c
    # Ke[1][1] = intended block + the misplaced "[1][2]" accumulation
    C11 = (one - dt2 * (prod_c * tau + prod_c * dtau * c - nec_c * n)) \
        + (one - dt2 * (prod_c * dtau * c - nec_c * c))
    D11 = -dt2 * (-(dif_c * dtau)[..., None, :] * Gc
                  - (mech_c * dtau * c)[..., None, :] * Gsig
                  - (mech_c * tau)[..., None, :] * Gsig) + Dtau_c
    E11 = dt2 * dif_c * tau

    C20 = -dt2 * (nec_l * n)
    C21 = -dt2 * (nec_c * n)
    C22 = one - dt2 * (nec_l * l + nec_c * c)

    C = jnp.stack(
        [
            jnp.stack([C00, C01, C02]),
            jnp.stack([C10, C11, zero]),
            jnp.stack([C20, C21, C22]),
        ]
    )
    D = jnp.stack(
        [
            jnp.stack([zero3, zero3, zero3]),
            jnp.stack([D10, D11, zero3]),
            jnp.stack([zero3, zero3, zero3]),
        ]
    )
    Em = jnp.stack(
        [
            jnp.stack([zero, zero, zero]),
            jnp.stack([zero, E11, zero]),
            jnp.stack([zero, zero, zero]),
        ]
    )
    return WeakForm(A=A, B=B, C=C, D=D, E=Em)


def hcc_blocks(u_qp, grad_qp, fields, params):
    """Block-sparse weak form (fem.weakform.WeakFormBlocks) for HCC —
    identical formulas to hcc_physics above, INCLUDING the reference
    anomalies (spurious phi*phi capacity terms in Ke[0][1]/Ke[0][2]/
    Ke[1][0], the misplaced second Ke[1][1] accumulation —
    src/coupled_hcc.C:566-637).  Blocks whose deck prefactors are plain
    Python-float zeros drop from the compiled program; the unconditional
    spurious `one` terms keep their blocks live regardless.

    The inert mechano-taxis scaffold (GRAD_sigma, always the zero vector
    in the reference, src/coupled_hcc.C:508) is structurally ABSENT
    unless a "grad_sigma" field is supplied — zeros either way."""
    p = params
    dt2 = p["dt"] / 2.0
    Lk = p["cells_min_capacity"]
    Kk = p["cells_max_capacity"]
    ek = p["cells_max_capacity_exponent"]
    prod_l, prod_c = p["produce_l"], p["produce_c"]
    nec_l, nec_c = p["necrosis_l"], p["necrosis_c"]

    l, c, n = u_qp[0], u_qp[1], u_qp[2]
    Gc = grad_qp[1]
    Gsig = fields.get("grad_sigma", None)

    tau, dtau = crowding_factor((l + c + n) / Kk, Kk, ek)
    dif_c = _gate(p["diffuse_c"], c > Lk)
    mech_c = _gate(p["mechano_c"], c > Lk)
    one = jnp.ones_like(l)
    bsig = (lambda coef: 0.0) if Gsig is None else \
        (lambda coef: _bvec(coef, Gsig))

    # ---------------- RHS (src/coupled_hcc.C:539-564) ---------------------
    A = (
        _add(l, _mul(dt2, _add(_mul(prod_l, tau, l),
                               _neg(_mul(nec_l, l, n))))),
        _add(c, _mul(dt2, _add(_mul(prod_c, tau, c),
                               _neg(_mul(nec_c, c, n))))),
        _add(n, _mul(dt2, _add(_mul(nec_l, l, n), _mul(nec_c, c, n)))),
    )
    B = (
        0.0,
        _mul(dt2, _add(_neg(_bvec(_mul(dif_c, tau), Gc)),
                       _neg(bsig(_mul(mech_c, tau, c))))),
        0.0,
    )

    # ---------------- Jacobian with anomalies (src/coupled_hcc.C:566-637) -
    nd = lambda x: _neg(_mul(dt2, x))
    C00 = _add(one, nd(_add(_mul(prod_l, tau), _mul(prod_l, dtau, l),
                            _neg(_mul(nec_l, n)))))
    C01 = _add(one, nd(_mul(prod_l, dtau, l)))          # spurious capacity
    C02 = _add(one, nd(_add(_mul(prod_l, dtau, l),      # spurious capacity
                            _neg(_mul(nec_l, l)))))
    C10 = _add(one, nd(_mul(prod_c, dtau, c)))          # spurious capacity
    # Ke[1][1] = intended block + the misplaced "[1][2]" accumulation
    C11 = _add(one, nd(_add(_mul(prod_c, tau), _mul(prod_c, dtau, c),
                            _neg(_mul(nec_c, n)))),
               one, nd(_add(_mul(prod_c, dtau, c),
                            _neg(_mul(nec_c, c)))))
    C20 = nd(_mul(nec_l, n))
    C21 = nd(_mul(nec_c, n))
    C22 = _add(one, nd(_add(_mul(nec_l, l), _mul(nec_c, c))))

    Dtau_c = _mul(dt2, _add(_bvec(_mul(dif_c, dtau), Gc),
                            bsig(_mul(mech_c, dtau, c))))
    D10 = Dtau_c
    D11 = _add(_mul(dt2, _add(_bvec(_mul(dif_c, dtau), Gc),
                              bsig(_mul(mech_c, dtau, c)),
                              bsig(_mul(mech_c, tau)))),
               Dtau_c)
    E11 = _mul(dt2, dif_c, tau)

    return WeakFormBlocks(
        A=A, B=B,
        C=((C00, C01, C02), (C10, C11, 0.0), (C20, C21, C22)),
        D=((0.0, 0.0, 0.0), (D10, D11, 0.0), (0.0, 0.0, 0.0)),
        E=((0.0, 0.0, 0.0), (0.0, E11, 0.0), (0.0, 0.0, 0.0)),
    )


def default_params():
    """Defaults of the coupled_hcc input() (src/coupled_hcc.C:350-370)."""
    return {
        "dt": 1.0,
        "cells_min_capacity": 0.0,
        "cells_max_capacity": 1.0,
        "cells_max_capacity_exponent": 1.0,
        "produce_l": 0.0,
        "diffuse_c": 0.0,
        "mechano_c": 0.0,
        "produce_c": 0.0,
        "necrosis_l": 0.0,
        "necrosis_c": 0.0,
        "necrosis_pressure": 0.0,
    }
