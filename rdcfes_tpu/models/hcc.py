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

from ..fem.weakform import WeakForm
from .pihna import crowding_factor

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
