"""ADPM: 3-species Alzheimer's disease progression model.

Pointwise weak-form physics for the reference's ADPM driver
(src/adpm.C:324-652): species PrP (normal prion protein), A_b (amyloid-beta),
Tau (tau protein), with

* response-function-driven reaction terms: trapezoid transform Tr_,
  step-decay production SD_, rectangular-pulse gating Pi_ for
  decay/diffusion/taxis (src/adpm.C:497-530; functions in
  rdcfes_tpu.models.response)
* time-weighted PrP decay: decay coefficient scaled by time^gamma
  (src/adpm.C:368-369)
* fibre-tract-aligned anisotropic taxis with an angular tolerance gate:
  the taxis drift direction is +/- the element's tract vector when the
  (normalized) concentration gradient is within `taxis/<s>/angle` of it,
  else zero (src/adpm.C:473-492)

The Jacobian keeps only the terms the reference keeps (src/adpm.C:532-591);
all dropped terms are derivatives of piecewise-constant response functions or
of the tract gating, which vanish almost everywhere — so the blocks still
equal the a.e.-exact derivative of the RHS (verified by autodiff in
tests/test_adpm.py).

`fields` must contain "tracts": (E, 3) per-element fibre vectors (from the
elemental IC file, src/adpm.C:230-262) and "time": scalar simulation time.

`params` keys: dt, decay_PrP, decay_PrP_pulse0, decay_PrP_pulse1,
decay_PrP_time_exponent, transform_A_b, transform_A_b_t0..t3,
transform_Tau, transform_Tau_t0..t3, diffuse_A_b(+_pulse0/1),
taxis1_A_b(+_pulse0/1), taxis2_A_b(+_pulse0/1), produce_A_b(+_s0/_s1),
decay_A_b(+_pulse0/1), same for Tau, omega_A_b, omega_Tau (cosines of the
tolerance angles).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.weakform import WeakForm
from . import response as rf

ADPM_VARS = ("PrP", "A_b", "Tau")


def _triple(p, stem):
    return (p[stem], p[stem + "_pulse0"], p[stem + "_pulse1"])


def _sigmoid3(p, stem):
    return (p[stem], p[stem + "_s0"], p[stem + "_s1"])


def _trapezoid5(p, stem):
    return (p[stem], p[stem + "_t0"], p[stem + "_t1"], p[stem + "_t2"],
            p[stem + "_t3"])


def tract_gate(grad, tracts_qp, omega):
    """Gated taxis direction (src/adpm.C:477-492): +/- tract when the unit
    gradient aligns within the tolerance cosine `omega`, else zero.

    Channel-first: grad (Q, 3, E); tracts_qp (Q, 3, E) -> (Q, 3, E)."""
    norm = jnp.linalg.norm(grad, axis=-2, keepdims=True)  # (Q, 1, E)
    unit = grad / jnp.where(norm == 0.0, 1.0, norm)
    d = jnp.sum(unit * tracts_qp, axis=-2, keepdims=True)
    t = jnp.where(d > omega, tracts_qp, jnp.where(d < -omega, -tracts_qp, 0.0))
    return jnp.where(norm > 0.0, t, 0.0)


def adpm_physics(u_qp, grad_qp, fields, params):
    p = params
    dt2 = p["dt"] / 2.0
    time = fields["time"]
    tracts = fields["tracts"]  # (E, 3)

    PrP, Ab, Ta = u_qp[0], u_qp[1], u_qp[2]
    GAb, GTa = grad_qp[1], grad_qp[2]
    Q, E = PrP.shape
    # tracts (E, 3) -> channel-first (Q, 3, E)
    tracts_qp = jnp.broadcast_to(tracts.T[None, :, :], (Q, 3, E))

    # parameter tuples (src/adpm.C:368-411)
    gamma = p["decay_PrP_time_exponent"]
    decay_PrP = (p["decay_PrP"] * time**gamma,
                 p["decay_PrP_pulse0"], p["decay_PrP_pulse1"])
    diffuse_Ab = _triple(p, "diffuse_A_b")
    taxis1_Ab = _triple(p, "taxis1_A_b")
    taxis2_Ab = _triple(p, "taxis2_A_b")
    produce_Ab = _sigmoid3(p, "produce_A_b")
    transform_Ab = _trapezoid5(p, "transform_A_b")
    decay_Ab = _triple(p, "decay_A_b")
    diffuse_Ta = _triple(p, "diffuse_Tau")
    taxis1_Ta = _triple(p, "taxis1_Tau")
    taxis2_Ta = _triple(p, "taxis2_Tau")
    produce_Ta = _sigmoid3(p, "produce_Tau")
    transform_Ta = _trapezoid5(p, "transform_Tau")
    decay_Ta = _triple(p, "decay_Tau")

    tract_Ab = tract_gate(GAb, tracts_qp, p["omega_A_b"])
    tract_Ta = tract_gate(GTa, tracts_qp, p["omega_Tau"])

    Tr_Ab = rf.tr_(Ab, transform_Ab)
    Tr_Ta = rf.tr_(Ta, transform_Ta)
    dTr_Ab = rf.deriv_tr_(Ab, transform_Ab)
    dTr_Ta = rf.deriv_tr_(Ta, transform_Ta)
    SD_Ab = rf.sd_(Ab, produce_Ab)
    SD_Ta = rf.sd_(Ta, produce_Ta)
    dSD_Ab = rf.deriv_sd_(Ab, produce_Ab)
    dSD_Ta = rf.deriv_sd_(Ta, produce_Ta)
    Pi_decay_PrP = rf.pi_(PrP, decay_PrP)
    Pi_decay_Ab = rf.pi_(Ab, decay_Ab)
    Pi_decay_Ta = rf.pi_(Ta, decay_Ta)
    Pi_dif_Ab = rf.pi_(Ab, diffuse_Ab)
    Pi_dif_Ta = rf.pi_(Ta, diffuse_Ta)
    Pi_tax1_Ab = rf.pi_(Ab, taxis1_Ab)
    Pi_tax2_Ab = rf.pi_(Ta, taxis2_Ab)   # gated by Tau (src/adpm.C:514)
    Pi_tax1_Ta = rf.pi_(Ta, taxis1_Ta)
    Pi_tax2_Ta = rf.pi_(Ab, taxis2_Ta)   # gated by A_b (src/adpm.C:527)

    zero = jnp.zeros_like(PrP)
    zero3 = jnp.zeros_like(GAb)
    one = jnp.ones_like(PrP)

    # ---------------- RHS -------------------------------------------------
    A = jnp.stack(
        [
            PrP + dt2 * (-Tr_Ab * PrP - Tr_Ta * PrP - Pi_decay_PrP * PrP),
            Ab + dt2 * (SD_Ab * Ab + Tr_Ab * PrP - Pi_decay_Ab * Ab),
            Ta + dt2 * (SD_Ta * Ta + Tr_Ta * PrP - Pi_decay_Ta * Ta),
        ]
    )
    B = jnp.stack(
        [
            zero3,
            dt2 * (-Pi_dif_Ab[..., None, :] * GAb
                   - (Pi_tax1_Ab * Ab)[..., None, :] * tract_Ab
                   + (Pi_tax2_Ab * Ab)[..., None, :] * tract_Ta),
            dt2 * (-Pi_dif_Ta[..., None, :] * GTa
                   - (Pi_tax1_Ta * Ta)[..., None, :] * tract_Ta
                   + (Pi_tax2_Ta * Ta)[..., None, :] * tract_Ab),
        ]
    )

    # ---------------- Jacobian (src/adpm.C:532-591) -----------------------
    C00 = one - dt2 * (-Tr_Ab - Tr_Ta - Pi_decay_PrP)
    C01 = -dt2 * (-dTr_Ab * PrP)
    C02 = -dt2 * (-dTr_Ta * PrP)
    C10 = -dt2 * Tr_Ab
    C11 = one - dt2 * (SD_Ab + dSD_Ab * Ab + dTr_Ab * PrP - Pi_decay_Ab)
    D11 = -dt2 * (-Pi_tax1_Ab[..., None, :] * tract_Ab
                  + Pi_tax2_Ab[..., None, :] * tract_Ta)
    E11 = dt2 * Pi_dif_Ab
    C20 = -dt2 * Tr_Ta
    C22 = one - dt2 * (SD_Ta + dSD_Ta * Ta + dTr_Ta * PrP - Pi_decay_Ta)
    D22 = -dt2 * (-Pi_tax1_Ta[..., None, :] * tract_Ta
                  + Pi_tax2_Ta[..., None, :] * tract_Ab)
    E22 = dt2 * Pi_dif_Ta

    C = jnp.stack(
        [
            jnp.stack([C00, C01, C02]),
            jnp.stack([C10, C11, zero]),
            jnp.stack([C20, zero, C22]),
        ]
    )
    D = jnp.stack(
        [
            jnp.stack([zero3, zero3, zero3]),
            jnp.stack([zero3, D11, zero3]),
            jnp.stack([zero3, zero3, D22]),
        ]
    )
    Emat = jnp.stack(
        [
            jnp.stack([zero, zero, zero]),
            jnp.stack([zero, E11, zero]),
            jnp.stack([zero, zero, E22]),
        ]
    )
    return WeakForm(A=A, B=B, C=C, D=D, E=Emat)


def default_params():
    """Defaults of the ADPM input() (src/adpm.C:169-225); omega_* are cosines
    of the tolerance angles (default 89.9 degrees)."""
    import numpy as np

    d = {
        "dt": 1.0e-9,
        "decay_PrP": 0.0, "decay_PrP_pulse0": -1.0e-20,
        "decay_PrP_pulse1": 1.0e20, "decay_PrP_time_exponent": 0.0,
        "transform_A_b": 0.0, "transform_A_b_t0": -1.1e-20,
        "transform_A_b_t1": -1.0e-20, "transform_A_b_t2": 1.0e20,
        "transform_A_b_t3": 1.1e20,
        "transform_Tau": 0.0, "transform_Tau_t0": -1.1e-20,
        "transform_Tau_t1": -1.0e-20, "transform_Tau_t2": 1.0e20,
        "transform_Tau_t3": 1.1e20,
        "omega_A_b": float(np.cos(np.deg2rad(89.9))),
        "omega_Tau": float(np.cos(np.deg2rad(89.9))),
    }
    for s in ("A_b", "Tau"):
        d.update({
            f"diffuse_{s}": 0.0, f"diffuse_{s}_pulse0": -1.0e-20,
            f"diffuse_{s}_pulse1": 1.0e20,
            f"taxis1_{s}": 0.0, f"taxis1_{s}_pulse0": -1.0e-20,
            f"taxis1_{s}_pulse1": 1.0e20,
            f"taxis2_{s}": 0.0, f"taxis2_{s}_pulse0": -1.0e-20,
            f"taxis2_{s}_pulse1": 1.0e20,
            f"produce_{s}": 0.0, f"produce_{s}_s0": 1.0e20,
            f"produce_{s}_s1": 1.1e20,
            f"decay_{s}": 0.0, f"decay_{s}_pulse0": -1.0e-20,
            f"decay_{s}_pulse1": 1.0e20,
        })
    return d
