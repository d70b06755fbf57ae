"""Hyperelastic constitutive oracle: literal transcription of the
reference's calculate_stress (reference src/hyperlastic_inline.h:17-189).

Plain nested-loop NumPy, one evaluation per call — written to be
line-for-line checkable against the C source (including the inert
dWdI2/d2I2 terms), so the framework's two evaluators
(models/hyperelastic.stress_and_tangent — batched einsums — and
stress_and_tangent_cf — the rank-structured channel-first reduction) can
both be verified against the reference's OWN derivation chain rather than
only against each other / autodiff.
"""

from __future__ import annotations

import numpy as np

_VOIGT = ((0, 0), (1, 1), (2, 2), (0, 1), (1, 2), (0, 2))


def calculate_stress(F, Fp, A, young, poisson, fibre_stiffness,
                     calculate_tangent=True):
    """(sigma (3,3), tangent (6,6) or None) for ONE material point.

    F  : total deformation gradient (3, 3)
    Fp : growth tensor (3, 3) (diagonal in the reference's usage)
    A  : fibre unit vector (3,) (contributes only via dWdI4 = -koppa)
    """
    mu = 0.5 * young / (1.0 + poisson)
    lam = young * poisson / ((1.0 + poisson) * (1.0 - 2.0 * poisson))
    koppa = fibre_stiffness / 2.0

    FpINV = np.linalg.inv(Fp)
    Fe = F @ FpINV
    Ce = Fe.T @ Fe
    CeINV = np.linalg.inv(Ce)
    delta = np.eye(3)

    I1 = np.trace(Ce)
    Je = np.linalg.det(Fe)
    J_recip = 1.0 / np.linalg.det(F)

    dWdI1 = mu / 2.0
    dWdI2 = 0.0
    dWdJe = (-mu / Je) + (lam / 2.0 * Je - lam / 2.0 / Je)
    dWdI4 = -koppa
    d2WdJedJe = (mu / Je / Je) + (lam / 2.0 + lam / 2.0 / Je / Je)

    dI1dCe = np.zeros((3, 3))
    dI2dCe = np.zeros((3, 3))
    dJedCe = np.zeros((3, 3))
    dI4dCe = np.zeros((3, 3))
    d2I2 = np.zeros((3, 3, 3, 3))
    d2Je = np.zeros((3, 3, 3, 3))
    for i in range(3):
        for j in range(3):
            dI1dCe[i, j] = delta[i, j]
            dI2dCe[i, j] = delta[i, j] * I1 - Ce[i, j]
            dJedCe[i, j] = 0.5 * Je * CeINV[i, j]
            dI4dCe[i, j] = A[i] * A[j]
            for k in range(3):
                for l in range(3):
                    d2I2[i, j, k, l] = (delta[i, j] * delta[k, l]
                                        - 0.5 * delta[i, k] * delta[j, l]
                                        - 0.5 * delta[i, l] * delta[j, k])
                    d2Je[i, j, k, l] = (
                        0.25 * Je * CeINV[i, j] * CeINV[k, l]
                        - 0.25 * Je * CeINV[i, k] * CeINV[j, l]
                        - 0.25 * Je * CeINV[i, l] * CeINV[j, k])

    S2pk = (2.0 * dWdI1 * dI1dCe + 2.0 * dWdI2 * dI2dCe
            + 2.0 * dWdJe * dJedCe + 2.0 * dWdI4 * dI4dCe)
    sigma = (F @ S2pk @ F.T) * J_recip

    if not calculate_tangent:
        return sigma, None

    dSdCe = np.zeros((3, 3, 3, 3))
    dCedC = np.zeros((3, 3, 3, 3))
    for i in range(3):
        for j in range(3):
            for k in range(3):
                for l in range(3):
                    dSdCe[i, j, k, l] = (
                        4.0 * dWdI2 * d2I2[i, j, k, l]
                        + 4.0 * dWdJe * d2Je[i, j, k, l]
                        + 4.0 * d2WdJedJe * dJedCe[i, j] * dJedCe[k, l])
                    dCedC[i, j, k, l] = (
                        0.5 * FpINV[k, i] * FpINV[j, l]
                        + 0.5 * FpINV[l, i] * FpINV[k, j])

    dSdC = np.einsum("ijmn,mnkl->ijkl", dSdCe, dCedC)
    tsm = np.einsum("iI,jJ,kK,lL,IJKL->ijkl", F, F, F, F, dSdC) * J_recip

    tangent = np.zeros((6, 6))
    for r, (i, j) in enumerate(_VOIGT):
        for c, (k, l) in enumerate(_VOIGT):
            tangent[r, c] = tsm[i, j, k, l]
    return sigma, tangent
