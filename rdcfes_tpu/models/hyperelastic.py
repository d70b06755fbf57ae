"""Batched finite-strain hyperelastic constitutive model.

TPU-native replacement for the reference's per-quadrature-point Hyperelastic
class (src/hyperelastic.h:7-127, src/hyperlastic_inline.h:17-189):
compressible Neo-Hookean strain energy with a fibre (I4) reinforcement term
and a multiplicative growth decomposition F = Fe Fp with Fp = diag(lambda(t)).
Everything is evaluated for ALL elements x quadrature points at once as
einsums over (..., 3, 3) arrays — the 4th-order tangent contraction becomes a
handful of batched tensor products instead of 81-entry scalar loops.

Derivation (same constitutive law as the reference, re-derived):
  W(I1, Je, I4) with  dW/dI1 = mu/2,
                      dW/dJe = -mu/Je + (lambda/2)(Je - 1/Je),
                      dW/dI4 = -koppa          (koppa = FibreStiffness/2)
  S = 2 dW/dCe : dCe  pulled back through Fp, pushed forward with the TOTAL
  F and J = det F (as the reference does, src/hyperlastic_inline.h:83-92),
  spatial tangent  c = (1/J) F F F F : dS/dC  in 6x6 Voigt ordering
  (00, 11, 22, 01, 12, 02).

Material parameters are per-element arrays so multi-material meshes
(subdomain-keyed decks, src/solid.C:261-280) evaluate in one batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..fem.geometry import _inv3x3

# Voigt index pairs in the reference's ordering (src/hyperelastic.h:14-21)
VOIGT = ((0, 0), (1, 1), (2, 2), (0, 1), (1, 2), (0, 2))


class SolidMaterial(NamedTuple):
    """Per-element material constants (from the subdomain/material table)."""

    young: jnp.ndarray          # (E,)
    poisson: jnp.ndarray        # (E,)
    fibre_stiffness: jnp.ndarray  # (E,)
    stretch_rate: jnp.ndarray   # (E, 3) VolumetricStretchRatio/rate_*


def kinematics(grad_X: jnp.ndarray, lam: jnp.ndarray):
    """From the inverse-map gradient to (F, Fe, Fp_inv, J).

    grad_X : (..., 3, 3) with grad_X[d, r] = d X0_d / d x_r  (gradient of the
             undeformed coordinates on the CURRENT configuration, as
             accumulated in src/solid_system.C:221-229)
    lam    : (..., 3) growth stretches; Fp = diag(lam)
    """
    F, _ = _inv3x3(grad_X)  # deformation gradient = (dX/dx)^-1
    J = _det3(F)
    Fp_inv = 1.0 / lam  # diagonal
    Fe = F * Fp_inv[..., None, :]  # F @ diag(1/lam)
    return F, Fe, Fp_inv, J


def _det3(M):
    return (
        M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
        - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
        + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0])
    )


def stress_and_tangent(
    grad_X: jnp.ndarray,
    lam: jnp.ndarray,
    eta: jnp.ndarray,
    young: jnp.ndarray,
    poisson: jnp.ndarray,
    fibre_k: jnp.ndarray,
    want_tangent: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Cauchy stress (..., 3, 3), Voigt tangent (..., 6, 6) and F (..., 3, 3).

    eta: (..., 3) fibre direction in the reference configuration; used only
    where fibre_k > 0 (normalized internally, src/hyperelastic.h:46).
    """
    mu = 0.5 * young / (1.0 + poisson)
    lame = young * poisson / ((1.0 + poisson) * (1.0 - 2.0 * poisson))
    koppa = fibre_k / 2.0

    F, Fe, Fp_inv, J = kinematics(grad_X, lam)

    # fibre unit vector, active only when fibre stiffness is positive
    eta_norm = jnp.linalg.norm(eta, axis=-1, keepdims=True)
    A = jnp.where(
        (fibre_k > 0.0)[..., None],
        eta / jnp.where(eta_norm == 0.0, 1.0, eta_norm),
        0.0,
    )

    Ce = jnp.einsum("...ki,...kj->...ij", Fe, Fe)
    CeInv, _ = _inv3x3(Ce)
    Je = _det3(Fe)
    J_r = 1.0 / J

    dWdI1 = mu / 2.0
    dWdJe = -mu / Je + 0.5 * lame * Je - 0.5 * lame / Je
    dWdI4 = -koppa
    d2WdJe2 = mu / Je**2 + 0.5 * lame + 0.5 * lame / Je**2

    eye = jnp.broadcast_to(jnp.eye(3), Ce.shape)
    dJedCe = 0.5 * Je[..., None, None] * CeInv
    AA = A[..., :, None] * A[..., None, :]

    S = (
        2.0 * dWdI1[..., None, None] * eye
        + 2.0 * dWdJe[..., None, None] * dJedCe
        + 2.0 * dWdI4[..., None, None] * AA
    )
    # push-forward with the total F and J (reference behavior)
    sigma = jnp.einsum("...iI,...jJ,...IJ->...ij", F, F, S) * J_r[..., None, None]

    if not want_tangent:
        return sigma, None, F

    # dS/dCe = 4 dWdJe d2Je/dCe2 + 4 d2WdJe2 dJedCe (x) dJedCe
    Je4 = 0.25 * Je[..., None, None, None, None]
    CiCi = CeInv[..., :, :, None, None] * CeInv[..., None, None, :, :]
    Cik_jl = CeInv[..., :, None, :, None] * CeInv[..., None, :, None, :]
    Cil_jk = CeInv[..., :, None, None, :] * CeInv[..., None, :, :, None]
    d2Je = Je4 * (CiCi - Cik_jl - Cil_jk)
    dSdCe = (
        4.0 * dWdJe[..., None, None, None, None] * d2Je
        + 4.0 * d2WdJe2[..., None, None, None, None]
        * dJedCe[..., :, :, None, None] * dJedCe[..., None, None, :, :]
    )
    # chain rule through the growth pullback: dCe/dC via diagonal Fp_inv
    # dSdC[i,j,k,l] = dSdCe[i,j,m,n] * (1/2)(FpInv_km FpInv_nl + FpInv_lm FpInv_kn)
    # with diagonal FpInv this is a per-index scaling + symmetrization
    w = Fp_inv  # (..., 3)
    scaled = dSdCe * w[..., None, None, :, None] * w[..., None, None, None, :]
    dSdC = 0.5 * (scaled + jnp.swapaxes(scaled, -1, -2))
    # spatial tangent: (1/J) F F F F : dSdC
    FS = jnp.einsum("...iI,...jJ,...IJkl->...ijkl", F, F, dSdC)
    tsm = jnp.einsum("...kK,...lL,...ijKL->...ijkl", F, F, FS) * J_r[..., None, None, None, None]
    # condense to 6x6 Voigt
    rows = []
    for (i, j) in VOIGT:
        rows.append(jnp.stack([tsm[..., i, j, k, l] for (k, l) in VOIGT], axis=-1))
    tangent = jnp.stack(rows, axis=-2)
    return sigma, tangent, F


# ======================================================================
# Channel-first constitutive evaluation (production-scale solid path)
# ======================================================================
#
# Same constitutive law as stress_and_tangent, re-derived in a
# rank-structured form and laid out channel-first: every 3x3 tensor is a
# nested Python list of (..., B) arrays with the BIG batch axis minor, so
# nothing tile-pads on TPU (the (E, Q, 3, 3) einsum layout above pads the
# two 3-wide minor dims onto (8, 128) tiles — fine at O(10k) elements,
# ruinous at production scale).
#
# Tangent derivation: with Ci = Ce^-1 and the W-derivatives of the model,
#   dS/dCe = alpha Ci (x) Ci + beta (Ci [I,K] Ci [J,L] + Ci [I,L] Ci [J,K])
#   alpha  = dWdJe Je + d2WdJe2 Je^2,   beta = -dWdJe Je
# (the I4 fibre term has constant dW/dI4, so it contributes no tangent).
# The growth pullback scales columns by w = Fp^-1 and the push-forward
# contracts with the total F on all four legs, which collapses to
#   tsm = (1/J) [ alpha P (x) Qm + beta (Hm[i,k] Hm[j,l] + Hm[i,l] Hm[j,k]) ]
#   P  = F Ci F^T,   Qm = F Ciw F^T (Ciw = w_K w_L Ci),   Hm = F CiW F^T
#   (CiW = Ci with columns scaled by w)
# — three small matrix products instead of an 81x81 contraction chain.


def _m3(fn):
    return [[fn(i, j) for j in range(3)] for i in range(3)]


def _mm(A, B):
    """C = A @ B on 3x3 lists of batched arrays."""
    return _m3(lambda i, j: A[i][0] * B[0][j] + A[i][1] * B[1][j]
               + A[i][2] * B[2][j])


def _mmT(A, B):
    """C = A @ B^T."""
    return _m3(lambda i, j: A[i][0] * B[j][0] + A[i][1] * B[j][1]
               + A[i][2] * B[j][2])


def _det3_cf(M):
    return (M[0][0] * (M[1][1] * M[2][2] - M[1][2] * M[2][1])
            - M[0][1] * (M[1][0] * M[2][2] - M[1][2] * M[2][0])
            + M[0][2] * (M[1][0] * M[2][1] - M[1][1] * M[2][0]))


def _inv3_cf(M):
    A = M[1][1] * M[2][2] - M[1][2] * M[2][1]
    B = -(M[1][0] * M[2][2] - M[1][2] * M[2][0])
    C = M[1][0] * M[2][1] - M[1][1] * M[2][0]
    det = M[0][0] * A + M[0][1] * B + M[0][2] * C
    r = 1.0 / det
    inv = [
        [A * r, -(M[0][1] * M[2][2] - M[0][2] * M[2][1]) * r,
         (M[0][1] * M[1][2] - M[0][2] * M[1][1]) * r],
        [B * r, (M[0][0] * M[2][2] - M[0][2] * M[2][0]) * r,
         -(M[0][0] * M[1][2] - M[0][2] * M[1][0]) * r],
        [C * r, -(M[0][0] * M[2][1] - M[0][1] * M[2][0]) * r,
         (M[0][0] * M[1][1] - M[0][1] * M[1][0]) * r],
    ]
    return inv, det


def stress_and_tangent_cf(grad_X, lam, eta, young, poisson, fibre_k,
                          want_tangent: bool = True):
    """Channel-first constitutive evaluation.

    grad_X : 3x3 nested list of (..., B) arrays, grad_X[d][r] = dX0_d/dx_r
    lam    : [3] of (..., B) growth stretches
    eta    : [3] of (..., B) fibre direction (reference configuration)
    young, poisson, fibre_k : (..., B)

    Returns (sigma 3x3 list, tangent 6x6 list or None, F 3x3 list).
    Identical math to stress_and_tangent (associativity-level round-off)."""
    mu = 0.5 * young / (1.0 + poisson)
    lame = young * poisson / ((1.0 + poisson) * (1.0 - 2.0 * poisson))
    koppa = fibre_k / 2.0

    F, det_gradX = _inv3_cf(grad_X)  # F = (dX/dx)^-1
    # J = det F = 1 / det(grad_X): _inv3_cf's determinant is of its INPUT
    # (this line once scaled sigma by det(F)^2 — caught by the
    # reference-chain oracle, tests/test_parity_oracle.py)
    J = 1.0 / det_gradX
    w = [1.0 / lam[d] for d in range(3)]
    Fe = _m3(lambda i, j: F[i][j] * w[j])
    Ce = _m3(lambda i, j: Fe[0][i] * Fe[0][j] + Fe[1][i] * Fe[1][j]
             + Fe[2][i] * Fe[2][j])
    Ci, _detCe = _inv3_cf(Ce)
    Je = _det3_cf(Fe)
    J_r = 1.0 / J

    # fibre unit vector where fibre stiffness is active
    import jax.numpy as _jnp

    en = _jnp.sqrt(eta[0] ** 2 + eta[1] ** 2 + eta[2] ** 2)
    en_safe = _jnp.where(en == 0.0, 1.0, en)
    active = fibre_k > 0.0
    A = [_jnp.where(active, eta[d] / en_safe, 0.0) for d in range(3)]
    FA = [F[i][0] * A[0] + F[i][1] * A[1] + F[i][2] * A[2] for i in range(3)]

    dWdI1 = mu / 2.0
    dWdJe = -mu / Je + 0.5 * lame * Je - 0.5 * lame / Je
    dWdI4 = -koppa
    d2WdJe2 = mu / Je**2 + 0.5 * lame + 0.5 * lame / Je**2

    # sigma = (1/J)[ 2 dWdI1 F F^T + dWdJe Je P + 2 dWdI4 (FA)(FA)^T ]
    P = _mmT(_mm(F, Ci), F)  # F Ci F^T
    FFt = _mmT(F, F)
    s_vol = dWdJe * Je
    sigma = _m3(lambda i, j: J_r * (2.0 * dWdI1 * FFt[i][j]
                                    + s_vol * P[i][j]
                                    + 2.0 * dWdI4 * FA[i] * FA[j]))
    if not want_tangent:
        return sigma, None, F

    alpha = dWdJe * Je + d2WdJe2 * Je * Je
    beta = -dWdJe * Je
    Ciw = _m3(lambda k, l: Ci[k][l] * w[k] * w[l])
    CiW = _m3(lambda k, l: Ci[k][l] * w[l])
    Qm = _mmT(_mm(F, Ciw), F)
    Hm = _mmT(_mm(F, CiW), F)

    def tsm(i, j, k, l):
        return J_r * (alpha * P[i][j] * Qm[k][l]
                      + beta * (Hm[i][k] * Hm[j][l] + Hm[i][l] * Hm[j][k]))

    tangent = [[tsm(i, j, k, l) for (k, l) in VOIGT] for (i, j) in VOIGT]
    return sigma, tangent, F
