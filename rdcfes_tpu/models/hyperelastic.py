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
