"""Weak-form coefficient abstraction and batched element kernels.

Every RDC model in the reference assembles, per quadrature point, element
contributions of exactly three bilinear shapes and two linear shapes
(see the i/j loops of src/pihna.C:511-748, src/adpm.C:494-592,
src/proteas.C:516-697, src/ripf.C:563-665, src/coupled_hcc.C:537-639):

  RHS   : Fe_v(i)    += JxW * ( A_v * phi_i  +  B_v . dphi_i )
  Matrix: Ke_vw(i,j) += JxW * ( C_vw * phi_j phi_i
                              + (D_vw . dphi_i) phi_j
                              + Emat_vw * (dphi_j . dphi_i) )

so a model is fully described by the five coefficient fields (A, B, C, D, E)
evaluated from old-solution values at quadrature points.  This turns the
reference's branchy scalar qp loops into batched einsums over all elements —
dense, static-shaped MXU/VPU work — and makes every model share one assembly
code path.  Jacobian blocks can also be cross-checked against autodiff of the
RHS coefficients (tests do this).

LAYOUT: element axis LAST (see fem.geometry docstring for the TPU tiling
rationale).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class WeakForm(NamedTuple):
    """Per-quadrature-point weak-form coefficients.

    Shapes (V = number of variables, E = elements, Q = quadrature points):
      A : (V, Q, E)        rhs mass-type coefficient
      B : (V, Q, 3, E)     rhs flux-type coefficient (dotted with dphi_i)
      C : (V, V, Q, E)     jacobian mass block  (phi_j phi_i)
      D : (V, V, Q, 3, E)  jacobian taxis block ((D . dphi_i) phi_j)
      E : (V, V, Q, E)     jacobian diffusion block (dphi_j . dphi_i)
    Any field may be None meaning identically zero.
    """

    A: Optional[jnp.ndarray] = None
    B: Optional[jnp.ndarray] = None
    C: Optional[jnp.ndarray] = None
    D: Optional[jnp.ndarray] = None
    E: Optional[jnp.ndarray] = None


def element_vectors(wf: WeakForm, phi: jnp.ndarray, JxW: jnp.ndarray,
                    dphi: jnp.ndarray) -> jnp.ndarray:
    """Fe (V, K, E) from the rhs coefficients.

    phi (Q, K); JxW (Q, E); dphi (Q, K, 3, E)."""
    out = None
    if wf.A is not None:
        out = jnp.einsum("vqe,qe,qk->vke", wf.A, JxW, phi)
    if wf.B is not None:
        term = jnp.einsum("vqde,qe,qkde->vke", wf.B, JxW, dphi)
        out = term if out is None else out + term
    if out is None:
        raise ValueError("empty weak form rhs")
    return out


def element_matrices(wf: WeakForm, phi: jnp.ndarray, JxW: jnp.ndarray,
                     dphi: jnp.ndarray) -> jnp.ndarray:
    """Ke (V, W, K_i, K_j, E) — i = test (row) index, j = trial (column)."""
    out = None
    if wf.C is not None:
        out = jnp.einsum("vwqe,qe,qi,qj->vwije", wf.C, JxW, phi, phi)
    if wf.D is not None:
        term = jnp.einsum("vwqde,qe,qide,qj->vwije", wf.D, JxW, dphi, phi)
        out = term if out is None else out + term
    if wf.E is not None:
        term = jnp.einsum("vwqe,qe,qide,qjde->vwije", wf.E, JxW, dphi, dphi)
        out = term if out is None else out + term
    if out is None:
        raise ValueError("empty weak form matrix")
    return out
