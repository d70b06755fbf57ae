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

    phi (Q, K); JxW (Q, E); dphi (Q, K, 3, E).

    Statically unrolled over (q, k, d): contractions over the tiny
    quadrature/node/direction dims are written as elementwise
    multiply-accumulates so XLA:TPU never assigns a small dim to the tiled
    lane axis (a dot over d=3 lays the 1.3 GB operands out with 34x tile
    padding)."""
    Q, K = phi.shape
    cols = []
    for k in range(K):
        acc = None
        for q in range(Q):
            if wf.A is not None:
                term = (JxW[q] * float(phi[q, k])) * wf.A[:, q]  # (V, E)
                acc = term if acc is None else acc + term
            if wf.B is not None:
                for d in range(3):
                    term = (JxW[q] * dphi[q, k, d]) * wf.B[:, q, d]
                    acc = term if acc is None else acc + term
        if acc is None:
            raise ValueError("empty weak form rhs")
        cols.append(acc)
    return jnp.stack(cols, axis=1)  # (V, K, E)


def element_matrices(wf: WeakForm, phi: jnp.ndarray, JxW: jnp.ndarray,
                     dphi: jnp.ndarray, grad_const: bool = False,
                     return_diag: bool = False):
    """Ke (V, W, K_i, K_j, E) — i = test (row) index, j = trial (column).

    Fully unrolled over (q, i, j, d) with elementwise multiply-accumulates
    on (V, W, E) arrays: a single fused einsum materializes the full
    (Q, E, K, K, V, V) outer product before reducing (43 GB at brain scale),
    and any dot contracting over the tiny q/d dims forces tile-padded
    layouts on the big coefficient arrays.  Elementwise chains keep every
    array (..., E)-minor and fuse on the VPU.

    grad_const=True enables the affine-element (TET4) fast path: shape
    gradients are identical at every quadrature point, so the diffusion
    term collapses to (sum_q JxW*E_q) * (dphi_i . dphi_j) — one multiply
    per (i, j) instead of Q — and the taxis term pre-contracts D over q
    per trial function before dotting with the constant gradients.  Pure
    reassociation of the q-sum: same value to f64 round-off.

    return_diag=True additionally returns diag_e (V, W, K, E), the (i, i)
    sub-blocks, sliced before the big stack so the block-Jacobi
    preconditioner setup does not re-read the full Ke from HBM."""
    if wf.C is None and wf.D is None and wf.E is None:
        raise ValueError("empty weak form matrix")
    Q, K = phi.shape
    # JxW-premultiplied coefficient slices, shared across all (i, j) blocks
    cqs = [wf.C[:, :, q] * JxW[q] for q in range(Q)] if wf.C is not None else None
    eqs = [wf.E[:, :, q] * JxW[q] for q in range(Q)] if wf.E is not None else None
    if wf.D is not None:
        Dqs = [wf.D[:, :, q] * JxW[q][None, None, None, :] for q in range(Q)]
    if grad_const:
        dphi0 = dphi[0]  # (K, 3, E): q-invariant for affine elements
        esum = sum(eqs[1:], eqs[0]) if eqs is not None else None
        if wf.D is not None:
            # pre-contract over q per trial index: (V, W, E) per (j, d)
            Dphi = [
                [sum((Dqs[q][:, :, d] * float(phi[q, j]) for q in range(1, Q)),
                     Dqs[0][:, :, d] * float(phi[0, j]))
                 for d in range(3)]
                for j in range(K)
            ]
    elif wf.D is not None:
        # (D . dphi_i) per (q, i): sum over the 3 directions, elementwise
        t1s = [
            [
                Dqs[q][:, :, 0] * dphi[q, i, 0]
                + Dqs[q][:, :, 1] * dphi[q, i, 1]
                + Dqs[q][:, :, 2] * dphi[q, i, 2]
                for i in range(K)
            ]
            for q in range(Q)
        ]
    blocks = []
    diag = []
    for i in range(K):
        row = []
        for j in range(K):
            if grad_const:
                acc = None
                if cqs is not None:
                    acc = sum(
                        (cqs[q] * float(phi[q, i] * phi[q, j])
                         for q in range(1, Q)),
                        cqs[0] * float(phi[0, i] * phi[0, j]),
                    )
                if wf.D is not None:
                    t = (Dphi[j][0] * dphi0[i, 0]
                         + Dphi[j][1] * dphi0[i, 1]
                         + Dphi[j][2] * dphi0[i, 2])
                    acc = t if acc is None else acc + t
                if esum is not None:
                    gg = (dphi0[i, 0] * dphi0[j, 0]
                          + dphi0[i, 1] * dphi0[j, 1]
                          + dphi0[i, 2] * dphi0[j, 2])  # (E,)
                    t = esum * gg
                    acc = t if acc is None else acc + t
                row.append(acc)
            else:
                terms = []
                for q in range(Q):
                    acc = None
                    if cqs is not None:
                        acc = cqs[q] * float(phi[q, i] * phi[q, j])
                    if wf.D is not None:
                        t = t1s[q][i] * float(phi[q, j])
                        acc = t if acc is None else acc + t
                    if eqs is not None:
                        gg = (dphi[q, i, 0] * dphi[q, j, 0]
                              + dphi[q, i, 1] * dphi[q, j, 1]
                              + dphi[q, i, 2] * dphi[q, j, 2])  # (E,)
                        t = eqs[q] * gg
                        acc = t if acc is None else acc + t
                    terms.append(acc)
                row.append(sum(terms[1:], terms[0]))
        diag.append(row[i])
        blocks.append(jnp.stack(row, axis=2))  # (V, W, K_j, E)
    Ke = jnp.stack(blocks, axis=2)  # (V, W, K_i, K_j, E)
    if return_diag:
        return Ke, jnp.stack(diag, axis=2)  # (V, W, K, E)
    return Ke
