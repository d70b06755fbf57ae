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


# ======================================================================
# Block-sparse weak form + matrix-free coefficient application (qp-apply)
# ======================================================================
#
# The dense WeakForm stacks above materialize every (v, w) block even when
# a deck turns a whole operator off (run/PIHNA/input.dat: diffuse/c = 0,
# taxis/* = 0 — most of the 25 PIHNA Jacobian blocks are runtime zeros).
# The block-sparse form keeps each block as an individual array OR the
# Python float 0.0, so
#
#   * physics functions can drop dead blocks at TRACE time when the deck
#     parameters are passed as static Python scalars, and
#   * the Krylov matvec can be applied STRAIGHT FROM THE COEFFICIENTS
#     (gather x -> interpolate at qp -> apply (V, V, Q, E) blocks ->
#     project back with phi/dphi -> restrict) without ever materializing
#     the (V, V, K, K, E) element matrices — the assembled-Ke read was the
#     single largest HBM stream of the round-1 step.
#
# Math: for LHS blocks C (mass), D (taxis), E (diffusion),
#   (A x)_i = sum_q JxW [ phi_qi * C.x_qp  +  dphi_qi . (D x_qp + E gx_qp) ]
# which is exactly the RHS quadrature of element_vectors with
#   A_coef = C.x_qp,  B_coef = D x_qp + E gx_qp.

def _is_zero(x) -> bool:
    return isinstance(x, (int, float)) and x == 0.0


class WeakFormBlocks(NamedTuple):
    """Per-block weak-form coefficients; any entry may be the Python float
    0.0 meaning structurally absent (dropped from the compiled program).

    A : [V] of (Q, E)        rhs mass coefficients
    B : [V] of (Q, 3, E)     rhs flux coefficients
    C : [V][V] of (Q, E)     jacobian mass blocks
    D : [V][V] of (Q, 3, E)  jacobian taxis blocks
    E : [V][V] of (Q, E)     jacobian diffusion blocks
    """

    A: tuple
    B: tuple
    C: tuple
    D: tuple
    E: tuple

    @property
    def n_vars(self) -> int:
        return len(self.A)

    def to_dense(self):
        """Dense WeakForm with identical values (zeros materialized) —
        single source of truth for the legacy stacked-API consumers."""
        V = self.n_vars
        ref = next(a for a in self.A if not _is_zero(a))
        zero = jnp.zeros_like(ref)
        zero3 = jnp.zeros(ref.shape[:1] + (3,) + ref.shape[1:], ref.dtype)
        fill = lambda x, z: z if _is_zero(x) else x
        return WeakForm(
            A=jnp.stack([fill(a, zero) for a in self.A]),
            B=jnp.stack([fill(b, zero3) for b in self.B]),
            C=jnp.stack([jnp.stack([fill(c, zero) for c in row])
                         for row in self.C]),
            D=jnp.stack([jnp.stack([fill(d, zero3) for d in row])
                         for row in self.D]),
            E=jnp.stack([jnp.stack([fill(e, zero) for e in row])
                         for row in self.E]),
        )

    def cast(self, dtype):
        f = lambda x: x if _is_zero(x) else x.astype(dtype)
        return WeakFormBlocks(
            A=tuple(f(a) for a in self.A),
            B=tuple(f(b) for b in self.B),
            C=tuple(tuple(f(c) for c in row) for row in self.C),
            D=tuple(tuple(f(d) for d in row) for row in self.D),
            E=tuple(tuple(f(e) for e in row) for row in self.E),
        )


def _accum(terms):
    live = [t for t in terms if t is not None]
    if not live:
        return None
    acc = live[0]
    for t in live[1:]:
        acc = acc + t
    return acc


def block_rhs(wfb: WeakFormBlocks, phi, JxW, dphi) -> jnp.ndarray:
    """Fe (V, K, E) from block A/B coefficients (element_vectors without
    the dense stack; dead vars contribute genuine zeros)."""
    Q, K = phi.shape
    E_dim = JxW.shape[-1]
    rows = []
    for v in range(wfb.n_vars):
        cols = []
        for k in range(K):
            terms = []
            for q in range(Q):
                if not _is_zero(wfb.A[v]):
                    terms.append((JxW[q] * float(phi[q, k])) * wfb.A[v][q])
                if not _is_zero(wfb.B[v]):
                    for d in range(3):
                        terms.append(
                            (JxW[q] * dphi[q, k, d]) * wfb.B[v][q, d])
            acc = _accum(terms)
            cols.append(jnp.zeros((E_dim,), JxW.dtype) if acc is None else acc)
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)


def qp_apply(wfb: WeakFormBlocks, phi, JxW, dphi, x_qp, gx_qp) -> jnp.ndarray:
    """Element contributions Ye (V, K, E) of the LHS operator applied to a
    vector already interpolated at quadrature points — the matrix-free
    matvec core.  x_qp (V, Q, E); gx_qp (V, Q, 3, E)."""
    V = wfb.n_vars
    # z[v][q] (E,) mass response; zg[v][q][d] (E,) flux response
    A_coef = []
    B_coef = []
    for v in range(V):
        zq = []
        for q in range(phi.shape[0]):
            terms = [wfb.C[v][w][q] * x_qp[w, q]
                     for w in range(V) if not _is_zero(wfb.C[v][w])]
            zq.append(_accum(terms))
        A_coef.append(zq)
        zgq = []
        for q in range(phi.shape[0]):
            per_d = []
            for d in range(3):
                terms = [wfb.D[v][w][q, d] * x_qp[w, q]
                         for w in range(V) if not _is_zero(wfb.D[v][w])]
                terms += [wfb.E[v][w][q] * gx_qp[w, q, d]
                          for w in range(V) if not _is_zero(wfb.E[v][w])]
                per_d.append(_accum(terms))
            zgq.append(per_d)
        B_coef.append(zgq)

    Q, K = phi.shape
    E_dim = JxW.shape[-1]
    rows = []
    for v in range(V):
        cols = []
        for k in range(K):
            terms = []
            for q in range(Q):
                if A_coef[v][q] is not None:
                    terms.append((JxW[q] * float(phi[q, k])) * A_coef[v][q])
                for d in range(3):
                    if B_coef[v][q][d] is not None:
                        terms.append(
                            (JxW[q] * dphi[q, k, d]) * B_coef[v][q][d])
            acc = _accum(terms)
            cols.append(jnp.zeros((E_dim,), JxW.dtype) if acc is None else acc)
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)


def block_rhs_affine(wfb: WeakFormBlocks, phi, JxW, dphi) -> jnp.ndarray:
    """block_rhs for AFFINE elements (P1/TET4): the flux projection's
    shape gradient is q-independent, so sum_q JxW[q]*B[v][q,d] is
    pre-contracted once and the K*Q*3 flux expansion becomes K*3.
    Identical sum reassociated (f64 ~1e-16)."""
    Q, K = phi.shape
    E_dim = JxW.shape[-1]
    dphi0 = dphi[0]
    rows = []
    for v in range(wfb.n_vars):
        Bsum = None
        if not _is_zero(wfb.B[v]):
            per_d = []
            for d in range(3):
                acc = JxW[0] * wfb.B[v][0, d]
                for q in range(1, Q):
                    acc = acc + JxW[q] * wfb.B[v][q, d]
                per_d.append(acc)
            Bsum = per_d
        cols = []
        for k in range(K):
            terms = []
            if not _is_zero(wfb.A[v]):
                for q in range(Q):
                    terms.append((JxW[q] * float(phi[q, k])) * wfb.A[v][q])
            if Bsum is not None:
                for d in range(3):
                    terms.append(dphi0[k, d] * Bsum[d])
            acc = _accum(terms)
            cols.append(jnp.zeros((E_dim,), JxW.dtype) if acc is None else acc)
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)


def diffusion_presum(wfb: WeakFormBlocks, JxW):
    """Per-step pre-contraction for the affine (TET4) apply path: with
    q-independent shape gradients the diffusion flux's ONLY q-dependence
    is the coefficient, so sum_q JxW[q] * E[v][w][q] folds into one (E,)
    weight per live block.  Computed once per step, consumed by every
    Krylov matvec through qp_apply_affine."""
    V = wfb.n_vars
    Q = JxW.shape[0]
    rows = []
    for v in range(V):
        row = []
        for w in range(V):
            if _is_zero(wfb.E[v][w]):
                row.append(0.0)
            else:
                acc = JxW[0] * wfb.E[v][w][0]
                for q in range(1, Q):
                    acc = acc + JxW[q] * wfb.E[v][w][q]
                row.append(acc)
        rows.append(tuple(row))
    return tuple(rows)


def qp_apply_affine(wfb: WeakFormBlocks, Epre, phi, JxW, dphi,
                    x_qp, gx) -> jnp.ndarray:
    """qp_apply for AFFINE elements (P1/TET4): the shape gradients and
    therefore grad(x) are q-independent, so the flux response contracts
    over q before the k-projection — the same sum as qp_apply,
    reassociated (f64 difference ~1e-16), at ~2.4x fewer f64 ops:
    the K*Q*3 flux projection becomes K*3 and the diffusion coefficient
    q-sum is hoisted per step (Epre = diffusion_presum(wfb, JxW)).

    x_qp (V, Q, E); gx (V, 3, E) the q-independent gradient of x
    (interpolate_ue_affine).
    """
    V = wfb.n_vars
    Q, K = phi.shape
    E_dim = JxW.shape[-1]
    # mass response per q (q-dependent coefficient AND x), as qp_apply
    A_coef = []
    for v in range(V):
        zq = []
        for q in range(Q):
            terms = [wfb.C[v][w][q] * x_qp[w, q]
                     for w in range(V) if not _is_zero(wfb.C[v][w])]
            zq.append(_accum(terms))
        A_coef.append(zq)
    # flux response, q-collapsed: Fd[v][d] =
    #   sum_w sum_q JxW[q]*D[v][w][q,d]*x_qp[w,q]   (taxis: x per q)
    # + sum_w Epre[v][w]*gx[w,d]                    (diffusion: hoisted)
    Fd = []
    for v in range(V):
        per_d = []
        for d in range(3):
            terms = []
            for w in range(V):
                if not _is_zero(wfb.D[v][w]):
                    acc = (JxW[0] * wfb.D[v][w][0, d]) * x_qp[w, 0]
                    for q in range(1, Q):
                        acc = acc + (JxW[q] * wfb.D[v][w][q, d]) * x_qp[w, q]
                    terms.append(acc)
                if not _is_zero(Epre[v][w]):
                    terms.append(Epre[v][w] * gx[w, d])
            per_d.append(_accum(terms))
        Fd.append(per_d)
    dphi0 = dphi[0]  # (K, 3, E): q-independent gradients
    rows = []
    for v in range(V):
        cols = []
        for k in range(K):
            terms = []
            for q in range(Q):
                if A_coef[v][q] is not None:
                    terms.append((JxW[q] * float(phi[q, k])) * A_coef[v][q])
            for d in range(3):
                if Fd[v][d] is not None:
                    terms.append(dphi0[k, d] * Fd[v][d])
            acc = _accum(terms)
            cols.append(jnp.zeros((E_dim,), JxW.dtype) if acc is None else acc)
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)


def block_diag_affine(wfb: WeakFormBlocks, phi, JxW, dphi) -> jnp.ndarray:
    """block_diag for AFFINE elements (P1/TET4): the diffusion term's
    gradient-squared factor is q-independent, so its coefficient q-sum
    (diffusion_presum) is computed once and multiplied by
    gg_i = sum_d dphi[0,i,d]^2; the D (taxis) term similarly hoists its
    q-sum per direction.  Same sums reassociated."""
    V = wfb.n_vars
    Q, K = phi.shape
    E_dim = JxW.shape[-1]
    zero = jnp.zeros((E_dim,), JxW.dtype)
    dphi0 = dphi[0]
    Epre = diffusion_presum(wfb, JxW)
    gg = [
        dphi0[i, 0] * dphi0[i, 0] + dphi0[i, 1] * dphi0[i, 1]
        + dphi0[i, 2] * dphi0[i, 2] for i in range(K)]
    out_rows = []
    for v in range(V):
        row = []
        for w in range(V):
            # taxis: sum_q JxW[q]*phi[q,i]*D[q,d] needs the phi factor,
            # so pre-sum per (i, d) pair stays q-looped but the dphi
            # multiply hoists out of q
            cols = []
            for i in range(K):
                terms = []
                if not _is_zero(wfb.C[v][w]):
                    acc = (JxW[0] * float(phi[0, i] * phi[0, i])) * wfb.C[v][w][0]
                    for q in range(1, Q):
                        acc = acc + (JxW[q] * float(phi[q, i] * phi[q, i])) * wfb.C[v][w][q]
                    terms.append(acc)
                if not _is_zero(wfb.D[v][w]):
                    for d in range(3):
                        acc = (JxW[0] * float(phi[0, i])) * wfb.D[v][w][0, d]
                        for q in range(1, Q):
                            acc = acc + (JxW[q] * float(phi[q, i])) * wfb.D[v][w][q, d]
                        terms.append(dphi0[i, d] * acc)
                if not _is_zero(Epre[v][w]):
                    terms.append(Epre[v][w] * gg[i])
                acc = _accum(terms)
                cols.append(zero if acc is None else acc)
            row.append(jnp.stack(cols, axis=0))
        out_rows.append(jnp.stack(row, axis=0))
    return jnp.stack(out_rows, axis=0)


def block_diag(wfb: WeakFormBlocks, phi, JxW, dphi) -> jnp.ndarray:
    """diag_e (V, V, K, E): the per-element (i, i) entries of each (v, w)
    block, for the block-Jacobi preconditioner — computed straight from the
    coefficients, no Ke materialization."""
    V = wfb.n_vars
    Q, K = phi.shape
    E_dim = JxW.shape[-1]
    zero = jnp.zeros((E_dim,), JxW.dtype)
    out_rows = []
    for v in range(V):
        row = []
        for w in range(V):
            cols = []
            for i in range(K):
                terms = []
                for q in range(Q):
                    if not _is_zero(wfb.C[v][w]):
                        terms.append(
                            (JxW[q] * float(phi[q, i] * phi[q, i]))
                            * wfb.C[v][w][q])
                    if not _is_zero(wfb.D[v][w]):
                        dd = _accum([
                            wfb.D[v][w][q, d] * dphi[q, i, d]
                            for d in range(3)])
                        terms.append((JxW[q] * float(phi[q, i])) * dd)
                    if not _is_zero(wfb.E[v][w]):
                        gg = (dphi[q, i, 0] * dphi[q, i, 0]
                              + dphi[q, i, 1] * dphi[q, i, 1]
                              + dphi[q, i, 2] * dphi[q, i, 2])
                        terms.append(JxW[q] * wfb.E[v][w][q] * gg)
                acc = _accum(terms)
                cols.append(zero if acc is None else acc)
            row.append(jnp.stack(cols, axis=0))
        out_rows.append(jnp.stack(row, axis=0))
    return jnp.stack(out_rows, axis=0)


def block_element_matrices(wfb: WeakFormBlocks, phi, JxW, dphi,
                           grad_const: bool = False) -> jnp.ndarray:
    """Ke (V, W, K, K, E) from the block-sparse coefficients — identical
    math to element_matrices on to_dense(wfb), but dead blocks cost nothing
    to compute (their Ke entries are broadcast zeros)."""
    V = wfb.n_vars
    Q, K = phi.shape
    E_dim = JxW.shape[-1]
    zeroblk = jnp.zeros((K, K, E_dim), JxW.dtype)
    if grad_const:
        dphi0 = dphi[0]  # (K, 3, E)
        gg = [[dphi0[i, 0] * dphi0[j, 0] + dphi0[i, 1] * dphi0[j, 1]
               + dphi0[i, 2] * dphi0[j, 2] for j in range(K)]
              for i in range(K)]
    out_rows = []
    for v in range(V):
        row = []
        for w in range(V):
            c_blk = wfb.C[v][w]
            d_blk = wfb.D[v][w]
            e_blk = wfb.E[v][w]
            if _is_zero(c_blk) and _is_zero(d_blk) and _is_zero(e_blk):
                row.append(zeroblk)
                continue
            cq = None if _is_zero(c_blk) else [c_blk[q] * JxW[q] for q in range(Q)]
            eq = None if _is_zero(e_blk) else [e_blk[q] * JxW[q] for q in range(Q)]
            dq = None if _is_zero(d_blk) else [
                d_blk[q] * JxW[q][None, :] for q in range(Q)]
            if grad_const and eq is not None:
                esum = sum(eq[1:], eq[0])
            if grad_const and dq is not None:
                # pre-contract D over q per trial index j
                Dphi = [
                    [sum((dq[q][d] * float(phi[q, j]) for q in range(1, Q)),
                         dq[0][d] * float(phi[0, j])) for d in range(3)]
                    for j in range(K)
                ]
            blocks_i = []
            for i in range(K):
                cols = []
                for j in range(K):
                    acc = None
                    if cq is not None:
                        if grad_const:
                            acc = sum(
                                (cq[q] * float(phi[q, i] * phi[q, j])
                                 for q in range(1, Q)),
                                cq[0] * float(phi[0, i] * phi[0, j]))
                        else:
                            acc = sum(
                                (cq[q] * float(phi[q, i] * phi[q, j])
                                 for q in range(1, Q)),
                                cq[0] * float(phi[0, i] * phi[0, j]))
                    if dq is not None:
                        if grad_const:
                            t = (Dphi[j][0] * dphi0[i, 0]
                                 + Dphi[j][1] * dphi0[i, 1]
                                 + Dphi[j][2] * dphi0[i, 2])
                        else:
                            t = None
                            for q in range(Q):
                                tq = (dq[q][0] * dphi[q, i, 0]
                                      + dq[q][1] * dphi[q, i, 1]
                                      + dq[q][2] * dphi[q, i, 2]
                                      ) * float(phi[q, j])
                                t = tq if t is None else t + tq
                        acc = t if acc is None else acc + t
                    if eq is not None:
                        if grad_const:
                            t = esum * gg[i][j]
                        else:
                            t = None
                            for q in range(Q):
                                g = (dphi[q, i, 0] * dphi[q, j, 0]
                                     + dphi[q, i, 1] * dphi[q, j, 1]
                                     + dphi[q, i, 2] * dphi[q, j, 2])
                                tq = eq[q] * g
                                t = tq if t is None else t + tq
                        acc = t if acc is None else acc + t
                    cols.append(acc)
                blocks_i.append(jnp.stack(cols, axis=0))  # (K_j, E)
            row.append(jnp.stack(blocks_i, axis=0))  # (K_i, K_j, E)
        out_rows.append(jnp.stack(row, axis=0))
    return jnp.stack(out_rows, axis=0)  # (V, W, K, K, E)
