"""On-device Krylov solvers with block-Jacobi preconditioning.

TPU-native replacement for the PETSc KSP solve under `model.solve()`
(reference src/pihna.C:80; SuperLU_dist / distributed Krylov per
README.md:19).  Everything is pure JAX: `lax.while_loop` iteration,
static shapes, f64 arithmetic (the 1e-8 parity target needs it), and only
dot products / SpMVs inside the loop so a sharded deployment reduces to the
same program with `psum`-combined segment sums.

Defaults mirror the implicit libMesh/PETSc settings the reference runs
under: relative tolerance 1e-12 ("linear solver tolerance" =
TOLERANCE*TOLERANCE) and 5000 max iterations ("linear solver maximum
iterations"), the EquationSystems defaults used when a driver never sets
them (none of the RDC drivers do).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..fem.assembly import NodePairSparsity
from ..fem.bcsr import bcsr_matvec, extract_diagonal_blocks

DEFAULT_RTOL = 1e-12
DEFAULT_MAXITER = 5000


class SolveResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray       # iterations taken
    residual: jnp.ndarray    # final |r| / |b|


# ----------------------------------------------------------------------
# preconditioners
# ----------------------------------------------------------------------
def small_block_inverse(D: jnp.ndarray, pivot: bool = True) -> jnp.ndarray:
    """Batched inverse of small channel-first blocks D (V, V, N) -> (V, V, N)
    via Gauss-Jordan.

    TPU rationale: (a) the f64 path has no LuDecomposition lowering, so
    `jnp.linalg.inv` does not compile there; (b) channel-first layout keeps
    the big N axis on lanes (a (N, V, V) layout would tile-pad ~25x).  The
    unrolled V<=5 elimination is exact and compiles to plain VPU arithmetic.

    pivot=False skips partial pivoting (the argmax/row-permute ops dominate
    the kernel: 16 ms -> 1.8 ms measured on v5e for (5,5,24k) blocks, with
    9e-15 relative difference).  Safe whenever the blocks are diagonally
    dominant — true for the transient CN diagonal blocks, which are
    lumped-mass plus O(dt) coupling.
    """
    V = D.shape[0]
    N = D.shape[-1]
    if V == 1:
        return 1.0 / D
    A = D
    Inv = jnp.tile(jnp.eye(V, dtype=D.dtype)[:, :, None], (1, 1, N))
    row_ids = jnp.arange(V)[:, None]  # (V, 1)
    for k in range(V):
        if pivot:
            # partial pivot: largest |A[r, k, n]| among rows r >= k
            col = jnp.abs(A[:, k, :])  # (V, N)
            col = jnp.where(row_ids >= k, col, -jnp.inf)
            p = jnp.argmax(col, axis=0)  # (N,)
            perm = jnp.where(row_ids == k, p[None, :],
                             jnp.where(row_ids == p[None, :], k, row_ids))
            A = jnp.take_along_axis(A, perm[:, None, :], axis=0)
            Inv = jnp.take_along_axis(Inv, perm[:, None, :], axis=0)
        pivot_val = A[k, k, :]  # (N,)
        Ak = A[k] / pivot_val[None, :]      # (V, N) row k normalized
        Ik = Inv[k] / pivot_val[None, :]
        factor = A[:, k, :]             # (V, N)
        A = A - factor[:, None, :] * Ak[None, :, :]
        Inv = Inv - factor[:, None, :] * Ik[None, :, :]
        onehot = (jnp.arange(V) == k)[:, None, None]
        A = jnp.where(onehot, Ak[None, :, :], A)
        Inv = jnp.where(onehot, Ik[None, :, :], Inv)
    return Inv


def block_jacobi_inverse(values: jnp.ndarray, diag_slots: jnp.ndarray) -> jnp.ndarray:
    """Invert the (V, V, n_nodes) diagonal blocks once per assembly."""
    D = extract_diagonal_blocks(values, diag_slots)
    return small_block_inverse(D)


def apply_block_jacobi(Dinv: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Dinv (V, W, N) applied to r (W, N) -> (V, N) — elementwise + axis
    reduction (dot-free; see fem.geometry on small-dim contractions)."""
    return jnp.sum(Dinv * r[None], axis=1)


def _identity(r):
    return r


def _dot(a, b):
    return jnp.vdot(a, b)


# ----------------------------------------------------------------------
# BiCGStab (the workhorse: nonsymmetric transient systems)
# ----------------------------------------------------------------------
def bicgstab(matvec: Callable, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
             M: Callable = _identity, rtol: float = DEFAULT_RTOL,
             maxiter: int = DEFAULT_MAXITER) -> SolveResult:
    """Right-preconditioned BiCGStab on arbitrarily shaped arrays."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.sqrt(_dot(b, b).real)
    safe_bnorm = jnp.where(bnorm == 0.0, 1.0, bnorm)
    atol2 = (rtol * safe_bnorm) ** 2

    r0 = b - matvec(x0)
    rhat = r0

    def cond(state):
        x, r, p, v, rho, alpha, omega, k = state
        return jnp.logical_and(_dot(r, r).real > atol2, k < maxiter)

    def body(state):
        x, r, p, v, rho, alpha, omega, k = state
        rho1 = _dot(rhat, r)
        # breakdown guards: rho/omega/(rhat.v) hitting exact zero would put
        # inf/NaN into the carry; freeze the iterate and exit instead
        safe = lambda d: jnp.where(d == 0.0, 1.0, d)
        beta = (rho1 / safe(rho)) * (alpha / safe(omega))
        p_new = r + beta * (p - omega * v)
        phat = M(p_new)
        v_new = matvec(phat)
        rtv = _dot(rhat, v_new)
        alpha_new = rho1 / safe(rtv)
        s = r - alpha_new * v_new
        shat = M(s)
        t = matvec(shat)
        tt = _dot(t, t)
        omega_new = jnp.where(tt == 0.0, 0.0, _dot(t, s) / safe(tt))
        breakdown = (rho1 == 0.0) | (rtv == 0.0) | (omega == 0.0)
        x_new = x + alpha_new * phat + omega_new * shat
        r_new = s - omega_new * t
        x_new = jnp.where(breakdown, x, x_new)
        r_new = jnp.where(breakdown, r, r_new)
        k_new = jnp.where(breakdown, maxiter, k + 1)
        return (x_new, r_new, p_new, v_new, rho1, alpha_new, omega_new,
                k_new)

    init = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
            jnp.asarray(1.0, b.dtype), jnp.asarray(1.0, b.dtype),
            jnp.asarray(1.0, b.dtype), jnp.asarray(0, jnp.int32))
    x, r, *_, k = jax.lax.while_loop(cond, body, init)
    res = jnp.sqrt(_dot(r, r).real) / safe_bnorm
    return SolveResult(x=x, iters=k, residual=res)


# ----------------------------------------------------------------------
# CG (symmetric positive definite systems, e.g. pure mass solves)
# ----------------------------------------------------------------------
def cg(matvec: Callable, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
       M: Callable = _identity, rtol: float = DEFAULT_RTOL,
       maxiter: int = DEFAULT_MAXITER) -> SolveResult:
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.sqrt(_dot(b, b).real)
    safe_bnorm = jnp.where(bnorm == 0.0, 1.0, bnorm)
    atol2 = (rtol * safe_bnorm) ** 2

    r0 = b - matvec(x0)
    z0 = M(r0)

    def cond(state):
        x, r, z, p, rz, k = state
        return jnp.logical_and(_dot(r, r).real > atol2, k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / _dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    init = (x0, r0, z0, z0, _dot(r0, z0), jnp.asarray(0, jnp.int32))
    x, r, *_, k = jax.lax.while_loop(cond, body, init)
    res = jnp.sqrt(_dot(r, r).real) / safe_bnorm
    return SolveResult(x=x, iters=k, residual=res)


# ----------------------------------------------------------------------
# restarted GMRES (fallback for stiff nonsymmetric systems)
# ----------------------------------------------------------------------
def gmres(matvec: Callable, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
          M: Callable = _identity, rtol: float = DEFAULT_RTOL,
          maxiter: int = DEFAULT_MAXITER, restart: int = 30) -> SolveResult:
    """GMRES(restart) with right preconditioning.

    Fixed-shape Arnoldi basis (restart+1, ...) so the whole solver is a
    static XLA program; convergence is tracked through the Givens-updated
    residual estimate.

    TPU formulation: the orthogonalization is CLASSICAL Gram-Schmidt with
    one reorthogonalization pass (CGS2) — each pass is two matmuls
    against the whole masked basis (h = V w; w -= V^T h), which ride the
    MXU, instead of modified GS's m sequential masked dot/axpy pairs,
    which are loop-dispatch-bound (measured 24 ms/iteration on the old
    form — unusable inside a production time step).  CGS2 has the same
    practical stability as MGS (Giraud et al. 2005)."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.sqrt(_dot(b, b).real)
    safe_bnorm = jnp.where(bnorm == 0.0, 1.0, bnorm)
    atol = rtol * safe_bnorm
    m = restart
    flat_shape = b.size
    dtype = b.dtype
    rows = jnp.arange(m + 1)

    def outer_cond(state):
        x, res, total_k = state
        return jnp.logical_and(res > atol, total_k < maxiter)

    def outer_body(state):
        x, _, total_k = state
        r = b - matvec(x)
        beta = jnp.sqrt(_dot(r, r).real)
        V = jnp.zeros((m + 1, flat_shape), dtype)
        V = V.at[0].set(jnp.where(beta > 0, (r / beta).reshape(-1), 0.0))
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def arnoldi_body(j, carry):
            V, H, cs, sn, g, done = carry
            w = matvec(M(V[j].reshape(b.shape))).reshape(-1)
            # CGS2: project against rows <= j (later rows are zero, so
            # the mask only guards the H entries), then one
            # reorthogonalization pass
            mask = rows <= j
            h1 = jnp.where(mask, V @ w, 0.0)
            w = w - V.T @ h1
            h2 = jnp.where(mask, V @ w, 0.0)
            w = w - V.T @ h2
            Hj = h1 + h2
            hnext = jnp.sqrt(jnp.vdot(w, w).real)
            Hj = Hj.at[j + 1].set(hnext)
            V = V.at[j + 1].set(
                jnp.where(hnext > 0,
                          w / jnp.where(hnext == 0, 1.0, hnext), 0.0))
            # apply existing Givens rotations to the new column: the
            # recurrence is sequential in i but O(m) scalar work
            def apply_rot(i, Hcol):
                hi = Hcol[i]
                hi1 = Hcol[i + 1]
                t = cs[i] * hi + sn[i] * hi1
                u = -sn[i] * hi + cs[i] * hi1
                keep = i < j
                Hcol = Hcol.at[i].set(jnp.where(keep, t, hi))
                return Hcol.at[i + 1].set(jnp.where(keep, u, hi1))

            Hj = jax.lax.fori_loop(0, m, apply_rot, Hj)
            # new rotation
            denom = jnp.sqrt(Hj[j] ** 2 + Hj[j + 1] ** 2)
            denom_safe = jnp.where(denom == 0, 1.0, denom)
            c_new = jnp.where(denom == 0, 1.0, Hj[j] / denom_safe)
            s_new = jnp.where(denom == 0, 0.0, Hj[j + 1] / denom_safe)
            Hj = Hj.at[j].set(c_new * Hj[j] + s_new * Hj[j + 1]).at[j + 1].set(0.0)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            g = g.at[j + 1].set(-s_new * g[j])
            g = g.at[j].set(c_new * g[j])
            H = H.at[:, j].set(Hj[: m + 1])
            done = jnp.abs(g[j + 1]) <= atol
            return (V, H, cs, sn, g, done)

        def arnoldi_step(j, carry):
            done = carry[-1]
            return jax.lax.cond(done, lambda _, c: c, arnoldi_body, j, carry)

        V, H, cs, sn, g, _ = jax.lax.fori_loop(
            0, m, arnoldi_step, (V, H, cs, sn, g, jnp.asarray(False))
        )
        # back substitution on the m x m triangular system (masked for early exit)
        Hd = jnp.diagonal(H[:m, :m])
        active = jnp.abs(Hd) > 0

        def backsub(i_rev, y):
            i = m - 1 - i_rev
            s = g[i] - jnp.dot(H[i, :], y)
            yi = jnp.where(active[i], s / jnp.where(Hd[i] == 0, 1.0, Hd[i]), 0.0)
            return y.at[i].set(yi)

        y = jax.lax.fori_loop(0, m, backsub, jnp.zeros(m, dtype))
        dx = M((V[:m].T @ y).reshape(b.shape))
        x = x + dx
        r = b - matvec(x)
        res = jnp.sqrt(_dot(r, r).real)
        return (x, res, total_k + m)

    init_r = b - matvec(x0)
    init = (x0, jnp.sqrt(_dot(init_r, init_r).real), jnp.asarray(0, jnp.int32))
    x, res, k = jax.lax.while_loop(outer_cond, outer_body, init)
    return SolveResult(x=x, iters=k, residual=res / safe_bnorm)


# ----------------------------------------------------------------------
# high-level entry: solve a block-CSR system
# ----------------------------------------------------------------------
def solve_bcsr(values: jnp.ndarray, sp: NodePairSparsity, b: jnp.ndarray,
               x0: Optional[jnp.ndarray] = None, method: str = "bicgstab",
               rtol: float = DEFAULT_RTOL, maxiter: int = DEFAULT_MAXITER,
               precondition: bool = True, rows=None, cols=None,
               diag_slots=None) -> SolveResult:
    """Solve A x = b with A given as block-CSR values over `sp`.

    `rows/cols/diag_slots` may be passed as device arrays to avoid re-uploading
    the host sparsity tables inside a jit.
    """
    rows = jnp.asarray(sp.rows) if rows is None else rows
    cols = jnp.asarray(sp.cols) if cols is None else cols
    diag_slots = jnp.asarray(sp.diag_slots) if diag_slots is None else diag_slots
    n = sp.n_nodes
    matvec = partial(bcsr_matvec, values, rows, cols, n_nodes=n)
    if precondition:
        Dinv = block_jacobi_inverse(values, diag_slots)
        M = partial(apply_block_jacobi, Dinv)
    else:
        M = _identity
    fn = {"bicgstab": bicgstab, "cg": cg, "gmres": gmres}[method]
    return fn(matvec, b, x0=x0, M=M, rtol=rtol, maxiter=maxiter)
