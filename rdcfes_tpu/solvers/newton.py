"""Newton driver for the nonlinear solid path.

Replaces libMesh's `NewtonSolver`/`DiffSolver` as configured by the reference
(src/solid_system.C:86-100): the stopping rules and knobs mirror the deck
parameters `solver/nonlinear/{max_nonlinear_iterations, relative_step_tolerance,
relative_residual_tolerance, absolute_residual_tolerance, require_reduction}`
and `solver/linear/{max_linear_iterations, initial_linear_tolerance}`
(run/Solid/uniaxial_compression/input.dat).

The loop is a `lax.while_loop` re-assembling residual + block-CSR tangent each
iteration — with coordinates as plain inputs, the "moving mesh" of the
reference (src/solid_system.C:103-123) is just re-tracing the same geometry
code on the updated positions.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..fem.assembly import NodePairSparsity
from ..fem.bcsr import bcsr_matvec
from .krylov import (
    apply_block_jacobi,
    block_jacobi_inverse,
    bicgstab,
    gmres,
)


class NewtonOptions(NamedTuple):
    max_nonlinear_iterations: int = 100
    relative_step_tolerance: float = 1e-3
    relative_residual_tolerance: float = 1e-8
    absolute_residual_tolerance: float = 1e-8
    require_residual_reduction: bool = False
    max_linear_iterations: int = 50000
    initial_linear_tolerance: float = 1e-3
    linear_method: str = "bicgstab"
    # bisect the step at most this many times when residual reduction is
    # required (libMesh NewtonSolver line-search role)
    max_line_search_steps: int = 8


class NewtonResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    residual_norm: jnp.ndarray
    initial_residual_norm: jnp.ndarray


def newton_solve(
    assemble: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    x0: jnp.ndarray,
    sp: NodePairSparsity,
    opts: NewtonOptions = NewtonOptions(),
    rows=None, cols=None, diag_slots=None,
) -> NewtonResult:
    """Solve R(x) = 0 given `assemble(x) -> (R (N,V), K values (nnz,V,V))`."""
    rows = jnp.asarray(sp.rows) if rows is None else rows
    cols = jnp.asarray(sp.cols) if cols is None else cols
    diag_slots = jnp.asarray(sp.diag_slots) if diag_slots is None else diag_slots
    n = sp.n_nodes
    lin = {"bicgstab": bicgstab, "gmres": gmres}[opts.linear_method]

    def norm(v):
        return jnp.sqrt(jnp.vdot(v, v).real)

    R0, _ = assemble(x0)
    r0norm = norm(R0)
    safe_r0 = jnp.where(r0norm == 0.0, 1.0, r0norm)

    def cond(state):
        x, rnorm, step_rel, k = state
        not_conv = jnp.logical_and(
            rnorm > opts.absolute_residual_tolerance,
            rnorm / safe_r0 > opts.relative_residual_tolerance,
        )
        not_conv = jnp.logical_and(not_conv, step_rel > opts.relative_step_tolerance)
        return jnp.logical_and(not_conv, k < opts.max_nonlinear_iterations)

    def body(state):
        x, rnorm, _, k = state
        R, values = assemble(x)
        matvec = partial(bcsr_matvec, values, rows, cols, n_nodes=n)
        Dinv = block_jacobi_inverse(values, diag_slots)
        M = partial(apply_block_jacobi, Dinv)
        # libMesh NewtonSolver adapts the inner linear tolerance to the
        # current nonlinear residual reduction
        lin_rtol = jnp.minimum(opts.initial_linear_tolerance, rnorm / safe_r0)
        lin_rtol = jnp.maximum(lin_rtol, 1e-14)
        res = lin(matvec, -R, M=M, rtol=lin_rtol, maxiter=opts.max_linear_iterations)
        dx = res.x

        if opts.require_residual_reduction:
            def ls_cond(c):
                lam, rn, j = c
                return jnp.logical_and(rn >= rnorm, j < opts.max_line_search_steps)

            def ls_body(c):
                lam, _, j = c
                lam = lam * 0.5
                Rn, _ = assemble(x + lam * dx)
                return (lam, norm(Rn), j + 1)

            Rfull, _ = assemble(x + dx)
            lam, _, _ = jax.lax.while_loop(
                ls_cond, ls_body, (jnp.asarray(1.0, x.dtype), norm(Rfull), 0)
            )
        else:
            lam = jnp.asarray(1.0, x.dtype)

        x_new = x + lam * dx
        R_new, _ = assemble(x_new)
        xnorm = norm(x_new)
        step_rel = norm(lam * dx) / jnp.where(xnorm == 0, 1.0, xnorm)
        return (x_new, norm(R_new), step_rel, k + 1)

    init = (x0, r0norm, jnp.asarray(jnp.inf, x0.dtype), jnp.asarray(0, jnp.int32))
    x, rnorm, _, k = jax.lax.while_loop(cond, body, init)
    return NewtonResult(x=x, iters=k, residual_norm=rnorm, initial_residual_norm=r0norm)
