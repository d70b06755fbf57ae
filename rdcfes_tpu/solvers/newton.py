"""Newton driver for the nonlinear solid path.

Replaces libMesh's `NewtonSolver`/`DiffSolver` as configured by the reference
(src/solid_system.C:86-100): the stopping rules and knobs mirror the deck
parameters `solver/nonlinear/{max_nonlinear_iterations, relative_step_tolerance,
relative_residual_tolerance, absolute_residual_tolerance, require_reduction}`
and `solver/linear/{max_linear_iterations, initial_linear_tolerance}`
(run/Solid/uniaxial_compression/input.dat).

Structure: a HOST-side Newton loop driving jitted device programs (assemble;
ELL-layout Krylov solve).  Keeping the outer loop on the host is deliberate:
scatter ops inside `lax.while_loop` hit a pathological XLA:TPU compile path
(see fem.assembly.ell_structure), Newton iteration counts are tiny (3-10),
and the host gets convergence diagnostics for free.  The inner Krylov loop
is a device `while_loop` over the scatter-free ELL SpMV.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import NodePairSparsity, ell_structure
from ..fem.bcsr import ell_matvec, to_ell
from .krylov import (
    apply_block_jacobi,
    bicgstab,
    block_jacobi_inverse,
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
    # "mixed": f32 inner BiCGStab sweeps + f64 outer residual carry
    # (the transient production design, refine_mixed) — halves the
    # values stream of every SpMV; "f64" (default): plain double
    # Krylov, matching the reference's PETSc KSP.  f64 stays the
    # default because the loose default Newton tolerances (rel step
    # 1e-3) stop at a path-dependent iterate — under "mixed" the
    # single-chip and (f64) halo solves then differ beyond the 1e-8
    # artifact-equality bar.  Deck key solver/linear/precision opts a
    # case in; the f64 stall rescue rides along on every path (on the
    # Pallas fast path the rescue matvec is the plain-XLA ELL apply —
    # extra kernel call sites break the compile budget).
    linear_precision: str = "f64"
    # Beneš-kernel x-gather for the inner SpMV: "1" on TPU hardware,
    # "interpret" for CI, "0" for the XLA gather.  Bit-identical to the
    # XLA gather and 1.27x faster on the 110k-HEX8 bench (PERF.md
    # section 8), but requires TPU (or interpret mode), so the default
    # None defers to the RDCFES_SOLID_FAST env var (itself "0" when
    # unset) to keep CPU runs working.  Deck key:
    # solver/linear/fast_gather.
    fast_gather: Optional[str] = None
    # bisect the step at most this many times when residual reduction is
    # required (libMesh NewtonSolver line-search role)
    max_line_search_steps: int = 8
    # modified Newton: keep the assembled tangent across iterations while
    # the residual keeps contracting by at least tangent_refresh_ratio
    # per accepted step; reassemble (at the current iterate) as soon as
    # contraction degrades, and before declaring a line-search failure.
    # The tangent assembly is ~92% of a measured 110k-HEX8 load step
    # (PERF.md section 11), so trading a few extra cheap iterations
    # (residual-only assembly + linear solve) for skipped tangent
    # assemblies is a large net win; convergence is still measured on
    # the exact f64 residual, so the stopping rules are unchanged.
    reuse_tangent: bool = False
    tangent_refresh_ratio: float = 0.3


class NewtonResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    residual_norm: jnp.ndarray
    initial_residual_norm: jnp.ndarray
    # True when a stopping rule was met; False on divergence (failed line
    # search / linear breakdown / iteration cap), mirroring libMesh
    # DiffSolver's DIVERGED_* outcomes so drivers can detect failure
    converged: bool = True


def _c_apply(cons, x):
    """Distribute master values to hanging entries: x_h = (x_a + x_b)/2.
    x is channel-first (V, N); cons = (hh, aa, bb)."""
    hh, aa, bb = cons
    return x.at[:, hh].set(0.5 * (x[:, aa] + x[:, bb]))


def _ct_fold(cons, y):
    """Fold hanging rows into their masters (C^T): y_a += y_h/2,
    y_b += y_h/2, y_h = 0."""
    hh, aa, bb = cons
    half = 0.5 * y[:, hh]
    y = y.at[:, aa].add(half)
    y = y.at[:, bb].add(half)
    return y.at[:, hh].set(0.0)


class NewtonSolver:
    """Reusable Newton driver: jits the linear stage once per sparsity."""

    def __init__(self, sp: NodePairSparsity, opts: NewtonOptions = NewtonOptions(),
                 constraints: Optional[np.ndarray] = None):
        import os

        self.sp = sp
        self.opts = opts
        ell_cols, ell_slot = ell_structure(sp)
        self._ell_cols = jnp.asarray(ell_cols)
        self._ell_slot = jnp.asarray(ell_slot)
        self._diag_slots = jnp.asarray(sp.diag_slots)
        # hanging-node constraints (H, 3) rows [h, a, b]: x_h=(x_a+x_b)/2
        # (mesh/constrain.py) — Newton iterates in the reduced space and
        # the linear stage applies C^T K C matrix-free, the same algebra
        # as systems/mixed.MixedTransientRDCSystem.  Positions constrain
        # LINEARLY (midpoint of the master edge), so dx_h=(dx_a+dx_b)/2
        # and a constrained x0 stays constrained through every update.
        if constraints is not None and len(constraints):
            c = np.asarray(constraints, dtype=np.int32)
            self._cons = (jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1]),
                          jnp.asarray(c[:, 2]))
        else:
            self._cons = None
        lin = {"bicgstab": bicgstab, "gmres": gmres}[opts.linear_method]

        # opt-in Beneš-kernel x-gather for the inner SpMV
        # (RDCFES_SOLID_FAST = 1 on hardware, "interpret" for CI): pad
        # slots remapped to the row's own node make every node's
        # incidence count exactly L, and the pad products are zero
        # blocks either way.  Stage tables ride the jit boundary as
        # ARGUMENTS (closure constants at this size 413 the remote
        # compile, PERF.md section 5).
        mode = (opts.fast_gather if opts.fast_gather is not None
                else os.environ.get("RDCFES_SOLID_FAST", "0"))
        self._fast = None
        self._fast_args = ()
        if mode != "0":
            from ..fem.fastpath import build_fast_plans
            from ..fem.pallas_perm import device_plan

            cols_fast = np.asarray(ell_cols).copy()
            pad = np.asarray(ell_slot) == sp.nnz
            cols_fast[pad] = np.broadcast_to(
                np.arange(sp.n_nodes), cols_fast.shape)[pad]
            plans = build_fast_plans(cols_fast.T, sp.n_nodes)
            dfwd = device_plan(plans.fwd)
            self._fast = {"plans": plans, "fwd": dfwd,
                          "interpret": mode == "interpret"}
            self._fast_args = tuple(dfwd[4:])

        def linear_solve(values, rhs, rtol, *fa):
            values_ell = to_ell(values, self._ell_slot)
            if self._fast is not None:
                from ..fem.bcsr import ell_matvec_fast

                dfwd_ = self._fast["fwd"]._replace(**dict(zip(
                    ("iL1", "iB1t", "jA1", "rA", "jA2", "iB2t", "iL2"),
                    fa)))
                matvec = partial(ell_matvec_fast, dfwd_,
                                 self._fast["plans"], values_ell,
                                 interpret=self._fast["interpret"])
            else:
                matvec = partial(ell_matvec, values_ell, self._ell_cols)
            if self._cons is not None:
                # constrained operator C^T K C: iterates live in the
                # reduced space embedded with hanging entries zero; the
                # block-Jacobi preconditioner is node-block-diagonal, so
                # it preserves that subspace
                raw_mv = matvec
                matvec = lambda y: _ct_fold(
                    self._cons, raw_mv(_c_apply(self._cons, y)))
                rhs = _ct_fold(self._cons, rhs)
            Dinv = block_jacobi_inverse(values, self._diag_slots)
            M = partial(apply_block_jacobi, Dinv)
            # LEFT preconditioning with the preconditioned residual as the
            # convergence measure (PETSc's default, same rationale as the
            # transient path): penalty-BC rows dwarf interior rows by the
            # penalty factor (~1e8), so a raw-residual criterion stalls on
            # fine meshes — observed as BiCGStab hitting max_linear_iterations
            # and returning a diverged step on a 16^3 hex cube
            pre_matvec = lambda y: M(matvec(y))
            pre_b = M(rhs)
            if opts.linear_precision == "mixed" and opts.linear_method == "bicgstab":
                # f32 inner sweeps + f64 outer residual carry (the
                # transient path's refine_mixed); solid operators are
                # elasticity-like (no advection), so f32 stalls are
                # rare, but the f64 fallback still covers them off the
                # fast path
                from ..systems.transient import refine_mixed

                f32 = jnp.float32
                if self._fast is not None:
                    from ..fem.bcsr import ell_matvec_fast

                    mv32_raw = partial(ell_matvec_fast, dfwd_,
                                       self._fast["plans"],
                                       values_ell.astype(f32),
                                       interpret=self._fast["interpret"])
                else:
                    mv32_raw = partial(ell_matvec, values_ell.astype(f32),
                                       self._ell_cols)
                if self._cons is not None:
                    raw32 = mv32_raw
                    mv32_raw = lambda y: _ct_fold(
                        self._cons, raw32(_c_apply(self._cons, y)))
                M32 = partial(apply_block_jacobi, Dinv.astype(f32))
                mv32 = lambda y: M32(mv32_raw(y))
                # the f64 stall rescue covers the stagnation exit on
                # EVERY path: on the Pallas fast path the rescue matvec
                # is the plain-XLA ELL apply (extra kernel call sites
                # break the compile budget, PERF.md section 5; a rescue
                # is rare enough that its matvec speed does not matter)
                plain_ell = (lambda y: ell_matvec(values_ell,
                                                  self._ell_cols, y))
                if self._cons is not None:
                    raw_pl = plain_ell
                    plain_ell = lambda y: _ct_fold(
                        self._cons, raw_pl(_c_apply(self._cons, y)))
                plain64 = (pre_matvec if self._fast is None else
                           (lambda y: M(plain_ell(y))))
                x, iters, resid = refine_mixed(
                    mv32, pre_matvec, pre_b, jnp.zeros_like(pre_b),
                    rtol, opts.max_linear_iterations,
                    f64_fallback=True, fallback_matvec=plain64)
                return x, iters, resid
            res = lin(pre_matvec, pre_b, rtol=rtol,
                      maxiter=opts.max_linear_iterations)
            return res.x, res.iters, res.residual

        self._linear_solve = jax.jit(linear_solve)

    def _res_norm(self, R) -> float:
        """Residual norm for the Newton stopping rules: the REDUCED-space
        residual ||C^T R|| when hanging-node constraints are present (the
        raw hanging rows carry forces that the constraint distributes to
        the masters — equilibrium holds in the reduced space)."""
        if self._cons is not None:
            R = _ct_fold(self._cons, R)
        return float(jnp.linalg.norm(R))

    def solve(self, assemble: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
              x0: jnp.ndarray,
              residual_only: Callable[[jnp.ndarray], jnp.ndarray] = None,
              ) -> NewtonResult:
        """Solve R(x) = 0 given jit-compiled
        `assemble(x) -> (R (N,V), K values (nnz,V,V))`.

        `residual_only(x) -> R`, when provided, is used for line-search
        backtracking trials so the (much more expensive) tangent assembly
        runs exactly once per ACCEPTED Newton step — libMesh's NewtonSolver
        likewise only re-evaluates the residual during backtracking
        (its line search calls assembly with Jacobian disabled)."""
        opts = self.opts
        x = x0
        R, values = assemble(x)
        rnorm = self._res_norm(R)
        r0 = rnorm if rnorm > 0 else 1.0
        k = 0
        converged = False
        # modified-Newton state: True while `values` was assembled at an
        # EARLIER iterate (opts.reuse_tangent).  Any failure with a stale
        # tangent refreshes it at the current x and retries instead of
        # declaring divergence.
        stale = False

        def refresh():
            nonlocal R, values, rnorm, stale
            R, values = assemble(x)
            rnorm = self._res_norm(R)
            stale = False

        while k < opts.max_nonlinear_iterations:
            if rnorm <= opts.absolute_residual_tolerance:
                converged = True
                break
            if rnorm / r0 <= opts.relative_residual_tolerance:
                converged = True
                break
            # libMesh NewtonSolver adapts the inner linear tolerance to the
            # current nonlinear residual reduction
            lin_rtol = max(min(opts.initial_linear_tolerance, rnorm / r0), 1e-14)
            dx, lin_iters, lin_res = self._linear_solve(
                values, -R, lin_rtol, *self._fast_args)
            if self._cons is not None:
                # expand the reduced update: dx_h = (dx_a + dx_b)/2, so a
                # constrained x stays constrained through x + lam*dx
                dx = _c_apply(self._cons, dx)

            lam = 1.0
            if not bool(jnp.isfinite(dx).all()):
                if stale:
                    refresh()
                    continue
                # hard linear breakdown: stop with the current iterate rather
                # than poisoning x (the reference's PETSc KSP would abort the
                # run here)
                break
            # line-search trials only need ||R||; use the residual-only
            # assembly when the caller provides one (the tangent assembly
            # then runs once per ACCEPTED step, below)
            trial_R = residual_only if residual_only is not None else (
                lambda y: assemble(y)[0])
            # residual at the accepted trial point, when a bisection
            # computed it (the reuse path below then skips re-evaluating)
            R_acc = None
            skip_step_check = False
            if float(lin_res) > 1.0 and not opts.require_residual_reduction:
                # the linear solve diverged (residual grew): a full step is
                # garbage.  Safeguard with a residual-reduction bisection even
                # when the deck does not require one — PETSc would have
                # reported KSP_DIVERGED instead of handing back this step.
                ok = False
                for _ in range(opts.max_line_search_steps):
                    R_new = trial_R(x + lam * dx)
                    if self._res_norm(R_new) < rnorm:
                        ok = True
                        break
                    lam *= 0.5
                if not ok:
                    if stale:
                        refresh()
                        continue
                    break  # no usable step in this direction
                R_acc = R_new
                # a diverged linear stage must not satisfy the step-size
                # convergence rule (pre-reuse behavior: this path skipped
                # the step_rel check entirely)
                skip_step_check = True
            elif opts.require_residual_reduction:
                reduced = False
                for _ in range(opts.max_line_search_steps):
                    R_new = trial_R(x + lam * dx)
                    if self._res_norm(R_new) < rnorm:
                        reduced = True
                        break
                    lam *= 0.5
                if not reduced:
                    if stale:
                        refresh()
                        continue
                    # libMesh NewtonSolver reports
                    # DIVERGED_BACKTRACKING_FAILURE here; return the last
                    # iterate flagged diverged instead of accepting a
                    # residual-increasing step
                    break
                R_acc = R_new

            x = x + lam * dx
            if opts.reuse_tangent:
                R_new = R_acc if R_acc is not None else trial_R(x)
                rnorm_new = self._res_norm(R_new)
                if rnorm_new > opts.tangent_refresh_ratio * rnorm:
                    # contraction degraded: the frozen tangent has gone
                    # stale (or this is a genuinely hard step) — pay for
                    # a fresh assembly at the new iterate
                    refresh()
                else:
                    R = R_new
                    rnorm = rnorm_new
                    stale = True
            else:
                R, values = assemble(x)
                rnorm = self._res_norm(R)
            k += 1

            if skip_step_check:
                continue
            xnorm = float(jnp.linalg.norm(x))
            step_rel = lam * float(jnp.linalg.norm(dx)) / (xnorm if xnorm else 1.0)
            if step_rel <= opts.relative_step_tolerance:
                converged = True
                break
        else:
            # max_nonlinear_iterations reached; converged iff the final
            # residual meets a tolerance
            converged = (rnorm <= opts.absolute_residual_tolerance
                         or rnorm / r0 <= opts.relative_residual_tolerance)
        return NewtonResult(
            x=x, iters=jnp.asarray(k),
            residual_norm=jnp.asarray(rnorm),
            initial_residual_norm=jnp.asarray(r0),
            converged=converged,
        )


def newton_solve(assemble, x0, sp, opts: NewtonOptions = NewtonOptions(),
                 rows=None, cols=None, diag_slots=None) -> NewtonResult:
    """One-shot convenience wrapper around NewtonSolver."""
    return NewtonSolver(sp, opts).solve(assemble, x0)
