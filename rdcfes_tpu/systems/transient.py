"""Transient linearized-Crank-Nicolson RDC system.

This is the TPU-native equivalent of libMesh's
`TransientLinearImplicitSystem` as the reference drivers use it
(src/pihna.C:28-35,66-93): per time step

  1. rotate solution history (older <- old <- current, src/pihna.C:77-78)
  2. assemble LHS = [phi_j phi_i - (dt/2) J(u_old)] and
     RHS = [u_old phi_i + (dt/2) F(u_old)] — the one-Newton-step
     linearized Crank-Nicolson scheme common to every RDC driver
     (SURVEY.md section 2.4 "numerics common to all RDC drivers")
  3. Krylov-solve the sparse system (replaces PETSc KSP, src/pihna.C:80)
     with the scatter-free ELLPACK SpMV
  4. clamp the solution pointwise to physical bounds
     (`check_solution`, src/pihna.C:760-803)

The whole step is one jitted function; internally every large array is
channel-first (element/node axis last — see fem.geometry for the TPU tiling
rationale) while the public state keeps the conventional (n_nodes, V)
shape.  The mesh is static here, so geometry factors are computed once at
construction.  History depth is 2 (u_old kept, u_older kept-but-unused —
matching the reference, where `older` usage is commented out,
src/ripf.C:461-466).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import (
    assemble_matrix_gather,
    assemble_vector_gather,
    build_sparsity,
    ell_structure,
    gather_tables,
    interpolate_at_qp,
    interpolate_ue,
    interpolate_ue_affine,
)
from ..fem.bcsr import ell_matvec, to_ell  # noqa: F401 (assembled path)
from ..fem.geometry import geometry_factors
from ..fem.weakform import (
    block_diag,
    block_diag_affine,
    block_rhs,
    block_rhs_affine,
    diffusion_presum,
    element_matrices,
    element_vectors,
    qp_apply,
    qp_apply_affine,
)
from ..mesh.core import Mesh
from ..solvers.krylov import (
    DEFAULT_MAXITER,
    DEFAULT_RTOL,
    apply_block_jacobi,
    bicgstab,
    block_jacobi_inverse,  # noqa: F401 (assembled path)
    gmres,
    small_block_inverse,
)


def clamp_nonnegative(u: jnp.ndarray) -> jnp.ndarray:
    """Default post-solve clamp: every species >= 0 (src/pihna.C:786-790).

    Operates on the channel-first solver layout u (V, N)."""
    return jnp.maximum(u, 0.0)


def refine_mixed(mv32, pre_matvec64, pre_b, x0, rtol, maxiter,
                 f64_fallback: bool = False, fallback_matvec=None,
                 inner_rtol: float = 1e-6, adaptive_tol: bool = True):
    """Mixed-precision iterative refinement (shared by TransientRDCSystem
    and MixedTransientRDCSystem): f32 inner BiCGStab on the caller's
    preconditioned matvec, f64 outer residual correction.  The f64
    preconditioned residual is CARRIED, not recomputed — one
    true-operator application per outer pass instead of two.  The outer
    loop also exits on STAGNATION (no residual reduction across an
    outer pass) instead of burning all 12 passes on a plateau.

    f64_fallback adds the stall rescue: f32 inner sweeps stagnate on
    strongly advection-dominated operators (taxis CFL of a few;
    poor-quality transition elements lower the threshold) where the
    reference's f64 PETSc KSP still converges, so a conditional f64
    BiCGStab finishes the solve.  `fallback_matvec` (default:
    pre_matvec64) lets fast-path callers route the rescue through the
    plain XLA apply instead of duplicating Pallas call sites — the
    compile helper is SIGKILLed beyond a few embedded kernel instances
    per program (PERF.md section 5), and a rescue solve is rare enough
    that its matvec speed does not matter."""
    f32 = jnp.float32
    bnorm = jnp.sqrt(jnp.vdot(pre_b, pre_b).real)
    safe_b = jnp.where(bnorm == 0.0, 1.0, bnorm)
    tol = rtol * safe_b

    def cond(s):
        x, r, rnorm, prev, iters, k = s
        # prev carries the previous pass's residual: a pass that fails
        # to reduce it by at least 2x is stagnating (the f32 floor), and
        # further f32 sweeps cannot help — stop and let the fallback act
        return jnp.logical_and(
            jnp.logical_and(rnorm > tol, k < 12), rnorm < 0.5 * prev)

    def body(s):
        x, r, rnorm, _, iters, k = s
        # inner_rtol sets the landing depth per pass (the residual-
        # equation trick makes the correction's RELATIVE accuracy what
        # matters).  1e-6 default; ill-conditioned operators (mixed-mesh
        # transition elements, ~1e5 residual-to-error amplification)
        # pass 1e-7 — near the f32 floor — to land the SOLUTION at the
        # old three-matvec design's depth for a few extra f32 sweeps
        # and zero extra f64 matvecs (measured: +0.6 inner iters/step
        # at 1e-7 on the PIHNA bench, where the depth buys nothing).
        # ADAPTIVE CEILING (round 5): a pass whose start residual is
        # already near tol does not need the full inner_rtol depth —
        # an inner relative residual of eps lands the outer residual at
        # ~eps*rnorm, so eps = 0.25*tol/rnorm suffices (safety 4x).
        # This is what makes the caller's rtol a real cost knob: before
        # it, every pass ran to fixed depth and rtol 1e-9 cost exactly
        # as many sweeps as 1e-12 (measured, round-5 calibration).
        # adaptive_tol=False opts OUT (MixedTransientRDCSystem): the
        # ceiling reasons about the RESIDUAL, but the mixed-mesh
        # transition operator amplifies residual to SOLUTION error by
        # ~1e5 — shallow final passes meet tol yet land the solution
        # 6.4e-8 from the equilibrated dense solve (caught by
        # test_adpm_mixed_elemental_field_matches_direct_solve, which
        # passes again at fixed depth).
        if adaptive_tol:
            eps_k = jnp.clip(0.25 * tol / rnorm, inner_rtol, 1e-1
                             ).astype(f32)
        else:
            eps_k = jnp.asarray(inner_rtol, f32)
        inner = bicgstab(mv32, r.astype(f32), rtol=eps_k,
                         maxiter=80)
        x = x + inner.x.astype(jnp.float64)
        r2 = pre_b - pre_matvec64(x)
        return (x, r2, jnp.sqrt(jnp.vdot(r2, r2).real), rnorm,
                iters + inner.iters, k + 1)

    # pass 0 solves the FULL system in f32 with the warm start as the
    # f32 initial guess.  The previous design first measured the warm
    # start with a true-operator application (r0 = b - A x0, an f64
    # matvec); but the f32 pass only needs x0 to its own accuracy, so
    # starting pass 0 from x0 IN f32 saves one f64 matvec per step
    # (bench composition: 3 -> 2) while the stopping criterion below
    # still measures the true f64 residual.  x0's f64 detail is
    # preserved by applying the pass's EXACT f32 correction to the f64
    # x0 — when pass 0 exits at zero iterations (warm start already
    # below its tolerance) the old behavior is recovered bit-for-bit.
    # Pass-0 rtol 3e-7 (vs 1e-6 for refinement passes): deep enough
    # that ONE refinement pass lands below rtol=1e-12, not so deep it
    # stalls on the f32 residual floor (~1e-7, PERF.md section 8).
    # With a LOOSE caller rtol (>= 3e-7) pass 0 targets that directly —
    # b and r share the same norm scaling — so a warm start already at
    # tolerance exits at the r0 check with zero iterations, as before.
    # jnp.maximum, not float(): Newton's adaptive linear tolerance
    # (Eisenstat-Walker) arrives as a TRACED scalar.
    x0_32 = x0.astype(f32)
    inner0 = bicgstab(mv32, pre_b.astype(f32), x0=x0_32,
                      rtol=jnp.maximum(rtol, 3e-7), maxiter=80)
    x1 = x0 + (inner0.x - x0_32).astype(jnp.float64)
    r1 = pre_b - pre_matvec64(x1)
    init = (x1, r1, jnp.sqrt(jnp.vdot(r1, r1).real),
            jnp.asarray(jnp.inf, jnp.float64),
            inner0.iters, jnp.asarray(1, jnp.int32))
    x, _, rnorm, _, iters, _ = jax.lax.while_loop(cond, body, init)
    if not f64_fallback:
        return x, iters, rnorm / safe_b

    fb_mv = pre_matvec64 if fallback_matvec is None else fallback_matvec

    def fallback(x):
        r = bicgstab(fb_mv, pre_b, x0=x, rtol=rtol, maxiter=maxiter)
        return r.x, iters + r.iters, r.residual

    return jax.lax.cond(
        rnorm > tol, fallback,
        lambda x: (x, iters, rnorm / safe_b), x)


class TransientRDCSystem:
    """A transient multi-species RDC system on a fixed mesh.

    Parameters
    ----------
    mesh     : host Mesh
    n_vars   : number of coupled nodal variables V
    physics  : callable(u_qp (V,Q,E), grad_qp (V,Q,3,E), fields, params)
               -> WeakForm.  `fields` is a dict of auxiliary arrays in
               channel-first layout plus scalars like "time".
    clamp    : callable(u (V,N)) -> (V,N), applied after each solve
    method   : linear solver ("bicgstab" | "gmres")
    """

    def __init__(
        self,
        mesh: Mesh,
        n_vars: int,
        physics: Callable,
        clamp: Callable = clamp_nonnegative,
        method: str = "bicgstab",
        rtol: float = DEFAULT_RTOL,
        maxiter: int = DEFAULT_MAXITER,
        moving_mesh: bool = False,
        dtype=jnp.float64,
        precision: str = "f64",
        precond_refresh: int = 1,
        physics_blocks: Optional[Callable] = None,
        fast_gather: str = "auto",
        constraints: Optional[np.ndarray] = None,
    ):
        self.mesh = mesh
        self.n_vars = n_vars
        self.physics = physics
        # physics_blocks: block-sparse form of the same physics
        # (fem.weakform.WeakFormBlocks).  When provided and the step params
        # are plain Python scalars, step() switches to the matrix-free
        # qp-apply path: deck-zero blocks are dropped at trace time and the
        # Krylov matvec applies the weak-form coefficients directly —
        # no (V, V, K, K, E) element-matrix materialization at all.
        self.physics_blocks = physics_blocks
        self._qp_step_cache = {}
        self.clamp = clamp
        self.method = method
        # dtype=float32 is the fast "production serving" mode: ~2x matvec
        # throughput and half the memory, at the cost of the 1e-8 reference
        # parity (f32 limits the achievable relative residual to ~1e-6)
        self.dtype = dtype
        if dtype == jnp.float32:
            rtol = max(rtol, 1e-6)
        self.rtol = rtol
        # precision="mixed": f32 inner Krylov + f64 iterative refinement —
        # same converged f64 answer, cheaper matvecs (see _solve_mixed)
        if precision not in ("f64", "mixed"):
            raise ValueError(f"unknown precision {precision!r}")
        self.precision = precision
        # precond_refresh = k > 1: recompute the block-Jacobi inverse only
        # every k steps (it is just a preconditioner — see _step_reuse_impl)
        self.precond_refresh = int(precond_refresh)
        self._dinv_cache = None
        self._steps_since_precond = 0
        self.maxiter = maxiter
        # moving_mesh: recompute geometry factors from the coords passed to
        # step() — the coupled RDC<->solid path assembles on the CURRENT
        # deformed configuration every step (src/coupled_hcc.C:114 via
        # fe->reinit on the moved mesh)
        self.moving_mesh = moving_mesh

        self.sp = build_sparsity(mesh.connectivity, mesh.n_nodes)
        # device-resident static tables (channel-first)
        self.conn = jnp.asarray(mesh.connectivity)
        self.conn_T = jnp.asarray(mesh.connectivity.T)
        self.conn_flat_cf = jnp.asarray(mesh.connectivity.T.reshape(-1))
        slot_gather, node_gather = gather_tables(self.sp, mesh.connectivity)
        self.slot_gather = jnp.asarray(slot_gather)
        self.node_gather = jnp.asarray(node_gather)
        # flat restriction index: ONE batched gather + (C, N) reshape-sum
        # instead of C sequential gathers — in-program gather ops carry a
        # large fixed cost on TPU (measured: the C-loop restrict is ~3.5 ms
        # while a single fused gather of the same volume is ~0.03 ms), so
        # the restrict must be one gather op, not C
        self.node_gather_flat = jnp.asarray(node_gather.reshape(-1))
        self.diag_slots = jnp.asarray(self.sp.diag_slots)
        self.phi, JxW, dphi = geometry_factors(
            jnp.asarray(mesh.coords), self.conn, mesh.elem_type
        )
        self.JxW = JxW.astype(self.dtype)
        self.dphi = dphi.astype(self.dtype)
        # ELLPACK tables: the scatter-free SpMV layout for the Krylov loop
        ell_cols, ell_slot = ell_structure(self.sp)
        self.ell_cols = jnp.asarray(ell_cols)
        self.ell_slot = jnp.asarray(ell_slot)
        self._step = jax.jit(self._step_impl)
        self._step_reuse = jax.jit(self._step_reuse_impl)
        self._step_moving = jax.jit(self._step_moving_impl)
        # f32 geometry copies for the mixed-precision qp matvec
        self.JxW32 = self.JxW.astype(jnp.float32)
        self.dphi32 = self.dphi.astype(jnp.float32)
        # fast-gather mode: route the f32 inner matvec's corner gather and
        # restriction through the Mosaic Beneš permutation kernels
        # (fem/pallas_perm.py) — XLA executes those gathers at ~0.2 G
        # indices/s, the kernels at ~7 G elements/s (PERF.md round 3).
        # "auto": on for real TPU backends; "interpret": force with
        # interpreter-mode kernels (CPU tests); "off"/"on" explicit.
        assert fast_gather in ("auto", "on", "off", "interpret")
        self.fast_gather = fast_gather
        self._fast = None  # lazily built (plan construction is host-heavy)
        # hanging-node constraints (H, 3) rows [h, a, b]: u_h = (u_a+u_b)/2
        # (libMesh's constrain_element_matrix_and_vector analogue,
        # reference src/pihna.C:752).  The qp step solves the constrained
        # operator C^T A C matrix-free: C distributes master values to
        # hanging dofs before the element apply, C^T folds hanging-row
        # contributions back onto the endpoints after the restriction.
        # Produced by mesh/constrain.ConstrainedMesh.refine.
        if constraints is not None and len(constraints):
            c = np.asarray(constraints, dtype=np.int32)
            self._cons = (jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1]),
                          jnp.asarray(c[:, 2]))
        else:
            self._cons = None

    def _fast_args(self):
        """The plan tables as a jit-argument pytree (empty when off)."""
        fast = self._fast_tables()
        return fast["args"] if fast is not None else ()

    def _geom_args(self):
        """The big step-invariant device tables of the qp path, passed
        through the jit boundary as ARGUMENTS.  Closed over, they are
        baked into the program as dense MLIR literals — measured 216 MB
        of MLIR text at bench scale (dphi f64 alone is a 126 MB literal)
        — which both slows every remote compile and OOM-SIGKILLs the
        axon compile helper once more than a few Mosaic kernel variants
        share the program.  As arguments they cost one device pointer
        each."""
        return {
            "JxW": self.JxW, "dphi": self.dphi,
            "JxW32": self.JxW32, "dphi32": self.dphi32,
            "conn_T": self.conn_T, "node_gather": self.node_gather,
        }

    def _fast_tables(self):
        """Resolve + lazily build the fast-gather plans; None = disabled."""
        if self.fast_gather == "off" or self.physics_blocks is None:
            return None
        if self.fast_gather == "auto":
            if self.mesh.elem_type not in ("TET4", "HEX8"):
                # the permutation-kernel plans are hardware-validated on
                # the first-order types only; TET10 runs the XLA qp path
                return None
            platform = jax.devices()[0].platform.lower()
            if not ("tpu" in platform or "axon" in platform):
                return None
        if self._fast is None:
            from ..fem.fastpath import build_fast_plans
            from ..fem.pallas_perm import device_plan

            plans = build_fast_plans(np.asarray(self.mesh.connectivity),
                                     self.mesh.n_nodes)
            fwd, rev = device_plan(plans.fwd), device_plan(plans.rev)
            # the fused apply kernel streams its coefficient planes over
            # the whole element axis, so it runs on the first EL "live"
            # columns of each k-plane (real elements occupy the k-plane
            # prefix by construction) instead of the full padded E_pad
            EL = min(plans.E_pad, -(-plans.E // 512) * 512)
            ep = EL - plans.E
            jxw32p = jnp.pad(self.JxW32, ((0, 0), (0, ep)))
            dphi32p = jnp.pad(self.dphi32,
                              ((0, 0), (0, 0), (0, 0), (0, ep)))
            self._fast = {
                "plans": plans,
                "fwd": fwd,
                "rev": rev,
                # the ~10 MB of stage tables (and padded f32 geometry for
                # the fused apply kernel) are passed through the jit
                # boundary as ARGUMENTS (closing over them bakes them as
                # constants into every pallas call site — observed to OOM
                # the remote compile helper at scan scale)
                "args": (tuple(fwd[4:]), tuple(rev[4:]), jxw32p, dphi32p),
                "EL": EL,
                "interpret": self.fast_gather == "interpret",
                # each Mosaic kernel variant in a program costs the
                # remote compile helper minutes and ~GBs; the f64
                # transport and fused-apply variants are opt-in until the
                # compile cost is paid off (envs for hardware experiments;
                # interpret mode enables everything for test coverage)
                "use_f64": (self.fast_gather == "interpret"
                            or bool(int(os.environ.get(
                                "RDCFES_FAST_F64", "1")))),
                # affine (TET4) meshes default to the fused apply kernel
                # (qp_apply_affine_fused: hardware-validated, +1.5
                # steps/s end-to-end); the generic-geometry fused kernel
                # stays opt-in (heavier body, untested on HEX8 hardware)
                "use_fused": (self.fast_gather == "interpret"
                              or bool(int(os.environ.get(
                                  "RDCFES_FAST_FUSED",
                                  "1" if self.mesh.elem_type == "TET4"
                                  else "0")))),
                # df64 build: the coefficient-build interp + rhs run in
                # the paired-f32 Pallas kernels (fem/pallas_df64.py)
                # instead of XLA-emulated f64.  TET4 + compiled Mosaic
                # only (in interpret mode the kernel body lowers to XLA
                # ops, whose simplifier folds the compensated arithmetic
                # — module docstring there), which makes this a
                # TPU-only default: measured +1.82 ms/step with
                # trajectory parity UNCHANGED at 1.606e-9 (PERF.md §12;
                # scripts/probe_df64_parity.py).  RDCFES_DF64_BUILD=0
                # restores the XLA-f64 build.
                "use_df64": (self.fast_gather != "interpret"
                             and self.mesh.elem_type == "TET4"
                             and bool(int(os.environ.get(
                                 "RDCFES_DF64_BUILD", "1")))),
            }
            if self.mesh.elem_type == "TET4":
                # paired-f32 splits of the step-invariant geometry
                # (affine gradient table + JxW) for the df64 build
                # kernels, padded to the EL live prefix (zero tails:
                # JxW = 0 pad lanes zero out pad-element contributions)
                from ..fem.pallas_df64 import split_f64
                d0h, d0l = split_f64(self.dphi[0])
                pad = ((0, 0), (0, 0), (0, ep))
                jh, jl = split_f64(self.JxW)
                jpad = ((0, 0), (0, ep))
                self._fast["args"] = self._fast["args"] + (
                    (jnp.pad(d0h, pad), jnp.pad(d0l, pad)),
                    (jnp.pad(jh, jpad), jnp.pad(jl, jpad)),)
        return self._fast

    # ------------------------------------------------------------------
    def initial_state(self, u0: np.ndarray) -> Dict[str, jnp.ndarray]:
        u0 = jnp.asarray(u0, dtype=self.dtype)
        assert u0.shape == (self.mesh.n_nodes, self.n_vars)
        # u_raw = the pre-clamp solver output (RIPF's finite-difference
        # time-derivative bookkeeping uses it, src/ripf.C:770)
        return {"u": u0, "u_old": u0, "u_older": u0, "u_raw": u0}

    # ------------------------------------------------------------------
    def gather_state(self, state: Dict) -> Dict:
        """Uniform multi-chip-compatible accessor (HaloShardedSystem has
        the distributed counterpart): state -> global numpy arrays."""
        return {k: np.asarray(v) for k, v in state.items()}

    def scatter_state(self, gstate: Dict) -> Dict:
        return {k: jnp.asarray(v, dtype=self.dtype) for k, v in gstate.items()}

    # ------------------------------------------------------------------
    def assemble(self, u_T: jnp.ndarray, fields: Dict, params: Dict,
                 geom=None):
        """Assemble (values (V,V,nnz), rhs (V,N)) for one linearized-CN step
        from the channel-first old solution u_T (V, N).

        This materialized block-CSR path is used by tests and by consumers
        that need the explicit matrix; the production step is MATRIX-FREE
        (see _element_kernels/_elem_matvec): the per-element matrices are
        kept in their natural (V, W, K, K, E) layout and applied inside the
        Krylov loop, because the slot-gather that builds the global sparse
        matrix is all random 8-byte HBM reads (~1 s/step at brain scale)."""
        Fe, Ke, _ = self._element_kernels(u_T, fields, params, geom)
        values = assemble_matrix_gather(Ke, self.slot_gather)
        b = assemble_vector_gather(Fe, self.node_gather)
        return values, b

    # ------------------------------------------------------------------
    def _element_kernels(self, u_T, fields, params, geom=None):
        phi, JxW, dphi = geom if geom is not None else (self.phi, self.JxW, self.dphi)
        u_qp, grad_qp = interpolate_at_qp(u_T, self.conn_T, phi, dphi)
        wf = self.physics(u_qp, grad_qp, fields, params)
        Fe = element_vectors(wf, phi, JxW, dphi)
        # grad_const: TET4 is affine, shape gradients are q-invariant —
        # enables the pre-contracted fast path; diag_e comes out of the same
        # pass so the preconditioner never re-reads the full Ke
        Ke, diag_e = element_matrices(
            wf, phi, JxW, dphi,
            grad_const=(self.mesh.elem_type in ("TET4", "TRI3")),
            return_diag=True,
        )
        # physics callbacks that build constants with jnp.ones/zeros default
        # to f64 under x64; without this cast a dtype=float32 system would
        # fail deep inside the Krylov while_loop with a carry-type mismatch
        return (Fe.astype(self.dtype), Ke.astype(self.dtype),
                diag_e.astype(self.dtype))

    def _elem_matvec(self, Ke, x):
        """Matrix-free SpMV: y = (sum_e P_e^T Ke P_e) x, as
        gather -> per-element block apply (unrolled over the small trial
        dims) -> gather-based restriction.  No scatter, no global sparse
        matrix, Ke consumed in its natural layout."""
        V = self.n_vars
        ue = x[:, self.conn_T]  # (V, K, E)
        # fused product + (w, j) reduction — single pass over Ke
        ye = jnp.sum(Ke * ue[None, :, None, :, :], axis=(1, 3))  # (V, K, E)
        flat = ye.reshape(V, -1)  # (V, K*E) in (i, e) order
        flat = jnp.concatenate([flat, jnp.zeros((V, 1), flat.dtype)], axis=-1)
        C = self.node_gather.shape[0]
        acc = flat[:, self.node_gather[0]]
        for c in range(1, C):
            acc = acc + flat[:, self.node_gather[c]]
        return acc

    def _diag_blocks(self, diag_e, node_gather=None):
        """Block-Jacobi diagonal (V, V, N): the per-element (i, i)
        sub-blocks (V, V, K, E) restricted per node via the node-gather
        table."""
        ng = self.node_gather if node_gather is None else node_gather
        V = self.n_vars
        flat = diag_e.reshape(V, V, -1)  # (V, V, K*E) in (i, e) order
        flat = jnp.concatenate(
            [flat, jnp.zeros((V, V, 1), flat.dtype)], axis=-1
        )
        C = ng.shape[0]
        acc = flat[:, :, ng[0]]
        for c in range(1, C):
            acc = acc + flat[:, :, ng[c]]
        return acc

    def _solve_clamped(self, state, Fe, Ke, Dinv):
        b = assemble_vector_gather(Fe, self.node_gather)
        M = partial(apply_block_jacobi, Dinv)
        matvec = partial(self._elem_matvec, Ke)
        # LEFT block-Jacobi preconditioning (solve M^-1 A x = M^-1 b) with
        # the PRECONDITIONED residual as the convergence measure — PETSc's
        # default, and essential here: the deck's variable scales span ~13
        # orders (cells ~ Kappa_k = 2.4e5 vs cytokines ~ Kappa_a = 1e-8), so
        # a raw-residual criterion leaves the small-scale species equations
        # unresolved and their error feeds back into the dynamics
        pre_matvec = lambda x: M(matvec(x))
        pre_b = M(b)
        # warm start: linear extrapolation of the two previous solutions.
        # The converged solution is identical (unique to solver tolerance,
        # far below the 1e-8 parity bar); a good predictor just cuts Krylov
        # iterations — the reference's PETSc solve starts from zero.
        x0 = 2.0 * state["u"].T - state["u_old"].T
        if self.precision == "mixed" and self.dtype == jnp.float64:
            u_raw, iters, resid = self._solve_mixed(Ke, Dinv, b, pre_b, x0,
                                                    pre_matvec)
        else:
            fn = {"bicgstab": bicgstab, "gmres": gmres}[self.method]
            r = fn(pre_matvec, pre_b, x0=x0, rtol=self.rtol,
                   maxiter=self.maxiter)
            u_raw, iters, resid = r.x, r.iters, r.residual
        u_new = self.clamp(u_raw)
        new_state = {"u": u_new.T, "u_old": state["u"],
                     "u_older": state["u_old"], "u_raw": u_raw.T}
        return new_state, iters, resid

    def _solve_mixed(self, Ke, Dinv, b, pre_b, x0, pre_matvec64):
        """Mixed-precision iterative refinement: f32 inner BiCGStab on the
        preconditioned system, f64 outer residual correction.  Converges to
        the same f64 preconditioned-residual tolerance as the pure-f64
        solve (the 1e-8 parity bar is far above it) at roughly half the
        matvec cost — the f32 element blocks stream at ~2x the bandwidth.
        The dense-Ke path carries the f64 stall fallback (see
        refine_mixed); the kernel fast path stays single-program
        (PERF.md section 5)."""
        f32 = jnp.float32
        Ke32 = Ke.astype(f32)
        Dinv32 = Dinv.astype(f32)
        M32 = partial(apply_block_jacobi, Dinv32)
        mv32 = lambda x: M32(self._elem_matvec(Ke32, x))
        return refine_mixed(mv32, pre_matvec64, pre_b, x0, self.rtol,
                            self.maxiter, f64_fallback=True)

    def _fresh_dinv(self, diag_e):
        # pivot=False: the CN diagonal blocks are lumped-mass + O(dt)
        # coupling, strongly diagonally dominant (measured 9e-15 relative
        # difference vs pivoted at 1/9 the cost)
        return small_block_inverse(self._diag_blocks(diag_e), pivot=False)

    def _step_impl(self, state: Dict, fields: Dict, params: Dict):
        # history rotation (src/pihna.C:77-78): the freshly rotated "old"
        # solution (= the current one) drives the assembly
        Fe, Ke, diag_e = self._element_kernels(state["u"].T, fields, params)
        Dinv = self._fresh_dinv(diag_e)
        return self._solve_clamped(state, Fe, Ke, Dinv) + (Dinv,)

    def _step_reuse_impl(self, state: Dict, fields: Dict, params: Dict,
                         Dinv: jnp.ndarray):
        # stale-preconditioner step: the block-Jacobi inverse is reused from
        # an earlier step.  The preconditioner only steers the iteration —
        # the converged answer still satisfies the same tolerance on the
        # (stale-)preconditioned residual, so parity is unaffected; the
        # operator drifts with u_old, so iteration counts degrade slowly
        Fe, Ke, _ = self._element_kernels(state["u"].T, fields, params)
        return self._solve_clamped(state, Fe, Ke, Dinv)

    def _step_moving_impl(self, state: Dict, fields: Dict, params: Dict,
                          coords: jnp.ndarray):
        geom = geometry_factors(coords, self.conn, self.mesh.elem_type)
        Fe, Ke, diag_e = self._element_kernels(state["u"].T, fields, params,
                                               geom=geom)
        return self._solve_clamped(state, Fe, Ke, self._fresh_dinv(diag_e))

    # ------------------------------------------------------------------
    # matrix-free qp-apply path (static deck parameters)
    # ------------------------------------------------------------------
    def _restrict(self, flat, node_gather=None):
        """(.., K*E) element-corner values -> (.., N) via node_gather."""
        ng = self.node_gather if node_gather is None else node_gather
        pad = jnp.zeros(flat.shape[:-1] + (1,), flat.dtype)
        f = jnp.concatenate([flat, pad], axis=-1)
        C = ng.shape[0]
        acc = f[..., ng[0]]
        for c in range(1, C):
            acc = acc + f[..., ng[c]]
        return acc

    def _qp_step_fn(self, params: Dict):
        """Jitted (fresh, reuse) qp-apply steps for one static parameter
        set (see _qp_raw_body)."""
        step_fn = self._qp_raw_body(params)
        fresh = jax.jit(lambda st, f, fa, ga: step_fn(st, f, None, fa, ga))
        reuse = jax.jit(step_fn)
        return fresh, reuse

    def _qp_raw_body(self, params: Dict):
        """The raw (untraced) qp-apply step body for one static parameter
        set, cached — composable inside scan.  Closing over plain-float
        params lets the physics drop deck-zero blocks from the compiled
        program."""
        key = ("__body__",) + tuple(sorted(params.items()))
        cached = self._qp_step_cache.get(key)
        if cached is not None:
            return cached
        V = self.n_vars
        mixed = self.precision == "mixed" and self.dtype == jnp.float64
        fast = self._fast_tables()
        # TET4/TRI3 are affine: shape gradients are q-independent, so
        # matvecs run through the reassociated apply (qp_apply_affine)
        # with the diffusion coefficient q-sum hoisted out of the loop
        affine = self.mesh.elem_type in ("TET4", "TRI3")
        # hanging-node constraints: C distributes masters to hanging
        # dofs, C^T folds hanging contributions back; the Krylov solve
        # runs on C^T A C embedded in full vectors with hanging entries
        # pinned to zero (see __init__)
        cons = self._cons

        def c_apply(x):
            hh, aa, bb = cons
            return x.at[:, hh].set(0.5 * (x[:, aa] + x[:, bb]))

        def ct_fold(y):
            hh, aa, bb = cons
            half = 0.5 * y[:, hh]
            y = y.at[:, aa].add(half)
            y = y.at[:, bb].add(half)
            return y.at[:, hh].set(0.0)

        def apply_from_ue(wf_, JxW_, dphi_, ue, Epre):
            if affine and Epre is not None:
                x_qp, gx = interpolate_ue_affine(ue, self.phi, dphi_)
                return qp_apply_affine(wf_, Epre, self.phi, JxW_, dphi_,
                                       x_qp, gx)
            x_qp, gx_qp = interpolate_ue(ue, self.phi, dphi_)
            return qp_apply(wf_, self.phi, JxW_, dphi_, x_qp, gx_qp)

        def _plans_from(fa):
            """Rebuild DevicePlans from jit-argument table tuples (static
            meta from the closure, arrays from the arguments)."""
            fwd = fast["fwd"]._replace(**dict(zip(
                ("iL1", "iB1t", "jA1", "rA", "jA2", "iB2t", "iL2"), fa[0])))
            rev = fast["rev"]._replace(**dict(zip(
                ("iL1", "iB1t", "jA1", "rA", "jA2", "iB2t", "iL2"), fa[1])))
            return fwd, rev

        def gather_ue_fast(fa, x):
            """Corner gather x (V, N) -> ue (V, K, E_pad) through the
            Beneš permutation kernels (f64 rides as hi/lo f32 planes)."""
            from ..fem.pallas_perm import gather_corners, gather_corners_f64

            dfwd, _ = _plans_from(fa)
            fp = fast["plans"]
            gc = (gather_corners_f64 if x.dtype == jnp.float64
                  else gather_corners)
            xp = jnp.pad(x, ((0, 0), (0, fp.NR * 128 - fp.N)))
            ue = gc(dfwd, xp.reshape(V, fp.NR, 128), fp.C_x,
                    interpret=fast["interpret"], channels=2 * V)
            return ue.reshape(V, fp.K, fp.E_pad)

        def gather_ue_pair_fast(fa, x):
            """gather_ue_fast keeping the f64 payload as (hi, lo) f32
            planes — feeds the df64 build kernels without the join and
            the consumer's re-split."""
            from ..fem.pallas_perm import gather_corners_f64_pair

            dfwd, _ = _plans_from(fa)
            fp = fast["plans"]
            xp = jnp.pad(x, ((0, 0), (0, fp.NR * 128 - fp.N)))
            h, l = gather_corners_f64_pair(
                dfwd, xp.reshape(V, fp.NR, 128), fp.C_x,
                interpret=fast["interpret"], channels=2 * V)
            return (h.reshape(V, fp.K, fp.E_pad),
                    l.reshape(V, fp.K, fp.E_pad))

        def mv_fast(fa, wf_, JxW_, dphi_, x, stacks=None, Epre=None):
            """Matvec with the corner gather and restriction routed
            through the Beneš permutation kernels.  With `stacks` (the
            f32 inner solve), the interp/apply between them runs in the
            fused Pallas kernel too — the whole matvec is three kernels
            plus vector ops.  f64 operands ride the permutation kernels
            as hi/lo f32 planes with the apply in XLA."""
            from ..fem.pallas_apply import (qp_apply_affine_fused,
                                            qp_apply_fused)
            from ..fem.pallas_perm import grid_permute, grid_permute_f64

            _, drev = _plans_from(fa)
            f64 = x.dtype == jnp.float64
            gp = grid_permute_f64 if f64 else grid_permute
            fp = fast["plans"]
            interp = fast["interpret"]
            VC = 2 * V  # canonical channel count (shared kernel variant)
            ue = gather_ue_fast(fa, x)
            if stacks is not None and not f64:
                # fused path, on the EL-column live prefix of each
                # k-plane (real elements sit in the k-plane prefix by
                # plan construction); the E_pad tail is re-padded with
                # zeros so padded restrict targets contribute zeros
                EL = fast["EL"]
                kind, stk = stacks
                if kind == "affine":
                    Ye = qp_apply_affine_fused(
                        stk, self.phi, fa[2], fa[3][0], ue[:, :, :EL],
                        interpret=interp)
                else:
                    Ye = qp_apply_fused(stk, self.phi, fa[2], fa[3],
                                        ue[:, :, :EL], interpret=interp)
                yb = jnp.pad(Ye, ((0, 0), (0, 0), (0, fp.E_pad - EL)))
            else:
                # table width decides the live prefix (shape-driven so
                # E- and E_pad-sized coefficient tables both work)
                Et = JxW_.shape[-1]
                Ye = apply_from_ue(wf_, JxW_, dphi_, ue[:, :, :Et], Epre)
                yb = jnp.pad(Ye, ((0, 0), (0, 0), (0, fp.E_pad - Et)))
            if f64:
                g = gp(drev, yb.reshape(V, fp.A * 128, 128),
                       interpret=interp, channels=VC)
                return g.reshape(V, fp.C_x,
                                 fp.NR * 128).sum(axis=1)[:, :fp.N]
            # f32: the incidence-group sum folds into the permute kernel
            # (f64 can't — its hi/lo planes must join before summing)
            from ..fem.pallas_perm import grid_permute_reduce

            g = grid_permute_reduce(drev, yb.reshape(V, fp.A * 128, 128),
                                    fp.C_x, interpret=interp, channels=V)
            return g.reshape(V, fp.NR * 128)[:, :fp.N]

        def restrict_fast(fa, Fe_vke):
            """(W, K, E) element contributions -> (W, N) nodal sums via
            the permutation kernels (any channel count, f32 or f64)."""
            from ..fem.pallas_perm import grid_permute, grid_permute_f64

            _, drev = _plans_from(fa)
            fp = fast["plans"]
            W = Fe_vke.shape[0]
            gp = (grid_permute_f64 if Fe_vke.dtype == jnp.float64
                  else grid_permute)
            yb = jnp.pad(Fe_vke, ((0, 0), (0, 0),
                                  (0, fp.E_pad - Fe_vke.shape[-1])))
            g = gp(drev, yb.reshape(W, fp.A * 128, 128),
                   interpret=fast["interpret"], channels=2 * V)
            return g.reshape(W, fp.C_x, fp.NR * 128).sum(axis=1)[:, :fp.N]

        def restrict_fast_pair(fa, Feh, Fel):
            """restrict_fast for (hi, lo) f32 pairs from the df64 rhs
            kernel: the pair planes ride the permutation directly (the
            f64 path's input split disappears); the join happens after
            the permute, where the fold sum needs real f64."""
            from ..fem.pallas_perm import _join_f64, grid_permute

            _, drev = _plans_from(fa)
            fp = fast["plans"]
            W = Feh.shape[0]
            pad = lambda a: jnp.pad(
                a, ((0, 0), (0, 0), (0, fp.E_pad - a.shape[-1])))
            x2 = jnp.concatenate([pad(Feh), pad(Fel)],
                                 axis=0).reshape(2 * W, fp.A * 128, 128)
            g = grid_permute(drev, x2, interpret=fast["interpret"],
                             channels=2 * V)
            j = _join_f64(g[:W], g[W:])
            return j.reshape(W, fp.C_x, fp.NR * 128).sum(axis=1)[:, :fp.N]

        def step_fn(state, fields, Dinv_in, fast_args=None, geom=None):
            # `geom` (self._geom_args()) carries the big step-invariant
            # tables as jit arguments — closed over they dominate program
            # size and OOM the remote compile helper (see _geom_args)
            g = geom if geom is not None else self._geom_args()
            u_T = state["u"].T
            # kernel fast path: gathers/restrictions ride the Beneš
            # kernels; the element pipeline itself stays at E — running
            # it at E_pad was MEASURED SLOWER (E_pad = 1.12 E at bench
            # scale: 12% more f64-emulated interp/physics/rhs work
            # outweighs the slice/pad copies it saved; 33.98 vs 35.34
            # steps/s, PERF.md section 9)
            kfast = fast is not None and (fast["use_f64"]
                                          or self.dtype == jnp.float32)
            use_df64 = (kfast and affine and fast.get("use_df64", False)
                        and self.dtype == jnp.float64)
            if use_df64:
                # df64 build interp: the gather's hi/lo planes feed the
                # paired-f32 Pallas interp directly — no f64 join of the
                # (V, K, E_pad) gather, no XLA-emulated f64 interp
                # (PERF.md §8's staged lever; accuracy class ~2^-45,
                # three decades inside the 1e-8/step parity contract)
                from ..fem.pallas_df64 import interp_affine_df64, join_f64

                ueh, uel = gather_ue_pair_fast(fast_args, u_T)
                EL = fast["EL"]
                up_, gp_ = interp_affine_df64(
                    (ueh[:, :, :EL], uel[:, :, :EL]),
                    np.asarray(self.phi), fast_args[4],
                    interpret=fast["interpret"])
                Ereal = fast["plans"].E
                u_qp = join_f64(*up_)[:, :, :Ereal]
                gx1 = join_f64(*gp_)[:, :, :Ereal]
                grad_qp = jnp.broadcast_to(
                    gx1[:, None], (V,) + u_qp.shape[1:2] + gx1.shape[1:])
            else:
                if kfast:
                    # the coefficient build's corner gather of u goes
                    # through the same Beneš kernel as the Krylov matvecs
                    # (~2.4 ms XLA f64 gather saved; identical values,
                    # same order)
                    ue = gather_ue_fast(fast_args,
                                        u_T)[:, :, :fast["plans"].E]
                else:
                    ue = u_T[:, g["conn_T"]]
                if affine:
                    # TET4: per-q gradients are bit-identical (dphi[q] ==
                    # dphi[0]); compute once and broadcast for the physics
                    u_qp, gx1 = interpolate_ue_affine(ue, self.phi,
                                                      g["dphi"])
                    grad_qp = jnp.broadcast_to(
                        gx1[:, None],
                        (V,) + u_qp.shape[1:2] + gx1.shape[1:])
                else:
                    u_qp, grad_qp = interpolate_ue(ue, self.phi,
                                                   g["dphi"])
            wfb = self.physics_blocks(u_qp, grad_qp, fields, params)
            rhs_fn = block_rhs_affine if affine else block_rhs
            if use_df64:
                # rhs in paired f32: the A/B coefficient split feeds the
                # Pallas rhs kernel, whose Fe pairs ride the restriction
                # permutation directly (no f64 Fe materialization, no
                # split inside the restrict)
                from ..fem.pallas_df64 import rhs_affine_df64

                Fe_pair = rhs_affine_df64(wfb, np.asarray(self.phi),
                                          fast_args[5], fast_args[4],
                                          interpret=fast["interpret"])
                b = restrict_fast_pair(fast_args, *Fe_pair)
            elif kfast:
                Fe = rhs_fn(wfb, self.phi, g["JxW"], g["dphi"])
                b = restrict_fast(fast_args, Fe.astype(self.dtype))
            else:
                Fe = rhs_fn(wfb, self.phi, g["JxW"], g["dphi"])
                b = self._restrict(Fe.astype(self.dtype).reshape(V, -1),
                                   g["node_gather"])
            if cons is not None:
                b = ct_fold(b)
            if Dinv_in is None:
                diag_fn = block_diag_affine if affine else block_diag
                diag_e = diag_fn(wfb, self.phi, g["JxW"], g["dphi"])
                D = self._diag_blocks(diag_e.astype(self.dtype),
                                      g["node_gather"])
                if cons is not None:
                    # fold the hanging diagonal onto the endpoints
                    # (the C^T A C diagonal's 1/4-weight contribution)
                    # and pin hanging blocks to identity so iterates
                    # stay zero there
                    hh, aa, bb = cons
                    quarter = 0.25 * D[:, :, hh]
                    D = D.at[:, :, aa].add(quarter)
                    D = D.at[:, :, bb].add(quarter)
                    eye = jnp.broadcast_to(
                        jnp.eye(V, dtype=D.dtype)[:, :, None],
                        (V, V, hh.shape[0]))
                    D = D.at[:, :, hh].set(eye)
                Dinv = small_block_inverse(D, pivot=False)
            else:
                Dinv = Dinv_in

            def mv(wf_, JxW_, dphi_, x, Epre=None):
                Ye = apply_from_ue(wf_, JxW_, dphi_, x[:, g["conn_T"]],
                                   Epre)
                return self._restrict(Ye.reshape(V, -1), g["node_gather"])

            # once-per-step diffusion q-sum for the affine apply; every
            # Krylov matvec (f64 outer and f32 inner) reuses it
            Epre = diffusion_presum(wfb, g["JxW"]) if affine else None
            if kfast:
                matvec64 = partial(mv_fast, fast_args, wfb, g["JxW"],
                                   g["dphi"], Epre=Epre)
            else:
                matvec64 = partial(mv, wfb, g["JxW"], g["dphi"], Epre=Epre)
            if cons is not None:
                mv64_core = matvec64
                matvec64 = lambda x: ct_fold(mv64_core(c_apply(x)))
            M = partial(apply_block_jacobi, Dinv)
            pre_matvec = lambda x: M(matvec64(x))
            pre_b = M(b)
            # linear extrapolation warm start; measured better than the
            # quadratic predictor here (clamping kinks defeat it: 791 vs
            # 1209 inner iterations over the 120-step bench)
            x0 = 2.0 * state["u"].T - state["u_old"].T
            if cons is not None:
                # iterate in the reduced space: hanging entries stay 0
                x0 = x0.at[:, cons[0]].set(0.0)
            if mixed:
                wfb32 = wfb.cast(jnp.float32)
                Dinv32 = Dinv.astype(jnp.float32)
                M32 = partial(apply_block_jacobi, Dinv32)
                Epre32 = (diffusion_presum(wfb32, g["JxW32"])
                          if affine else None)
                if fast is not None:
                    if fast["use_fused"]:
                        from ..fem.pallas_apply import (stack_blocks,
                                                        stack_blocks_affine)

                        stacks32 = (
                            ("affine",
                             stack_blocks_affine(wfb32, Epre32,
                                                 fast["EL"]))
                            if affine else
                            ("generic", stack_blocks(wfb32, fast["EL"])))
                    else:
                        stacks32 = None
                    mv32_core = lambda x: mv_fast(
                        fast_args, wfb32, g["JxW32"], g["dphi32"], x,
                        stacks=stacks32, Epre=Epre32)
                else:
                    mv32_core = lambda x: mv(wfb32, g["JxW32"],
                                             g["dphi32"], x, Epre=Epre32)
                if cons is not None:
                    _mv32c = mv32_core
                    mv32_core = lambda x: ct_fold(_mv32c(c_apply(x)))
                mv32 = lambda x: M32(mv32_core(x))
                # f64 stall rescue on EVERY path.  On the kernel fast
                # path the rescue matvec is the plain-XLA f64 apply
                # (`mv`), not `mv_fast`: an extra BiCGStab instance over
                # the Pallas matvec would duplicate kernel call sites
                # and break the compile-helper budget (PERF.md 5); the
                # rescue only runs on stalled steps, where robustness —
                # not matvec speed — is what matters.
                if fast is not None:
                    mv64_xla = partial(mv, wfb, g["JxW"], g["dphi"],
                                       Epre=Epre)
                    if cons is not None:
                        _mvx = mv64_xla
                        mv64_xla = lambda x: ct_fold(_mvx(c_apply(x)))
                    rescue_mv = lambda x: M(mv64_xla(x))
                else:
                    rescue_mv = None  # pre_matvec itself is the XLA apply
                u_raw, iters, resid = self._refine_mixed(
                    mv32, pre_matvec, pre_b, x0,
                    f64_fallback=True, fallback_matvec=rescue_mv)
            else:
                fn = {"bicgstab": bicgstab, "gmres": gmres}[self.method]
                r = fn(pre_matvec, pre_b, x0=x0, rtol=self.rtol,
                       maxiter=self.maxiter)
                u_raw, iters, resid = r.x, r.iters, r.residual
            if cons is not None:
                # hanging dofs are DERIVED: distribute the solved master
                # values, and re-derive after the clamp touches the
                # endpoints (u_h = (u_a+u_b)/2 holds exactly in u_new)
                u_raw = c_apply(u_raw)
            u_new = self.clamp(u_raw)
            if cons is not None:
                u_new = c_apply(u_new)
            new_state = {"u": u_new.T, "u_old": state["u"],
                         "u_older": state["u_old"], "u_raw": u_raw.T}
            return new_state, iters, resid, Dinv

        self._qp_step_cache[key] = step_fn
        return step_fn

    def _refine_mixed(self, mv32, pre_matvec64, pre_b, x0,
                      f64_fallback: bool = False, fallback_matvec=None):
        """Module-level refine_mixed with this system's tolerances.
        f64_fallback adds the stall rescue; fast-path callers pass the
        XLA apply as fallback_matvec to stay within the compile-helper
        budget."""
        return refine_mixed(mv32, pre_matvec64, pre_b, x0, self.rtol,
                            self.maxiter, f64_fallback=f64_fallback,
                            fallback_matvec=fallback_matvec)

    def _qp_multi_fn(self, params: Dict, n: int, field_update=None):
        """Jitted n-step advance (lax.scan) for one static parameter set:
        the whole segment runs as ONE device program, so per-step dispatch
        cost vanishes and XLA pipelines across steps.  The block-Jacobi
        inverse refreshes every `precond_refresh` steps via lax.cond inside
        the scan (iteration 0 always refreshes, so no seed is needed).

        `traj` (dict of (n,)-arrays, may be empty) carries per-step scalar
        values — e.g. ADPM's advancing `time` — scanned over alongside the
        step counter so time-gated physics (pulses/trapezoids/sigmoids)
        stay exact inside the segment."""
        body_fn = self._qp_raw_body(params)
        refresh = max(1, self.precond_refresh)
        V, N = self.n_vars, self.mesh.n_nodes

        def multi(state, fields, traj, aux, fargs, fast_args, geom):
            Dinv0 = jnp.zeros((V, V, N), self.dtype)

            def body(carry, x):
                i, tr = x
                st, Dv, ax = carry
                f = {**fields, **tr}
                if field_update is not None:
                    fu, ax = field_update(st, ax, tr, *fargs)
                    f = {**f, **fu}
                new_state, it, res, Dv2 = jax.lax.cond(
                    i % refresh == 0,
                    lambda st, Dv: body_fn(st, f, None, fast_args,
                                           geom),
                    lambda st, Dv: body_fn(st, f, Dv, fast_args,
                                           geom),
                    st, Dv,
                )
                return (new_state, Dv2, ax), (it, res)

            (state, _, aux), (its, ress) = jax.lax.scan(
                body, (state, Dinv0, aux), (jnp.arange(n), traj))
            return state, its, ress, aux

        return jax.jit(multi)

    def choose_subcycle(self, state: Dict, fields: Optional[Dict] = None,
                        params: Optional[Dict] = None,
                        scalars: Optional[Dict] = None,
                        coords: Optional[jnp.ndarray] = None,
                        scalar_traj: Optional[Dict] = None,
                        kmax: int = 32,
                        stall_factor: float = 100.0,
                        k0: int = 1) -> int:
        """Adaptive subcycle factor: probe ONE step at dt/k0, dt/2k0, ...
        from `state` (probe results are discarded) and return the first k
        whose linear solve converges (residual <= stall_factor * rtol).
        Each probed dt compiles its own single-step program, so this is a
        setup-time call — run it once per (mesh, params) regime, outside
        any timed loop, and pass the result as run_steps(subcycle=k) (or
        let run_steps(subcycle="auto") call it for you).  `k0` starts the
        probe ladder above 1 when lower k are already known to fail —
        on the per-step dispatch path the successful probe's compiled
        program is exactly the one the subcycled run reuses, so a correct
        k0 makes the probe's compile cost zero."""
        f = dict(fields or {})
        if scalar_traj:
            # the probe sees the trajectory's first-step scalar values
            f.update({k: np.asarray(v)[0] for k, v in scalar_traj.items()})
        k = max(1, int(k0))
        while True:
            p = dict(params)
            p["dt"] = float(params["dt"]) / k
            _, _, res = self.step(state, fields=f, params=p,
                                  coords=coords, scalars=scalars)
            if float(res) <= stall_factor * self.rtol or k >= kmax:
                return k
            k *= 2

    def run_steps(self, state: Dict, n: int, fields: Optional[Dict] = None,
                  params: Optional[Dict] = None,
                  scalars: Optional[Dict] = None, segment: Optional[int] = None,
                  scalar_traj: Optional[Dict] = None,
                  field_update=None, field_aux=None, field_args=(),
                  coords: Optional[jnp.ndarray] = None,
                  subcycle: Optional[object] = None):
        """Advance n steps through compiled scans (static scalar params
        required).  Returns (state, iters_per_step, residual_per_step),
        plus the final field_update aux carry when `field_update` is given.

        `subcycle=k` (int > 1) advances each requested step as k substeps
        at dt/k; `subcycle="auto"` probes for the smallest power-of-two k
        whose linear solve converges (choose_subcycle).  This is the
        capability answer to advection-dominated regimes (taxis CFL >~ 2)
        where the linearized-CN operator turns INDEFINITE — eigenvalues
        on both sides of the origin (measured on the ADPM deck-amplitude
        operator: lambda in {-14.7, -7.5+-13.6i, ...} next to +2.4e3) —
        and NO Krylov/preconditioner pair converges: unrestarted f64
        GMRES + exact block-Jacobi stalls at 7.6e-5 after 1500
        iterations, and ILU(0) on the assembled matrix is exactly
        singular, so the reference's PETSc defaults would fail on the
        same matrix.  At dt/8 the substep operator is definite and the
        standard mixed stack converges in ~40 iterations (measured).
        Returned iters/residuals are aggregated per OUTER step (iters
        summed, residual of the last substep); per-step scalar_traj
        values are held constant across an outer step's substeps; the
        returned history (u_old/u_older/u_raw) is at SUBSTEP spacing —
        callers that difference history across steps (RIPF's TD fields)
        should not subcycle.

        The n steps are chained as device programs of at most `segment`
        steps each (default 50, env RDCFES_SCAN_SEGMENT): a single scan
        program running ≳40 s trips the TPU device watchdog (observed
        UNAVAILABLE kernel faults on 400-step ADPM scans — PERF.md
        section 4), so segmentation is built into the production path
        rather than left to callers.  Identical math: segments chain the
        carried state; equal-size segments reuse one compiled program.

        `scalar_traj` maps a scalar-field name to its per-step values,
        shape (n,): step j of the segment sees value [j].  This is how a
        per-step-varying scalar like ADPM's `time` (which gates pulses /
        trapezoids, src/adpm.C:268-296) rides a scan without freezing —
        `scalars` entries, by contrast, are constant over all n steps.

        `field_update(state, aux, tr, *field_args) -> (fields, new_aux)`
        is a jittable per-step hook, traced into the scan body BEFORE the
        step, for qp fields derived from the carried solution — RIPF's
        TD fields are (u - prev_raw)/dt of the previous step
        (src/ripf.C:675-775), so its per-step host gather-and-rebuild
        loop collapses into the device program.  `field_args` ride as
        jit arguments (never close big arrays into the program — the
        axon tunnel rejects large serialized constants)."""
        assert self.physics_blocks is not None, "run_steps needs physics_blocks"
        assert params and all(
            isinstance(v, (int, float)) for v in params.values()
        ), "run_steps needs plain-scalar params"
        if subcycle not in (None, 1):
            k = (self.choose_subcycle(state, fields=fields, params=params,
                                      scalars=scalars, coords=coords,
                                      scalar_traj=scalar_traj)
                 if subcycle == "auto" else int(subcycle))
            if k > 1:
                p_sub = dict(params)
                p_sub["dt"] = float(params["dt"]) / k
                traj_sub = {kk: np.repeat(np.asarray(v), k)
                            for kk, v in (scalar_traj or {}).items()}
                out = self.run_steps(
                    state, int(n) * k, fields=fields, params=p_sub,
                    scalars=scalars, segment=segment,
                    scalar_traj=traj_sub or None,
                    field_update=field_update, field_aux=field_aux,
                    field_args=field_args, coords=coords)
                st, its, ress = out[:3]
                its = its.reshape(int(n), k).sum(axis=1)
                ress = ress.reshape(int(n), k)[:, -1]
                return (st, its, ress) + out[3:]
        if self.moving_mesh:
            assert coords is not None, "moving_mesh system needs current coords"
            geom = self._geom_from_coords(jnp.asarray(coords))
            # the cached block-Jacobi inverse belongs to the previous
            # geometry — never let a per-step fallback reuse it
            self._dinv_cache = None
        else:
            geom = None
        if scalars:
            fields = {**(fields or {}), **scalars}
        traj = {k: jnp.asarray(v, self.dtype)
                for k, v in (scalar_traj or {}).items()}
        for k, v in traj.items():
            assert v.shape == (int(n),), (
                f"scalar_traj[{k!r}] must have shape ({int(n)},), got {v.shape}")
        p = {k: float(v) for k, v in params.items()}
        fast = self._fast_tables()
        if (fast is not None and not fast["interpret"]
                and not bool(int(os.environ.get("RDCFES_FAST_SCAN", "0")))):
            # per-step dispatch through the cached single-step programs:
            # measured perf-neutral vs the scan (PERF.md), and scan
            # programs containing the Mosaic kernels only became
            # compileable once the geometry tables stopped being baked
            # into the program (RDCFES_FAST_SCAN=1 opts into the scan
            # path until it is soak-tested on hardware)
            its_all, ress_all = [], []
            aux = field_aux
            for j in range(int(n)):
                tr_j = {k: v[j] for k, v in traj.items()}
                f = {**(fields or {}), **tr_j}
                if field_update is not None:
                    fu, aux = field_update(state, aux, tr_j, *field_args)
                    f = {**f, **fu}
                state, it, res = self._step_qp(state, f, p, geom=geom)
                its_all.append(it)
                ress_all.append(res)
            out = (state, jnp.stack(its_all), jnp.stack(ress_all))
            return out + ((aux,) if field_update is not None else ())
        if segment is None:
            import os as _os

            segment = int(_os.environ.get("RDCFES_SCAN_SEGMENT", "50"))
        segment = max(1, int(segment))
        aux = field_aux

        def run_one(st, m, lo):
            nonlocal aux
            key = (("__multi__", int(m), id(field_update))
                   + tuple(sorted(traj)) + tuple(sorted(p.items())))
            fn = self._qp_step_cache.get(key)
            if fn is None:
                fn = self._qp_multi_fn(p, int(m), field_update)
                self._qp_step_cache[key] = fn
            tr = {k: v[lo:lo + m] for k, v in traj.items()}
            st, its, ress, aux = fn(st, fields or {}, tr,
                                    aux if aux is not None else 0.0,
                                    tuple(field_args), self._fast_args(),
                                    geom if geom is not None
                                    else self._geom_args())
            return st, its, ress

        n = int(n)
        if n <= segment:
            out = run_one(state, n, 0)
        else:
            its_all, ress_all = [], []
            remaining, lo = n, 0
            while remaining > 0:
                m = min(segment, remaining)
                state, its, ress = run_one(state, m, lo)
                its_all.append(its)
                ress_all.append(ress)
                remaining -= m
                lo += m
            out = (state, jnp.concatenate(its_all),
                   jnp.concatenate(ress_all))
        return out + ((aux,) if field_update is not None else ())

    def _geom_from_coords(self, coords):
        """The _geom_args tables rebuilt from CURRENT node positions (the
        moving-mesh scan path: within a segment of the coupled loop the
        coordinates are constant — they only move at loading points, so
        geometry is step-invariant per segment and builds ONCE, outside
        the scan).  phi is coordinate-independent and reused."""
        fn = getattr(self, "_moving_geom_fn", None)
        if fn is None:
            def build(cs):
                _, JxW, dphi = geometry_factors(cs, self.conn,
                                                self.mesh.elem_type)
                JxW = JxW.astype(self.dtype)
                dphi = dphi.astype(self.dtype)
                return {"JxW": JxW, "dphi": dphi,
                        "JxW32": JxW.astype(jnp.float32),
                        "dphi32": dphi.astype(jnp.float32),
                        "conn_T": self.conn_T,
                        "node_gather": self.node_gather}

            fn = self._moving_geom_fn = jax.jit(build)
        return fn(coords)

    def _step_qp(self, state, fields, params, geom=None):
        key = tuple(sorted((k, float(v)) for k, v in params.items()))
        fns = self._qp_step_cache.get(key)
        if fns is None:
            fns = self._qp_step_fn({k: float(v) for k, v in params.items()})
            self._qp_step_cache[key] = fns
        fresh, reuse = fns
        fa = self._fast_args()
        ga = self._geom_args() if geom is None else geom
        if (self.precond_refresh > 1 and self._dinv_cache is not None
                and self._steps_since_precond < self.precond_refresh):
            self._steps_since_precond += 1
            new_state, iters, res, _ = reuse(state, fields,
                                             self._dinv_cache, fa, ga)
            return new_state, iters, res
        new_state, iters, res, Dinv = fresh(state, fields, fa, ga)
        self._dinv_cache = Dinv
        self._steps_since_precond = 1
        return new_state, iters, res

    # ------------------------------------------------------------------
    def step(self, state: Dict, fields: Optional[Dict] = None,
             params: Optional[Dict] = None, coords: Optional[jnp.ndarray] = None,
             scalars: Optional[Dict] = None):
        """Advance one time step. Returns (new_state, lin_iters, lin_residual).

        `coords` (required when moving_mesh=True) are the current node
        positions the geometry is evaluated on.  `scalars` (per-step values
        like "time") are merged into `fields` — the split mirrors the
        multi-chip system, where element fields are sharded and scalars
        replicated."""
        if scalars:
            fields = {**(fields or {}), **scalars}
        if self.moving_mesh:
            assert coords is not None, "moving_mesh system needs current coords"
            return self._step_moving(state, fields or {}, params or {}, coords)
        if (self.physics_blocks is not None and params
                and all(isinstance(v, (int, float)) for v in params.values())):
            return self._step_qp(state, fields or {}, params)
        if (self.precond_refresh > 1 and self._dinv_cache is not None
                and self._steps_since_precond < self.precond_refresh):
            self._steps_since_precond += 1
            return self._step_reuse(state, fields or {}, params or {},
                                    self._dinv_cache)
        out = self._step(state, fields or {}, params or {})
        new_state, iters, res, Dinv = out
        self._dinv_cache = Dinv
        self._steps_since_precond = 1
        return new_state, iters, res
