"""Transient RDC system on mixed-element-type meshes.

libMesh assembles heterogeneous meshes element-by-element through one
polymorphic FE loop (the reference reads arbitrary Gmsh meshes and its
writer maps 16 element types, src/paraview.h:210-234).  The TPU-native
equivalent is per-TYPE blocks: each MixedMesh block is a static-shape
batch with its own geometry tables and element kernels, and the global
operator is the sum of block restrictions,

    A = sum_b  P_b^T A_b P_b ,

so the Krylov matvec is a handful of fixed-shape fused kernels instead
of one ragged loop — the XLA-friendly formulation of the same math.

Numerics are identical to systems/transient.TransientRDCSystem (one
linearized Crank-Nicolson step per time step, block-Jacobi-left
preconditioned BiCGStab, post-solve clamp, u_raw history contract,
stale-preconditioner reuse); this class covers the materialized-kernel
path (element matrices in natural layout, applied matrix-free inside
the Krylov loop).  The single-type fast paths (Pallas permutation
kernels, affine fusion) stay on TransientRDCSystem — mixed meshes are
an ingestion-completeness surface, not the benchmark path.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import (
    assemble_vector_gather,
    build_sparsity,
    gather_tables,
    interpolate_at_qp,
)
from ..fem.geometry import geometry_factors
from ..fem.weakform import element_matrices, element_vectors
from ..solvers.krylov import (
    DEFAULT_MAXITER,
    DEFAULT_RTOL,
    apply_block_jacobi,
    bicgstab,
    gmres,
    small_block_inverse,
)
from .transient import clamp_nonnegative, refine_mixed


class MixedTransientRDCSystem:
    """TransientRDCSystem counterpart for MixedMesh (per-type blocks).

    Drop-in for the driver surface: initial_state / step / run_steps /
    gather_state / scatter_state with the same state dict
    (u, u_old, u_older, u_raw) and the same (state, iters, residual)
    step results.
    """

    def __init__(
        self,
        mesh,
        n_vars: int,
        physics: Callable,
        clamp: Callable = clamp_nonnegative,
        method: str = "bicgstab",
        rtol: float = DEFAULT_RTOL,
        maxiter: int = DEFAULT_MAXITER,
        dtype=jnp.float64,
        precision: str = "f64",
        precond_refresh: int = 1,
        physics_blocks: Optional[Callable] = None,  # accepted, unused
        moving_mesh: bool = False,
        constraints=None,
    ):
        self.mesh = mesh
        self.n_vars = n_vars
        self.physics = physics
        self.clamp = clamp
        self.method = method
        self.dtype = dtype
        if dtype == jnp.float32:
            rtol = max(rtol, 1e-6)
        self.rtol = rtol
        if precision not in ("f64", "mixed"):
            raise ValueError(f"unknown precision {precision!r}")
        self.precision = precision
        self.precond_refresh = int(precond_refresh)
        self._dinv_cache = None
        self._steps_since_precond = 0
        self.maxiter = maxiter

        coords = jnp.asarray(mesh.coords)
        self._blk = []
        # concat-order [start, start+n) range of each block: elemental
        # aux fields (e.g. ADPM tracts, adpm.C:32-37) arrive as one
        # (n_elems, ...) array over the block-concatenated element order
        # and are sliced per block before the physics call
        off = 0
        self._block_off = []
        for b in mesh.blocks:
            self._block_off.append((off, b.n_elems))
            off += b.n_elems
        for b in mesh.blocks:
            conn = jnp.asarray(b.connectivity)
            sp = build_sparsity(b.connectivity, mesh.n_nodes)
            _, node_gather = gather_tables(sp, b.connectivity)
            phi, JxW, dphi = geometry_factors(coords, conn, b.elem_type)
            self._blk.append({
                "elem_type": b.elem_type,
                "conn_T": jnp.asarray(b.connectivity.T),
                "node_gather": jnp.asarray(node_gather),
                "phi": phi,
                "JxW": JxW.astype(self.dtype),
                "dphi": dphi.astype(self.dtype),
            })
        # moving mesh (coupled RDC<->solid, reference coupled_hcc.C:114):
        # geometry factors are rebuilt per block from the coords passed
        # to step() — same contract as TransientRDCSystem(moving_mesh=)
        self.moving_mesh = moving_mesh
        # hanging-node constraints (H, 3) rows [h, a, b]: u_h=(u_a+u_b)/2
        # — produced by mesh/adapt_ext.MixedConstrained when the TET4
        # block of a mixed mesh refines against frozen transition blocks.
        # Solved as C^T A C matrix-free, same algebra as
        # TransientRDCSystem(constraints=).
        if constraints is not None and len(constraints):
            c = np.asarray(constraints, dtype=np.int32)
            self._cons = (jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1]),
                          jnp.asarray(c[:, 2]))
        else:
            self._cons = None
        self._step = jax.jit(self._step_impl)
        self._step_reuse = jax.jit(self._step_reuse_impl)
        self._step_moving = jax.jit(self._step_moving_impl)

    # ------------------------------------------------------------------
    def initial_state(self, u0: np.ndarray) -> Dict[str, jnp.ndarray]:
        u0 = jnp.asarray(u0, dtype=self.dtype)
        assert u0.shape == (self.mesh.n_nodes, self.n_vars)
        return {"u": u0, "u_old": u0, "u_older": u0, "u_raw": u0}

    def gather_state(self, state: Dict) -> Dict:
        return {k: np.asarray(v) for k, v in state.items()}

    def scatter_state(self, gstate: Dict) -> Dict:
        return {k: jnp.asarray(v, dtype=self.dtype)
                for k, v in gstate.items()}

    # ------------------------------------------------------------------
    def _fields_for_block(self, bi, fields):
        """Slice elemental aux fields (leading axis == n_elems, e.g. ADPM
        tracts) to block bi's concat-order range; per-block TUPLES (one
        entry per block, e.g. driver-sampled qp fields whose Q differs by
        element type) select entry bi; everything else (nodal fields,
        scalars) passes through unchanged."""
        off, nb = self._block_off[bi]
        out = {}
        for k, v in (fields or {}).items():
            if isinstance(v, (tuple, list)):
                out[k] = v[bi]
            elif (getattr(v, "ndim", 0) >= 1
                    and v.shape[0] == self.mesh.n_elems):
                out[k] = v[off:off + nb]
            else:
                out[k] = v
        return out

    def _block_kernels(self, bi, blk, u_T, fields, params, geom=None):
        """(Fe, Ke, diag_e) of one block from the linearized-CN weak form
        — the per-type instance of TransientRDCSystem._element_kernels.
        `geom` overrides the cached (JxW, dphi) on the moving-mesh path."""
        JxW, dphi = geom if geom is not None else (blk["JxW"], blk["dphi"])
        u_qp, grad_qp = interpolate_at_qp(u_T, blk["conn_T"], blk["phi"],
                                          dphi)
        wf = self.physics(u_qp, grad_qp,
                          self._fields_for_block(bi, fields), params)
        Fe = element_vectors(wf, blk["phi"], JxW, dphi)
        Ke, diag_e = element_matrices(
            wf, blk["phi"], JxW, dphi,
            grad_const=(blk["elem_type"] == "TET4"), return_diag=True,
        )
        return (Fe.astype(self.dtype), Ke.astype(self.dtype),
                diag_e.astype(self.dtype))

    def _restrict(self, blk, flat):
        """(.., K*E) block corner values -> (.., N) via its gather table."""
        ng = blk["node_gather"]
        pad = jnp.zeros(flat.shape[:-1] + (1,), flat.dtype)
        f = jnp.concatenate([flat, pad], axis=-1)
        acc = f[..., ng[0]]
        for c in range(1, ng.shape[0]):
            acc = acc + f[..., ng[c]]
        return acc

    def _matvec(self, Kes, x):
        """y = sum_b P_b^T (Ke_b P_b x): per-block gather-apply-restrict."""
        V = self.n_vars
        y = None
        for blk, Ke in zip(self._blk, Kes):
            ue = x[:, blk["conn_T"]]                        # (V, K, E)
            ye = jnp.sum(Ke * ue[None, :, None, :, :], axis=(1, 3))
            yb = self._restrict(blk, ye.reshape(V, -1))
            y = yb if y is None else y + yb
        return y

    # constraint algebra (hanging nodes): iterate in the reduced space,
    # apply the constrained operator C^T A C matrix-free
    def _c_apply(self, x):
        hh, aa, bb = self._cons
        return x.at[:, hh].set(0.5 * (x[:, aa] + x[:, bb]))

    def _ct_fold(self, y):
        hh, aa, bb = self._cons
        half = 0.5 * y[:, hh]
        y = y.at[:, aa].add(half)
        y = y.at[:, bb].add(half)
        return y.at[:, hh].set(0.0)

    def _assemble_all(self, u_T, fields, params, geoms=None):
        V = self.n_vars
        Fes, Kes, b, diag = [], [], None, None
        for bi, blk in enumerate(self._blk):
            Fe, Ke, diag_e = self._block_kernels(
                bi, blk, u_T, fields, params,
                geom=None if geoms is None else geoms[bi])
            Kes.append(Ke)
            bb = assemble_vector_gather(Fe, blk["node_gather"])
            db = self._restrict(
                blk, diag_e.reshape(V * V, -1)).reshape(V, V, -1)
            b = bb if b is None else b + bb
            diag = db if diag is None else diag + db
        if self._cons is not None:
            b = self._ct_fold(b)
            # fold the hanging diagonal's 1/4-weight contribution onto
            # the endpoints and pin hanging blocks to identity so the
            # Krylov iterates stay zero there (same construction as
            # TransientRDCSystem's qp step)
            diag = diag.reshape(V, V, -1)
            hh, aa, bb_ = self._cons
            quarter = 0.25 * diag[:, :, hh]
            diag = diag.at[:, :, aa].add(quarter)
            diag = diag.at[:, :, bb_].add(quarter)
            eye = jnp.broadcast_to(
                jnp.eye(V, dtype=diag.dtype)[:, :, None],
                (V, V, hh.shape[0]))
            diag = diag.at[:, :, hh].set(eye)
        return Kes, b, diag

    # ------------------------------------------------------------------
    def _solve_clamped(self, state, Kes, b, Dinv):
        M = partial(apply_block_jacobi, Dinv)
        if self._cons is None:
            matvec = partial(self._matvec, Kes)
        else:
            matvec = lambda x: self._ct_fold(
                self._matvec(Kes, self._c_apply(x)))
        pre_matvec = lambda x: M(matvec(x))
        pre_b = M(b)
        x0 = 2.0 * state["u"].T - state["u_old"].T
        if self._cons is not None:
            x0 = x0.at[:, self._cons[0]].set(0.0)
        if self.precision == "mixed" and self.dtype == jnp.float64:
            f32 = jnp.float32
            Kes32 = [K.astype(f32) for K in Kes]
            M32 = partial(apply_block_jacobi, Dinv.astype(f32))
            if self._cons is None:
                mv32c = partial(self._matvec, Kes32)
            else:
                mv32c = lambda x: self._ct_fold(
                    self._matvec(Kes32, self._c_apply(x)))
            mv32 = lambda x: M32(mv32c(x))
            # inner_rtol 1e-7: mixed-mesh transition elements give this
            # operator ~1e5 residual-to-solution-error amplification
            # (test_mixed's dense-solve bar), so each refinement pass
            # lands near the f32 floor — zero extra f64 matvecs
            # adaptive_tol=False: the per-pass residual ceiling would
            # let final passes land shallow; through this operator's
            # ~1e5 amplification that costs ~6e-8 of SOLUTION accuracy
            # (refine_mixed docring; round-5 regression caught by the
            # dense-solve test)
            u_raw, iters, resid = refine_mixed(
                mv32, pre_matvec, pre_b, x0, self.rtol, self.maxiter,
                f64_fallback=True, inner_rtol=1e-7, adaptive_tol=False)
        else:
            fn = {"bicgstab": bicgstab, "gmres": gmres}[self.method]
            r = fn(pre_matvec, pre_b, x0=x0, rtol=self.rtol,
                   maxiter=self.maxiter)
            u_raw, iters, resid = r.x, r.iters, r.residual
        if self._cons is not None:
            # hanging dofs are DERIVED: distribute the solved masters,
            # clamp, then re-derive so u_h = (u_a + u_b)/2 holds exactly
            u_raw = self._c_apply(u_raw)
        u_new = self.clamp(u_raw)
        if self._cons is not None:
            u_new = self._c_apply(u_new)
        new_state = {"u": u_new.T, "u_old": state["u"],
                     "u_older": state["u_old"], "u_raw": u_raw.T}
        return new_state, iters, resid

    def _step_impl(self, state, fields, params):
        Kes, b, diag = self._assemble_all(state["u"].T, fields, params)
        Dinv = small_block_inverse(diag, pivot=False)
        return self._solve_clamped(state, Kes, b, Dinv) + (Dinv,)

    def _step_reuse_impl(self, state, fields, params, Dinv):
        Kes, b, _ = self._assemble_all(state["u"].T, fields, params)
        return self._solve_clamped(state, Kes, b, Dinv)

    def _step_moving_impl(self, state, fields, params, coords):
        """Geometry rebuilt per block from current node positions (the
        deformed-configuration RDC solve of the coupled driver)."""
        from ..fem.geometry import geometry_factors

        geoms = []
        for blk, mb in zip(self._blk, self.mesh.blocks):
            _, JxW, dphi = geometry_factors(
                coords, jnp.asarray(mb.connectivity), blk["elem_type"])
            geoms.append((JxW.astype(self.dtype), dphi.astype(self.dtype)))
        Kes, b, diag = self._assemble_all(state["u"].T, fields, params,
                                          geoms=geoms)
        Dinv = small_block_inverse(diag, pivot=False)
        return self._solve_clamped(state, Kes, b, Dinv)

    # ------------------------------------------------------------------
    def step(self, state: Dict, fields: Optional[Dict] = None,
             params: Optional[Dict] = None,
             scalars: Optional[Dict] = None,
             coords: Optional[jnp.ndarray] = None):
        if scalars:
            fields = {**(fields or {}), **scalars}
        if self.moving_mesh:
            assert coords is not None, "moving_mesh system needs current coords"
            return self._step_moving(state, fields or {}, params or {},
                                     jnp.asarray(coords))
        if (self.precond_refresh > 1 and self._dinv_cache is not None
                and self._steps_since_precond < self.precond_refresh):
            self._steps_since_precond += 1
            return self._step_reuse(state, fields or {}, params or {},
                                    self._dinv_cache)
        new_state, iters, res, Dinv = self._step(state, fields or {},
                                                 params or {})
        self._dinv_cache = Dinv
        self._steps_since_precond = 1
        return new_state, iters, res

    def run_steps(self, state: Dict, n: int, fields: Optional[Dict] = None,
                  params: Optional[Dict] = None,
                  scalars: Optional[Dict] = None,
                  segment: Optional[int] = None):
        """n steps through the cached per-step programs (the scan path is
        a single-type fast-path optimization; per-step dispatch is
        measured perf-neutral — PERF.md)."""
        its, ress = [], []
        for _ in range(int(n)):
            state, it, res = self.step(state, fields=fields, params=params,
                                       scalars=scalars)
            its.append(it)
            ress.append(res)
        return state, jnp.stack(its), jnp.stack(ress)

    # ------------------------------------------------------------------
    def assemble_scipy(self, u_T, fields, params):
        """Global block-CSR operator and rhs as scipy objects (test/oracle
        surface: the per-block element matrices are each validated by the
        single-type oracles; this materializes their sum)."""
        import scipy.sparse as sps

        V, N = self.n_vars, self.mesh.n_nodes
        A = None
        b = None
        for bi, (blk, mb) in enumerate(zip(self._blk, self.mesh.blocks)):
            u_qp, grad_qp = interpolate_at_qp(
                jnp.asarray(u_T), blk["conn_T"], blk["phi"], blk["dphi"])
            wf = self.physics(u_qp, grad_qp,
                              self._fields_for_block(bi, fields or {}),
                              params or {})
            Fe = element_vectors(wf, blk["phi"], blk["JxW"], blk["dphi"])
            Ke = element_matrices(wf, blk["phi"], blk["JxW"], blk["dphi"],
                                  grad_const=(blk["elem_type"] == "TET4"))
            Ke = np.asarray(Ke)
            conn = mb.connectivity
            E, K = conn.shape
            rows = np.repeat(conn, K, axis=1).reshape(-1)
            cols = np.tile(conn, (1, K)).reshape(-1)
            blocks = [[sps.csr_matrix(
                (Ke[v, w].transpose(2, 0, 1).reshape(-1), (rows, cols)),
                shape=(N, N)) for w in range(V)] for v in range(V)]
            Ab = sps.bmat(blocks, format="csr")
            bb = np.zeros((V, N))
            FeT = np.asarray(Fe)  # (V, K, E)
            for v in range(V):
                np.add.at(bb[v], conn.reshape(-1),
                          FeT[v].T.reshape(-1))
            A = Ab if A is None else A + Ab
            b = bb if b is None else b + bb
        return A, b.reshape(V * N)
