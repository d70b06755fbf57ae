"""Multi-chip spatial domain decomposition over a jax device mesh.

TPU-native replacement for the reference's MPI domain decomposition
(SURVEY.md section 2.2): where libMesh partitions the mesh with METIS and
each rank assembles its local elements into a distributed PETSc matrix with
VecScatter halo exchanges, here

  * elements are partitioned into contiguous equal blocks across a 1-D
    device mesh axis "d" — "owner-computes" element kernels run per device
    under `shard_map`
  * the Krylov solve is MATRIX-FREE, mirroring the single-chip design
    (systems/transient.py): each device applies its local element blocks to
    the replicated iterate (gather -> fused block product -> gather-based
    restriction over a per-shard inverse-connectivity table) and one `psum`
    combines the partial nodal results — the ICI collective that replaces
    PETSc's VecScatter halo exchange.  No scatter ops anywhere (scatter in
    a `while_loop` is pathological on XLA:TPU, see fem.assembly), no global
    sparse matrix.
  * the block-Jacobi preconditioner is a psum of locally restricted
    diagonal blocks; Krylov vectors and dot products stay replicated.

Run under `jax.sharding.Mesh(devices, ("d",))`; on one device this
degenerates to the unsharded step.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..fem.assembly import interpolate_at_qp
from ..fem.geometry import geometry_factors
from ..fem.weakform import element_matrices, element_vectors
from ..mesh.core import Mesh
from ..solvers.krylov import DEFAULT_MAXITER, DEFAULT_RTOL, small_block_inverse
from ..systems.transient import clamp_nonnegative


def partition_elements(n_elems: int, n_shards: int) -> Tuple[int, int]:
    """Contiguous equal-size blocks; returns (padded_count, block)."""
    block = -(-n_elems // n_shards)
    return block * n_shards, block


class ShardedTransientSystem:
    """Element-sharded linearized-CN transient system (multi-chip PIHNA et al.).

    Same step() contract as TransientRDCSystem; the whole step (element
    kernels + matrix-free BiCGStab) executes as one shard_map program."""

    def __init__(
        self,
        mesh: Mesh,
        n_vars: int,
        physics: Callable,
        device_mesh: DeviceMesh,
        clamp: Callable = clamp_nonnegative,
        rtol: float = DEFAULT_RTOL,
        maxiter: int = DEFAULT_MAXITER,
    ):
        self.mesh = mesh
        self.n_vars = n_vars
        self.physics = physics
        self.clamp = clamp
        self.rtol = rtol
        self.maxiter = maxiter
        self.dmesh = device_mesh
        D = device_mesh.devices.size
        self.n_shards = D
        N = mesh.n_nodes
        K = mesh.nodes_per_elem

        # ---- element tables, padded to D equal blocks --------------------
        Epad, Eb = partition_elements(mesh.n_elems, D)
        self.Eb = Eb
        conn_T = np.zeros((K, Epad), dtype=np.int32)
        conn_T[:, : mesh.n_elems] = mesh.connectivity.T
        phi, JxW, dphi = geometry_factors(
            jnp.asarray(mesh.coords), jnp.asarray(mesh.connectivity),
            mesh.elem_type,
        )  # phi (Q,K); JxW (Q,E); dphi (Q,K,3,E)
        Q = np.asarray(JxW).shape[0]
        JxW_p = np.zeros((Q, Epad))
        JxW_p[:, : mesh.n_elems] = np.asarray(JxW)  # padded elems weigh zero
        dphi_p = np.zeros((Q, K, 3, Epad))
        dphi_p[..., : mesh.n_elems] = np.asarray(dphi)
        self.phi = phi  # NumPy constant table

        # ---- per-shard inverse-connectivity (restriction) tables ---------
        # node_gather[s, c, n] = flat (k, e_local) index of the c-th
        # element-corner contribution to node n on shard s; pad = K * Eb
        tables = []
        Cmax = 1
        for s in range(D):
            local = conn_T[:, s * Eb : (s + 1) * Eb].reshape(-1)
            # padded elements (conn 0) must not contribute
            e_ids = np.tile(
                np.arange(s * Eb, (s + 1) * Eb), (K, 1)
            ).reshape(-1)
            mask = e_ids < mesh.n_elems
            valid = np.nonzero(mask)[0]
            order = valid[np.argsort(local[valid], kind="stable")]
            sorted_nodes = local[order]
            counts = np.bincount(sorted_nodes, minlength=N)
            Cs = int(counts.max()) if len(sorted_nodes) else 1
            Cmax = max(Cmax, Cs)
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            tbl = np.full((Cs, N), K * Eb, dtype=np.int32)
            pos = np.arange(len(sorted_nodes)) - starts[sorted_nodes]
            tbl[pos, sorted_nodes] = order
            tables.append(tbl)
        node_gather = np.full((D, Cmax, N), K * Eb, dtype=np.int32)
        for s, tbl in enumerate(tables):
            node_gather[s, : tbl.shape[0]] = tbl

        eshard2 = NamedSharding(device_mesh, P(None, "d"))
        eshard4 = NamedSharding(device_mesh, P(None, None, None, "d"))
        dshard = NamedSharding(device_mesh, P("d"))
        repl = NamedSharding(device_mesh, P())
        self.conn_T_s = jax.device_put(conn_T, eshard2)
        self.JxW_s = jax.device_put(JxW_p, eshard2)
        self.dphi_s = jax.device_put(dphi_p, eshard4)
        self.node_gather_s = jax.device_put(node_gather, dshard)
        self._repl = repl

        fn = shard_map(
            self._step_shard,
            mesh=device_mesh,
            in_specs=(
                P(), P(), P(),                   # u, fields, params
                P(None, "d"),                    # conn_T (K, E)
                P(None, "d"),                    # JxW (Q, E)
                P(None, None, None, "d"),        # dphi (Q, K, 3, E)
                P("d"),                          # node_gather (D, C, N)
            ),
            out_specs=(P(), P(), P()),
            # the solver keeps its iterates replicated by construction
            # (identical math on identical inputs); vma inference cannot see
            # that through the while_loop, so disable the static check
            check_vma=False,
        )
        self._step = jax.jit(fn)

    # ------------------------------------------------------------------
    def initial_state(self, u0: np.ndarray) -> jnp.ndarray:
        u0 = np.asarray(u0, dtype=np.float64)
        assert u0.shape == (self.mesh.n_nodes, self.n_vars)
        return jax.device_put(jnp.asarray(u0), self._repl)

    # ------------------------------------------------------------------
    def _step_shard(self, u, fields, params, conn_T, JxW, dphi, node_gather):
        """Per-device program; the only collectives are psums of nodal
        vectors over mesh axis "d"."""
        V = self.n_vars
        ng = node_gather[0]  # (C, N) — this shard's restriction table
        u_T = u.T  # (V, N) replicated

        def restrict(flat_local):
            """(.., K*E_loc) element-corner values -> (.., N) local part."""
            pad = jnp.zeros(flat_local.shape[:-1] + (1,), flat_local.dtype)
            f = jnp.concatenate([flat_local, pad], axis=-1)
            acc = f[..., ng[0]]
            for c in range(1, ng.shape[0]):
                acc = acc + f[..., ng[c]]
            return acc

        # ---- local element kernels ---------------------------------------
        u_qp, grad_qp = interpolate_at_qp(u_T, conn_T, self.phi, dphi)
        wf = self.physics(u_qp, grad_qp, fields, params)
        Fe = element_vectors(wf, self.phi, JxW, dphi)   # (V, K, E_loc)
        Ke, diag_e = element_matrices(
            wf, self.phi, JxW, dphi,
            grad_const=(self.mesh.elem_type == "TET4"), return_diag=True,
        )  # (V, V, K, K, E_loc), (V, V, K, E_loc)

        b = lax.psum(restrict(Fe.reshape(V, -1)), "d")

        # ---- block-Jacobi from psum of locally restricted diagonals ------
        diag = lax.psum(restrict(diag_e.reshape(V, V, -1)), "d")
        empty = jnp.abs(diag).sum(axis=(0, 1)) == 0.0
        diag = jnp.where(
            empty[None, None, :],
            jnp.broadcast_to(jnp.eye(V)[:, :, None], diag.shape), diag,
        )
        Dinv = small_block_inverse(diag, pivot=False)  # CN blocks: diag-dominant

        def matvec(x):
            ue = x[:, conn_T]  # (V, K, E_loc)
            ye = jnp.sum(Ke * ue[None, :, None, :, :], axis=(1, 3))
            return lax.psum(restrict(ye.reshape(V, -1)), "d")

        def precond(r):
            return jnp.sum(Dinv * r[None], axis=1)

        # left-preconditioned BiCGStab on the preconditioned residual
        # (see systems/transient.py on why this matters given the deck's
        # variable scales)
        pre_matvec = lambda x: precond(matvec(x))
        pre_b = precond(b)
        x, iters, res = _bicgstab(pre_matvec, pre_b, u_T, self.rtol,
                                  self.maxiter)
        u_new = self.clamp(x)
        return u_new.T, iters, res

    # ------------------------------------------------------------------
    def step(self, u, fields: Optional[Dict] = None,
             params: Optional[Dict] = None):
        return self._step(u, fields or {}, params or {},
                          self.conn_T_s, self.JxW_s, self.dphi_s,
                          self.node_gather_s)


def _bicgstab(matvec, b, x0, rtol, maxiter):
    """Identical recurrence to solvers.krylov.bicgstab (identity M: the
    caller pre-composes the preconditioner), restated here so the whole loop
    traces inside shard_map — dots on replicated arrays need no collectives;
    only the matvec communicates."""
    dot = lambda a, c: jnp.vdot(a, c)
    bnorm = jnp.sqrt(dot(b, b).real)
    safe_b = jnp.where(bnorm == 0.0, 1.0, bnorm)
    atol2 = (rtol * safe_b) ** 2
    r0 = b - matvec(x0)
    rhat = r0

    def cond(s):
        x, r, p, v, rho, alpha, omega, k = s
        return jnp.logical_and(dot(r, r).real > atol2, k < maxiter)

    def body(s):
        x, r, p, v, rho, alpha, omega, k = s
        rho1 = dot(rhat, r)
        # breakdown guards (mirrors solvers.krylov.bicgstab): an exact-zero
        # rho/omega/(rhat.v) would put inf/NaN into the carry and be
        # returned (then clamped) silently; freeze the iterate and exit
        safe = lambda d: jnp.where(d == 0.0, 1.0, d)
        beta = (rho1 / safe(rho)) * (alpha / safe(omega))
        p_new = r + beta * (p - omega * v)
        v_new = matvec(p_new)
        rtv = dot(rhat, v_new)
        alpha_new = rho1 / safe(rtv)
        st = r - alpha_new * v_new
        t = matvec(st)
        tt = dot(t, t)
        omega_new = jnp.where(tt == 0.0, 0.0, dot(t, st) / safe(tt))
        breakdown = (rho1 == 0.0) | (rtv == 0.0) | (omega == 0.0)
        x_new = x + alpha_new * p_new + omega_new * st
        r_new = st - omega_new * t
        x_new = jnp.where(breakdown, x, x_new)
        r_new = jnp.where(breakdown, r, r_new)
        k_new = jnp.where(breakdown, maxiter, k + 1)
        return (x_new, r_new, p_new, v_new, rho1, alpha_new, omega_new,
                k_new)

    def vary(a):
        try:
            if "d" in jax.typeof(a).vma:
                return a
            # jax >= 0.9 spelling (lax.pvary is deprecated)
            return lax.pcast(a, ("d",), to="varying")
        except (AttributeError, TypeError):
            try:
                return lax.pvary(a, ("d",))
            except AttributeError:
                return a

    z = jnp.zeros_like(b)
    one = jnp.asarray(1.0, b.dtype)
    init = (vary(x0), vary(r0), vary(z), vary(z), vary(one), vary(one),
            vary(one), jnp.asarray(0, jnp.int32))
    x, r, *_, k = lax.while_loop(cond, body, init)
    return x, k, jnp.sqrt(dot(r, r).real) / safe_b
