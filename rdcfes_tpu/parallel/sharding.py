"""Multi-chip spatial domain decomposition over a jax device mesh.

TPU-native replacement for the reference's MPI domain decomposition
(SURVEY.md section 2.2): where libMesh partitions the mesh with METIS and
each rank assembles its local elements into a distributed PETSc matrix with
VecScatter halo exchanges, here

  * elements are partitioned into contiguous equal blocks across a 1-D
    device mesh axis "d" — "owner-computes" assembly is a `shard_map` over
    the element axis
  * each device scatter-adds its element contributions into a full-size
    row-major ELLPACK buffer; one `psum_scatter` over the row axis then
    leaves every device with its fully-summed block of matrix ROWS (the
    ICI-collective replacement for PETSc's off-process row communication)
  * the Krylov solve runs INSIDE the same shard_map with the scatter-free
    ELL SpMV: each device computes y for its rows (gather from the
    replicated iterate + batched einsum) and an `all_gather` re-replicates
    y — scatter ops never appear inside the `while_loop`, which matters
    doubly on TPU (they are slow AND trigger a pathological compile path,
    see fem.assembly.ell_structure)
  * the block-Jacobi preconditioner is an all_gather of locally-owned
    diagonal blocks

Run under `jax.sharding.Mesh(devices, ("d",))`; on a single device the same
program degenerates to the unsharded step.
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

from ..fem.assembly import build_sparsity, ell_structure
from ..fem.geometry import geometry_factors
from ..fem.weakform import element_matrices, element_vectors
from ..mesh.core import Mesh
from ..solvers.krylov import DEFAULT_MAXITER, DEFAULT_RTOL, small_block_inverse
from ..systems.transient import clamp_nonnegative


def partition_elements(n_elems: int, n_shards: int) -> Tuple[int, int]:
    """Contiguous equal-size blocks; returns (padded_count, block)."""
    block = -(-n_elems // n_shards)
    return block * n_shards, block


def _pad_axis0(a: np.ndarray, target: int, fill=0):
    pad = target - a.shape[0]
    if pad == 0:
        return a
    width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, width, constant_values=fill)


class ShardedTransientSystem:
    """Element-sharded linearized-CN transient system (multi-chip PIHNA et al.).

    Same step() contract as TransientRDCSystem; the whole step (assembly +
    BiCGStab) executes as one shard_map program over the device mesh."""

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

        sp = build_sparsity(mesh.connectivity, mesh.n_nodes)
        self.sp = sp
        N = mesh.n_nodes

        # ---- row-major ELL structure, rows padded to D equal blocks ------
        ell_cols, ell_slot = ell_structure(sp)  # (N, L)
        L = ell_cols.shape[1]
        self.L = L
        self.Npad = partition_elements(N, D)[0]
        ell_cols_p = _pad_axis0(ell_cols, self.Npad)
        ell_slot_p = _pad_axis0(ell_slot, self.Npad, fill=sp.nnz)
        # slot -> linear ELL position (row * L + pos); pad bin at the end
        slot_to_lin = np.full(sp.nnz + 1, self.Npad * L, dtype=np.int64)
        rr = np.repeat(np.arange(self.Npad), L)
        slot_to_lin[ell_slot_p.reshape(-1)] = rr * L + np.tile(
            np.arange(L), self.Npad
        )
        # per-row position of the diagonal block
        diag_pos = np.zeros(self.Npad, dtype=np.int32)
        rows_idx, pos_idx = np.nonzero(
            ell_slot_p[:N] == sp.diag_slots[:, None]
        )
        diag_pos[rows_idx] = pos_idx

        # ---- element tables, padded to D equal blocks --------------------
        Epad, _ = partition_elements(mesh.n_elems, D)
        conn_p = _pad_axis0(mesh.connectivity.astype(np.int32), Epad)
        # (e,i,j) -> linear ELL target
        ell_lin = slot_to_lin[sp.slots]  # (E, K, K)
        ell_lin_p = _pad_axis0(ell_lin, Epad, fill=self.Npad * L)
        phi, JxW, dphi = geometry_factors(
            jnp.asarray(mesh.coords), jnp.asarray(mesh.connectivity),
            mesh.elem_type,
        )
        JxW_p = _pad_axis0(np.asarray(JxW), Epad)  # padded elems weigh zero
        dphi_p = _pad_axis0(np.asarray(dphi), Epad)
        self.phi = jnp.asarray(phi)

        shard = NamedSharding(device_mesh, P("d"))
        repl = NamedSharding(device_mesh, P())
        self.conn_s = jax.device_put(conn_p, shard)
        self.ell_lin_s = jax.device_put(ell_lin_p, shard)
        self.JxW_s = jax.device_put(JxW_p, shard)
        self.dphi_s = jax.device_put(dphi_p, shard)
        self.ell_cols_s = jax.device_put(ell_cols_p, shard)   # rows sharded
        self.diag_pos_s = jax.device_put(diag_pos, shard)
        self._repl = repl

        fn = shard_map(
            self._step_shard,
            mesh=device_mesh,
            in_specs=(
                P(), P(), P(),                   # u, fields, params
                P("d"), P("d"), P("d"), P("d"),  # conn, ell_lin, JxW, dphi
                P("d"), P("d"),                  # ell_cols, diag_pos
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
    def _step_shard(self, u, fields, params, conn, ell_lin, JxW, dphi,
                    ell_cols, diag_pos):
        """Per-device program; collectives over mesh axis "d"."""
        N = self.sp.n_nodes
        V = self.n_vars
        L = self.L
        Nb = self.Npad // self.n_shards  # rows per device

        # ---- local gather + quadrature physics + element kernels --------
        ue = u[conn]  # (E_loc, K, V) — nodal state is replicated
        u_qp = jnp.einsum("qk,ekv->veq", self.phi, ue)
        grad_qp = jnp.einsum("eqkd,ekv->veqd", dphi, ue)
        wf = self.physics(u_qp, grad_qp, fields, params)
        Fe = element_vectors(wf, self.phi, JxW, dphi)
        Ke = element_matrices(wf, self.phi, JxW, dphi)

        # ---- rhs: local scatter-add + psum (allreduce over ICI) ----------
        E_loc, K = conn.shape
        b_local = jax.ops.segment_sum(
            jnp.transpose(Fe, (1, 2, 0)).reshape(E_loc * K, V),
            conn.reshape(-1), num_segments=N,
        )
        b = lax.psum(b_local, "d")

        # ---- matrix: scatter into full row-ELL, psum_scatter rows --------
        contrib = jnp.transpose(Ke, (2, 3, 4, 0, 1)).reshape(E_loc * K * K, V, V)
        ell_full = jax.ops.segment_sum(
            contrib, ell_lin.reshape(-1), num_segments=self.Npad * L + 1
        )[: self.Npad * L].reshape(self.Npad, L, V, V)
        vals_rows = lax.psum_scatter(
            ell_full, "d", scatter_dimension=0, tiled=True
        )  # (Nb, L, V, V), fully summed rows owned by this device

        # ---- block-Jacobi from all_gather of owned diagonal blocks -------
        row_ids = jnp.arange(Nb)
        diag_local = vals_rows[row_ids, diag_pos]  # (Nb, V, V)
        diag = lax.all_gather(diag_local, "d", axis=0, tiled=True)[:N]
        Dinv = small_block_inverse(
            jnp.where(
                (jnp.abs(diag).sum(axis=(1, 2)) == 0.0)[:, None, None],
                jnp.broadcast_to(jnp.eye(V), diag.shape), diag,
            )
        )

        def matvec(x):
            xg = x[ell_cols]  # (Nb, L, V) gather from replicated x
            y_loc = jnp.einsum("nlvw,nlw->nv", vals_rows, xg)
            return lax.all_gather(y_loc, "d", axis=0, tiled=True)[:N]

        def precond(r):
            return jnp.einsum("nvw,nw->nv", Dinv, r)

        # ---- replicated BiCGStab with sharded, scatter-free SpMV ---------
        x, iters, res = _bicgstab(matvec, b, u, precond, self.rtol, self.maxiter)
        u_new = self.clamp(x)
        return u_new, iters, res

    # ------------------------------------------------------------------
    def step(self, u, fields: Optional[Dict] = None,
             params: Optional[Dict] = None):
        return self._step(u, fields or {}, params or {},
                          self.conn_s, self.ell_lin_s, self.JxW_s, self.dphi_s,
                          self.ell_cols_s, self.diag_pos_s)


def _bicgstab(matvec, b, x0, M, rtol, maxiter):
    """Identical recurrence to solvers.krylov.bicgstab, restated here so the
    whole loop traces inside shard_map (dots on replicated arrays need no
    collectives; only the matvec communicates)."""
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
        beta = (rho1 / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = matvec(phat)
        alpha = rho1 / dot(rhat, v)
        st = r - alpha * v
        shat = M(st)
        t = matvec(shat)
        tt = dot(t, t)
        omega = jnp.where(tt == 0.0, 0.0, dot(t, st) / jnp.where(tt == 0.0, 1.0, tt))
        x = x + alpha * phat + omega * shat
        r = st - omega * t
        return (x, r, p, v, rho1, alpha, omega, k + 1)

    z = jnp.zeros_like(b)
    one = jnp.asarray(1.0, b.dtype)
    # mark replicated-initial carries as device-varying so the while_loop
    # carry types match after the first iteration (shard_map vma tracking)
    def vary(a):
        try:
            if "d" in jax.typeof(a).vma:
                return a
            return lax.pvary(a, ("d",))
        except AttributeError:
            return a

    init = (vary(x0), vary(r0), vary(z), vary(z), vary(one), vary(one),
            vary(one), jnp.asarray(0, jnp.int32))
    x, r, *_, k = lax.while_loop(cond, body, init)
    return x, k, jnp.sqrt(dot(r, r).real) / safe_b
