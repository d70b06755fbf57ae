"""Multi-chip spatial domain decomposition over a jax device mesh.

TPU-native replacement for the reference's MPI domain decomposition
(SURVEY.md section 2.2): where libMesh partitions the mesh with METIS and
each rank assembles its local elements into a distributed PETSc matrix with
VecScatter halo exchanges, here

  * elements are partitioned into contiguous blocks (padded to equal size)
    across a 1-D device mesh axis "d" — "owner-computes" assembly becomes a
    `shard_map` over the element axis
  * each device scatter-adds its element contributions into a full-size
    block-CSR value buffer; one `psum_scatter` then leaves every device with
    its fully-summed shard of the nonzeros (the ICI-collective replacement
    for PETSc's off-process row communication at matrix close)
  * the Krylov solve runs INSIDE the same shard_map: the SpMV is
    local-gather + batched block product + segment-sum + `psum`, Krylov
    vectors and dot products stay replicated — reductions ride ICI, exactly
    the "context parallelism over space" called for in SURVEY.md section 5
  * the block-Jacobi preconditioner is built from a psum of the locally
    owned diagonal blocks

Run under `jax.sharding.Mesh(devices, ("d",))`; on a single device the same
program degenerates to the unsharded step.
"""

from __future__ import annotations

from functools import partial
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

from ..fem.assembly import build_sparsity
from ..fem.geometry import geometry_factors
from ..fem.weakform import element_matrices, element_vectors
from ..mesh.core import Mesh
from ..solvers.krylov import DEFAULT_MAXITER, DEFAULT_RTOL, small_block_inverse
from ..systems.transient import clamp_nonnegative


def partition_elements(n_elems: int, n_shards: int) -> Tuple[int, int]:
    """Contiguous equal-size element blocks; returns (padded_E, block)."""
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

    Same step() contract as TransientRDCSystem, but the whole step
    (assembly + BiCGStab) executes as one shard_map program over the device
    mesh axis "d"."""

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

        # ---- element tables, padded to D equal blocks --------------------
        Epad, _ = partition_elements(mesh.n_elems, D)
        conn_p = _pad_axis0(mesh.connectivity.astype(np.int32), Epad)
        slots_p = _pad_axis0(sp.slots, Epad)
        # padding elements: weight them out by zeroing their JxW
        phi, JxW, dphi = geometry_factors(
            jnp.asarray(mesh.coords), jnp.asarray(mesh.connectivity),
            mesh.elem_type,
        )
        Q = JxW.shape[1]
        JxW_p = _pad_axis0(np.asarray(JxW), Epad)
        dphi_p = _pad_axis0(np.asarray(dphi), Epad)
        self.phi = jnp.asarray(phi)

        # ---- nnz tables, padded to D equal blocks ------------------------
        Npad_nnz = partition_elements(sp.nnz, D)[0]
        rows_p = _pad_axis0(sp.rows, Npad_nnz, fill=N)  # row N = dump row
        cols_p = _pad_axis0(sp.cols, Npad_nnz, fill=0)
        self.nnz_pad = Npad_nnz

        shard = NamedSharding(device_mesh, P("d"))
        repl = NamedSharding(device_mesh, P())
        self.conn_s = jax.device_put(conn_p, shard)
        self.slots_s = jax.device_put(slots_p, shard)
        self.JxW_s = jax.device_put(JxW_p, shard)
        self.dphi_s = jax.device_put(dphi_p, shard)
        self.rows_s = jax.device_put(rows_p, shard)
        self.cols_s = jax.device_put(cols_p, shard)
        self.diag_slots_r = jax.device_put(sp.diag_slots.astype(np.int32), repl)
        self._repl = repl

        fn = shard_map(
            self._step_shard,
            mesh=device_mesh,
            in_specs=(
                P(), P(), P(),              # u, fields, params (replicated)
                P("d"), P("d"), P("d"), P("d"),  # conn, slots, JxW, dphi
                P("d"), P("d"), P(),        # rows, cols, diag_slots
            ),
            out_specs=(P(), P(), P()),
        )
        self._step = jax.jit(fn)

    # ------------------------------------------------------------------
    def initial_state(self, u0: np.ndarray) -> jnp.ndarray:
        u0 = np.asarray(u0, dtype=np.float64)
        assert u0.shape == (self.mesh.n_nodes, self.n_vars)
        return jax.device_put(jnp.asarray(u0), self._repl)

    # ------------------------------------------------------------------
    def _step_shard(self, u, fields, params, conn, slots, JxW, dphi,
                    rows, cols, diag_slots):
        """Per-device program; collectives over mesh axis "d"."""
        N = self.sp.n_nodes
        nnz = self.sp.nnz
        D = self.n_shards
        nnz_shard = self.nnz_pad // D
        V = self.n_vars

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

        # ---- matrix: local scatter into full nnz, then psum_scatter ------
        contrib = jnp.transpose(Ke, (2, 3, 4, 0, 1)).reshape(E_loc * K * K, V, V)
        vals_full = jax.ops.segment_sum(
            contrib, slots.reshape(-1), num_segments=self.nnz_pad
        )
        vals_shard = lax.psum_scatter(
            vals_full, "d", scatter_dimension=0, tiled=True
        )  # (nnz_shard, V, V), fully summed

        # ---- block-Jacobi from psum of locally-owned diagonal blocks -----
        my_shard = lax.axis_index("d")
        lo = my_shard * nnz_shard
        local_slot_of = diag_slots - lo  # where my shard holds the diag block
        in_mine = jnp.logical_and(local_slot_of >= 0, local_slot_of < nnz_shard)
        safe_idx = jnp.clip(local_slot_of, 0, nnz_shard - 1)
        diag_local = jnp.where(
            in_mine[:, None, None], vals_shard[safe_idx], 0.0
        )
        diag = lax.psum(diag_local, "d")  # (N, V, V) replicated
        Dinv = small_block_inverse(diag)

        def matvec(x):
            xg = x[cols]  # (nnz_shard, V)
            prod = jnp.einsum("svw,sw->sv", vals_shard, xg)
            # padded slots carry row id N -> dumped into an extra bin
            y = jax.ops.segment_sum(prod, rows, num_segments=N + 1)[:N]
            return lax.psum(y, "d")

        def precond(r):
            return jnp.einsum("nvw,nw->nv", Dinv, r)

        # ---- replicated BiCGStab with sharded SpMV -----------------------
        x, iters, res = _bicgstab(matvec, b, u, precond, self.rtol, self.maxiter)
        u_new = self.clamp(x)
        return u_new, iters, res

    # ------------------------------------------------------------------
    def step(self, u, fields: Optional[Dict] = None,
             params: Optional[Dict] = None):
        return self._step(u, fields or {}, params or {},
                          self.conn_s, self.slots_s, self.JxW_s, self.dphi_s,
                          self.rows_s, self.cols_s, self.diag_slots_r)


def _bicgstab(matvec, b, x0, M, rtol, maxiter):
    """Identical recurrence to solvers.krylov.bicgstab, restated here so the
    whole loop traces inside shard_map (dots on replicated arrays need no
    collectives; only matvec psums)."""
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
    init = (x0, r0, z, z, one, one, one, jnp.asarray(0, jnp.int32))
    x, r, *_, k = lax.while_loop(cond, body, init)
    return x, k, jnp.sqrt(dot(r, r).real) / safe_b
