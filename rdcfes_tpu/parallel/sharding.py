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

        # ---- channel-first ELL structure, rows padded to D blocks --------
        ell_cols, ell_slot = ell_structure(sp)  # (L, N)
        L = ell_cols.shape[0]
        self.L = L
        self.Npad = partition_elements(N, D)[0]
        pad_cols = self.Npad - N
        ell_cols_p = np.pad(ell_cols, ((0, 0), (0, pad_cols)))
        ell_slot_p = np.pad(ell_slot, ((0, 0), (0, pad_cols)),
                            constant_values=sp.nnz)
        # slot -> linear position into the (L, Npad) value layout
        # (lin = pos * Npad + row); pad bin at the end
        slot_to_lin = np.full(sp.nnz + 1, self.Npad * L, dtype=np.int64)
        pp, rr = np.nonzero(ell_slot_p < sp.nnz)
        slot_to_lin[ell_slot_p[pp, rr]] = pp * self.Npad + rr
        # per-row position of the diagonal block
        diag_pos = np.zeros(self.Npad, dtype=np.int32)
        pos_idx, rows_idx = np.nonzero(ell_slot_p[:, :N] == sp.diag_slots[None, :])
        diag_pos[rows_idx] = pos_idx

        # ---- element tables, padded to D equal blocks --------------------
        Epad, _ = partition_elements(mesh.n_elems, D)
        conn_p = _pad_axis0(mesh.connectivity.astype(np.int32), Epad)
        # (i, j, e)-ordered flat targets into the (L, Npad) layout
        ell_lin = slot_to_lin[np.transpose(sp.slots, (1, 2, 0))]  # (K, K, E)
        K = mesh.nodes_per_elem
        ell_lin_p = np.full((K, K, Epad), self.Npad * L, dtype=np.int64)
        ell_lin_p[:, :, : mesh.n_elems] = ell_lin
        phi, JxW, dphi = geometry_factors(
            jnp.asarray(mesh.coords), jnp.asarray(mesh.connectivity),
            mesh.elem_type,
        )  # phi (Q,K); JxW (Q,E); dphi (Q,K,3,E)
        Q = np.asarray(JxW).shape[0]
        JxW_p = np.zeros((Q, Epad))
        JxW_p[:, : mesh.n_elems] = np.asarray(JxW)  # padded elems weigh zero
        dphi_p = np.zeros((Q, K, 3, Epad))
        dphi_p[..., : mesh.n_elems] = np.asarray(dphi)
        self.phi = phi  # NumPy constant table (see fem.geometry)

        eshard = NamedSharding(device_mesh, P("d"))           # element axis 0
        lastshard4 = NamedSharding(device_mesh, P(None, None, None, "d"))
        lastshard3 = NamedSharding(device_mesh, P(None, None, "d"))
        lastshard2 = NamedSharding(device_mesh, P(None, "d"))
        repl = NamedSharding(device_mesh, P())
        self.conn_s = jax.device_put(conn_p, eshard)
        self.ell_lin_s = jax.device_put(ell_lin_p, lastshard3)
        self.JxW_s = jax.device_put(JxW_p, lastshard2)
        self.dphi_s = jax.device_put(dphi_p, lastshard4)
        self.ell_cols_s = jax.device_put(ell_cols_p, lastshard2)  # rows sharded
        self.diag_pos_s = jax.device_put(diag_pos, eshard)
        self._repl = repl

        fn = shard_map(
            self._step_shard,
            mesh=device_mesh,
            in_specs=(
                P(), P(), P(),                   # u, fields, params
                P("d"),                          # conn (elements)
                P(None, None, "d"),              # ell_lin (K, K, E)
                P(None, "d"),                    # JxW (Q, E)
                P(None, None, None, "d"),        # dphi (Q, K, 3, E)
                P(None, "d"),                    # ell_cols (L, N)
                P("d"),                          # diag_pos (N,)
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
        """Per-device program; collectives over mesh axis "d".  All large
        arrays are channel-first (node/element axis last)."""
        N = self.sp.n_nodes
        V = self.n_vars
        L = self.L
        Nb = self.Npad // self.n_shards  # rows per device
        u_T = u.T  # (V, N) replicated

        # ---- local gather + quadrature physics + element kernels --------
        conn_T = conn.T  # (K, E_loc)
        from ..fem.assembly import interpolate_at_qp as _interp
        u_qp, grad_qp = _interp(u_T, conn_T, self.phi, dphi)
        wf = self.physics(u_qp, grad_qp, fields, params)
        Fe = element_vectors(wf, self.phi, JxW, dphi)   # (V, K, E_loc)
        Ke = element_matrices(wf, self.phi, JxW, dphi)  # (V, V, K, K, E_loc)

        # ---- rhs: local scatter-add + psum (allreduce over ICI) ----------
        # per-variable 1-D scatters (multi-window scatters force tiny-dim-
        # minor tile-padded layouts; see fem.assembly.assemble_matrix)
        conn_flat = conn_T.reshape(-1)
        b_local = jnp.stack([
            jnp.zeros((N,)).at[conn_flat].add(Fe[v].reshape(-1))
            for v in range(V)
        ])
        b = lax.psum(b_local, "d")

        # ---- matrix: scatter into full (V,V,L,Npad), psum_scatter rows ---
        lin_flat = ell_lin.reshape(-1)
        ell_full = jnp.stack([
            jnp.stack([
                jnp.zeros((self.Npad * L + 1,)).at[lin_flat].add(
                    Ke[v, w].reshape(-1))
                for w in range(V)
            ])
            for v in range(V)
        ])
        ell_full = ell_full[:, :, : self.Npad * L].reshape(V, V, L, self.Npad)
        vals_rows = lax.psum_scatter(
            ell_full, "d", scatter_dimension=3, tiled=True
        )  # (V, V, L, Nb), fully summed rows owned by this device

        # ---- block-Jacobi from all_gather of owned diagonal blocks -------
        idx = jnp.broadcast_to(diag_pos[None, None, None, :], (V, V, 1, Nb))
        diag_local = jnp.take_along_axis(vals_rows, idx, axis=2)[:, :, 0, :]
        diag = lax.all_gather(diag_local, "d", axis=2, tiled=True)[:, :, :N]
        empty = jnp.abs(diag).sum(axis=(0, 1)) == 0.0
        diag = jnp.where(
            empty[None, None, :],
            jnp.broadcast_to(jnp.eye(V)[:, :, None], diag.shape), diag,
        )
        Dinv = small_block_inverse(diag)

        def matvec(x):
            xg = x[:, ell_cols]  # (V, L, Nb) gather from replicated x
            y_loc = jnp.sum(vals_rows * xg[None], axis=(1, 2))
            return lax.all_gather(y_loc, "d", axis=1, tiled=True)[:, :N]

        def precond(r):
            return jnp.sum(Dinv * r[None], axis=1)

        # ---- replicated BiCGStab with sharded, scatter-free SpMV ---------
        x, iters, res = _bicgstab(matvec, b, u_T, precond, self.rtol, self.maxiter)
        u_new = self.clamp(x)
        return u_new.T, iters, res

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
