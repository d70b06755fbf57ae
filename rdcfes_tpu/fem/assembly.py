"""Gather-compute-scatter assembly into a node-block CSR operator.

TPU-native replacement for the reference's PETSc matrix assembly
(`system.get_system_matrix().add_matrix(Ke, dof_indices)`, src/pihna.C:754):

* The sparsity pattern over node pairs is fixed by the mesh connectivity, so
  it is computed ONCE on the host (`build_sparsity`, via the native meshkit
  runtime when built) together with a slot table mapping every
  (element, i, j) entry to its nonzero index.  Per time step, assembly is
  then a pure static-shaped scatter-add — no atomics, no dynamic sparsity.
* The matrix is stored as V x W nodal blocks in channel-first layout
  (V, W, nnz) — the nnz axis last so TPU tiling pads ~1x instead of 25x
  (see fem.geometry docstring).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class NodePairSparsity(NamedTuple):
    """Host-precomputed block-CSR structure over node pairs.

    n_nodes   : int
    nnz       : int                   number of node-pair blocks
    rows      : (nnz,) int32          row (node) id of each block
    cols      : (nnz,) int32          col (node) id of each block
    slots     : (E, K, K) int32       nonzero index of (element, i, j)
    row_ptr   : (n_nodes+1,) int64    CSR offsets (blocks sorted by row, col)
    diag_slots: (n_nodes,) int32      slot of each diagonal block
    """

    n_nodes: int
    nnz: int
    rows: np.ndarray
    cols: np.ndarray
    slots: np.ndarray
    row_ptr: np.ndarray
    diag_slots: np.ndarray

    def slots_flat_cf(self) -> np.ndarray:
        """Slot ids flattened in (i, j, e) order — matches the flattening of
        channel-first element matrices Ke (V, W, i, j, E)."""
        return np.ascontiguousarray(
            np.transpose(self.slots, (1, 2, 0))
        ).reshape(-1)


def build_sparsity(connectivity: np.ndarray, n_nodes: int) -> NodePairSparsity:
    """Build node-pair block sparsity + per-element slot table (host side).

    Uses the native meshkit runtime when built (~20x faster at brain-mesh
    scale); the NumPy path below is the reference fallback with identical
    output (tests assert bit equality)."""
    try:
        from ..native import build_sparsity_native

        nat = build_sparsity_native(connectivity, n_nodes)
    except Exception:
        nat = None
    if nat is not None:
        rows, cols, slots, nnz = nat
        row_ptr = np.zeros(n_nodes + 1, dtype=np.int64)
        np.add.at(row_ptr, rows + 1, 1)
        row_ptr = np.cumsum(row_ptr)
        diag = np.nonzero(rows == cols)[0]
        diag_slots = np.full(n_nodes, -1, dtype=np.int32)
        diag_slots[rows[diag]] = diag.astype(np.int32)
        return NodePairSparsity(
            n_nodes=n_nodes, nnz=nnz, rows=rows, cols=cols, slots=slots,
            row_ptr=row_ptr, diag_slots=diag_slots,
        )

    conn = np.asarray(connectivity, dtype=np.int64)
    E, K = conn.shape
    rows = np.repeat(conn, K, axis=1).reshape(E, K, K)  # rows[e,i,j] = conn[e,i]
    cols = np.tile(conn, (1, K)).reshape(E, K, K)       # cols[e,i,j] = conn[e,j]
    pair_keys = rows.reshape(-1) * np.int64(n_nodes) + cols.reshape(-1)
    uniq, inv = np.unique(pair_keys, return_inverse=True)
    nnz = uniq.shape[0]
    u_rows = (uniq // n_nodes).astype(np.int32)
    u_cols = (uniq % n_nodes).astype(np.int32)
    row_ptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(row_ptr, u_rows + 1, 1)
    row_ptr = np.cumsum(row_ptr)
    diag = np.nonzero(u_rows == u_cols)[0]
    diag_slots = np.full(n_nodes, -1, dtype=np.int32)
    diag_slots[u_rows[diag]] = diag.astype(np.int32)
    return NodePairSparsity(
        n_nodes=n_nodes,
        nnz=nnz,
        rows=u_rows,
        cols=u_cols,
        slots=inv.reshape(E, K, K).astype(np.int32),
        row_ptr=row_ptr,
        diag_slots=diag_slots,
    )


def build_sparsity_mixed(blocks, n_nodes: int):
    """Union node-pair sparsity over MixedMesh blocks + per-block slot
    tables.

    Returns (sp, slots_flat_cf_list): `sp` is the union NodePairSparsity
    (its per-element `slots` field is empty — with heterogeneous K there
    is no single (E, K, K) table; consumers that assemble use the
    returned per-block channel-first flat slot tables instead, and the
    solver stack only reads the CSR structure)."""
    keys_all, shapes = [], []
    for b in blocks:
        conn = np.asarray(b.connectivity, dtype=np.int64)
        E, K = conn.shape
        rows = np.repeat(conn, K, axis=1).reshape(-1)
        cols = np.tile(conn, (1, K)).reshape(-1)
        keys_all.append(rows * np.int64(n_nodes) + cols)
        shapes.append((E, K))
    uniq, inv = np.unique(np.concatenate(keys_all), return_inverse=True)
    nnz = uniq.shape[0]
    u_rows = (uniq // n_nodes).astype(np.int32)
    u_cols = (uniq % n_nodes).astype(np.int32)
    row_ptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(row_ptr, u_rows + 1, 1)
    row_ptr = np.cumsum(row_ptr)
    diag = np.nonzero(u_rows == u_cols)[0]
    diag_slots = np.full(n_nodes, -1, dtype=np.int32)
    diag_slots[u_rows[diag]] = diag.astype(np.int32)
    sp = NodePairSparsity(
        n_nodes=n_nodes, nnz=nnz, rows=u_rows, cols=u_cols,
        slots=np.zeros((0, 1, 1), dtype=np.int32), row_ptr=row_ptr,
        diag_slots=diag_slots,
    )
    slot_lists, off = [], 0
    for E, K in shapes:
        s = inv[off:off + E * K * K].reshape(E, K, K).astype(np.int32)
        off += E * K * K
        slot_lists.append(
            np.ascontiguousarray(np.transpose(s, (1, 2, 0))).reshape(-1))
    return sp, slot_lists


def ell_structure(sp: NodePairSparsity) -> Tuple[np.ndarray, np.ndarray]:
    """ELLPACK view of the block-CSR sparsity: per-row padded column/slot
    tables in channel-first layout (host precompute).

    TPU rationale: scatter ops inside `lax.while_loop` trigger a pathological
    XLA:TPU compile path (observed 350-470 s for a 3k-dof Krylov loop), and
    scatter-adds are also slower than dense math at runtime.  Padding each
    node-row to the maximum degree L turns the SpMV into gather + batched
    einsum — no scatter anywhere in the solver loop, compile drops to
    seconds, and the inner product maps onto the VPU/MXU.

    Returns (ell_cols [L, N] int32, ell_slot [L, N] int32); padding entries
    carry slot == nnz (callers append one zero block at index nnz).
    """
    N = sp.n_nodes
    deg = np.diff(sp.row_ptr)
    L = int(deg.max())
    ar = np.arange(sp.nnz, dtype=np.int64)
    pos = ar - sp.row_ptr[sp.rows]
    ell_cols = np.zeros((L, N), dtype=np.int32)
    ell_slot = np.full((L, N), sp.nnz, dtype=np.int32)
    ell_cols[pos, sp.rows] = sp.cols
    ell_slot[pos, sp.rows] = ar.astype(np.int32)
    return ell_cols, ell_slot


def gather_tables(sp: NodePairSparsity, connectivity: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Invert the scatter maps into padded gather tables (host precompute).

    TPU scatter-adds are quasi-serial — 25 scatters over 2.1M element
    contributions cost seconds per assembly at brain scale — so assembly
    gathers instead: every nonzero slot pulls its (<= C) contributing
    (i, j, e) entries from the flat element-matrix buffer, and every node
    pulls its (<= C2) element-corner contributions for the rhs.

    Returns
    -------
    slot_gather : (C, nnz) int32 indices into the flat (i, j, e)-ordered
                  element-matrix buffer; padding = K*K*E (callers append one
                  zero entry there)
    node_gather : (C2, n_nodes) int32 indices into the flat (k, e)-ordered
                  element-vector buffer; padding = K*E
    """
    conn = np.asarray(connectivity)
    E, K = conn.shape

    slot_gather = invert_scatter(sp.slots_flat_cf().astype(np.int64),
                                 sp.nnz)
    node_gather = invert_scatter(conn.T.reshape(-1).astype(np.int64),
                                 sp.n_nodes)
    return slot_gather, node_gather


def invert_scatter(targets: np.ndarray, n_bins: int) -> np.ndarray:
    """Invert a scatter map into a padded gather table (host precompute):
    row c of the result holds, for each bin, the index of its c-th
    contribution in the flat source buffer; padding = len(targets)
    (callers append one zero entry there).  Shared by gather_tables and
    the per-block solid assembly (systems/solid.py)."""
    targets = np.asarray(targets, dtype=np.int64)
    order = np.argsort(targets, kind="stable")
    sorted_t = targets[order]
    counts = np.bincount(sorted_t, minlength=n_bins)
    C = int(counts.max())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    table = np.full((C, n_bins), len(targets), dtype=np.int64)
    pos = np.arange(len(targets)) - starts[sorted_t]
    table[pos, sorted_t] = order
    return table.astype(np.int32)


def assemble_matrix_gather(Ke: jnp.ndarray, slot_gather: jnp.ndarray
                           ) -> jnp.ndarray:
    """Gather-based matrix assembly: values (V, W, nnz) from element
    matrices Ke (V, W, K, K, E), scatter-free."""
    V, W = Ke.shape[:2]
    flat = Ke.reshape(V, W, -1)
    flat = jnp.concatenate(
        [flat, jnp.zeros((V, W, 1), Ke.dtype)], axis=-1
    )  # pad entry
    C = slot_gather.shape[0]
    acc = flat[:, :, slot_gather[0]]
    for c in range(1, C):
        acc = acc + flat[:, :, slot_gather[c]]
    return acc


def assemble_vector_gather(Fe: jnp.ndarray, node_gather: jnp.ndarray
                           ) -> jnp.ndarray:
    """Gather-based rhs assembly: (V, n_nodes) from Fe (V, K, E)."""
    V = Fe.shape[0]
    flat = Fe.reshape(V, -1)
    flat = jnp.concatenate([flat, jnp.zeros((V, 1), Fe.dtype)], axis=-1)
    C = node_gather.shape[0]
    acc = flat[:, node_gather[0]]
    for c in range(1, C):
        acc = acc + flat[:, node_gather[c]]
    return acc


def assemble_matrix(Ke: jnp.ndarray, slots_flat_cf: jnp.ndarray,
                    nnz: int) -> jnp.ndarray:
    """Scatter-add element matrices into channel-first block values.

    Ke            : (V, W, K, K, E) element matrices from `element_matrices`
    slots_flat_cf : (K*K*E,) slot table from sp.slots_flat_cf()
    Returns values (V, W, nnz).
    """
    V, W = Ke.shape[:2]
    # one 1-D scatter-add per (v, w) block: a single scatter with (V, W)
    # window dims makes XLA lay both the updates and the target out with
    # the tiny dims minor (41x tile padding, 8+ GB at brain scale)
    rows = []
    for v in range(V):
        cols = []
        for w in range(W):
            cols.append(
                jnp.zeros((nnz,), Ke.dtype)
                .at[slots_flat_cf].add(Ke[v, w].reshape(-1))
            )
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # (V, W, nnz)


def assemble_vector(Fe: jnp.ndarray, conn_flat_cf: jnp.ndarray,
                    n_nodes: int) -> jnp.ndarray:
    """Scatter-add element vectors Fe (V, K, E) into nodal rhs (V, n_nodes).

    conn_flat_cf: (K*E,) = connectivity.T.reshape(-1)."""
    V = Fe.shape[0]
    # per-variable 1-D scatter-adds (see assemble_matrix on why)
    return jnp.stack([
        jnp.zeros((n_nodes,), Fe.dtype).at[conn_flat_cf].add(Fe[v].reshape(-1))
        for v in range(V)
    ])


def interpolate_at_qp(
    u: jnp.ndarray, conn_T: jnp.ndarray, phi: jnp.ndarray,
    dphi: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Interpolate nodal fields and their gradients to quadrature points.

    Vectorized form of the reference's per-qp accumulation loops
    (src/pihna.C:429-442).

    u (V, n_nodes); conn_T (K, E); phi (Q, K); dphi (Q, K, 3, E)
    -> (u_qp (V, Q, E), grad_qp (V, Q, 3, E)).

    Unrolled over the tiny q/k/d dims (see fem.geometry docstring on TPU
    tile padding of small-dim contractions).
    """
    ue = u[:, conn_T]  # (V, K, E)
    return interpolate_ue(ue, phi, dphi)


def interpolate_ue(
    ue: jnp.ndarray, phi: jnp.ndarray, dphi: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """interpolate_at_qp from already-gathered corner values ue (V, K, E)
    — the entry point of the Pallas fast-gather path, where the corner
    gather runs through the Beneš kernels (fem/pallas_perm.py)."""
    Q, K = phi.shape
    phi_host = phi if isinstance(phi, np.ndarray) else np.asarray(phi)
    uq = []
    gq = []
    for q in range(Q):
        acc = None
        for k in range(K):
            term = float(phi_host[q, k]) * ue[:, k, :]  # (V, E)
            acc = term if acc is None else acc + term
        uq.append(acc)
        dirs = []
        for d in range(3):
            acc = None
            for k in range(K):
                term = dphi[q, k, d] * ue[:, k, :]  # (E,) * (V, E)
                acc = term if acc is None else acc + term
            dirs.append(acc)
        gq.append(jnp.stack(dirs, axis=1))  # (V, 3, E)
    return jnp.stack(uq, axis=1), jnp.stack(gq, axis=1)


def interpolate_ue_affine(
    ue: jnp.ndarray, phi: jnp.ndarray, dphi: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """interpolate_ue for AFFINE elements (P1/TET4): the gradient is
    q-independent, so it is computed ONCE from dphi[0] instead of per
    quadrature point — (Q-1)*K*3 fewer multiplies per (V, E).

    Returns (x_qp (V, Q, E), gx (V, 3, E)); pair with
    fem.weakform.qp_apply_affine."""
    Q, K = phi.shape
    phi_host = phi if isinstance(phi, np.ndarray) else np.asarray(phi)
    uq = []
    for q in range(Q):
        acc = None
        for k in range(K):
            term = float(phi_host[q, k]) * ue[:, k, :]  # (V, E)
            acc = term if acc is None else acc + term
        uq.append(acc)
    dirs = []
    for d in range(3):
        acc = None
        for k in range(K):
            term = dphi[0, k, d] * ue[:, k, :]  # (E,) * (V, E)
            acc = term if acc is None else acc + term
        dirs.append(acc)
    return jnp.stack(uq, axis=1), jnp.stack(dirs, axis=1)
