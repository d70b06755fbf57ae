"""Gather-compute-scatter assembly into a node-block CSR operator.

TPU-native replacement for the reference's PETSc matrix assembly
(`system.get_system_matrix().add_matrix(Ke, dof_indices)`, src/pihna.C:754):

* The sparsity pattern over node pairs is fixed by the mesh connectivity, so
  it is computed ONCE on the host (`build_sparsity`) together with a slot
  table mapping every (element, i, j) entry to its nonzero index.  Per time
  step, assembly is then a pure static-shaped `segment_sum` — no atomics,
  no dynamic sparsity, nothing the XLA scheduler can't pipeline.
* The matrix is stored as block-CSR with V x V nodal blocks (V = number of
  coupled variables), the natural unit for both the 25-block PIHNA Jacobian
  (src/pihna.C:571-747) and block-Jacobi preconditioning.
"""

from __future__ import annotations

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
    # uniq is sorted by (row, col) already -> CSR row_ptr by counting
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


def ell_structure(sp: NodePairSparsity) -> Tuple[np.ndarray, np.ndarray]:
    """ELLPACK view of the block-CSR sparsity: per-row padded column/slot
    tables (host precompute).

    TPU rationale: scatter ops inside `lax.while_loop` trigger a pathological
    XLA:TPU compile path (observed 350-470 s for a 3k-dof Krylov loop), and
    scatter-adds are also slower than dense math at runtime.  Padding each
    node-row to the maximum degree L turns the SpMV into gather + batched
    einsum — no scatter anywhere in the solver loop, compile drops to
    seconds, and the inner product maps onto the VPU/MXU.

    Returns (ell_cols [N, L] int32, ell_slot [N, L] int32); padding entries
    carry slot == nnz (callers append one zero block at index nnz).
    """
    N = sp.n_nodes
    deg = np.diff(sp.row_ptr)
    L = int(deg.max())
    ar = np.arange(sp.nnz, dtype=np.int64)
    pos = ar - sp.row_ptr[sp.rows]
    ell_cols = np.zeros((N, L), dtype=np.int32)
    ell_slot = np.full((N, L), sp.nnz, dtype=np.int32)
    ell_cols[sp.rows, pos] = sp.cols
    ell_slot[sp.rows, pos] = ar.astype(np.int32)
    return ell_cols, ell_slot


def assemble_matrix(Ke: jnp.ndarray, slots: jnp.ndarray, nnz: int) -> jnp.ndarray:
    """Scatter-add element matrices into block-CSR values.

    Ke    : (V, W, E, K, K) element matrices from `element_matrices`
    slots : (E, K, K) slot table from `build_sparsity`
    Returns values (nnz, V, W).
    """
    V, W, E, K, _ = Ke.shape
    contrib = jnp.transpose(Ke, (2, 3, 4, 0, 1)).reshape(E * K * K, V, W)
    return jax.ops.segment_sum(contrib, slots.reshape(-1), num_segments=nnz)


def assemble_vector(Fe: jnp.ndarray, connectivity: jnp.ndarray,
                    n_nodes: int) -> jnp.ndarray:
    """Scatter-add element vectors Fe (V, E, K) into nodal rhs (n_nodes, V)."""
    V, E, K = Fe.shape
    contrib = jnp.transpose(Fe, (1, 2, 0)).reshape(E * K, V)
    return jax.ops.segment_sum(
        contrib, connectivity.reshape(-1), num_segments=n_nodes
    )


def interpolate_at_qp(
    u: jnp.ndarray, connectivity: jnp.ndarray, phi: jnp.ndarray,
    dphi: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Interpolate nodal fields and their gradients to quadrature points.

    Vectorized form of the reference's per-qp accumulation loops
    (src/pihna.C:429-442): u (n_nodes, V) -> (u_qp [V,E,Q], grad_qp [V,E,Q,3]).
    """
    ue = u[connectivity]  # (E, K, V)
    u_qp = jnp.einsum("qk,ekv->veq", phi, ue)
    grad_qp = jnp.einsum("eqkd,ekv->veqd", dphi, ue)
    return u_qp, grad_qp
