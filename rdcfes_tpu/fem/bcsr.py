"""Block-CSR sparse operator: matvec and diagonal extraction.

The distributed PETSc SpMV inside `model.solve()` (reference src/pihna.C:80)
becomes an on-device gather -> batched small-matmul -> segment_sum.  On a
device mesh the nonzero blocks are sharded along the nnz axis and each shard's
partial row sums are combined with a `psum` (see rdcfes_tpu.parallel) — the
ICI-native replacement for PETSc's VecScatter halo exchange.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bcsr_matvec(values: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
                x: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
    """y = A @ x with A in node-block CSR.

    values : (nnz, V, W) nodal blocks
    rows   : (nnz,) block row ids
    cols   : (nnz,) block col ids
    x      : (n_nodes, W)
    Returns y (n_nodes, V).
    """
    xg = x[cols]  # (nnz, W)
    prod = jnp.einsum("svw,sw->sv", values, xg)
    return jax.ops.segment_sum(prod, rows, num_segments=n_nodes)


def extract_diagonal_blocks(values: jnp.ndarray,
                            diag_slots: jnp.ndarray) -> jnp.ndarray:
    """Gather the (n_nodes, V, V) diagonal blocks for block-Jacobi."""
    return values[diag_slots]


def to_ell(values: jnp.ndarray, ell_slot: jnp.ndarray) -> jnp.ndarray:
    """Re-layout block-CSR values (nnz, V, W) into ELLPACK (N, L, V, W);
    padding slots (== nnz) map to an appended zero block."""
    V, W = values.shape[-2:]
    padded = jnp.concatenate(
        [values, jnp.zeros((1, V, W), values.dtype)], axis=0
    )
    return padded[ell_slot]


def ell_matvec(values_ell: jnp.ndarray, ell_cols: jnp.ndarray,
               x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x with A in ELLPACK block layout — gather + batched einsum,
    scatter-free (see fem.assembly.ell_structure for why this matters on
    TPU)."""
    xg = x[ell_cols]  # (N, L, W)
    return jnp.einsum("nlvw,nlw->nv", values_ell, xg)
