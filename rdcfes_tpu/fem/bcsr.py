"""Block-sparse operators in channel-first layout: CSR and ELLPACK matvecs.

The distributed PETSc SpMV inside `model.solve()` (reference src/pihna.C:80)
becomes an on-device gather -> batched block product.  Two layouts:

* CSR (V, W, nnz): general-purpose; matvec scatter-adds per-slot products —
  fine OUTSIDE solver loops.
* ELLPACK (V, W, L, N): the production layout for Krylov loops — the SpMV
  is gather + einsum with NO scatter (scatter inside `lax.while_loop`
  triggers a pathological XLA:TPU compile path; see
  fem.assembly.ell_structure) and the reduction vectorizes over the node
  lane axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bcsr_matvec(values: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
                x: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
    """y = A @ x with A in channel-first block CSR.

    values (V, W, nnz); rows/cols (nnz,); x (W, n_nodes) -> y (V, n_nodes).
    """
    xg = x[:, cols]  # (W, nnz)
    prod = jnp.einsum("vws,ws->vs", values, xg)
    V = values.shape[0]
    return jnp.zeros((V, n_nodes), x.dtype).at[:, rows].add(prod)


def extract_diagonal_blocks(values: jnp.ndarray,
                            diag_slots: jnp.ndarray) -> jnp.ndarray:
    """Gather the (V, V, n_nodes) diagonal blocks for block-Jacobi."""
    return values[:, :, diag_slots]


def to_ell(values: jnp.ndarray, ell_slot: jnp.ndarray) -> jnp.ndarray:
    """Re-layout block values (V, W, nnz) into ELLPACK (V, W, L, N);
    padding slots (== nnz) map to an appended zero block."""
    V, W, nnz = values.shape
    padded = jnp.concatenate(
        [values, jnp.zeros((V, W, 1), values.dtype)], axis=-1
    )
    return padded[:, :, ell_slot]  # ell_slot (L, N) -> (V, W, L, N)


def ell_matvec(values_ell: jnp.ndarray, ell_cols: jnp.ndarray,
               x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x with A in ELLPACK block layout — gather, elementwise
    product and an axis reduction; scatter-free and dot-free (a dot over
    the tiny w/l dims would force tile-padded operand layouts).

    values_ell (V, W, L, N); ell_cols (L, N); x (W, N) -> y (V, N)."""
    xg = x[:, ell_cols]  # (W, L, N)
    return jnp.sum(values_ell * xg[None], axis=(1, 2))


def ell_matvec_fast(dfwd, fp, values_ell: jnp.ndarray, x: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """ELL matvec with the x-gather routed through the Beneš permutation
    kernels (fem/pallas_perm): the ELL column table IS a FEM
    'connectivity' of L corner slots per node-row, so
    xg[w, l, n] = x[w, cols[l, n]] is the forward corner gather of the
    plan built from `ell_cols.T` (fem/fastpath.build_fast_plans, with
    pad slots remapped to the row's own node so every node's incidence
    count is exactly L).  The block product / reduction stays in XLA —
    the values stream from HBM either way; only the gather was the
    measured bottleneck (~0.2 G indices/s in XLA, scripts/
    microbench_inloop.py).  f64 rides as hi/lo f32 planes.

    dfwd: DevicePlan of the forward plan; fp: FastGatherPlans meta;
    values_ell (V, W, L, N); x (W, N) -> y (V, N)."""
    from .pallas_perm import gather_corners, gather_corners_f64

    W = x.shape[0]
    gc = gather_corners_f64 if x.dtype == jnp.float64 else gather_corners
    xp = jnp.pad(x, ((0, 0), (0, fp.NR * 128 - fp.N)))
    xg = gc(dfwd, xp.reshape(W, fp.NR, 128), fp.C_x, interpret=interpret,
            channels=2 * W)
    xg = xg.reshape(W, fp.K, fp.E_pad)[:, :, :fp.E]  # (W, L, N)
    return jnp.sum(values_ell * xg[None], axis=(1, 2))
