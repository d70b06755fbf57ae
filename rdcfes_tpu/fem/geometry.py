"""Batched isoparametric geometry factors (channel-first layouts).

Replaces the per-element `fe->reinit(elem)` call of the reference
(src/pihna.C:420, src/solid_system.C:133-143): for every element at once we
compute the Jacobian of the reference->physical map, `JxW`, and the physical
shape-function gradients `dphi`.

LAYOUT RULE (TPU): the element axis E is always LAST.  TPU memory is tiled
(sublane, lane) over the two minor dimensions; arrays whose minor dims are
the small physics dims (K=4..8 nodes, Q=5..8 qps, 3 directions) pad 25-35x
and blow out HBM at production scale, while (small..., E) layouts pad ~1x
and vectorize over lanes.  Everything downstream (weak-form kernels,
assembly, solvers) follows the same rule.

Shapes: phi (Q, K) constant; JxW (Q, E); dphi (Q, K, 3, E).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from . import elements


def _inv3x3(J: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched closed-form 3x3 inverse and determinant.

    Mirrors the adjugate formula of the reference's `inverse()` helper
    (src/utils.h:332-347) but batched over leading axes: J[..., 3, 3].
    """
    a = J[..., 0, 0]; b = J[..., 0, 1]; c = J[..., 0, 2]
    d = J[..., 1, 0]; e = J[..., 1, 1]; f = J[..., 1, 2]
    g = J[..., 2, 0]; h = J[..., 2, 1]; i = J[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    inv = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1),
            jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1),
        ],
        axis=-2,
    ) * inv_det[..., None, None]
    return inv, det


def _inv3x3_cf(J: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Channel-first 3x3 inverse: J (..., 3, 3, E) -> (inv, det (..., E))."""
    a = J[..., 0, 0, :]; b = J[..., 0, 1, :]; c = J[..., 0, 2, :]
    d = J[..., 1, 0, :]; e = J[..., 1, 1, :]; f = J[..., 1, 2, :]
    g = J[..., 2, 0, :]; h = J[..., 2, 1, :]; i = J[..., 2, 2, :]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    r = 1.0 / det
    row0 = jnp.stack([A * r, -(b * i - c * h) * r, (b * f - c * e) * r], axis=-2)
    row1 = jnp.stack([B * r, (a * i - c * g) * r, -(a * f - c * d) * r], axis=-2)
    row2 = jnp.stack([C * r, -(a * h - b * g) * r, (a * e - b * d) * r], axis=-2)
    return jnp.stack([row0, row1, row2], axis=-3), det


def geometry_factors(
    coords: jnp.ndarray, connectivity: jnp.ndarray, elem_type: str
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-element quadrature geometry, channel-first.

    Parameters
    ----------
    coords       : (N, 3) node coordinates (device array; may be traced)
    connectivity : (E, K) element-to-node map
    elem_type    : "TET4" | "HEX8"

    Returns
    -------
    phi  : (Q, K)        shape functions at quadrature points (constant)
    JxW  : (Q, E)        det(J) * w_q
    dphi : (Q, K, 3, E)  physical gradients of the shape functions
    """
    phi_np, dN_np, w_np = elements.tabulate(elem_type)
    # phi is a compile-time constant table: keep it NumPy so downstream
    # kernels can unroll with python scalars even under jit tracing
    phi = phi_np
    w = jnp.asarray(w_np)

    if dN_np.shape[-1] == 2:
        # 2D volume elements (TRI3/QUAD4): the in-plane 2x2 Jacobian with
        # physical gradients embedded as 3-vectors whose z-component is
        # zero — every downstream kernel (weak forms, qp-apply, fast
        # path) keeps its 3D static shapes and the z-terms fold away as
        # multiplications by a constant zero
        return _geometry_factors_2d(coords, connectivity, phi_np, dN_np, w)

    conn_T = connectivity.T  # (K, E)
    X = coords.T[:, conn_T]  # (3, K, E)
    Q, K = phi_np.shape
    # J[q, d, r, e] = sum_k X[d, k, e] dN[q, k, r] — unrolled over the tiny
    # k/r dims as scalar multiply-adds of (3, E) slices so XLA never assigns
    # a small dim to the tiled lane axis (see module docstring)
    dN_host = dN_np  # python scalars for the unroll
    J_rows = []
    for q in range(Q):
        rows = []
        for r in range(3):
            acc = None
            for k in range(K):
                c = float(dN_host[q, k, r])
                if c == 0.0:
                    continue
                term = c * X[:, k, :]  # (3, E)
                acc = term if acc is None else acc + term
            rows.append(acc if acc is not None else jnp.zeros_like(X[:, 0, :]))
        J_rows.append(jnp.stack(rows, axis=1))  # (3, r, E)
    J = jnp.stack(J_rows, axis=0)  # (Q, 3, 3, E): [q, d, r, e]
    Jinv, detJ = _inv3x3_cf(J)  # Jinv (Q, 3, 3, E): [q, r, d, e]
    JxW = detJ * w[:, None]
    # dphi[q, k, d, e] = sum_r dN[q, k, r] Jinv[q, r, d, e] — same unroll
    dphi_q = []
    for q in range(Q):
        ks = []
        for k in range(K):
            acc = None
            for r in range(3):
                c = float(dN_host[q, k, r])
                if c == 0.0:
                    continue
                term = c * Jinv[q, r]  # (3, E)
                acc = term if acc is None else acc + term
            ks.append(acc if acc is not None else jnp.zeros_like(Jinv[q, 0]))
        dphi_q.append(jnp.stack(ks, axis=0))  # (K, 3, E)
    dphi = jnp.stack(dphi_q, axis=0)  # (Q, K, 3, E)
    return phi, JxW, dphi


def _geometry_factors_2d(coords, connectivity, phi_np, dN_np, w):
    """2D companion of geometry_factors (same unrolled elementwise style).

    coords may be (N, 2) or (N, 3) with a constant z (ignored); returns
    phi (Q, K), JxW (Q, E), dphi (Q, K, 3, E) with dphi[..., 2, :] == 0.
    """
    conn_T = connectivity.T                     # (K, E)
    X = coords.T[:2][:, conn_T]                 # (2, K, E)
    Q, K = phi_np.shape
    J_rows = []
    for q in range(Q):
        rows = []
        for r in range(2):
            acc = None
            for k in range(K):
                c = float(dN_np[q, k, r])
                if c == 0.0:
                    continue
                term = c * X[:, k, :]           # (2, E)
                acc = term if acc is None else acc + term
            rows.append(acc if acc is not None
                        else jnp.zeros_like(X[:, 0, :]))
        J_rows.append(jnp.stack(rows, axis=1))  # (2, r, E)
    J = jnp.stack(J_rows, axis=0)               # (Q, 2, 2, E): [q, d, r, e]
    a = J[:, 0, 0]; b = J[:, 0, 1]
    c_ = J[:, 1, 0]; d = J[:, 1, 1]
    det = a * d - b * c_
    r_ = 1.0 / det
    # Jinv[q, r, d, e] rows
    Jinv = jnp.stack([jnp.stack([d * r_, -b * r_], axis=-2),
                      jnp.stack([-c_ * r_, a * r_], axis=-2)], axis=-3)
    JxW = det * w[:, None]
    zero = jnp.zeros_like(det[0])  # (E,)
    dphi_q = []
    for q in range(Q):
        ks = []
        for k in range(K):
            acc = None
            for r in range(2):
                cc = float(dN_np[q, k, r])
                if cc == 0.0:
                    continue
                term = cc * Jinv[q, r]          # (2, E)
                acc = term if acc is None else acc + term
            if acc is None:
                acc = jnp.zeros_like(Jinv[q, 0])
            ks.append(jnp.concatenate([acc, zero[None]], axis=0))  # (3, E)
        dphi_q.append(jnp.stack(ks, axis=0))    # (K, 3, E)
    dphi = jnp.stack(dphi_q, axis=0)            # (Q, K, 3, E)
    return phi_np, JxW, dphi


def face_geometry_factors(
    coords: jnp.ndarray, faces: jnp.ndarray, face_type: str
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-boundary-face quadrature geometry (element-batch-leading layout;
    boundary sets are small, so tile padding is immaterial here).

    Replaces `fe_face->reinit(elem, side)` (reference src/adpm.C:604,
    src/solid_system.C:310-315).

    Returns (psi [Q,Kf], JxW [F,Q], xyz [F,Q,3], normals [F,Q,3]).
    """
    psi_np, dN_np, w_np = elements.tabulate(face_type)
    psi = jnp.asarray(psi_np)
    dN = jnp.asarray(dN_np)  # (Q, Kf, 2)
    w = jnp.asarray(w_np)

    if face_type == "EDGE2":
        # boundary edges of a 2D volume mesh: tangent from the 1D map,
        # outward normal = the in-plane right rotation of the tangent
        # (edges come from ELEMENT_FACES in CCW element order, so the
        # boundary is traversed CCW and "right of travel" points out)
        X2 = coords[faces][..., :2]                      # (F, Kf, 2)
        T = jnp.einsum("fkd,qkr->fqdr", X2, dN)[..., 0]  # (F, Q, 2)
        length_J = jnp.linalg.norm(T, axis=-1)
        t_hat = T / length_J[..., None]
        n2 = jnp.stack([t_hat[..., 1], -t_hat[..., 0]], axis=-1)
        pad = jnp.zeros_like(length_J)[..., None]
        normals = jnp.concatenate([n2, pad], axis=-1)    # (F, Q, 3)
        JxW = length_J * w[None, :]
        xyz2 = jnp.einsum("qk,fkd->fqd", psi, X2)
        xyz = jnp.concatenate([xyz2, pad], axis=-1)
        return psi, JxW, xyz, normals

    X = coords[faces]  # (F, Kf, 3)
    T = jnp.einsum("fkd,qkr->fqdr", X, dN)  # (F, Q, 3, 2) tangents
    t0 = T[..., 0]
    t1 = T[..., 1]
    n = jnp.cross(t0, t1)  # (F, Q, 3), length = surface Jacobian
    area_J = jnp.linalg.norm(n, axis=-1)
    normals = n / area_J[..., None]
    JxW = area_J * w[None, :]
    xyz = jnp.einsum("qk,fkd->fqd", psi, X)
    return psi, JxW, xyz, normals
