"""Batched isoparametric geometry factors.

Replaces the per-element `fe->reinit(elem)` call of the reference
(src/pihna.C:420, src/solid_system.C:133-143): for every element at once we
compute the Jacobian of the reference->physical map, `JxW`, and the physical
shape-function gradients `dphi`.  The whole computation is a handful of
batched einsums / 3x3 inversions, so it jits into dense MXU/VPU work — and
because coordinates are an *input*, moving-mesh physics (solid/coupled paths,
reference src/solid_system.C:103-123) just re-invokes it with the current
node positions inside the Newton loop.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from . import elements


def _inv3x3(J: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched closed-form 3x3 inverse and determinant.

    Mirrors the adjugate formula of the reference's `inverse()` helper
    (src/utils.h:332-347) but batched over leading axes.
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


def geometry_factors(
    coords: jnp.ndarray, connectivity: jnp.ndarray, elem_type: str
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-element quadrature geometry.

    Parameters
    ----------
    coords       : (N, 3) node coordinates (device array; may be traced)
    connectivity : (E, K) element-to-node map
    elem_type    : "TET4" | "HEX8"

    Returns
    -------
    phi  : (Q, K)      shape functions at quadrature points (constant table)
    JxW  : (E, Q)      det(J) * w_q
    dphi : (E, Q, K, 3) physical gradients of the shape functions
    """
    phi_np, dN_np, w_np = elements.tabulate(elem_type)
    phi = jnp.asarray(phi_np)
    dN = jnp.asarray(dN_np)  # (Q, K, 3) reference gradients
    w = jnp.asarray(w_np)

    X = coords[connectivity]  # (E, K, 3)
    # J[e,q,d,r] = d x_d / d xi_r = sum_k X[e,k,d] dN[q,k,r]
    J = jnp.einsum("ekd,qkr->eqdr", X, dN)
    Jinv, detJ = _inv3x3(J)  # Jinv[e,q,r,d] = d xi_r / d x_d
    JxW = detJ * w[None, :]
    # dphi[e,q,k,d] = sum_r dN[q,k,r] Jinv[e,q,r,d]
    dphi = jnp.einsum("qkr,eqrd->eqkd", dN, Jinv)
    return phi, JxW, dphi


def face_geometry_factors(
    coords: jnp.ndarray, faces: jnp.ndarray, face_type: str
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-boundary-face quadrature geometry.

    Replaces `fe_face->reinit(elem, side)` (reference src/adpm.C:604,
    src/solid_system.C:310-315): for each face we compute the surface
    JxW, shape functions, physical quadrature-point positions, and unit
    outward normals (faces are stored with outward orientation by
    `extract_boundary_faces`).

    Returns (psi [Q,Kf], JxW [F,Q], xyz [F,Q,3], normals [F,Q,3]).
    """
    psi_np, dN_np, w_np = elements.tabulate(face_type)
    psi = jnp.asarray(psi_np)
    dN = jnp.asarray(dN_np)  # (Q, Kf, 2)
    w = jnp.asarray(w_np)

    X = coords[faces]  # (F, Kf, 3)
    # tangents t_r[f,q,d] = sum_k X[f,k,d] dN[q,k,r]
    T = jnp.einsum("fkd,qkr->fqdr", X, dN)  # (F, Q, 3, 2)
    t0 = T[..., 0]
    t1 = T[..., 1]
    n = jnp.cross(t0, t1)  # (F, Q, 3), length = surface Jacobian
    area_J = jnp.linalg.norm(n, axis=-1)
    normals = n / area_J[..., None]
    JxW = area_J * w[None, :]
    xyz = jnp.einsum("qk,fkd->fqd", psi, X)
    return psi, JxW, xyz, normals
