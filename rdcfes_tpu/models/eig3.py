"""Batched symmetric 3x3 eigendecomposition.

Replacement for the reference's JAMA tred2/tql2 port (src/eig3.C:25-271, used
by the solid post-processor src/solid_system.C:509-520).  Instead of the
iterative Householder+QL algorithm (sequential, scalar), we use the
closed-form trigonometric method for the eigenvalues — branch-free, batched,
TPU-friendly — and a cross-product construction for the eigenvectors.

Eigenvalues are returned in ascending order, matching the reference's sort
(src/eig3.C:186-198).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def eigvalsh3(A: jnp.ndarray) -> jnp.ndarray:
    """Ascending eigenvalues of symmetric (..., 3, 3) via the trigonometric
    closed form (Smith's method)."""
    a00 = A[..., 0, 0]; a11 = A[..., 1, 1]; a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]; a12 = A[..., 1, 2]; a02 = A[..., 0, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00**2 + b11**2 + b22**2 + 2.0 * (a01**2 + a12**2 + a02**2)
    p = jnp.sqrt(p2 / 6.0)
    p_safe = jnp.where(p == 0.0, 1.0, p)
    # det(B/p) / 2
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detB / (2.0 * p_safe**3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    lam = jnp.stack([e_lo, e_mid, e_hi], axis=-1)
    return jnp.where(p[..., None] == 0.0, jnp.stack([a00, a11, a22], axis=-1), lam)


def eigh3(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(eigenvalues ascending (..., 3), eigenvectors as COLUMNS (..., 3, 3)).

    Eigenvectors via the most robust cross product of rows of (A - lam I);
    degenerate (repeated-eigenvalue) cases fall back to an orthogonal
    complement construction.
    """
    lam = eigvalsh3(A)

    def one_vector(lami):
        B = A - lami[..., None, None] * jnp.broadcast_to(jnp.eye(3), A.shape)
        r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01**2, axis=-1)
        n02 = jnp.sum(c02**2, axis=-1)
        n12 = jnp.sum(c12**2, axis=-1)
        best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
        stacked = jnp.stack([c01, c02, c12], axis=-2)
        v = jnp.take_along_axis(stacked, best[..., None, None], axis=-2)[..., 0, :]
        nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.where(nv == 0.0, 1.0, nv), nv[..., 0]

    v0, n0 = one_vector(lam[..., 0])
    v2, n2 = one_vector(lam[..., 2])
    # handle fully degenerate / axis-aligned cases
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), v0.shape)
    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), v2.shape)
    v0 = jnp.where((n0 == 0.0)[..., None], ex, v0)
    v2 = jnp.where((n2 == 0.0)[..., None], ez, v2)
    # ensure v2 is orthogonal to v0 (repeated eigenvalues)
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    nv2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    fallback = jnp.cross(v0, ex + 0.5)  # arbitrary non-parallel helper
    nf = jnp.linalg.norm(fallback, axis=-1, keepdims=True)
    v2 = jnp.where(nv2 < 1e-12, fallback / jnp.where(nf == 0.0, 1.0, nf), v2 / jnp.where(nv2 == 0.0, 1.0, nv2))
    v1 = jnp.cross(v2, v0)
    vecs = jnp.stack([v0, v1, v2], axis=-1)  # columns
    return lam, vecs


def principal_stress_invariants(sigma: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(hydrostatic pressure, Von Mises stress) from a symmetric stress.

    Matches the reference's post-processing (src/solid_system.C:516-520):
    p = (l0+l1+l2)/3,  VM = sqrt(l0^2+l1^2+l2^2 - l0 l1 - l0 l2 - l1 l2) —
    evaluated here through the tensor invariants (I1^2 - 3 I2 under the hood),
    which is algebraically identical to the eigenvalue formula but avoids the
    precision loss of closed-form eigenvalues near degeneracy.
    """
    I1 = sigma[..., 0, 0] + sigma[..., 1, 1] + sigma[..., 2, 2]
    p = I1 / 3.0
    # VM^2 = I1^2 - 3 I2 = (3/2) dev(sigma):dev(sigma)
    s2 = jnp.einsum("...ij,...ij->...", sigma, sigma)
    vm = jnp.sqrt(jnp.maximum(1.5 * s2 - 0.5 * I1**2, 0.0))
    return p, vm
