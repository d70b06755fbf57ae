"""Inverse-distance interpolation.

Vectorized equivalent of the reference's InverseDistanceAlgorithm
(src/ida.h:5-48 — defined there but unused by any driver; provided here for
surface parity): weights w_i = |x - x_i|^(-coeff), normalized, applied to
nodal data.  Batched over query points.
"""

from __future__ import annotations

import jax.numpy as jnp


def inverse_distance_interpolate(xyz, nodes, data, coeff: float = 2.0):
    """xyz (..., 3) query points; nodes (M, 3); data (M,) -> (...,) values."""
    d = jnp.linalg.norm(xyz[..., None, :] - nodes, axis=-1)  # (..., M)
    w = jnp.where(d == 0.0, jnp.inf, d ** (-coeff))
    # exact hit: return that node's value
    hit = jnp.any(d == 0.0, axis=-1)
    hit_val = jnp.take(data, jnp.argmin(d, axis=-1))
    w_sum = jnp.sum(jnp.where(jnp.isinf(w), 0.0, w), axis=-1)
    interp = jnp.sum(jnp.where(jnp.isinf(w), 0.0, w) * data, axis=-1) / w_sum
    return jnp.where(hit, hit_val, interp)
