"""Small scalar helpers (surface parity with src/utils.h:69-98, 231-244).

The pow2..pow9 family, bounds clamps, sign, and the random-sampling helpers
the reference defines (uniform_rand/normal_rand are defined but unused by
any reference driver, src/utils.h:231-244 — provided here for completeness,
keyed explicitly, since JAX has no hidden global RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pow2(v): return v * v
def pow3(v): return v * pow2(v)
def pow4(v): return pow2(pow2(v))
def pow5(v): return v * pow4(v)
def pow6(v): return pow2(pow3(v))
def pow7(v): return v * pow6(v)
def pow8(v): return pow2(pow4(v))
def pow9(v): return pow3(pow3(v))


def degrees_to_radians(d):
    return d * (jnp.pi / 180.0)


def radians_to_degrees(r):
    return r * (180.0 / jnp.pi)


def apply_lbound(L, X):
    return jnp.maximum(L, X)


def apply_ubound(X, U):
    return jnp.minimum(X, U)


def apply_bounds(L, X, U):
    return jnp.clip(X, L, U)


def sign(r, tol=0.0):
    """+1 / -1 / 0 with a dead zone (src/utils.h:92-98)."""
    return jnp.where(r > tol, 1, jnp.where(r < -tol, -1, 0))


def uniform_rand(key, from_, to, shape=()):
    return jax.random.uniform(key, shape, minval=from_, maxval=to)


def normal_rand(key, mean, stdev, shape=()):
    return mean + stdev * jax.random.normal(key, shape)
