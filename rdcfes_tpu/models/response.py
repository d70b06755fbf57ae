"""Parametric response functions (branchless jnp.where chains).

Vectorized equivalents of the scalar helpers in the reference
(src/utils.h:100-229): rectangular pulse `pi_`, step-decay `sd_`,
step-growth `sg_`, trapezoid `tr_`, Boltzmann sigmoid increase/decrease
`bsi_`/`bsd_`, each with its analytic derivative.  Semantics match the
reference exactly, including the quirks:

* a non-positive magnitude parameter cM disables the function entirely
* `bsi_`/`bsd_` do NOT scale by cM — cM only gates them on/off
  (src/utils.h:190-198, 210-219)
* derivatives of the piecewise-constant `pi_` are zero a.e. (callers in the
  reference never use a `deriv_Pi_`)

The where-chains mirror the reference's strict `<` comparisons so branch
boundaries land on identical sides.
"""

from __future__ import annotations

import jax.numpy as jnp


def pi_(C, p):
    """Rectangular function: cM on [c0, c1), else 0."""
    cM, c0, c1 = p[0], p[1], p[2]
    val = jnp.where(C < c0, 0.0, jnp.where(C < c1, cM, 0.0))
    return jnp.where(cM <= 0.0, 0.0, val)


def sd_(C, p):
    """Step-decay: cM below c0, linear ramp down to 0 at c1."""
    cM, c0, c1 = p[0], p[1], p[2]
    val = jnp.where(C < c0, cM, jnp.where(C < c1, cM * (c1 - C) / (c1 - c0), 0.0))
    return jnp.where(cM <= 0.0, 0.0, val)


def deriv_sd_(C, p):
    cM, c0, c1 = p[0], p[1], p[2]
    val = jnp.where(C < c0, 0.0, jnp.where(C < c1, -cM / (c1 - c0), 0.0))
    return jnp.where(cM <= 0.0, 0.0, val)


def sg_(C, p):
    """Step-growth: cM below c0, linear ramp cM*(C-c0)/(c1-c0) to c1, then 0."""
    cM, c0, c1 = p[0], p[1], p[2]
    val = jnp.where(C < c0, cM, jnp.where(C < c1, cM * (C - c0) / (c1 - c0), 0.0))
    return jnp.where(cM <= 0.0, 0.0, val)


def deriv_sg_(C, p):
    cM, c0, c1 = p[0], p[1], p[2]
    val = jnp.where(C < c0, 0.0, jnp.where(C < c1, cM / (c1 - c0), 0.0))
    return jnp.where(cM <= 0.0, 0.0, val)


def tr_(C, p):
    """Trapezoid: ramp up on [c0,c1), plateau cM on [c1,c2), ramp down on [c2,c3)."""
    cM, c0, c1, c2, c3 = p[0], p[1], p[2], p[3], p[4]
    val = jnp.where(
        C < c0, 0.0,
        jnp.where(
            C < c1, cM * (C - c0) / (c1 - c0),
            jnp.where(C < c2, cM, jnp.where(C < c3, cM * (c3 - C) / (c3 - c2), 0.0)),
        ),
    )
    return jnp.where(cM <= 0.0, 0.0, val)


def deriv_tr_(C, p):
    cM, c0, c1, c2, c3 = p[0], p[1], p[2], p[3], p[4]
    val = jnp.where(
        C < c0, 0.0,
        jnp.where(
            C < c1, cM / (c1 - c0),
            jnp.where(C < c2, 0.0, jnp.where(C < c3, -cM / (c3 - c2), 0.0)),
        ),
    )
    return jnp.where(cM <= 0.0, 0.0, val)


def _boltzmann(C, C0, dC):
    return jnp.exp((C - C0) / dC)


def bsi_(C, p):
    """Boltzmann sigmoid increase G/(1+G); gated (not scaled) by cM > 0."""
    cM, C0, dC = p[0], p[1], p[2]
    G = _boltzmann(C, C0, dC)
    return jnp.where(cM <= 0.0, 0.0, G / (1.0 + G))


def deriv_bsi_(C, p):
    cM, C0, dC = p[0], p[1], p[2]
    G = _boltzmann(C, C0, dC)
    return jnp.where(cM <= 0.0, 0.0, G / (dC * (1.0 + G) ** 2))


def bsd_(C, p):
    """Boltzmann sigmoid decrease 1/(1+G); gated (not scaled) by cM > 0."""
    cM, C0, dC = p[0], p[1], p[2]
    G = _boltzmann(C, C0, dC)
    return jnp.where(cM <= 0.0, 0.0, 1.0 / (1.0 + G))


def deriv_bsd_(C, p):
    cM, C0, dC = p[0], p[1], p[2]
    G = _boltzmann(C, C0, dC)
    return jnp.where(cM <= 0.0, 0.0, -G / (dC * (1.0 + G) ** 2))


def heaviside(x):
    """1 for x > 0 else 0 (src/utils.h:84)."""
    return jnp.where(x > 0.0, 1.0, 0.0)
