"""P1 Lagrange reference elements and Gauss quadrature tables.

TPU-native replacement for the libMesh FE surface the reference consumes:
`FEBase::build` + `QGauss(dim, fe_type.default_quadrature_order())` +
`fe->reinit(elem)` producing `phi`, `dphi`, `JxW` (reference src/pihna.C:335-356).

All transient variables in the reference are FIRST/LAGRANGE on TET4 or HEX8
meshes (src/pihna.C:30-34, src/adpm.C:26-29, run decks), for which
`default_quadrature_order()` = THIRD.  The degree-3 Gauss rules below match
libMesh's `QGauss` choices for that order:

* TET4 : 5-point rule with a negative centroid weight
         (centroid w=-2/15, four points (1/6,1/6,1/6)-type w=3/40;
         reference volume 1/6)
* HEX8 : 2x2x2 tensor Gauss (+-1/sqrt(3), unit weights)
* TRI3 face : 4-point degree-3 rule (centroid w=-27/96, three points
         (1/5,1/5)-type w=25/96; reference area 1/2)
* QUAD4 face: 2x2 tensor Gauss

Everything returns NumPy float64 tables; they are closed constants baked into
jitted programs — no per-element host work.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

_SQ3 = 1.0 / np.sqrt(3.0)


# ----------------------------------------------------------------------
# quadrature rules (degree-3 / "THIRD", the reference default)
# ----------------------------------------------------------------------
@lru_cache(maxsize=None)
def quadrature(elem_type: str) -> Tuple[np.ndarray, np.ndarray]:
    """Return (points [Q, d], weights [Q]) on the reference element."""
    if elem_type == "TET4":
        a, b = 1.0 / 6.0, 0.5
        pts = np.array(
            [
                [0.25, 0.25, 0.25],
                [a, a, a],
                [a, a, b],
                [a, b, a],
                [b, a, a],
            ]
        )
        wts = np.array([-2.0 / 15.0, 3.0 / 40.0, 3.0 / 40.0, 3.0 / 40.0, 3.0 / 40.0])
        return pts, wts
    if elem_type == "HEX8":
        g = [-_SQ3, _SQ3]
        pts = np.array([[x, y, z] for z in g for y in g for x in g])
        wts = np.ones(8)
        return pts, wts
    if elem_type == "TRI3":
        pts = np.array(
            [
                [1.0 / 3.0, 1.0 / 3.0],
                [0.2, 0.2],
                [0.6, 0.2],
                [0.2, 0.6],
            ]
        )
        wts = np.array([-27.0 / 96.0, 25.0 / 96.0, 25.0 / 96.0, 25.0 / 96.0])
        return pts, wts
    if elem_type == "QUAD4":
        g = [-_SQ3, _SQ3]
        pts = np.array([[x, y] for y in g for x in g])
        wts = np.ones(4)
        return pts, wts
    raise ValueError(f"unsupported element type {elem_type!r}")


# ----------------------------------------------------------------------
# shape functions
# ----------------------------------------------------------------------
def shape_functions(elem_type: str, pts: np.ndarray) -> np.ndarray:
    """phi [Q, K]: P1 Lagrange shape functions at reference points."""
    pts = np.atleast_2d(pts)
    if elem_type == "TET4":
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        return np.stack([1.0 - x - y - z, x, y, z], axis=1)
    if elem_type == "HEX8":
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        # vertex signs in the standard HEX8 ordering
        sx = np.array([-1, 1, 1, -1, -1, 1, 1, -1])
        sy = np.array([-1, -1, 1, 1, -1, -1, 1, 1])
        sz = np.array([-1, -1, -1, -1, 1, 1, 1, 1])
        return (
            (1 + x[:, None] * sx)
            * (1 + y[:, None] * sy)
            * (1 + z[:, None] * sz)
            / 8.0
        )
    if elem_type == "TRI3":
        x, y = pts[:, 0], pts[:, 1]
        return np.stack([1.0 - x - y, x, y], axis=1)
    if elem_type == "QUAD4":
        x, y = pts[:, 0], pts[:, 1]
        sx = np.array([-1, 1, 1, -1])
        sy = np.array([-1, -1, 1, 1])
        return (1 + x[:, None] * sx) * (1 + y[:, None] * sy) / 4.0
    raise ValueError(f"unsupported element type {elem_type!r}")


def shape_gradients(elem_type: str, pts: np.ndarray) -> np.ndarray:
    """dN [Q, K, d]: reference-coordinate gradients of the shape functions."""
    pts = np.atleast_2d(pts)
    Q = pts.shape[0]
    if elem_type == "TET4":
        dN = np.array(
            [
                [-1.0, -1.0, -1.0],
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
            ]
        )
        return np.broadcast_to(dN, (Q, 4, 3)).copy()
    if elem_type == "HEX8":
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        sx = np.array([-1, 1, 1, -1, -1, 1, 1, -1])
        sy = np.array([-1, -1, 1, 1, -1, -1, 1, 1])
        sz = np.array([-1, -1, -1, -1, 1, 1, 1, 1])
        gx = sx * (1 + y[:, None] * sy) * (1 + z[:, None] * sz) / 8.0
        gy = (1 + x[:, None] * sx) * sy * (1 + z[:, None] * sz) / 8.0
        gz = (1 + x[:, None] * sx) * (1 + y[:, None] * sy) * sz / 8.0
        return np.stack([gx, gy, gz], axis=2)
    if elem_type == "TRI3":
        dN = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
        return np.broadcast_to(dN, (Q, 3, 2)).copy()
    if elem_type == "QUAD4":
        x, y = pts[:, 0], pts[:, 1]
        sx = np.array([-1, 1, 1, -1])
        sy = np.array([-1, -1, 1, 1])
        gx = sx * (1 + y[:, None] * sy) / 4.0
        gy = (1 + x[:, None] * sx) * sy / 4.0
        return np.stack([gx, gy], axis=2)
    raise ValueError(f"unsupported element type {elem_type!r}")


@lru_cache(maxsize=None)
def tabulate(elem_type: str):
    """(phi [Q,K], dN [Q,K,d], weights [Q]) at the default quadrature rule."""
    pts, wts = quadrature(elem_type)
    return shape_functions(elem_type, pts), shape_gradients(elem_type, pts), wts
