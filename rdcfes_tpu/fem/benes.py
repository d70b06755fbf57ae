"""Beneš-style routing for arbitrary permutations on a TPU (A, B, L) grid.

Mosaic exposes exactly three data-movement primitives fast enough for the
matvec hot path (measured in scripts/microbench_pallas3.py):

  * lane gather   : out[r, l] = in[r, idx[r, l]]      (axis-1 TA, any rows)
  * sublane gather: out[s, l] = in[idx[s, l], l]      (axis-0 TA, 8 rows)
  * minor-dim transposes / rolls

An arbitrary gather (the FEM corner gather / restriction) is NOT directly
expressible, but any fixed BIJECTION of an (A, B, L) grid decomposes into
five single-axis permutation stages (generalized Beneš):

    L-stage, B-stage, A-stage, B-stage, L-stage

where the L-stages are lane gathers, the B-stages are lane gathers after
a minor-dims swap, and the A-stage (A = 36 rows as 5 blocks of 8) is
itself a within-block / across-block / within-block sandwich of sublane
gathers and block rolls.  Stage routing comes from recursive bipartite
edge coloring (König: a 2^k-regular bipartite multigraph splits into
perfect matchings by repeated Euler-circuit halving).

This module runs on the host at setup time: it builds the five stage
index tables for a given destination<-source map and provides a NumPy
reference `apply_plan` for unit tests; the device kernel that consumes
the tables lives in fem/pallas_perm.py.  The edge-coloring walks (the
setup-time hot path, ~30 s in pure Python at bench scale) dispatch to
the native C++ walker (native/meshkit.cpp meshkit_benes_color_batch)
when libmeshkit.so is built, with a pure-Python fallback.

Reference context: this machinery replaces the XLA gathers under the
reference's PETSc SpMV (src/pihna.C:80) — measured at ~0.2 G indices/s in
XLA vs ~7 G elements/s through these stages.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


# ----------------------------------------------------------------------
# bipartite edge coloring by Euler-split (degree must be a power of two)
# ----------------------------------------------------------------------
def _euler_split(src: np.ndarray, dst: np.ndarray, n_left: int,
                 n_right: int):
    """Split a 2k-regular bipartite multigraph into two k-regular halves.

    Returns a boolean mask: True = first half.  Walks Euler circuits and
    alternates edge directions (classic Gabow halving)."""
    E = len(src)
    # adjacency: for each vertex, list of incident edge ids (vectorized)
    # left vertices 0..n_left-1, right vertices n_left..n_left+n_right-1
    nv = n_left + n_right
    ends = np.concatenate([src, dst + n_left])
    adj = np.tile(np.arange(E, dtype=np.int64), 2)[
        np.argsort(ends, kind="stable")]
    deg = np.bincount(ends, minlength=nv)
    ptr = np.zeros(nv + 1, dtype=np.int64)
    np.cumsum(deg, out=ptr[1:])

    used = np.zeros(E, dtype=bool)
    side = np.zeros(E, dtype=bool)   # True = "left-to-right" orientation
    cursor = ptr[:-1].copy()

    # iterate Euler circuits: every vertex has even degree (2k-regular)
    for start_v in range(n_left + n_right):
        while True:
            # find an unused edge at start_v
            c = cursor[start_v]
            while c < ptr[start_v + 1] and used[adj[c]]:
                c += 1
            cursor[start_v] = c
            if c >= ptr[start_v + 1]:
                break
            # walk a circuit from start_v
            v = start_v
            while True:
                c = cursor[v]
                while c < ptr[v + 1] and used[adj[c]]:
                    c += 1
                cursor[v] = c
                if c >= ptr[v + 1]:
                    break  # circuit closed back at a saturated vertex
                e = adj[c]
                used[e] = True
                # orient edge: leaving a left vertex -> L2R
                if v < n_left:
                    side[e] = True
                    v = dst[e] + n_left
                else:
                    side[e] = False
                    v = src[e]
    return side


def edge_color_bipartite(src: np.ndarray, dst: np.ndarray, n_left: int,
                         n_right: int, degree: int) -> np.ndarray:
    """Color the edges of a `degree`-regular bipartite multigraph so each
    color class is a perfect matching.  degree must be a power of two.
    Returns (E,) int32 colors in [0, degree)."""
    E = len(src)
    assert degree & (degree - 1) == 0, "degree must be a power of two"
    colors = np.zeros(E, dtype=np.int32)
    groups = [(np.arange(E, dtype=np.int64), 0, degree)]
    while groups:
        idx, base, k = groups.pop()
        if k == 1:
            colors[idx] = base
            continue
        half = _euler_split(src[idx], dst[idx], n_left, n_right)
        groups.append((idx[half], base, k // 2))
        groups.append((idx[~half], base + k // 2, k // 2))
    return colors


def edge_color_batch(src: np.ndarray, dst: np.ndarray, seg_ptr: np.ndarray,
                     n_left: int, n_right: int, degree: int) -> np.ndarray:
    """Batched edge coloring over independent segments (the router's hot
    path): native C++ walker when libmeshkit is built, else the Python
    walker per segment.  Any valid coloring yields a valid plan, so the
    two backends are interchangeable."""
    from ..native import benes_color_batch

    out = benes_color_batch(src, dst, seg_ptr, n_left, n_right, degree)
    if out is not None:
        return out
    colors = np.empty(len(src), dtype=np.int32)
    for s in range(len(seg_ptr) - 1):
        lo, hi = int(seg_ptr[s]), int(seg_ptr[s + 1])
        colors[lo:hi] = edge_color_bipartite(src[lo:hi], dst[lo:hi],
                                             n_left, n_right, degree)
    return colors


# ----------------------------------------------------------------------
# the five-stage plan
# ----------------------------------------------------------------------
class GridPermPlan(NamedTuple):
    """Target-driven stage tables for one fixed (A, B, L) grid bijection.

    Data layout: flat (A*B, L) row-major over (a, b).  All index tables
    are uint8 (every routed axis has <= 128 positions) and cast to int32
    in the kernel.

    iL1 : (A*B, L)  stage-1 lane gather   y1[r, t] = x[r, iL1[r, t]]
    iB1 : (A, B, L) stage-2 b gather      y2[a,b,l] = y1[a, iB1[a,b,l], l]
    A-stage (A padded to AP = 5 blocks of 8, view (AP, B*L)):
      jA1  : (AP, B*L) within-block sublane gather (block-local rows)
      rA   : (AP, B*L) across-block roll distance in [0, 5)
      jA2  : (AP, B*L) within-block sublane gather
    iB2 : (A, B, L) stage-4 b gather
    iL2 : (A*B, L)  stage-5 lane gather
    """

    A: int
    B: int
    L: int
    AP: int
    iL1: np.ndarray
    iB1: np.ndarray
    jA1: np.ndarray
    rA: np.ndarray
    jA2: np.ndarray
    iB2: np.ndarray
    iL2: np.ndarray


def _a_stage_tables(a_src_of_dst: np.ndarray, A: int, AP: int):
    """Per-column A-axis permutation -> (jA1, rA, jA2) sub-stage tables.

    a_src_of_dst: (A, C) target-driven map, padded internally to AP rows
    (pads route identity).  Blocks of 8; across-block movement is a
    roll+select, so only the within-block positions need Hall coloring
    (8-regular block multigraph on 5+5 vertices)."""
    C = a_src_of_dst.shape[1]
    BLK = 8
    nb = AP // BLK
    full = np.empty((AP, C), dtype=np.int64)
    full[:A] = a_src_of_dst
    full[A:] = np.arange(A, AP, dtype=np.int64)[:, None]

    a_dst = np.broadcast_to(np.arange(AP)[:, None], (AP, C))
    u = (full // BLK).astype(np.int64)        # source block per (dst, col)
    v = (a_dst // BLK).astype(np.int64)       # dest block
    # color per column: edges (u -> v), 8-regular on nb+nb vertices,
    # one batched call (C independent segments, column-major layout)
    seg_ptr = np.arange(C + 1, dtype=np.int64) * AP
    col = edge_color_batch(u.T.reshape(-1), v.T.reshape(-1), seg_ptr,
                           nb, nb, BLK).reshape(C, AP).T.astype(np.int64)
    cgrid = np.broadcast_to(np.arange(C), (AP, C))
    jA1 = np.zeros((AP, C), dtype=np.uint8)
    rA = np.zeros((AP, C), dtype=np.uint8)
    # element with color s travels at within-block position s
    # stage jA1: within SOURCE block u: position s <- a_src % 8
    jA1[u * BLK + col, cgrid] = (full % BLK).astype(np.uint8)
    # stage rA: target slot (v, s) pulls from block u: roll distance
    rA[v * BLK + col, cgrid] = ((v - u) % nb).astype(np.uint8)
    # stage jA2: within DEST block: dest row a_dst reads position col
    jA2 = col.astype(np.uint8)
    return jA1, rA, jA2


def build_grid_permutation(src_of_dst: np.ndarray, A: int = 36,
                           B: int = 128, L: int = 128) -> GridPermPlan:
    """Build the 5-stage plan for y_flat[q] = x_flat[src_of_dst[q]].

    src_of_dst: (A*B*L,) int64 BIJECTION on the full grid (pad entries
    must be part of the bijection: route pads from pads)."""
    T = A * B * L
    assert src_of_dst.shape == (T,)
    AP = ((A + 7) // 8) * 8

    p = src_of_dst.astype(np.int64)
    dst = np.arange(T, dtype=np.int64)
    # coordinates
    a_s, rem = np.divmod(p, B * L)
    b_s, l_s = np.divmod(rem, L)
    a_d, rem = np.divmod(dst, B * L)
    b_d, l_d = np.divmod(rem, L)
    r_s = a_s * B + b_s            # source row in (A*B, L)
    r_d = a_d * B + b_d

    # ---- level 1: color by lane t (128-regular rows multigraph) -------
    t = edge_color_batch(r_s, r_d, np.array([0, T], dtype=np.int64),
                         A * B, A * B, L)
    iL1 = np.zeros((A * B, L), dtype=np.uint8)
    iL1[r_s, t] = l_s.astype(np.uint8)

    # ---- level 2 per lane: rows bijection -> color by b' --------------
    # one batched coloring call over the L per-lane segments, then
    # vectorized table scatters (each destination written exactly once)
    order = np.argsort(t, kind="stable")
    t_o = t[order].astype(np.int64)
    seg_ptr = np.searchsorted(t_o, np.arange(L + 1, dtype=np.int64))
    As, Bs = a_s[order], b_s[order]
    Ad, Bd = a_d[order], b_d[order]
    bp = edge_color_batch(As, Ad, seg_ptr, A, A, B).astype(np.int64)
    iB1 = np.zeros((A, B, L), dtype=np.uint8)
    a_src_tab = np.zeros((A, B * L), dtype=np.int64)  # A-stage per (b', t)
    iB2 = np.zeros((A, B, L), dtype=np.uint8)
    iL2 = np.zeros((A * B, L), dtype=np.uint8)
    iB1[As, bp, t_o] = Bs.astype(np.uint8)
    a_src_tab[Ad, bp * L + t_o] = As
    iB2[Ad, Bd, t_o] = bp.astype(np.uint8)
    iL2[Ad * B + Bd, l_d[order]] = t_o.astype(np.uint8)

    jA1, rA, jA2 = _a_stage_tables(a_src_tab, A, AP)
    return GridPermPlan(A=A, B=B, L=L, AP=AP, iL1=iL1, iB1=iB1, jA1=jA1,
                       rA=rA, jA2=jA2, iB2=iB2, iL2=iL2)


# ----------------------------------------------------------------------
# NumPy reference executor (unit-test oracle for the device kernel)
# ----------------------------------------------------------------------
def apply_plan(plan: GridPermPlan, x_flat: np.ndarray) -> np.ndarray:
    """Run the five stages in NumPy; x_flat (A*B*L,) -> permuted copy."""
    A, B, L, AP = plan.A, plan.B, plan.L, plan.AP
    x = x_flat.reshape(A * B, L)
    # stage 1: lane gather
    y = np.take_along_axis(x, plan.iL1.astype(np.int64), axis=1)
    # stage 2: b gather
    y = y.reshape(A, B, L)
    y = np.take_along_axis(y, plan.iB1.astype(np.int64), axis=1)
    # stage 3: A-stage on (AP, B*L)
    z = np.zeros((AP, B * L), dtype=x.dtype)
    z[:A] = y.reshape(A, B * L)
    nb = AP // 8
    zb = z.reshape(nb, 8, B * L)
    # within-block
    j1 = plan.jA1.reshape(nb, 8, B * L).astype(np.int64)
    z1 = np.take_along_axis(zb, j1, axis=1)
    # across-block roll+select: out[v] = z1[(v - r) % nb]
    r = plan.rA.reshape(nb, 8, B * L).astype(np.int64)
    z2 = np.zeros_like(z1)
    for d in range(nb):
        rolled = np.roll(z1, d, axis=0)   # rolled[v] = z1[(v - d) % nb]
        z2 = np.where(r == d, rolled, z2)
    # within-block
    j3 = plan.jA2.reshape(nb, 8, B * L).astype(np.int64)
    z3 = np.take_along_axis(z2, j3, axis=1)
    y = z3.reshape(AP, B * L)[:A].reshape(A, B, L)
    # stage 4: b gather
    y = np.take_along_axis(y, plan.iB2.astype(np.int64), axis=1)
    # stage 5: lane gather
    y = y.reshape(A * B, L)
    y = np.take_along_axis(y, plan.iL2.astype(np.int64), axis=1)
    return y.reshape(-1)
