"""AMR for TET10 and MIXED meshes — the last element-type gates removed.

libMesh's `MeshRefinement` is element-type generic, so the reference's
AMR entry points (src/pihna.C:805-840, src/solid.C:330-369,
src/coupled_hcc.C:733-780) refine whatever mesh was loaded.  Rounds 2-3
covered TET4 (bisection + libMesh-faithful constrained 1:8) and HEX8
(uniform); this module extends selective AMR to the remaining mesh
kinds:

TET10 — the corner skeleton refines with the TET4 bisection machinery
(mesh/adapt.py), the refined skeleton is re-upgraded to second order
(mesh/generators.tet4_to_tet10), and the solution transfers
QUADRATICALLY EXACTLY: every new node's value is the old second-order
field evaluated at the node's position (host point location over the
old skeleton + TET10 basis evaluation) — the counterpart of libMesh's
second-order embedding prolongation.  Conforming by construction (no
hanging nodes); deck strategy "1to8" falls back to bisection on TET10
with a printed notice (quadratic hanging constraints are out of scope).

MIXED — the TET4 block refines with the constrained 1:8 machinery
(mesh/constrain.py) while the transition blocks (PRISM6 / PYRAMID5 /
HEX8) hold fixed: a mid-edge node on an edge shared with a frozen block
hangs against its endpoints with the same P1 constraint the TET4 path
uses, and refining an element whose level-one closure would require a
frozen block to split is vetoed (ConstrainedMesh.frozen_edges).  All
blocks are P1, so the constraint algebra is uniform.

Everything here is host-side NumPy topology work; device systems are
rebuilt on the new mesh afterwards, exactly like mesh/refine.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import numpy as np

from .adapt import AdaptiveMesh
from .constrain import ConstrainedMesh
from .core import Mesh, MeshBlock, MixedMesh

# element edges per type (corner-node local indices) — used to build the
# frozen-edge set of non-refining MIXED blocks
_EDGES = {
    "TET4": [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
    "HEX8": [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
             (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)],
    "PRISM6": [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3),
               (0, 3), (1, 4), (2, 5)],
    "PYRAMID5": [(0, 1), (1, 2), (2, 3), (3, 0),
                 (0, 4), (1, 4), (2, 4), (3, 4)],
}


# ----------------------------------------------------------------------
# TET10
# ----------------------------------------------------------------------
def tet10_skeleton(mesh: Mesh):
    """Corner TET4 skeleton of a TET10 mesh.

    Returns (skel, corner_ids): skel is a TET4 Mesh over the renumbered
    corner nodes, corner_ids maps skeleton node id -> TET10 node id.
    Boundary ids transfer by corner-face key."""
    assert mesh.elem_type == "TET10", mesh.elem_type
    conn4 = mesh.connectivity[:, :4].astype(np.int64)
    corner_ids = np.unique(conn4)
    old2skel = np.full(mesh.n_nodes, -1, dtype=np.int64)
    old2skel[corner_ids] = np.arange(len(corner_ids))
    skel = Mesh(mesh.coords[corner_ids],
                old2skel[conn4].astype(np.int32), "TET4",
                mesh.subdomain_id.copy())
    if mesh.boundary_id is not None and len(mesh.boundary_faces):
        old = {tuple(sorted(int(x) for x in f[:3])): int(b)
               for f, b in zip(mesh.boundary_faces, mesh.boundary_id)}
        for i, f in enumerate(skel.boundary_faces):
            key = tuple(sorted(int(corner_ids[x]) for x in f))
            bid = old.get(key)
            if bid is not None:
                skel.boundary_id[i] = bid
    return skel, corner_ids


def quadratic_transfer(old: Mesh, new_coords: np.ndarray) -> np.ndarray:
    """(N_new, len-10 basis) transfer matrix application: evaluate the
    old TET10 field at each new node position.

    Returns a function u_old (N_old, ...) -> u_new (N_new, ...).  EXACT
    for any field in the old FE space: each new node is located inside
    (or on the boundary of) an old element via KD-tree candidates +
    barycentric containment, and the old element's 10 quadratic shape
    functions are evaluated there.  This is how libMesh prolongs
    second-order fields (embedding matrices) generalized to arbitrary
    target points, which also covers coarsening transfers."""
    from scipy.spatial import cKDTree

    from ..fem.elements import shape_functions

    assert old.elem_type == "TET10"
    conn = old.connectivity.astype(np.int64)
    X = old.coords[conn[:, :4]]                      # (E, 4, 3) corners
    cent = X.mean(axis=1)
    tree = cKDTree(cent)
    P = np.asarray(new_coords, dtype=np.float64)
    M = P.shape[0]
    k = min(24, len(cent))
    _, cand = tree.query(P, k=k)
    cand = np.atleast_2d(cand)
    T = np.transpose(X[:, 1:] - X[:, :1], (0, 2, 1))  # (E, 3, 3) cols=edges
    Tinv = np.linalg.inv(T)

    elem_of = np.full(M, -1, dtype=np.int64)
    bary = np.zeros((M, 3))
    todo = np.arange(M)
    for j in range(cand.shape[1]):
        if not todo.size:
            break
        e = cand[todo, j]
        lam = np.einsum("mij,mj->mi", Tinv[e], P[todo] - X[e, 0])
        ok = (lam.min(axis=1) >= -1e-8) & (lam.sum(axis=1) <= 1 + 1e-8)
        hit = todo[ok]
        elem_of[hit] = e[ok]
        bary[hit] = lam[ok]
        todo = todo[~ok]
    if todo.size:
        # numerically awkward points (slivers): fall back to the nearest
        # candidate's clipped barycentrics — still a convex evaluation
        e = cand[todo, 0]
        lam = np.einsum("mij,mj->mi", Tinv[e], P[todo] - X[e, 0])
        lam = np.clip(lam, 0.0, 1.0)
        s = lam.sum(axis=1, keepdims=True)
        lam = np.where(s > 1.0, lam / s, lam)
        elem_of[todo] = e
        bary[todo] = lam

    N10 = shape_functions("TET10", bary)             # (M, 10)
    src = conn[elem_of]                              # (M, 10)

    def transfer(u):
        u = np.asarray(u)
        return np.einsum("mk,mk...->m...", N10, u[src])

    return transfer


class Tet10AdaptOutcome(NamedTuple):
    """Driver-facing result, interface-compatible with adapt.AdaptOutcome."""

    mesh: Mesh                       # new TET10 mesh
    adaptive: "Tet10Adaptive"
    prolong: Callable[[np.ndarray], np.ndarray]
    restrict_elemental: Callable[[np.ndarray], np.ndarray]


@dataclass
class Tet10Adaptive:
    """A TET10 mesh plus the bisection forest of its corner skeleton."""

    mesh: Mesh
    skel: AdaptiveMesh

    @classmethod
    def from_mesh(cls, mesh: Mesh) -> "Tet10Adaptive":
        skel, _ = tet10_skeleton(mesh)
        return cls(mesh, AdaptiveMesh(skel))

    def refine_and_coarsen(self, refine_flags: np.ndarray,
                           coarsen_flags: np.ndarray,
                           max_level: int = 3
                           ) -> Optional[Tet10AdaptOutcome]:
        from .generators import tet4_to_tet10

        r = self.skel.refine_and_coarsen(refine_flags, coarsen_flags,
                                         max_level=max_level)
        if r is None:
            return None
        new10 = tet4_to_tet10(r.adaptive.mesh)
        transfer = quadratic_transfer(self.mesh, new10.coords)
        emap = r.elem_map

        def restrict_elemental(vals):
            return np.asarray(vals)[emap]

        return Tet10AdaptOutcome(new10, Tet10Adaptive(new10, r.adaptive),
                                 transfer, restrict_elemental)


# ----------------------------------------------------------------------
# MIXED
# ----------------------------------------------------------------------
class MixedAdaptOutcome(NamedTuple):
    """refine_and_coarsen on a MixedMesh's TET4 block.

    constraints: (H, 3) [h, a, b] hanging rows of the NEW mesh
    (u_h = (u_a + u_b) / 2) — pass to the transient system."""

    mesh: MixedMesh
    adaptive: "MixedConstrained"
    prolong: Callable[[np.ndarray], np.ndarray]
    transfer_elemental: Callable[[np.ndarray], np.ndarray]
    constraints: np.ndarray


@dataclass
class MixedConstrained:
    """A MixedMesh whose (single) TET4 block carries constrained-1:8 AMR.

    The internal ConstrainedMesh is built over the GLOBAL node set (its
    Mesh holds all mixed coords with the tet block's connectivity), so
    node ids, prolongation, and constraints are global for free; frozen
    blocks contribute frozen_edges + pinned_nodes."""

    mixed: MixedMesh
    tet_idx: int
    cmesh: ConstrainedMesh

    @classmethod
    def from_mesh(cls, mixed: MixedMesh) -> "MixedConstrained":
        tet_idx = [i for i, b in enumerate(mixed.blocks)
                   if b.elem_type == "TET4"]
        assert tet_idx, "MIXED AMR needs a TET4 block to refine"
        # one refining block (the dominant bulk zone); if several TET4
        # blocks exist the first refines and the rest are frozen
        ti = tet_idx[0]
        frozen, pinned = set(), []
        for i, b in enumerate(mixed.blocks):
            if i == ti:
                continue
            conn = b.connectivity.astype(np.int64)
            ed = np.array(_EDGES[b.elem_type])
            ev = np.sort(conn[:, ed], axis=-1).reshape(-1, 2)
            frozen.update(map(tuple, ev.tolist()))
            pinned.append(np.unique(conn))
        pinned = (np.unique(np.concatenate(pinned)) if pinned
                  else np.zeros(0, np.int64))
        tb = mixed.blocks[ti]
        tet_mesh = Mesh(mixed.coords.copy(),
                        tb.connectivity.copy(), "TET4",
                        tb.subdomain_id.copy())
        cm = ConstrainedMesh(tet_mesh,
                             frozen_edges=frozenset(
                                 (int(a), int(b)) for a, b in frozen),
                             pinned_nodes=pinned)
        return cls(mixed, ti, cm)

    @property
    def constraints(self) -> np.ndarray:
        return self.cmesh.constraints

    def refine_and_coarsen(self, refine_flags: np.ndarray,
                           coarsen_flags: np.ndarray,
                           max_level: int = 3
                           ) -> Optional[MixedAdaptOutcome]:
        """Flags are over the GLOBAL (block-concatenated) element order;
        only the TET4 block's slice acts."""
        off = 0
        for i, b in enumerate(self.mixed.blocks):
            if i == self.tet_idx:
                break
            off += b.n_elems
        nt = self.mixed.blocks[self.tet_idx].n_elems
        rf = np.asarray(refine_flags, dtype=bool)[off:off + nt]
        cf = np.asarray(coarsen_flags, dtype=bool)[off:off + nt]
        r = self.cmesh.refine_and_coarsen(rf, cf, max_level=max_level)
        if r is None:
            return None
        cm2 = r.constrained
        kept = r.kept_nodes

        # rebuild the MixedMesh: frozen blocks' connectivity remaps
        # through `kept` when coarsening renumbered (pinned nodes always
        # survive, so the map is total on them)
        if kept is not None:
            old2new = np.full(self.mixed.coords.shape[0], -1,
                              dtype=np.int64)
            old2new[kept] = np.arange(len(kept))
        blocks = []
        for i, b in enumerate(self.mixed.blocks):
            if i == self.tet_idx:
                blocks.append(MeshBlock(
                    "TET4", cm2.mesh.connectivity.copy(),
                    cm2.mesh.subdomain_id.copy()))
            elif kept is not None:
                conn = old2new[b.connectivity.astype(np.int64)]
                assert (conn >= 0).all(), "frozen-block node dropped"
                blocks.append(MeshBlock(b.elem_type,
                                        conn.astype(np.int32),
                                        b.subdomain_id.copy()))
            else:
                blocks.append(b)
        new_mixed = MixedMesh(cm2.mesh.coords.copy(), blocks)
        # boundary-id propagation: unchanged faces keep their old id by
        # corner key (in new numbering); split tet faces inherit through
        # the internal mesh's own propagated boundary
        idmap = {}
        remap = ((lambda x: int(old2new[x])) if kept is not None
                 else (lambda x: int(x)))
        if self.mixed.boundary_id is not None:
            for f, bid in zip(self.mixed.boundary_faces,
                              self.mixed.boundary_id):
                key = tuple(sorted(remap(x) for x in f if x >= 0))
                if all(k >= 0 for k in key):
                    idmap[key] = int(bid)
        if cm2.mesh.boundary_id is not None:
            for f, bid in zip(cm2.mesh.boundary_faces,
                              cm2.mesh.boundary_id):
                idmap.setdefault(
                    tuple(sorted(int(x) for x in f)), int(bid))
        for i, f in enumerate(new_mixed.boundary_faces):
            bid = idmap.get(tuple(sorted(int(x) for x in f if x >= 0)))
            if bid is not None:
                new_mixed.boundary_id[i] = bid

        new_self = MixedConstrained(new_mixed, self.tet_idx, cm2)
        pr = r.prolong
        te = r.transfer_elemental
        nt_new = cm2.mesh.n_elems

        def transfer_elemental(vals):
            vals = np.asarray(vals)
            head = vals[:off]
            tet = te(vals[off:off + nt])
            tail = vals[off + nt:]
            return np.concatenate([head, tet, tail], axis=0)

        return MixedAdaptOutcome(new_mixed, new_self, pr,
                                 transfer_elemental, cm2.constraints)


def kelly_mixed(mixed: MixedMesh, u, variables, tet_idx: int = None):
    """Kelly indicator over a MixedMesh, GLOBAL element order.

    Computed on the refinable TET4 block only (within-block face jumps;
    cross-block jumps are omitted — the transition blocks never refine,
    so their indicator could only force vetoed flags).  Other blocks
    report 0."""
    from ..fem.amr import kelly_error_indicator

    if tet_idx is None:
        tet_idx = next(i for i, b in enumerate(mixed.blocks)
                       if b.elem_type == "TET4")
    out = np.zeros(mixed.n_elems)
    off = 0
    for i, b in enumerate(mixed.blocks):
        if i == tet_idx:
            tet_mesh = Mesh(mixed.coords.copy(), b.connectivity.copy(),
                            "TET4", b.subdomain_id.copy())
            out[off:off + b.n_elems] = kelly_error_indicator(
                tet_mesh, u, variables)
        off += b.n_elems
    return out
