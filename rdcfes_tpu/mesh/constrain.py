"""Selective 1:8 (libMesh-style) TET4 refinement with hanging-node
constraints.

The reference refines flagged tets 1:8 and constrains the resulting
mid-edge nodes against their edge endpoints
(`MeshRefinement::refine_and_coarsen_elements` +
`DofMap::constrain_element_matrix_and_vector`, reference
src/pihna.C:752, :805-840).  mesh/adapt.py provides the conforming
bisection ALTERNATIVE (the round-2 deviation); this module provides the
libMesh-faithful strategy: flagged elements split 1:8, a mid-edge node
whose edge still belongs to an unrefined element becomes a HANGING node
with the P1 constraint u_h = (u_a + u_b) / 2, and the transient system
solves the constrained operator C^T A C matrix-free
(systems/transient.py `constraints=`).

Chained constraints are excluded the way libMesh's level-one rule does
it: refining a fine element that has a hanging corner forces the coarse
owner(s) of that constraint to refine in the same pass (flag closure),
so every constraint's endpoints are master dofs.

Coarsening is not provided on this strategy (the bisection strategy
retains it); every shipped deck's AMR is refine-only at the steps it
actually takes.

All host-side NumPy topology work; device systems are rebuilt on the new
mesh afterwards, exactly like mesh/refine.py's uniform path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, NamedTuple, Tuple

import numpy as np

from .core import Mesh
from .refine import _propagate_boundary, _tri_children, _unique_rows

_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int64
)


class ConstrainedAdaptResult(NamedTuple):
    constrained: "ConstrainedMesh"
    prolong: Callable[[np.ndarray], np.ndarray]
    elem_map: np.ndarray


@dataclass
class ConstrainedMesh:
    """A TET4 mesh plus its live hanging-node constraints.

    hanging maps a sorted edge (a, b) -> the mid-edge node id h carrying
    the constraint u_h = (u_a + u_b) / 2.  Both endpoints are always
    master dofs (flag closure, module docstring)."""

    mesh: Mesh
    hanging: Dict[Tuple[int, int], int] = field(default_factory=dict)

    @property
    def constraints(self) -> np.ndarray:
        """(H, 3) int32 rows [h, a, b] (H may be 0)."""
        if not self.hanging:
            return np.zeros((0, 3), dtype=np.int32)
        rows = [(h, a, b) for (a, b), h in sorted(self.hanging.items())]
        return np.asarray(rows, dtype=np.int32)

    # ------------------------------------------------------------------
    def refine(self, flags: np.ndarray):
        """Split flagged elements 1:8; returns ConstrainedAdaptResult or
        None when nothing is flagged."""
        mesh = self.mesh
        assert mesh.elem_type == "TET4", "constrained 1:8 is TET4-only"
        conn = mesh.connectivity.astype(np.int64)
        E, N = conn.shape[0], mesh.n_nodes
        S = np.asarray(flags, dtype=bool).copy()
        if not S.any():
            return None

        # ---- flag closure: no chained constraints ---------------------
        # refining an element with a hanging corner h forces the coarse
        # owners of h's edge (the unrefined elements containing that
        # edge) to refine too
        if self.hanging:
            h2edge = {h: e for e, h in self.hanging.items()}
            hang_ids = np.fromiter(h2edge.keys(), dtype=np.int64)
            # node -> elements adjacency for constraint-edge owners
            for _ in range(64):  # closure terminates long before this
                flagged_corners = np.isin(conn[S], hang_ids)
                if not flagged_corners.any():
                    break
                grew = False
                hs = np.unique(conn[S][flagged_corners])
                for h in hs:
                    a, b = h2edge[int(h)]
                    owners = np.nonzero(
                        np.any(conn == a, axis=1) & np.any(conn == b, axis=1)
                        & ~S)[0]
                    if owners.size:
                        S[owners] = True
                        grew = True
                if not grew:
                    break

        F = np.nonzero(S)[0]
        U = np.nonzero(~S)[0]
        cf = conn[F]  # (Ef, 4)
        Ef = cf.shape[0]

        # ---- mid-edge nodes (reuse existing hanging nodes) ------------
        edges = cf[:, _TET_EDGES].reshape(Ef * 6, 2)
        uniq, inv = _unique_rows(edges)  # uniq sorted (Ue, 2)
        mid_of = np.empty(len(uniq), dtype=np.int64)
        new_edges = []  # edges that get a NEW node this pass
        next_id = N
        for i, (a, b) in enumerate(map(tuple, uniq)):
            h = self.hanging.get((int(a), int(b)))
            if h is not None:
                mid_of[i] = h
            else:
                mid_of[i] = next_id
                next_id += 1
                new_edges.append((int(a), int(b)))
        new_edges = np.asarray(new_edges, dtype=np.int64).reshape(-1, 2)
        coords = np.concatenate(
            [mesh.coords, mesh.coords[new_edges].mean(axis=1)], axis=0)
        mid_ids = mid_of[inv].reshape(Ef, 6)

        # ---- 1:8 split (same pattern as mesh/refine._refine_tet) ------
        v = cf
        m01, m02, m03, m12, m13, m23 = (mid_ids[:, i] for i in range(6))
        corner = [
            np.stack([v[:, 0], m01, m02, m03], axis=1),
            np.stack([m01, v[:, 1], m12, m13], axis=1),
            np.stack([m02, m12, v[:, 2], m23], axis=1),
            np.stack([m03, m13, m23, v[:, 3]], axis=1),
        ]

        def d2(a, b):
            return ((coords[a] - coords[b]) ** 2).sum(axis=1)

        diags = np.stack([d2(m01, m23), d2(m02, m13), d2(m03, m12)],
                         axis=1)
        choice = np.argmin(diags, axis=1)
        octa_sets = []
        for p, q, eq in (
            (m01, m23, (m02, m03, m13, m12)),
            (m02, m13, (m01, m03, m23, m12)),
            (m03, m12, (m01, m02, m23, m13)),
        ):
            tets = [np.stack([p, q, eq[i], eq[(i + 1) % 4]], axis=1)
                    for i in range(4)]
            octa_sets.append(np.stack(tets, axis=1))
        octa = np.select(
            [choice[:, None, None] == c for c in range(3)], octa_sets)
        children = np.concatenate(
            [np.stack(corner, axis=1), octa], axis=1).reshape(Ef * 8, 4)
        X = coords[children]
        vol6 = np.einsum(
            "ei,ei->e",
            np.cross(X[:, 1] - X[:, 0], X[:, 2] - X[:, 0]),
            X[:, 3] - X[:, 0])
        flip = vol6 < 0
        children[flip, 2], children[flip, 3] = (
            children[flip, 3].copy(), children[flip, 2].copy())

        new_conn = np.concatenate([conn[U], children], axis=0)
        subdomain = np.concatenate(
            [mesh.subdomain_id[U], np.repeat(mesh.subdomain_id[F], 8)])
        elem_map = np.concatenate([U, np.repeat(F, 8)]).astype(np.int64)

        # ---- hanging-node bookkeeping ---------------------------------
        # a mid-edge node is hanging iff its edge still belongs to an
        # unsplit element; otherwise (all owners split) it is free
        unsplit_edges = {
            tuple(e) for e in np.sort(
                conn[U][:, _TET_EDGES].reshape(-1, 2), axis=1)}
        new_hanging: Dict[Tuple[int, int], int] = {}
        carried = dict(self.hanging)
        for i, (a, b) in enumerate(map(tuple, uniq)):
            key = (int(a), int(b))
            carried.pop(key, None)  # consumed by this pass's split
            if key in unsplit_edges:
                new_hanging[key] = int(mid_of[i])
        # constraints untouched by this pass persist as long as their
        # coarse owners remain unsplit
        for key, h in carried.items():
            if key in unsplit_edges:
                new_hanging[key] = h

        # ---- boundary propagation -------------------------------------
        mid_lookup = {}
        for i, (a, b) in enumerate(map(tuple, uniq)):
            mid_lookup[(int(a), int(b))] = int(mid_of[i])
            mid_lookup[(int(b), int(a))] = int(mid_of[i])
        keys, ids = [], []
        split = S
        bfaces = mesh.boundary_faces if mesh.boundary_faces is not None else []
        bids = mesh.boundary_id if mesh.boundary_id is not None else []
        belems = mesh.boundary_elem if mesh.boundary_elem is not None else []
        for face, bid, owner in zip(bfaces, bids, belems):
            if split[owner]:
                for ch in _tri_children(
                        tuple(int(x) for x in face), mid_lookup):
                    keys.append(sorted(ch))
                    ids.append(int(bid))
            else:
                keys.append(sorted(int(x) for x in face))
                ids.append(int(bid))
        new_mesh = _propagate_boundary(
            mesh, new_conn.astype(np.int32), "TET4", coords, subdomain,
            np.asarray(keys, dtype=np.int64),
            np.asarray(ids, dtype=np.int32))

        def prolong(u):
            u = np.asarray(u)
            if not len(new_edges):
                return u.copy()
            return np.concatenate([u, u[new_edges].mean(axis=1)], axis=0)

        return ConstrainedAdaptResult(
            ConstrainedMesh(new_mesh, new_hanging), prolong, elem_map)
