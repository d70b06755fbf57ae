"""Selective AMR (mesh/adapt.py): the VERDICT-mandated contracts.

Reference semantics being replaced: `refine_and_coarsen_elements` after
per-element flagging (reference src/pihna.C:833-837, src/solid.C:364-368)
— locality (a seed refines only a neighborhood), `mesh/AMR/max_level`
caps depth, and a smooth field coarsens back.
"""

from itertools import combinations

import numpy as np

from rdcfes_tpu.mesh import AdaptiveMesh, adapt_flagged, box_tet_mesh

BOUNDS = ((0, 1.0), (0, 1.0), (0, 1.0))


def _assert_conforming(mesh):
    """Every interior face shared by exactly 2 elements; single-count faces
    lie on the box boundary (a hanging face would be single-count inside)."""
    faces = {}
    conn = mesh.connectivity
    for e in range(mesh.n_elems):
        for f in combinations(sorted(conn[e]), 3):
            faces[f] = faces.get(f, 0) + 1
    assert max(faces.values()) <= 2
    for f, cnt in faces.items():
        if cnt == 1:
            pts = mesh.coords[list(f)]
            on_bnd = any(
                np.allclose(pts[:, d], v, atol=1e-9)
                for d in range(3) for v in BOUNDS[d]
            )
            assert on_bnd, f"hanging interior face {f}"


def test_localized_refinement():
    """A corner seed refines < 30% of the mesh, conforming, volume-exact."""
    mesh = box_tet_mesh(6, 6, 6, bounds=BOUNDS)
    am = AdaptiveMesh(mesh)
    E0, vol0 = mesh.n_elems, mesh.element_volumes().sum()
    centers = mesh.coords[mesh.connectivity].mean(axis=1)
    seed = (centers**2).sum(1) < 0.08
    assert 0 < seed.sum() < 0.05 * E0
    r = am.refine(seed, max_level=3)
    m1 = r.adaptive.mesh
    assert m1.n_elems > E0
    assert (m1.n_elems - E0) < 0.3 * E0, "refinement flooded the mesh"
    _assert_conforming(m1)
    assert abs(m1.element_volumes().sum() - vol0) < 1e-12
    # P1 prolongation reproduces linear fields exactly
    g = np.array([1.0, 2.0, -0.5])
    assert np.allclose(r.prolong(mesh.coords @ g), m1.coords @ g)
    # elemental restriction maps children to parents
    vals = np.arange(E0, dtype=float)
    assert (vals[r.elem_map] >= 0).all() and len(r.elem_map) == m1.n_elems


def test_max_level_caps_depth():
    mesh = box_tet_mesh(4, 4, 4, bounds=BOUNDS)
    am = AdaptiveMesh(mesh)
    for _ in range(10):
        centers = am.mesh.coords[am.mesh.connectivity].mean(axis=1)
        seed = (centers**2).sum(1) < 0.1
        r = am.refine(seed, max_level=1)  # 1 libMesh level = 3 bisections
        if r is None:
            break
        am = r.adaptive
    else:
        raise AssertionError("refinement never saturated at the level cap")
    # closure may deepen a neighbor by one past the cap, as libMesh's
    # smoothing also does
    assert am.level.max() <= 3 + 1


def test_smooth_field_coarsens_back():
    """Uniform bisection fully coarsens back to the original mesh."""
    mesh = box_tet_mesh(4, 4, 4, bounds=BOUNDS)
    am = AdaptiveMesh(mesh)
    E0, N0 = mesh.n_elems, mesh.n_nodes
    r = am.refine(np.ones(E0, bool), max_level=3)
    m1 = r.adaptive
    assert m1.mesh.n_elems == 2 * E0
    assert (m1.sibling >= 0).all(), "every bisection child must be paired"
    rc = m1.coarsen(np.ones(m1.mesh.n_elems, bool))
    m2 = rc.adaptive.mesh
    assert m2.n_elems == E0 and m2.n_nodes == N0
    _assert_conforming(m2)
    assert abs(m2.element_volumes().sum()
               - mesh.element_volumes().sum()) < 1e-12
    # nodal transfer on coarsening is selection of surviving nodes
    u1 = r.prolong(mesh.coords[:, 0])
    u2 = rc.prolong(u1)
    assert u2.shape == (N0,)


def test_refine_and_coarsen_combined():
    mesh = box_tet_mesh(4, 4, 4, bounds=BOUNDS)
    am = AdaptiveMesh(mesh)
    E0 = mesh.n_elems
    r = am.refine(np.arange(E0) % 5 == 0, max_level=3)
    am1 = r.adaptive
    E1 = am1.mesh.n_elems
    # coarsen everything previously refined, refine a different region
    centers = am1.mesh.coords[am1.mesh.connectivity].mean(axis=1)
    far = ((centers - 1.0) ** 2).sum(1) < 0.1
    out = adapt_flagged(am1, far, np.ones(E1, bool), max_level=3)
    assert out is not None
    _assert_conforming(out.mesh)
    # elemental restriction composes across coarsen+refine
    vals = np.linspace(0, 1, E1)
    rv = out.restrict_elemental(vals)
    assert rv.shape == (out.mesh.n_elems,)


def test_boundary_ids_propagate():
    mesh = box_tet_mesh(5, 5, 5, bounds=BOUNDS)
    am = AdaptiveMesh(mesh)
    # refine elements touching the x=0 face
    touching = (mesh.coords[mesh.connectivity][..., 0] == 0).any(axis=1)
    r = am.refine(touching, max_level=3)
    m1 = r.adaptive.mesh
    # the x=0 boundary faces must retain their id set
    ids0 = set(np.unique(mesh.boundary_id[
        np.isclose(mesh.coords[mesh.boundary_faces].mean(1)[:, 0], 0.0)]))
    ids1 = set(np.unique(m1.boundary_id[
        np.isclose(m1.coords[m1.boundary_faces].mean(1)[:, 0], 0.0)]))
    assert ids1 == ids0
