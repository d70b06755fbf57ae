"""Constrained selective 1:8 refinement (mesh/constrain.py) and the
hanging-node-constrained transient solve (systems/transient.py
`constraints=`).

Reference surface: MeshRefinement::refine_and_coarsen_elements with
hanging-node constraints + DofMap::constrain_element_matrix_and_vector
(reference src/pihna.C:752, :805-840).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rdcfes_tpu.mesh import ConstrainedMesh, box_tet_mesh, refine_uniform


def _tet_volumes(mesh):
    X = mesh.coords[mesh.connectivity]
    return np.abs(np.einsum(
        "ei,ei->e",
        np.cross(X[:, 1] - X[:, 0], X[:, 2] - X[:, 0]),
        X[:, 3] - X[:, 0])) / 6.0


def _center_flags(mesh, frac=0.2):
    cent = mesh.coords[mesh.connectivity].mean(axis=1)
    mid = mesh.coords.mean(axis=0)
    r = np.linalg.norm(cent - mid, axis=1)
    return r <= np.quantile(r, frac)


def test_topology_invariants():
    mesh = box_tet_mesh(4, 4, 4)
    cm = ConstrainedMesh(mesh)
    res = cm.refine(_center_flags(mesh))
    assert res is not None
    new = res.constrained
    m2 = new.mesh

    # volume conserved
    assert np.isclose(_tet_volumes(m2).sum(), _tet_volumes(mesh).sum())

    cons = new.constraints
    assert len(cons) > 0  # selective refinement must hang nodes
    h, a, b = cons[:, 0], cons[:, 1], cons[:, 2]
    # every hanging node is the midpoint of its constraint edge
    assert np.allclose(m2.coords[h],
                       0.5 * (m2.coords[a] + m2.coords[b]))
    # endpoints are master dofs (no chained constraints)
    assert not np.intersect1d(h, np.concatenate([a, b])).size
    # prolongation puts the constrained value on every hanging node
    u = np.random.default_rng(0).random((mesh.n_nodes, 2))
    up = res.prolong(u)
    assert up.shape[0] == m2.n_nodes
    assert np.allclose(up[h], 0.5 * (up[a] + up[b]))
    # elem_map covers the new elements and points at real parents
    assert res.elem_map.shape[0] == m2.n_elems
    assert res.elem_map.max() < mesh.n_elems


def test_uniform_flags_have_no_hanging_nodes():
    mesh = box_tet_mesh(3, 3, 3)
    res = ConstrainedMesh(mesh).refine(np.ones(mesh.n_elems, bool))
    assert len(res.constrained.constraints) == 0
    ref = refine_uniform(mesh)
    assert res.constrained.mesh.n_elems == ref.mesh.n_elems
    assert res.constrained.mesh.n_nodes == ref.mesh.n_nodes


def test_second_pass_flag_closure():
    """Refining a fine element with a hanging corner forces the coarse
    owner to refine (no chained constraints after any pass)."""
    mesh = box_tet_mesh(3, 3, 3)
    cm = ConstrainedMesh(mesh)
    res1 = cm.refine(_center_flags(mesh, 0.15))
    cm1 = res1.constrained
    # flag only elements that contain a hanging node as a corner
    hang = set(int(x) for x in cm1.constraints[:, 0])
    flags = np.array([bool(hang.intersection(map(int, row)))
                      for row in cm1.mesh.connectivity])
    assert flags.any()
    res2 = cm1.refine(flags)
    cons2 = res2.constrained.constraints
    if len(cons2):
        h2 = cons2[:, 0]
        ab2 = np.concatenate([cons2[:, 1], cons2[:, 2]])
        assert not np.intersect1d(h2, ab2).size
    # hanging midpoints are still geometric midpoints
    m2 = res2.constrained.mesh
    if len(cons2):
        assert np.allclose(
            m2.coords[cons2[:, 0]],
            0.5 * (m2.coords[cons2[:, 1]] + m2.coords[cons2[:, 2]]))


def _check_invariants(cm):
    """Conformity-under-constraints invariants of a ConstrainedMesh."""
    m = cm.mesh
    cons = cm.constraints
    conn = m.connectivity
    if len(cons):
        h, a, b = cons[:, 0], cons[:, 1], cons[:, 2]
        assert np.allclose(m.coords[h], 0.5 * (m.coords[a] + m.coords[b]))
        # endpoints are master dofs (no chains)
        assert not np.intersect1d(h, np.concatenate([a, b])).size
        # every constraint edge is an edge of some active element (a
        # coarse owner exists) and the hanging node is really used
        edges = {tuple(e) for e in np.sort(
            conn[:, [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]]]
            .reshape(-1, 2), axis=1)}
        used = set(int(x) for x in np.unique(conn))
        for hh, aa, bb in cons:
            assert (min(aa, bb), max(aa, bb)) in edges
            assert int(hh) in used
    # no orphan nodes
    assert len(np.unique(conn)) == m.n_nodes


def test_coarsen_roundtrip():
    """Refine selectively then coarsen every child group: the original
    mesh comes back (libMesh _coarsen_elements restoring parents)."""
    mesh = box_tet_mesh(4, 4, 4)
    cm0 = ConstrainedMesh(mesh)
    res = cm0.refine(_center_flags(mesh, 0.2))
    cm1 = res.constrained
    assert len(cm1.constraints)
    n_groups = len(cm1.groups)
    out = cm1.coarsen(np.ones(cm1.mesh.n_elems, bool))
    assert out is not None
    cm2, kept, transfer = out
    m2 = cm2.mesh
    assert m2.n_elems == mesh.n_elems
    assert m2.n_nodes == mesh.n_nodes
    assert len(cm2.constraints) == 0
    assert len(cm2.groups) == 0, n_groups
    assert np.isclose(_tet_volumes(m2).sum(), _tet_volumes(mesh).sum())
    # boundary ids survive the collapse
    assert (np.sort(np.unique(m2.boundary_id))
            == np.sort(np.unique(mesh.boundary_id))).all()
    assert len(m2.boundary_faces) == len(mesh.boundary_faces)
    # nodal transfer is a row selection of the kept (original) nodes
    u = np.random.default_rng(0).random((cm1.mesh.n_nodes, 2))
    assert (u[kept]).shape[0] == m2.n_nodes
    # constant elemental fields stay constant under the P0 projection
    vals = np.ones((cm1.mesh.n_elems, 3))
    tv = transfer(vals)
    assert tv.shape[0] == m2.n_elems and np.allclose(tv, 1.0)
    _check_invariants(cm2)


def test_coarsen_partial_and_veto():
    """Coarsening a subset keeps volume/invariants; collapses that would
    strand a finer neighbor's hanging nodes are vetoed (level-one)."""
    mesh = box_tet_mesh(4, 4, 4)
    res = ConstrainedMesh(mesh).refine(_center_flags(mesh, 0.25))
    cm1 = res.constrained
    # second level: refine some children of the first pass
    lvl1 = np.nonzero(cm1.elem_level == 1)[0]
    flags2 = np.zeros(cm1.mesh.n_elems, bool)
    flags2[lvl1[: len(lvl1) // 4]] = True
    res2 = cm1.refine(flags2)
    cm2 = res2.constrained
    _check_invariants(cm2)
    vol0 = _tet_volumes(cm2.mesh).sum()

    # try to coarsen EVERY level-1 group: groups whose collapse would
    # strand level-2 hanging nodes must be vetoed, the rest collapse
    out = cm2.coarsen(cm2.elem_level == 1)
    if out is None:
        pytest.skip("every level-1 group was vetoed on this geometry")
    cm3, kept, transfer = out
    assert np.isclose(_tet_volumes(cm3.mesh).sum(), vol0)
    _check_invariants(cm3)
    # level-2 elements are untouched
    assert (cm3.elem_level == 2).sum() == (cm2.elem_level == 2).sum()
    # elemental transfer conserves a volume integral (P0 L2 projection)
    rng = np.random.default_rng(1)
    vals = rng.random((cm2.mesh.n_elems, 1))
    tv = transfer(vals)
    assert np.isclose((tv[:, 0] * _tet_volumes(cm3.mesh)).sum(),
                      (vals[:, 0] * _tet_volumes(cm2.mesh)).sum())


def test_refine_and_coarsen_combined():
    """refine_and_coarsen applies both flag sets in libMesh order with
    composed transfers; a linear field rides the nodal transfer
    exactly."""
    mesh = box_tet_mesh(4, 4, 4)
    res = ConstrainedMesh(mesh).refine(_center_flags(mesh, 0.2))
    cm1 = res.constrained
    # coarsen the refined center back, refine a corner region instead
    cent = cm1.mesh.coords[cm1.mesh.connectivity].mean(axis=1)
    rflags = np.linalg.norm(cent, axis=1) < 0.35
    cflags = cm1.elem_level == 1
    out = cm1.refine_and_coarsen(rflags & ~cflags, cflags)
    assert out is not None
    cm2 = out.constrained
    _check_invariants(cm2)
    assert np.isclose(_tet_volumes(cm2.mesh).sum(),
                      _tet_volumes(mesh).sum())
    # linear fields are exact under P1 prolongation/restriction
    def lin(m):
        return (m.coords @ np.array([1.0, -2.0, 0.5]))[:, None] + 3.0
    up = out.prolong(lin(cm1.mesh))
    assert np.allclose(up, lin(cm2.mesh), atol=1e-12)
    ve = out.transfer_elemental(np.ones((cm1.mesh.n_elems, 2)))
    assert ve.shape[0] == cm2.mesh.n_elems and np.allclose(ve, 1.0)


def test_coarsen_max_level_cap():
    """refine honors max_level (libMesh max_h_level)."""
    mesh = box_tet_mesh(3, 3, 3)
    cm = ConstrainedMesh(mesh)
    res = cm.refine(np.ones(mesh.n_elems, bool), max_level=1)
    cm1 = res.constrained
    assert (cm1.elem_level == 1).all()
    # a second uniform pass at max_level=1 is a no-op
    assert cm1.refine(np.ones(cm1.mesh.n_elems, bool), max_level=1) is None


def _pihna_params():
    from rdcfes_tpu.models.pihna import default_params

    Kk = 2.39e5
    p = default_params()
    p.update(dt=0.1, cells_min_capacity=1.0, cells_max_capacity=Kk,
             cells_max_capacity_exponent=3.0, cytokines_max_capacity=1e-8,
             necrosis_c=500 / Kk, necrosis_h=200 / Kk, necrosis_v=300 / Kk,
             produce_c=-2.5, switch_c2h=1.0, switch_h2c=1.82,
             switch_h2n=0.5, diffuse_v=0.5, produce_v=10.0,
             secrete_a_c=2.77e-13, secrete_a_h=5.22e-10, decay_a=5678.4)
    return {k: float(v) for k, v in p.items()}


@pytest.mark.parametrize("fast", ["off", "interpret"])
def test_constrained_step_matches_dense_reduced_solve(fast):
    """One constrained CN step == the dense scipy solve of C^T A C on
    master dofs (the libMesh constrained-system semantics)."""
    import scipy.sparse as sps

    from rdcfes_tpu.models.pihna import pihna_blocks, pihna_physics
    from rdcfes_tpu.systems import TransientRDCSystem

    mesh0 = box_tet_mesh(3, 3, 3, bounds=((0, 30.0),) * 3)
    res = ConstrainedMesh(mesh0).refine(_center_flags(mesh0, 0.2))
    cm = res.constrained
    mesh = cm.mesh
    cons = cm.constraints
    assert len(cons)
    params = _pihna_params()

    rng = np.random.default_rng(0)
    V, N = 5, mesh.n_nodes
    u0 = np.abs(rng.random((N, V))) * np.array([1.0, 100., 50., 500., 1e-10])
    # consistent initial condition on hanging dofs
    u0[cons[:, 0]] = 0.5 * (u0[cons[:, 1]] + u0[cons[:, 2]])

    system = TransientRDCSystem(mesh, V, pihna_physics,
                                physics_blocks=pihna_blocks,
                                precision="mixed", constraints=cons,
                                fast_gather=fast)
    state, iters, resid = system.step(system.initial_state(u0),
                                      params=params)
    u_raw = np.asarray(state["u_raw"])  # pre-clamp solver output

    # dense reference: unconstrained A, b from the materialized path
    values, b = system.assemble(jnp.asarray(u0.T), {}, params)
    values, b = np.asarray(values), np.asarray(b)
    sp = system.sp
    blocks = [[sps.csr_matrix(
        (values[v, w], (sp.rows, sp.cols)), shape=(N, N))
        for w in range(V)] for v in range(V)]
    A = sps.bmat(blocks, format="csr")
    rhs = b.reshape(V * N)

    # C embedding: identity on masters, (1/2, 1/2) rows on hanging
    Cn = sps.lil_matrix((N, N))
    master = np.ones(N, bool)
    master[cons[:, 0]] = False
    for i in np.nonzero(master)[0]:
        Cn[i, i] = 1.0
    for hh, aa, bb in cons:
        Cn[hh, aa] = 0.5
        Cn[hh, bb] = 0.5
    Cn = Cn.tocsr()
    C = sps.block_diag([Cn] * V, format="csr")
    Ac = (C.T @ A @ C).tolil()
    bc = C.T @ rhs
    for v in range(V):
        for hh in cons[:, 0]:
            Ac[v * N + hh, v * N + hh] = 1.0
            bc[v * N + hh] = 0.0
    # equilibrate before the direct solve: the variable scales span ~13
    # orders (cells ~1e5 vs cytokines ~1e-10) and raw LU loses the tiny
    # variable to ~1e-7 relative.  Column-scale by the per-variable
    # solution magnitudes, then row-equilibrate, then dense solve — a
    # trustworthy ~1e-12 reference at this size (V*N ~ 1.5k)
    svar = np.abs(u0).max(axis=0) + 1e-30
    Scol = np.concatenate([np.full(N, s) for s in svar])
    Ad = Ac.toarray() * Scol[None, :]
    rrow = 1.0 / (np.abs(Ad).max(axis=1) + 1e-300)
    y = np.linalg.solve(Ad * rrow[:, None], bc * rrow)
    x = y * Scol
    u_ref = (C @ x).reshape(V, N).T
    # re-derive hanging rows the way the system does
    u_ref[cons[:, 0]] = 0.5 * (u_ref[cons[:, 1]] + u_ref[cons[:, 2]])

    scale = np.abs(u_ref).max(axis=0) + 1e-30
    rel = np.abs(u_raw - u_ref).max(axis=0) / scale
    assert rel.max() < 1e-8, rel


def test_constrained_amr_checkpoint_resume(tmp_path, monkeypatch):
    """Resume after 1to8 AMR restores the hanging-node constraints: the
    resumed trajectory matches the uninterrupted one (the refined mesh is
    nonconforming — an unconstrained resume would diverge)."""
    import os
    import shutil

    from rdcfes_tpu import cases
    from rdcfes_tpu.drivers import pihna

    monkeypatch.chdir(tmp_path)
    cases.make_pihna_case(".", n=4, n_steps=6)
    deck = open("input.dat").read()
    deck = deck.replace("output_step = 10", "output_step = 1")
    deck += ("refinement_step = 2\nmesh/AMR/max_steps = 1\n"
             "mesh/AMR/strategy = 1to8\ncheckpoint/step = 4\n")
    open("input.dat", "w").write(deck)
    outdir = pihna.run("input.dat")
    full_csv = open(os.path.join(outdir, "output.csv")).read()
    assert os.path.exists(os.path.join(outdir, "checkpoint_mesh.msh"))
    import numpy as np
    ck = np.load(os.path.join(outdir, "checkpoint.npz"))
    if "constraints" not in ck:
        import pytest
        pytest.skip("case refined without hanging nodes")

    # regenerate the step-4 checkpoint, then resume for the last 2 steps
    deck_short = deck.replace("time_step_number = 6", "time_step_number = 4")
    shutil.rmtree(outdir)
    open("input.dat", "w").write(deck_short)
    pihna.run("input.dat")
    open("input.dat", "w").write(
        deck + f"checkpoint/resume = {outdir}/checkpoint.npz\n")
    out2 = pihna.run("input.dat")
    resumed_csv = open(os.path.join(out2, "output.csv")).read()
    assert full_csv.splitlines()[-1] == resumed_csv.splitlines()[-1]


def test_constrained_run_steps_matches_step():
    """run_steps (scan path) with constraints == per-step stepping,
    including the stale-preconditioner reuse schedule."""
    from rdcfes_tpu.models.pihna import pihna_blocks, pihna_physics
    from rdcfes_tpu.systems import TransientRDCSystem

    mesh0 = box_tet_mesh(3, 3, 3, bounds=((0, 30.0),) * 3)
    res = ConstrainedMesh(mesh0).refine(_center_flags(mesh0, 0.2))
    cm = res.constrained
    cons = cm.constraints
    params = _pihna_params()
    rng = np.random.default_rng(1)
    u0 = np.abs(rng.random((cm.mesh.n_nodes, 5))) * \
        np.array([1.0, 100.0, 50.0, 500.0, 1e-10])
    u0[cons[:, 0]] = 0.5 * (u0[cons[:, 1]] + u0[cons[:, 2]])

    kw = dict(physics_blocks=pihna_blocks, precision="mixed",
              precond_refresh=2, constraints=cons)
    s1 = TransientRDCSystem(cm.mesh, 5, pihna_physics, fast_gather="off",
                            **kw)
    st1, _, _ = s1.run_steps(s1.initial_state(u0), 5, params=params)
    s2 = TransientRDCSystem(cm.mesh, 5, pihna_physics, fast_gather="off",
                            **kw)
    st2 = s2.initial_state(u0)
    for _ in range(5):
        st2, _, _ = s2.step(st2, params=params)
    a, b = np.asarray(st1["u"]), np.asarray(st2["u"])
    scale = np.abs(b).max(axis=0) + 1e-30
    assert (np.abs(a - b).max(axis=0) / scale).max() < 1e-10
    # the constraint holds in the final state
    h, aa, bb = cons[:, 0], cons[:, 1], cons[:, 2]
    assert np.allclose(a[h], 0.5 * (a[aa] + a[bb]), rtol=0, atol=1e-12)


def test_frozen_veto_owner_oscillation_fixpoint():
    """An element that OWNS a (non-frozen) hanging edge while HOLDING a
    frozen hanging node used to oscillate through the grow/veto closure
    (re-added by the owner rule, re-vetoed as a frozen holder each
    pass) and could exit at the iteration cap with a holder still
    flagged, whose refinement would chain constraints.  The veto
    fixpoint must instead cascade the veto to the flagged holder and
    return None (advisor r4 finding)."""
    from rdcfes_tpu.mesh.core import Mesh

    coords = np.array([
        [0.0, 0, 0], [1, 0, 0], [0.5, 0.5, 0], [0.5, 0, 1],   # elem X
        [2.0, 0, 0], [3, 0, 0], [2.5, 1, 0], [2.5, 0, 1],     # elem Y
        [0.0, 2, 0], [1, 2, 0],                               # frozen edge
    ])
    # X = elem 0: contains edge (0,1) -- the coarse owner of hanging
    # node 4 -- and holds node 2, which hangs on the FROZEN edge (8,9)
    # (its owner lives in a transition block outside this TET4 mesh).
    # Y = elem 1: flagged, holds hanging node 4.
    conn = np.array([[0, 1, 2, 3], [4, 5, 6, 7]], dtype=np.int32)
    mesh = Mesh(coords=coords, connectivity=conn, elem_type="TET4",
                subdomain_id=np.zeros(2, dtype=np.int32))
    cm = ConstrainedMesh(mesh,
                         hanging={(0, 1): 4, (8, 9): 2},
                         frozen_edges=frozenset({(8, 9)}))
    flags = np.array([False, True])
    assert cm.refine(flags) is None
