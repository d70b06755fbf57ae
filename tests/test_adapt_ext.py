"""TET10 and MIXED selective AMR (mesh/adapt_ext.py) — the last
element-type gates on the AMR surface (reference: libMesh
MeshRefinement is element-type generic, src/pihna.C:805-840)."""

import numpy as np
import jax.numpy as jnp

from rdcfes_tpu.mesh import box_mixed_mesh, box_tet_mesh
from rdcfes_tpu.mesh.adapt_ext import (
    MixedConstrained,
    Tet10Adaptive,
    kelly_mixed,
    quadratic_transfer,
    tet10_skeleton,
)
from rdcfes_tpu.mesh.generators import tet4_to_tet10


def _quad_poly(X):
    """A full quadratic polynomial — exactly representable in the TET10
    FE space, so transfer must reproduce it to roundoff."""
    x, y, z = X[:, 0], X[:, 1], X[:, 2]
    return (2.0 * x**2 + 3.0 * x * y - z**2 + 0.5 * y * z
            + x - 2.0 * y + 0.25 * z + 1.0)


def _center_flags(coords, conn, frac=0.25):
    cent = coords[conn[:, :4]].mean(axis=1)
    mid = coords.mean(axis=0)
    r = np.linalg.norm(cent - mid, axis=1)
    return r <= np.quantile(r, frac)


def _pihna_params():
    from rdcfes_tpu.models.pihna import default_params

    Kk = 2.39e5
    p = default_params()
    p.update(dt=0.1, cells_min_capacity=1.0, cells_max_capacity=Kk,
             cells_max_capacity_exponent=3.0, cytokines_max_capacity=1e-8,
             necrosis_c=500 / Kk, necrosis_h=200 / Kk, necrosis_v=300 / Kk,
             produce_c=-2.5, switch_c2h=1.0, switch_h2c=1.82,
             switch_h2n=0.5, diffuse_c=0.5, taxis_c=2e-5, diffuse_h=1.0,
             taxis_h=4e-5, diffuse_v=0.5, taxis_v=1e-4, produce_v=10.0,
             secrete_a_c=2.77e-13, secrete_a_h=5.22e-10, uptake_a_v=1e-3,
             decay_a=5678.4)
    return {k: float(v) for k, v in p.items()}


def test_tet10_skeleton_roundtrip():
    m4 = box_tet_mesh(3, 3, 3, bounds=((0, 2.0),) * 3)
    m10 = tet4_to_tet10(m4)
    skel, corner_ids = tet10_skeleton(m10)
    assert skel.n_elems == m10.n_elems
    # corner geometry identical, boundary ids carried over
    np.testing.assert_array_equal(skel.coords,
                                  m10.coords[corner_ids])
    assert sorted(np.unique(skel.boundary_id)) == sorted(
        np.unique(m10.boundary_id))


def test_tet10_refine_quadratic_exact():
    """Selective TET10 refinement transfers any second-order field
    EXACTLY (libMesh embedding-prolongation semantics), conserves
    volume, and produces a conforming mesh (no constraints)."""
    m10 = tet4_to_tet10(box_tet_mesh(3, 3, 3, bounds=((0, 2.0),) * 3))
    ad = Tet10Adaptive.from_mesh(m10)
    flags = _center_flags(m10.coords, m10.connectivity)
    out = ad.refine_and_coarsen(flags, np.zeros(m10.n_elems, bool))
    assert out is not None
    new = out.mesh
    assert new.elem_type == "TET10" and new.n_elems > m10.n_elems
    # volume conserved
    v0 = np.abs(m10.element_volumes()).sum()
    v1 = np.abs(new.element_volumes()).sum()
    assert abs(v0 - v1) < 1e-12 * v0
    # quadratic exactness of the transfer
    u_old = _quad_poly(m10.coords)
    u_new = out.prolong(u_old)
    np.testing.assert_allclose(u_new, _quad_poly(new.coords),
                               rtol=0, atol=1e-10)
    # multi-field shape passes through
    u2 = np.stack([u_old, 2.0 * u_old], axis=1)
    assert out.prolong(u2).shape == (new.n_nodes, 2)
    # elemental restriction maps parents to children
    sub = out.restrict_elemental(m10.subdomain_id)
    assert sub.shape == (new.n_elems,)


def test_tet10_refine_then_coarsen_recovers():
    """Coarsening flagged children collapses them and the quadratic
    transfer back stays exact for second-order fields."""
    m10 = tet4_to_tet10(box_tet_mesh(3, 3, 3, bounds=((0, 2.0),) * 3))
    ad = Tet10Adaptive.from_mesh(m10)
    flags = np.zeros(m10.n_elems, bool)
    flags[:4] = True
    out = ad.refine_and_coarsen(flags, np.zeros(m10.n_elems, bool))
    new, ad2 = out.mesh, out.adaptive
    # coarsen everything refinable
    out2 = ad2.refine_and_coarsen(np.zeros(new.n_elems, bool),
                                  np.ones(new.n_elems, bool))
    assert out2 is not None
    back = out2.mesh
    assert back.n_elems < new.n_elems
    u = out2.prolong(_quad_poly(new.coords))
    np.testing.assert_allclose(u, _quad_poly(back.coords),
                               rtol=0, atol=1e-10)


def test_tet10_kelly_indicator_runs():
    """Kelly on TET10: face-center gradients from the quadratic basis;
    a linear field has zero flux jump everywhere."""
    from rdcfes_tpu.fem.amr import kelly_error_indicator

    m10 = tet4_to_tet10(box_tet_mesh(3, 3, 3, bounds=((0, 2.0),) * 3))
    lin = (m10.coords @ np.array([1.0, -2.0, 0.5]))[:, None]
    eta = kelly_error_indicator(m10, jnp.asarray(lin), [0])
    assert eta.shape == (m10.n_elems,)
    assert np.abs(eta).max() < 1e-12
    quad = _quad_poly(m10.coords)[:, None]
    eta2 = kelly_error_indicator(m10, jnp.asarray(quad), [0])
    assert eta2.max() > 0


def test_mixed_constrained_refine_topology():
    """Refining TET4 elements against frozen transition blocks: interface
    mid-edge nodes hang, constraint masters are never hanging (no
    chains), frozen blocks' connectivity survives, and the level-one
    closure vetoes instead of splitting frozen blocks."""
    mm = box_mixed_mesh(5, 3, 3, bounds=((0, 2.0),) * 3)
    mc = MixedConstrained.from_mesh(mm)
    # flag every TET4 element adjacent to the transition layer: force
    # interface hangs
    off = 0
    for i, b in enumerate(mm.blocks):
        if i == mc.tet_idx:
            break
        off += b.n_elems
    tb = mm.blocks[mc.tet_idx]
    frozen_nodes = set()
    for i, b in enumerate(mm.blocks):
        if i != mc.tet_idx:
            frozen_nodes |= set(np.unique(b.connectivity).tolist())
    touches = np.array([
        bool(frozen_nodes & set(c.tolist())) for c in tb.connectivity])
    flags = np.zeros(mm.n_elems, bool)
    flags[off:off + tb.n_elems] = touches
    out = mc.refine_and_coarsen(flags, np.zeros(mm.n_elems, bool))
    assert out is not None
    cons = out.constraints
    assert len(cons)  # interface mids hang against frozen blocks
    masters = set(cons[:, 1].tolist()) | set(cons[:, 2].tolist())
    hangs = set(cons[:, 0].tolist())
    assert not masters & hangs, "chained constraint"
    # frozen blocks unchanged (no coarsening happened -> ids stable)
    for i, b in enumerate(out.mesh.blocks):
        if i != mc.tet_idx:
            np.testing.assert_array_equal(
                b.connectivity, mm.blocks[i].connectivity)
    # volume conserved
    assert abs(out.mesh.element_volumes().sum()
               - mm.element_volumes().sum()) < 1e-12
    # second pass: flag children holding frozen-hanging corners -> veto
    # keeps constraints un-chained
    mc2 = out.adaptive
    flags2 = np.ones(out.mesh.n_elems, bool)
    out2 = mc2.refine_and_coarsen(flags2,
                                  np.zeros(out.mesh.n_elems, bool))
    if out2 is not None:
        c2 = out2.constraints
        m2 = set(c2[:, 1].tolist()) | set(c2[:, 2].tolist())
        assert not m2 & set(c2[:, 0].tolist())


def test_mixed_constrained_step_matches_dense_reduced_solve():
    """One constrained mixed CN step == the equilibrated dense solve of
    C^T A C on master dofs (the VERDICT r3 item-5 acceptance check)."""
    import scipy.sparse as sps

    from rdcfes_tpu.models.pihna import pihna_physics
    from rdcfes_tpu.systems import MixedTransientRDCSystem

    mm = box_mixed_mesh(4, 2, 2, bounds=((0, 30.0),) * 3)
    mc = MixedConstrained.from_mesh(mm)
    flags = _center_flags(
        mm.coords,
        np.concatenate([b.connectivity[:, :4] for b in mm.blocks]),
        frac=0.3)
    out = mc.refine_and_coarsen(flags, np.zeros(mm.n_elems, bool))
    assert out is not None and len(out.constraints)
    mesh, cons = out.mesh, out.constraints

    p = _pihna_params()
    V, N = 5, mesh.n_nodes
    rng = np.random.default_rng(0)
    u0 = np.abs(rng.random((N, V))) * np.array([1., 100., 50., 500., 1e-10])
    u0[cons[:, 0]] = 0.5 * (u0[cons[:, 1]] + u0[cons[:, 2]])

    sys_ = MixedTransientRDCSystem(mesh, V, pihna_physics,
                                   precision="mixed", constraints=cons)
    st, _, res = sys_.step(sys_.initial_state(u0), params=p)
    assert float(res) < 1e-8
    u_raw = np.asarray(st["u_raw"])

    A, rhs = sys_.assemble_scipy(u0.T, {}, p)
    Cn = sps.lil_matrix((N, N))
    master = np.ones(N, bool)
    master[cons[:, 0]] = False
    for i in np.nonzero(master)[0]:
        Cn[i, i] = 1.0
    for hh, aa, bb in cons:
        Cn[hh, aa] = 0.5
        Cn[hh, bb] = 0.5
    C = sps.block_diag([Cn.tocsr()] * V, format="csr")
    Ac = (C.T @ A @ C).tolil()
    bc = C.T @ rhs
    for v in range(V):
        for hh in cons[:, 0]:
            Ac[v * N + hh, v * N + hh] = 1.0
            bc[v * N + hh] = 0.0
    svar = np.abs(u0).max(axis=0) + 1e-30
    Scol = np.concatenate([np.full(N, s) for s in svar])
    Ad = Ac.toarray() * Scol[None, :]
    rrow = 1.0 / (np.abs(Ad).max(axis=1) + 1e-300)
    y = np.linalg.solve(Ad * rrow[:, None], bc * rrow)
    u_ref = ((C @ (y * Scol)).reshape(V, N)).T
    u_ref[cons[:, 0]] = 0.5 * (u_ref[cons[:, 1]] + u_ref[cons[:, 2]])
    scale = np.abs(u_ref).max(axis=0) + 1e-30
    rel = np.abs(u_raw - u_ref).max(axis=0) / scale
    assert rel.max() < 1e-8, rel


def test_kelly_mixed_runs():
    mm = box_mixed_mesh(5, 3, 3, bounds=((0, 2.0),) * 3)
    u = _quad_poly(mm.coords)[:, None]
    eta = kelly_mixed(mm, jnp.asarray(u), [0])
    assert eta.shape == (mm.n_elems,)
    # only the TET4 block reports nonzero
    off = 0
    for i, b in enumerate(mm.blocks):
        seg = eta[off:off + b.n_elems]
        if b.elem_type == "TET4":
            assert seg.max() > 0
        else:
            assert np.all(seg == 0)
        off += b.n_elems


import os
import pytest


@pytest.fixture
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _amr_driver_case(order=1, mixed=False):
    from rdcfes_tpu import cases

    cases.make_pihna_case(".", n=4, n_steps=4, mixed=mixed, order=order)
    deck = open("input.dat").read().replace("output_step = 10",
                                            "output_step = 4")
    deck += ("refinement_step = 2\nmesh/AMR/max_steps = 1\n"
             "mesh/AMR/refine_percentage = 0.5\n")
    open("input.dat", "w").write(deck)


def test_pihna_driver_tet10_amr(in_tmp):
    """The driver's AMR block refines TET10 meshes (VERDICT r3 item 5:
    the 'do not refine' gate is gone): element count grows, the run
    completes, outputs stay finite."""
    from rdcfes_tpu.drivers import pihna

    _amr_driver_case(order=2)
    out = pihna.run("input.dat")
    csv = open(os.path.join(out, "output.csv")).read().splitlines()
    vals = np.array(csv[-1].split(","), dtype=float)
    assert np.isfinite(vals).all() and (vals >= 0).all()


def test_pihna_driver_mixed_amr(in_tmp):
    """Driver AMR on a MIXED mesh: the TET4 block refines with hanging
    nodes against the frozen transition blocks; the constrained system
    carries the run to completion."""
    from rdcfes_tpu.drivers import pihna

    _amr_driver_case(mixed=True)
    out = pihna.run("input.dat")
    csv = open(os.path.join(out, "output.csv")).read().splitlines()
    vals = np.array(csv[-1].split(","), dtype=float)
    assert np.isfinite(vals).all() and (vals >= 0).all()


def test_pihna_driver_mixed_amr_multichip(in_tmp):
    """Multi-chip MIXED AMR (VERDICT r4 item 8 tail): the refined
    constrained system reshards by rebuilding through the halo plan's
    constraint closure — the 8-device run completes and matches the
    single-chip CSV at output precision."""
    import jax

    from rdcfes_tpu.drivers import pihna

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-virtual-device CPU platform")
    _amr_driver_case(mixed=True)
    out1 = pihna.run("input.dat")
    csv1 = open(os.path.join(out1, "output.csv")).read()
    deck = open("input.dat").read() + "parallel/n_devices = 8\n"
    open("input.dat", "w").write(deck)
    out8 = pihna.run("input.dat")
    csv8 = open(os.path.join(out8, "output.csv")).read()
    assert csv8 == csv1
