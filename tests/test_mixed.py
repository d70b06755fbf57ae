"""Mixed-element-type meshes: PRISM6/PYRAMID5 reference elements, the
MixedMesh container, Gmsh mixed IO, the per-type-block transient system,
and the PIHNA driver end-to-end.

libMesh reads arbitrary mixed Gmsh meshes and the reference's writer
maps 16 element types (reference src/paraview.h:210-234); this is the
TPU-native equivalent: per-type static-shape blocks summed into one
global operator (systems/mixed.py).
"""

import collections
import os

import numpy as np
import pytest

from rdcfes_tpu.fem import elements as el
from rdcfes_tpu.mesh import (MeshBlock, MixedMesh, box_mixed_mesh,
                             box_tet_mesh, gmsh)


@pytest.fixture
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _duffy_rule(et, n=16):
    """High-order exact reference rule via collapsed-coordinate maps."""
    g, w = np.polynomial.legendre.leggauss(n)
    pts, wts = [], []
    if et == "PRISM6":
        a = (g + 1) / 2
        wa = w / 2
        for i, ai in enumerate(a):
            for j, bj in enumerate(a):
                for k, zk in enumerate(g):
                    pts.append([ai, bj * (1 - ai), zk])
                    wts.append(wa[i] * wa[j] * (1 - ai) * w[k])
    else:  # PYRAMID5
        zq = (g + 1) / 2
        wz = w / 2
        for i, ai in enumerate(g):
            for j, bj in enumerate(g):
                for k, zk in enumerate(zq):
                    pts.append([ai * (1 - zk), bj * (1 - zk), zk])
                    wts.append(w[i] * w[j] * wz[k] * (1 - zk) ** 2)
    return np.array(pts), np.array(wts)


@pytest.mark.parametrize("et,vol,nodes", [
    ("PRISM6", 1.0,
     np.array([[0, 0, -1], [1, 0, -1], [0, 1, -1],
               [0, 0, 1], [1, 0, 1], [0, 1, 1]], float)),
    ("PYRAMID5", 4.0 / 3.0,
     np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0],
               [-1, 1, 0], [0, 0, 1]], float)),
])
def test_transition_reference_elements(et, vol, nodes):
    """Shape functions are nodal-Kronecker / partition-of-unity and the
    8-point conical rules integrate mass AND stiffness of the (rational,
    for pyramids) first-order basis exactly."""
    pts, wts = el.quadrature(et)
    assert np.isclose(wts.sum(), vol)
    phi = el.shape_functions(et, pts)
    assert np.allclose(phi.sum(axis=1), 1.0)
    assert np.allclose(el.shape_gradients(et, pts).sum(axis=1), 0.0,
                       atol=1e-13)
    assert np.allclose(el.shape_functions(et, nodes), np.eye(len(nodes)),
                       atol=1e-14)
    assert np.isfinite(el.shape_gradients(et, nodes)).all()  # apex guard
    P, W = _duffy_rule(et)
    phir = el.shape_functions(et, P)
    Mq = np.einsum("qi,qj,q->ij", phi, phi, wts)
    Mr = np.einsum("qi,qj,q->ij", phir, phir, W)
    assert np.abs(Mq - Mr).max() < 1e-13
    gq = el.shape_gradients(et, pts)
    gr = el.shape_gradients(et, P)
    Kq = np.einsum("qid,qjd,q->ij", gq, gq, wts)
    Kr = np.einsum("qid,qjd,q->ij", gr, gr, W)
    assert np.abs(Kq - Kr).max() < 1e-12
    # finite-difference gradient check at interior points
    rng = np.random.default_rng(0)
    if et == "PRISM6":
        Pt = np.stack([rng.uniform(0.05, 0.4, 5), rng.uniform(0.05, 0.4, 5),
                       rng.uniform(-0.8, 0.8, 5)], axis=1)
    else:
        z = rng.uniform(0.05, 0.8, 5)
        Pt = np.stack([rng.uniform(-0.8, 0.8, 5) * (1 - z),
                       rng.uniform(-0.8, 0.8, 5) * (1 - z), z], axis=1)
    h = 1e-6
    g = el.shape_gradients(et, Pt)
    for d in range(3):
        Pp, Pm = Pt.copy(), Pt.copy()
        Pp[:, d] += h
        Pm[:, d] -= h
        fd = (el.shape_functions(et, Pp) - el.shape_functions(et, Pm)) / (2 * h)
        assert np.allclose(g[:, :, d], fd, atol=1e-6)


def test_box_mixed_mesh_conforming():
    """The HEX | PYRAMID+TET | TET box is globally conforming (every face
    shared by exactly 1 or 2 elements), positively oriented, and carries
    the cube boundary-id convention."""
    from rdcfes_tpu.mesh.core import _padded_faces

    m = box_mixed_mesh(5, 3, 3)
    census = {b.elem_type for b in m.blocks}
    assert census == {"HEX8", "PYRAMID5", "TET4"}
    vols = m.element_volumes()
    assert (vols > 0).all() and np.isclose(vols.sum(), 1.0)
    keys = np.concatenate([
        np.sort(_padded_faces(b.connectivity, b.elem_type),
                axis=-1).reshape(-1, 4) for b in m.blocks])
    _, counts = np.unique(keys, axis=0, return_counts=True)
    assert set(counts.tolist()) <= {1, 2}
    assert set(m.boundary_id.tolist()) == {0, 1, 2, 3, 4, 5}


def test_gmsh_mixed_roundtrip(tmp_path):
    m = box_mixed_mesh(5, 3, 3)
    p = str(tmp_path / "mixed.msh")
    gmsh.write(m, p)
    m2 = gmsh.read(p)
    assert m2.elem_type == "MIXED"
    assert m2.n_nodes == m.n_nodes and m2.n_elems == m.n_elems
    assert (sorted((b.elem_type, b.n_elems) for b in m.blocks)
            == sorted((b.elem_type, b.n_elems) for b in m2.blocks))
    assert (collections.Counter(m.boundary_id.tolist())
            == collections.Counter(m2.boundary_id.tolist()))
    # single-type files still come back as the classic Mesh (native path)
    t = box_tet_mesh(3, 3, 3)
    pt = str(tmp_path / "t.msh")
    gmsh.write(t, pt)
    t2 = gmsh.read(pt)
    assert type(t2).__name__ == "Mesh" and t2.elem_type == "TET4"


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


def test_mixed_step_matches_direct_solve():
    """One MixedTransientRDCSystem step == the equilibrated dense solve of
    the block-summed operator (each block's element matrices are the
    oracle-validated single-type kernels; this validates the cross-block
    summation)."""
    from rdcfes_tpu.models.pihna import pihna_physics
    from rdcfes_tpu.systems import MixedTransientRDCSystem

    mesh = box_mixed_mesh(5, 3, 3, bounds=((0, 30.0),) * 3)
    p = _pihna_params()
    N, V = mesh.n_nodes, 5
    rng = np.random.default_rng(0)
    u0 = np.abs(rng.random((N, V))) * np.array([1., 100., 50., 500., 1e-10])

    sys_ = MixedTransientRDCSystem(mesh, V, pihna_physics, precision="mixed")
    st, iters, res = sys_.step(sys_.initial_state(u0), params=p)
    assert float(res) < 1e-10
    u_raw = np.asarray(st["u_raw"])

    A, rhs = sys_.assemble_scipy(u0.T, {}, p)
    svar = np.abs(u0).max(axis=0) + 1e-30
    Scol = np.concatenate([np.full(N, s) for s in svar])
    Ad = A.toarray() * Scol[None, :]
    rrow = 1.0 / (np.abs(Ad).max(axis=1) + 1e-300)
    y = np.linalg.solve(Ad * rrow[:, None], rhs * rrow)
    u_ref = (y * Scol).reshape(V, N).T
    scale = np.abs(u_ref).max(axis=0) + 1e-30
    rel = np.abs(u_raw - u_ref).max(axis=0) / scale
    assert rel.max() < 1e-8, rel


def test_mixed_single_block_matches_transient_system():
    """A MixedMesh holding one TET4 block reproduces TransientRDCSystem on
    the same mesh bit-for-bit in math (same kernels, same solver), and a
    two-block split of the same elements matches too — the summation over
    blocks is exact."""
    from rdcfes_tpu.models.pihna import pihna_physics
    from rdcfes_tpu.systems import MixedTransientRDCSystem, TransientRDCSystem

    t = box_tet_mesh(4, 4, 4, bounds=((0, 30.0),) * 3)
    p = _pihna_params()
    N, V = t.n_nodes, 5
    rng = np.random.default_rng(1)
    u0 = np.abs(rng.random((N, V))) * np.array([1., 100., 50., 500., 1e-10])

    ref = TransientRDCSystem(t, V, pihna_physics)
    st_r = ref.initial_state(u0)

    one = MixedMesh(coords=t.coords, blocks=[
        MeshBlock("TET4", t.connectivity, t.subdomain_id)])
    two = MixedMesh(coords=t.coords, blocks=[
        MeshBlock("TET4", t.connectivity[::2], t.subdomain_id[::2]),
        MeshBlock("TET4", t.connectivity[1::2], t.subdomain_id[1::2])])
    for mm in (one, two):
        sys_ = MixedTransientRDCSystem(mm, V, pihna_physics)
        st = sys_.initial_state(u0)
        st_r2 = dict(st_r)
        for _ in range(3):
            st, _, _ = sys_.step(st, params=p)
            st_r2, _, _ = ref.step(st_r2, params=p)
        a, b = np.asarray(st["u"]), np.asarray(st_r2["u"])
        scale = np.abs(b).max(axis=0) + 1e-30
        assert (np.abs(a - b).max(axis=0) / scale).max() < 1e-9


def test_mixed_vtu_and_nodal_projection(tmp_path):
    from rdcfes_tpu.io.vtu import elemental_to_nodal, write_vtu

    m = box_mixed_mesh(4, 3, 3)
    # constant elemental field projects to the same nodal constant
    nod = elemental_to_nodal(m, np.full(m.n_elems, 7.0))
    assert np.allclose(nod, 7.0)
    path = str(tmp_path / "m.vtu")
    write_vtu(path, m, [("f", np.arange(m.n_nodes, dtype=float))])
    txt = open(path).read()
    types = txt.split('Name="types"')[1].split(">")[1].split("<")[0].split()
    cnt = collections.Counter(types)
    for b in m.blocks:
        code = {"TET4": "10", "HEX8": "12",
                "PRISM6": "13", "PYRAMID5": "14"}[b.elem_type]
        assert cnt[code] == b.n_elems
    offs = txt.split('Name="offsets"')[1].split(">")[1].split("<")[0].split()
    assert int(offs[-1]) == sum(
        b.n_elems * b.connectivity.shape[1] for b in m.blocks)


def test_pihna_driver_mixed_mesh(in_tmp):
    """End-to-end: generated mixed-mesh PIHNA case through the real
    driver — CSV metrics, VTU frames with heterogeneous cell types."""
    import glob

    from rdcfes_tpu import cases
    from rdcfes_tpu.drivers import pihna

    cases.make_pihna_case(".", n=4, n_steps=2, mixed=True)
    deck = open("input.dat").read().replace("output_step = 10",
                                            "output_step = 2")
    open("input.dat", "w").write(deck)
    out = pihna.run("input.dat")
    csv = open(os.path.join(out, "output.csv")).read().splitlines()
    vals = np.array(csv[-1].split(","), dtype=float)
    assert np.isfinite(vals).all() and (vals >= 0).all()
    vtu = sorted(glob.glob(os.path.join(out, "*.vtu")))
    assert vtu
    txt = open(vtu[-1]).read()
    types = set(txt.split('Name="types"')[1].split(">")[1]
                .split("<")[0].split())
    assert {"10", "12", "14"} <= types


def test_exodus_multiblock(tmp_path):
    """MixedMesh exports through ExodusII's native multi-block layout
    (reference export surface: ExodusII_IO(msh).write,
    src/process_mesh.C:169)."""
    from scipy.io import netcdf_file

    from rdcfes_tpu.io.exodus import write_exodus

    m = box_mixed_mesh(4, 2, 2)
    p = str(tmp_path / "m.ex2")
    write_exodus(p, m, [("f", np.ones(m.n_nodes))])
    f = netcdf_file(p, "r")
    blk = int(f.dimensions["num_el_blk"])
    assert blk == len(m.blocks)
    total = sum(int(f.dimensions[f"num_el_in_blk{i}"])
                for i in range(1, blk + 1))
    assert total == m.n_elems
    types = {f.variables[f"connect{i}"].elem_type for i in range(1, blk + 1)}
    assert types == {b"HEX8", b"PYRAMID5", b"TETRA4"}
    f.close()


def test_transform_mixed():
    """process_mesh's scale/translate/rotate path works on MixedMesh."""
    from rdcfes_tpu.mesh import transform

    m = box_mixed_mesh(4, 2, 2)
    m2 = transform.transform_mesh(m, scale=2.0, translate=(1.0, 0, 0),
                                  rotate_deg=(0, 0, 90.0))
    assert m2.elem_type == "MIXED"
    assert np.isclose(m2.element_volumes().sum(), 8.0)


def test_mixed_multichip_matches_single_chip():
    """Mixed meshes run multi-chip through the halo system: one exchange
    plan over the padded concatenation of all blocks, per-type element
    tables, block restrictions summed inside the shard program
    (parallel/halo.py build_mixed_plan / _step_shard_mixed).  3 PIHNA
    steps on the 8-device mesh match MixedTransientRDCSystem, through
    both step() and run_steps()."""
    import jax
    from jax.sharding import Mesh as DeviceMesh

    from rdcfes_tpu.models.pihna import pihna_physics
    from rdcfes_tpu.parallel.halo import HaloShardedSystem
    from rdcfes_tpu.systems import MixedTransientRDCSystem

    mesh = box_mixed_mesh(6, 4, 4, bounds=((0, 30.0),) * 3)
    p = _pihna_params()
    N, V = mesh.n_nodes, 5
    rng = np.random.default_rng(0)
    u0 = np.abs(rng.random((N, V))) * np.array([1., 100., 50., 500., 1e-10])

    ref = MixedTransientRDCSystem(mesh, V, pihna_physics, precision="mixed")
    st_r = ref.initial_state(u0)
    dmesh = DeviceMesh(np.array(jax.devices()), ("d",))
    sys_ = HaloShardedSystem(mesh, V, pihna_physics, dmesh)
    # per-device slab is O(N/D + boundary), not O(N): same scaling
    # contract as the single-type halo system (test_halo.py)
    assert sys_.plan.No_max < mesh.n_nodes // 2
    st = sys_.initial_state(u0)
    for _ in range(3):
        st, it, res = sys_.step(st, params=p)
        st_r, _, _ = ref.step(st_r, params=p)
        assert float(res) < 1e-8
    a, b = sys_.gather(st["u"]), np.asarray(st_r["u"])
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 1e-8, f"mixed halo/single-chip divergence {rel:.3e}"
    # run_steps (per-step dispatch on mixed) reproduces the step() chain
    st2, _, _ = sys_.run_steps(sys_.initial_state(u0), 3, params=p)
    a2 = sys_.gather(st2["u"])
    assert np.linalg.norm(a2 - a) / np.linalg.norm(a) < 1e-12


def _adpm_setup(mesh, seed=3):
    from rdcfes_tpu.models.adpm import default_params

    p = default_params()
    p.update(dt=0.05,
             decay_PrP=1e-4, decay_PrP_pulse0=0.01, decay_PrP_pulse1=10.0,
             taxis1_A_b=50.0, taxis1_A_b_pulse0=-1.0, taxis1_A_b_pulse1=0.01,
             taxis1_Tau=50.0, taxis1_Tau_pulse0=-1.0, taxis1_Tau_pulse1=0.01,
             decay_Tau=10.0, decay_Tau_pulse0=0.0005, decay_Tau_pulse1=1e20,
             diffuse_A_b=2e-4, diffuse_A_b_pulse0=-1.0,
             diffuse_A_b_pulse1=1e20)
    p = {k: float(v) for k, v in p.items()}
    rng = np.random.default_rng(seed)
    N = mesh.n_nodes
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0 = np.stack([np.ones(N), 1e-3 * np.exp(-r2 / (2 * 8.0**2)),
                   1e-4 * np.exp(-r2 / (2 * 6.0**2))], axis=1)
    tracts = rng.standard_normal((mesh.n_elems, 3))
    tracts /= np.linalg.norm(tracts, axis=1, keepdims=True)
    return p, u0, tracts


def test_adpm_mixed_elemental_field_matches_direct_solve():
    """Elemental aux fields (ADPM Tracts, adpm.C:32-37) are sliced per
    block on mixed meshes: one taxis-active step matches the equilibrated
    dense solve of the block-summed operator built with the same split."""
    import jax.numpy as jnp

    from rdcfes_tpu.models.adpm import adpm_physics
    from rdcfes_tpu.systems import MixedTransientRDCSystem

    mesh = box_mixed_mesh(5, 3, 3, bounds=((0, 30.0),) * 3)
    p, u0, tracts = _adpm_setup(mesh)
    fields = {"tracts": jnp.asarray(tracts), "time": 1.0}
    sys_ = MixedTransientRDCSystem(mesh, 3, adpm_physics, precision="mixed")
    st, iters, res = sys_.step(sys_.initial_state(u0), fields=fields,
                               params=p)
    assert float(res) < 1e-10
    u_raw = np.asarray(st["u_raw"])

    N, V = mesh.n_nodes, 3
    A, rhs = sys_.assemble_scipy(u0.T, fields, p)
    svar = np.abs(u0).max(axis=0) + 1e-30
    Scol = np.concatenate([np.full(N, s) for s in svar])
    Ad = A.toarray() * Scol[None, :]
    rrow = 1.0 / (np.abs(Ad).max(axis=1) + 1e-300)
    y = np.linalg.solve(Ad * rrow[:, None], rhs * rrow)
    u_ref = (y * Scol).reshape(V, N).T
    scale = np.abs(u_ref).max(axis=0) + 1e-30
    rel = np.abs(u_raw - u_ref).max(axis=0) / scale
    assert rel.max() < 1e-8, rel


def test_adpm_mixed_multichip_matches_single_chip():
    """Per-block elemental fields ride the mixed halo path as tuples of
    per-shard slabs (shard_elem_field mixed branch)."""
    import jax
    from jax.sharding import Mesh as DeviceMesh

    from rdcfes_tpu.models.adpm import adpm_physics
    from rdcfes_tpu.parallel.halo import HaloShardedSystem
    from rdcfes_tpu.systems import MixedTransientRDCSystem

    mesh = box_mixed_mesh(6, 4, 4, bounds=((0, 30.0),) * 3)
    p, u0, tracts = _adpm_setup(mesh)

    import jax.numpy as jnp
    ref = MixedTransientRDCSystem(mesh, 3, adpm_physics, precision="mixed")
    st_r = ref.initial_state(u0)
    dmesh = DeviceMesh(np.array(jax.devices()), ("d",))
    sys_ = HaloShardedSystem(mesh, 3, adpm_physics, dmesh)
    tf = sys_.shard_elem_field(tracts, axis=0)
    assert isinstance(tf, tuple) and len(tf) == len(mesh.blocks)
    st = sys_.initial_state(u0)
    for _ in range(3):
        st, it, res = sys_.step(st, fields={"tracts": tf},
                                scalars={"time": 1.0}, params=p)
        st_r, _, _ = ref.step(st_r, fields={"tracts": jnp.asarray(tracts),
                                            "time": 1.0}, params=p)
        assert float(res) < 1e-8
    a, b = sys_.gather(st["u"]), np.asarray(st_r["u"])
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 1e-8, f"mixed ADPM halo/single-chip divergence {rel:.3e}"


def test_adpm_driver_mixed_mesh(in_tmp):
    """End-to-end: generated mixed-mesh ADPM case through the real driver
    (tracts IO, per-block CSV quadrature, parcellation columns)."""
    import glob

    from rdcfes_tpu import cases
    from rdcfes_tpu.drivers import adpm

    cases.make_adpm_case(".", n=4, n_steps=2, mixed=True)
    deck = open("input.dat").read().replace("output_step = 20",
                                            "output_step = 2")
    open("input.dat", "w").write(deck)
    out = adpm.run("input.dat")
    csv = open(os.path.join(out, "output.csv")).read().splitlines()
    assert csv[0].count("CONCENTRATION__A_b") == 2  # two parcellations
    vals = np.array(csv[-1].split(","), dtype=float)
    assert np.isfinite(vals).all()
    vtu = sorted(glob.glob(os.path.join(out, "*.vtu")))
    assert vtu
    txt = open(vtu[-1]).read()
    assert "TractX" in txt


def test_mixed_constrained_multichip_matches_single_chip():
    """8-virtual-device constrained MIXED step == single-chip (VERDICT r4
    item 8): the halo plan closes its ghost sets over constraint
    endpoints on the padded block concatenation (build_mixed_plan), and
    _step_shard_mixed folds C^T locally — so the distributed C^T A C
    solve matches MixedTransientRDCSystem at 1e-8 and the constraint
    holds exactly in every gathered state."""
    import jax
    from jax.sharding import Mesh as DeviceMesh

    from rdcfes_tpu.mesh.adapt_ext import MixedConstrained
    from rdcfes_tpu.models.pihna import pihna_physics
    from rdcfes_tpu.parallel.halo import HaloShardedSystem
    from rdcfes_tpu.systems import MixedTransientRDCSystem

    mm = box_mixed_mesh(6, 4, 4, bounds=((0, 30.0),) * 3)
    mc = MixedConstrained.from_mesh(mm)
    conn_all = np.concatenate([b.connectivity[:, :4] for b in mm.blocks])
    cent = mm.coords[conn_all].mean(axis=1)
    r = np.linalg.norm(cent - mm.coords.mean(axis=0), axis=1)
    out = mc.refine_and_coarsen(r <= np.quantile(r, 0.3),
                                np.zeros(mm.n_elems, bool))
    assert out is not None and len(out.constraints)
    mesh, cons = out.mesh, out.constraints

    p = _pihna_params()
    N, V = mesh.n_nodes, 5
    rng = np.random.default_rng(0)
    u0 = np.abs(rng.random((N, V))) * np.array([1., 100., 50., 500., 1e-10])
    u0[cons[:, 0]] = 0.5 * (u0[cons[:, 1]] + u0[cons[:, 2]])

    ref = MixedTransientRDCSystem(mesh, V, pihna_physics,
                                  precision="mixed", constraints=cons)
    dmesh = DeviceMesh(np.array(jax.devices()), ("d",))
    halo = HaloShardedSystem(mesh, V, pihna_physics, dmesh,
                             constraints=cons)
    st_r, st_h = ref.initial_state(u0), halo.initial_state(u0)
    h, a, b = cons[:, 0], cons[:, 1], cons[:, 2]
    for _ in range(3):
        st_r, _, _ = ref.step(st_r, params=p)
        st_h, _, res_h = halo.step(st_h, params=p)
        assert float(res_h) < 1e-8
        ur = np.asarray(st_r["u"])
        uh = halo.gather(st_h["u"])
        rel = np.linalg.norm(ur - uh) / np.linalg.norm(ur)
        assert rel < 1e-8, f"constrained mixed halo divergence {rel:.3e}"
        assert np.allclose(uh[h], 0.5 * (uh[a] + uh[b]), rtol=0,
                           atol=1e-12)


def test_mixed_moving_mesh_multichip_matches_single_chip():
    """Moving-mesh mixed halo step (per-block geometry from ghost-filled
    current coords inside the shard program, _step_shard_moving_mixed)
    matches MixedTransientRDCSystem's moving path — the coupled-HCC
    deformed-configuration transport solve, distributed, on a mixed
    mesh (reference src/coupled_hcc.C:114)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh as DeviceMesh

    from rdcfes_tpu.models.hcc import default_params, hcc_physics
    from rdcfes_tpu.parallel.halo import HaloShardedSystem
    from rdcfes_tpu.systems import MixedTransientRDCSystem

    mesh = box_mixed_mesh(6, 4, 4)
    N = mesh.n_nodes
    u0 = np.zeros((N, 3))
    r2 = ((mesh.coords - 0.5) ** 2).sum(axis=1)
    u0[:, 0] = 1.0
    u0[:, 1] = 0.3 * np.exp(-r2 / 0.05)
    u0[:, 2] = 0.1 * np.exp(-r2 / 0.08)
    params = default_params()
    params.update({"dt": 0.05, "diffuse_c": 1e-3, "produce_c": 0.2,
                   "cells_max_capacity": 1.0})
    coords = mesh.coords + 0.03 * np.sin(mesh.coords * 3.0)

    ref = MixedTransientRDCSystem(mesh, 3, hcc_physics, moving_mesh=True,
                                  precision="mixed")
    dmesh = DeviceMesh(np.array(jax.devices()), ("d",))
    halo = HaloShardedSystem(mesh, 3, hcc_physics, dmesh, moving_mesh=True)
    sr, sh = ref.initial_state(u0), halo.initial_state(u0)
    cj = jnp.asarray(coords)
    for _ in range(3):
        sr, _, _ = ref.step(sr, params=params, coords=cj)
        sh, _, res = halo.step(sh, params=params, coords=coords)
        ur, uh = np.asarray(sr["u"]), halo.gather(sh["u"])
        rel = np.linalg.norm(ur - uh) / np.linalg.norm(ur)
        assert rel < 1e-8, f"mixed moving halo divergence {rel:.3e}"
        assert float(res) < 1e-8


def test_prism_block_assembles():
    """A prism-bearing MixedMesh solves too (PRISM6 tables on the real
    assembly path): split the mixed box's HEX8 block into prisms."""
    from rdcfes_tpu.models.hcc import default_params, hcc_physics
    from rdcfes_tpu.systems import MixedTransientRDCSystem

    m = box_mixed_mesh(5, 2, 2)
    blocks = []
    for b in m.blocks:
        if b.elem_type != "HEX8":
            blocks.append(b)
            continue
        c = b.connectivity
        # each hex -> 2 prisms, cut along the 0-2 base diagonal (the
        # shared quad faces stay quad: only the hex-internal face splits)
        pr = np.concatenate([
            c[:, [0, 1, 2, 4, 5, 6]],
            c[:, [0, 2, 3, 4, 6, 7]],
        ])
        sd = np.concatenate([b.subdomain_id, b.subdomain_id])
        blocks.append(MeshBlock("PRISM6", pr, sd))
    m2 = MixedMesh(coords=m.coords, blocks=blocks)
    assert np.isclose(m2.element_volumes().sum(), 1.0)
    params = default_params()
    params.update(dt=0.05, diffuse_c=1e-3, produce_c=0.2,
                  cells_max_capacity=1.0)
    rng = np.random.default_rng(2)
    u0 = np.abs(rng.random((m2.n_nodes, 3)))
    sys_ = MixedTransientRDCSystem(m2, 3, hcc_physics)
    st = sys_.initial_state(u0)
    for _ in range(2):
        st, it, res = sys_.step(st, params=params)
        assert float(res) < 1e-10
    assert np.isfinite(np.asarray(st["u"])).all()


def _newton_opts():
    from rdcfes_tpu.solvers.newton import NewtonOptions

    return NewtonOptions(
        max_nonlinear_iterations=12, relative_step_tolerance=1e-10,
        relative_residual_tolerance=1e-10, absolute_residual_tolerance=1e-10,
        max_linear_iterations=50000, initial_linear_tolerance=1e-3)


def test_solid_mixed_blocks_match_single_type():
    """SolidSystem on a MixedMesh: a two-HEX8-block split of a cube
    reproduces the single-type solve (block-summed union-sparsity
    assembly is exact), including penalty BCs and post-processing."""
    import jax.numpy as jnp

    from rdcfes_tpu.mesh import box_hex_mesh
    from rdcfes_tpu.mesh.generators import _assign_box_boundary_ids
    from rdcfes_tpu.systems.solid import SolidSystem

    mesh = box_hex_mesh(3, 3, 3)
    kw = dict(materials={0: {"young": 1.0e3, "poisson": 0.3}},
              bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.3)},
              penalty=1.0e8, newton=_newton_opts())
    ref = SolidSystem(mesh, **kw)
    res_r = ref.run_solver(ref.initial_positions(), 0.2)

    m2 = MixedMesh(coords=mesh.coords, blocks=[
        MeshBlock("HEX8", mesh.connectivity[::2], mesh.subdomain_id[::2]),
        MeshBlock("HEX8", mesh.connectivity[1::2], mesh.subdomain_id[1::2]),
    ])
    _assign_box_boundary_ids(m2, ((0, 1.0),) * 3)
    sys_ = SolidSystem(m2, **kw)
    res_m = sys_.run_solver(sys_.initial_positions(), 0.2)
    a, b = np.asarray(res_m.x), np.asarray(res_r.x)
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 1e-9
    # post-processing concatenates per block: reorder to compare
    p_r, vm_r, _ = ref.post_process(jnp.asarray(b), 0.2)
    p_m, vm_m, _ = sys_.post_process(jnp.asarray(a), 0.2)
    p_cat = np.concatenate([np.asarray(p_r)[::2], np.asarray(p_r)[1::2]])
    vm_cat = np.concatenate([np.asarray(vm_r)[::2], np.asarray(vm_r)[1::2]])
    np.testing.assert_allclose(np.asarray(p_m), p_cat, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vm_m), vm_cat, rtol=1e-6)


def test_solid_mixed_transition_elements():
    """Uniaxial compression of the HEX|PYRAMID+TET mixed box: penalty BCs
    span both face arities (quad faces on the hex zone, tri faces on the
    tet zone), Newton converges, and the compressed face lands on the
    prescribed plane."""
    import jax.numpy as jnp

    from rdcfes_tpu.systems.solid import SolidSystem

    m = box_mixed_mesh(5, 3, 3)
    sys_ = SolidSystem(
        m, materials={0: {"young": 1.0e3, "poisson": 0.3}},
        bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.3)},
        penalty=1.0e8, newton=_newton_opts())
    # both penalty face groups are active
    assert {g["face_type"] for g in sys_.bc_groups} == {"QUAD4", "TRI3"}
    res = sys_.run_solver(sys_.initial_positions(), 0.5)
    assert bool(res.converged)
    x = np.asarray(res.x)
    top = np.unique(m.boundary_faces[m.boundary_id == 5])
    top = top[top >= 0]
    np.testing.assert_allclose(x[top, 2], 1.0 - 0.5 * 0.3, atol=1e-3)
    p, vm, fc = sys_.post_process(jnp.asarray(x), 0.5)
    assert np.isfinite(np.asarray(p)).all()
    assert np.isfinite(np.asarray(vm)).all()
    # deformed element volumes stay positive across all three types
    assert (m.with_coords(x).element_volumes() > 0).all()


def test_solid_mixed_multichip_matches_single_chip():
    """Mixed-element multi-chip solid (per-type element blocks +
    per-arity penalty face groups over one halo plan,
    parallel/solid_halo._init_mixed): the 8-device node-partitioned
    Newton matches the single-chip union-sparsity solve."""
    import jax
    from jax.sharding import Mesh as DeviceMesh

    from rdcfes_tpu.systems.solid import SolidSystem

    m = box_mixed_mesh(5, 3, 3)
    mats = {0: {"young": 1.0e3, "poisson": 0.3}}
    bcs = {0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.3)}
    ref = SolidSystem(m, materials=mats, bcs=bcs, penalty=1.0e8,
                      newton=_newton_opts())
    r1 = ref.run_solver(ref.initial_positions(), 0.5)
    assert bool(r1.converged)
    dmesh = DeviceMesh(np.array(jax.devices()), ("d",))
    sys8 = SolidSystem(m, materials=mats, bcs=bcs, penalty=1.0e8,
                       newton=_newton_opts(), device_mesh=dmesh)
    # both face arities active, node-partitioned O(N/D + boundary) slabs
    assert set(sys8._halo._fgroup_types) == {"QUAD4", "TRI3"}
    assert sys8._halo.plan.No_max < m.n_nodes // 2
    r8 = sys8.run_solver(sys8.initial_positions(), 0.5)
    assert bool(r8.converged)
    a, b = np.asarray(r1.x), np.asarray(r8.x)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 1e-6, f"mixed multichip solid divergence {rel:.3e}"


def test_solid_driver_mixed_mesh(in_tmp):
    """End-to-end: the solid driver on a mixed-element Gmsh mesh (the
    reference reads such meshes through libMesh; here SolidSystem
    assembles per type block into the union sparsity)."""
    from rdcfes_tpu.drivers import solid as solid_driver

    m = box_mixed_mesh(4, 2, 2)
    gmsh.write(m, "input.msh")
    open("input.dat", "w").write("""
directory = simulation
input_GMSH = input.msh
output_PARAVIEW = out
loading_step = 0.5
output_time_points = ' 1 2 '
solver/nonlinear/max_nonlinear_iterations = 10
BCs = ' 0 5 '
BC/0/displacement/0 = +0.000
BC/0/displacement/1 = +0.000
BC/0/displacement/2 = +0.000
BC/5/displacement/0 = NAN
BC/5/displacement/1 = NAN
BC/5/displacement/2 = -0.30
BCs/displacement_penalty = 1.e+8
materials = ' 0 '
material/0/Hyperelastic/Young = 1.0e+4
material/0/Hyperelastic/Poisson = 0.3
""")
    outdir = solid_driver.run("input.dat")
    vtu = open(os.path.join(outdir, "out-2.vtu")).read()
    for name in ("u_z", "p", "VM"):
        assert f'Name="{name}"' in vtu
    types = set(vtu.split('Name="types"')[1].split(">")[1]
                .split("<")[0].split())
    assert {"10", "12", "14"} <= types


def test_mixed_moving_mesh_step_matches_static_on_deformed():
    """The moving-mesh mixed step (geometry from current coords, the
    deformed-configuration RDC solve of coupled_hcc.C:114) equals a
    static mixed system built on the deformed mesh."""
    import jax.numpy as jnp

    from rdcfes_tpu.models.hcc import default_params, hcc_physics
    from rdcfes_tpu.systems import MixedTransientRDCSystem

    m = box_mixed_mesh(5, 3, 3)
    params = default_params()
    params.update(dt=0.05, diffuse_c=1e-3, produce_c=0.2,
                  cells_max_capacity=1.0)
    rng = np.random.default_rng(7)
    u0 = np.abs(rng.random((m.n_nodes, 3)))
    # a smooth deformation that keeps all element types positive
    x = m.coords * (1.0 + 0.08 * np.sin(np.pi * m.coords[:, :1]))
    assert (m.with_coords(x).element_volumes() > 0).all()

    mv = MixedTransientRDCSystem(m, 3, hcc_physics, moving_mesh=True)
    st_m, _, res_m = mv.step(mv.initial_state(u0), params=params,
                             coords=jnp.asarray(x))
    ref = MixedTransientRDCSystem(m.with_coords(x), 3, hcc_physics)
    st_r, _, res_r = ref.step(ref.initial_state(u0), params=params)
    assert float(res_m) < 1e-10 and float(res_r) < 1e-10
    a, b = np.asarray(st_m["u"]), np.asarray(st_r["u"])
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 1e-12


def test_coupled_hcc_driver_mixed_mesh(in_tmp):
    """End-to-end: the two-way coupled driver on a mixed-element case —
    deformed-configuration RDC per step + solid at loading points, both
    halves assembling per type block."""
    import glob

    from rdcfes_tpu import cases
    from rdcfes_tpu.drivers import coupled_hcc

    cases.make_hcc_case(".", n=3, n_steps=2, n_loading=1, mixed=True)
    out = coupled_hcc.run("input.dat")
    vtu = sorted(glob.glob(os.path.join(out, "*.vtu")))
    assert vtu
    txt = open(vtu[-1]).read()
    types = set(txt.split('Name="types"')[1].split(">")[1]
                .split("<")[0].split())
    assert {"10", "12", "14"} <= types
    for name in ("l", "c", "n", "u_z", "p", "VM"):
        assert f'Name="{name}"' in txt
