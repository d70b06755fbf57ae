"""Driver-level multi-chip execution: deck key `parallel/n_devices` routes
PIHNA/ADPM/PROTEAS/RIPF through the halo-exchange sharded system, and the
end-to-end artifacts (CSV rows, VTU fields) match the single-device run.

Reference being matched: every shipped case runs domain-decomposed
(`mpiexec -n 4`, reference run/PIHNA/Makefile:6) with bitwise-equal science
outputs regardless of rank count.
"""

import os
import re
import shutil

import numpy as np
import pytest

import jax

from rdcfes_tpu import cases


@pytest.fixture
def in_tmp(tmp_path, monkeypatch):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    monkeypatch.chdir(tmp_path)
    return str(tmp_path)


def _vtu_field(path, name):
    txt = open(path).read()
    m = re.search(rf'Name="{name}"[^>]*>(.*?)</DataArray>', txt, re.S)
    return np.array(m.group(1).split(), dtype=float)


def _run_both(driver, prep, outputs):
    """Run single-device, then 8-device, compare artifacts."""
    deck = prep()
    open("input.dat", "w").write(deck)
    out1 = driver.run("input.dat")
    arts1 = {k: fn(out1) for k, fn in outputs.items()}
    shutil.move(out1, out1 + "_single")
    open("input.dat", "w").write(deck + "\nparallel/n_devices = 8\n")
    out8 = driver.run("input.dat")
    arts8 = {k: fn(out8) for k, fn in outputs.items()}
    for k in arts1:
        a, b = np.asarray(arts1[k]), np.asarray(arts8[k])
        scale = 1.0 + np.abs(a).max()
        assert np.allclose(a, b, rtol=1e-8, atol=1e-8 * scale), (
            f"{k}: single vs 8-device mismatch "
            f"(max {np.abs(a - b).max():.3e})"
        )


def _csv_rows(out):
    lines = open(os.path.join(out, "output.csv")).read().splitlines()
    rows = [l for l in lines if l and not l.startswith('"')]
    return [list(map(float, l.split(","))) for l in rows]


def test_pihna_multichip(in_tmp):
    from rdcfes_tpu.drivers import pihna

    def prep():
        cases.make_pihna_case(".", n=4, n_steps=3)
        return open("input.dat").read().replace("output_step = 10",
                                                "output_step = 3")

    _run_both(pihna, prep, {
        "csv": _csv_rows,
        "c": lambda o: _vtu_field(
            os.path.join(o, "Brain_Model-3.vtu"), "c"),
    })


def test_pihna_multichip_mixed_mesh(in_tmp):
    """Mixed-element meshes ride the halo system too (build_mixed_plan):
    the 8-device run of a HEX8/PYRAMID5/TET4 case matches single-chip
    artifacts through the real driver."""
    from rdcfes_tpu.drivers import pihna

    def prep():
        cases.make_pihna_case(".", n=4, n_steps=3, mixed=True)
        return open("input.dat").read().replace("output_step = 10",
                                                "output_step = 3")

    _run_both(pihna, prep, {
        "csv": _csv_rows,
        "c": lambda o: _vtu_field(
            os.path.join(o, "Brain_Model-3.vtu"), "c"),
    })


def test_adpm_multichip(in_tmp):
    from rdcfes_tpu.drivers import adpm

    def prep():
        cases.make_adpm_case(".", n=4, n_steps=3)
        return open("input.dat").read().replace(
            "output_step = 20", "output_step = 3").replace(
            "time_step_number = 3", "time_step_number = 3")

    _run_both(adpm, prep, {"csv": _csv_rows})


def test_adpm_multichip_mixed_mesh(in_tmp):
    """Mixed-element ADPM multi-chip: elemental Tracts ride the per-block
    tuple path of shard_elem_field; also regression for the f64 fallback
    in the single-chip mixed refinement (the deck's taxis amplitude
    stalls the f32 inner sweeps on transition elements)."""
    from rdcfes_tpu.drivers import adpm

    def prep():
        cases.make_adpm_case(".", n=4, n_steps=2, mixed=True)
        return open("input.dat").read().replace("output_step = 20",
                                                "output_step = 2")

    _run_both(adpm, prep, {"csv": _csv_rows})


def test_proteas_multichip(in_tmp):
    from rdcfes_tpu.drivers import proteas

    def prep():
        cases.make_proteas_case(".", n=3, n_steps=2)
        return open("input.dat").read()

    _run_both(proteas, prep, {
        "tum": lambda o: _vtu_field(os.path.join(o, "out-2.vtu"), "tum"),
    })


def test_ripf_multichip(in_tmp):
    from rdcfes_tpu.drivers import ripf

    def prep():
        cases.make_ripf_case(".", n=4, n_steps=3)
        return open("input.dat").read().replace(
            "output_time_points = ' 10 30 60 90 120 '",
            "output_time_points = ' 3 '",
        )

    _run_both(ripf, prep, {"csv": _csv_rows})


def test_ripf_multichip_scan_matches_per_step(in_tmp):
    """The multi-chip in-scan field_update path (TD/RT qp fields rebuilt
    from owned slabs + ghost fill inside the shard program,
    parallel/halo.py _multi_shard_qp_fn) equals per-step dispatch with
    host-rebuilt fields: same 8-device case with output every step
    (events force seg=1, the per-step branch) vs output at the end only
    (one scanned segment)."""
    from rdcfes_tpu.drivers import ripf

    cases.make_ripf_case(".", n=4, n_steps=3)
    base = open("input.dat").read() + "\nparallel/n_devices = 8\n"
    open("input.dat", "w").write(base.replace(
        "output_time_points = ' 10 30 60 90 120 '",
        "output_time_points = ' 1 2 3 '"))
    out_a = ripf.run("input.dat")
    shutil.move(out_a, out_a + "_per_step")
    open("input.dat", "w").write(base.replace(
        "output_time_points = ' 10 30 60 90 120 '",
        "output_time_points = ' 3 '"))
    out_b = ripf.run("input.dat")
    a = np.asarray(_csv_rows(out_a + "_per_step"))[-1]
    b = np.asarray(_csv_rows(out_b))[-1]
    assert np.allclose(a, b, rtol=1e-10, atol=1e-12), (
        f"scan vs per-step mismatch: {np.abs(a - b).max():.3e}")


def test_proteas_multichip_mixed_mesh(in_tmp):
    """Mixed-element PROTEAS: per-block qp-sampled RTD aux rides the
    tuple form of shard_elem_field (element axis last, per-block Q)."""
    from rdcfes_tpu.drivers import proteas

    def prep():
        cases.make_proteas_case(".", n=3, n_steps=2, mixed=True)
        return open("input.dat").read()

    _run_both(proteas, prep, {
        "tum": lambda o: _vtu_field(os.path.join(o, "out-2.vtu"), "tum"),
    })


def test_ripf_multichip_mixed_mesh(in_tmp):
    """Mixed-element RIPF: the four per-step TD/RT qp fields (including
    the (Q, 3, E) RT gradient) ride the per-block tuple path."""
    from rdcfes_tpu.drivers import ripf

    def prep():
        cases.make_ripf_case(".", n=4, n_steps=3, mixed=True)
        return open("input.dat").read().replace(
            "output_time_points = ' 10 30 60 90 120 '",
            "output_time_points = ' 3 '",
        )

    _run_both(ripf, prep, {"csv": _csv_rows})


def test_pihna_multichip_with_amr(in_tmp):
    """Selective AMR under distributed execution: flags are computed from
    the gathered state, the mesh adapts identically, and the halo system
    is rebuilt on the refined mesh — final artifacts match single-device."""
    from rdcfes_tpu.drivers import pihna

    def prep():
        cases.make_pihna_case(".", n=4, n_steps=3)
        deck = open("input.dat").read().replace("output_step = 10",
                                                "output_step = 3")
        deck += ("refinement_step = 2\n"
                 "mesh/AMR/max_steps = 1\n"
                 "mesh/AMR/max_level = 1\n")
        return deck

    _run_both(pihna, prep, {
        "csv": _csv_rows,
        "c": lambda o: _vtu_field(
            os.path.join(o, "Brain_Model-3.vtu"), "c"),
    })


def test_solid_multichip(in_tmp):
    """Solid driver with element-sharded constitutive assembly
    (parallel/n_devices): identical displacements to single-device."""
    from rdcfes_tpu.drivers import solid as solid_driver
    from rdcfes_tpu.mesh import box_hex_mesh, gmsh

    mesh = box_hex_mesh(3, 3, 3, bounds=((0, 1.5), (0, 1.5), (0, 1.5)))
    gmsh.write(mesh, "input.msh")
    deck = """
directory = simulation
input_GMSH = input.msh
output_PARAVIEW = out
loading_step = 0.5
output_step = 2
BCs = ' 0 5 '
BC/0/displacement/0 = 0.0
BC/0/displacement/1 = 0.0
BC/0/displacement/2 = 0.0
BC/5/displacement/0 = NAN
BC/5/displacement/1 = NAN
BC/5/displacement/2 = -0.1
BCs/displacement_penalty = 1.0e6
materials = ' 0 '
material/0/Hyperelastic/Young = 1000.0
material/0/Hyperelastic/Poisson = 0.3
"""

    def prep():
        return deck

    _run_both(solid_driver, prep, {
        "u_z": lambda o: _vtu_field(os.path.join(o, "out-2.vtu"), "u_z"),
        "VM": lambda o: _vtu_field(os.path.join(o, "out-2.vtu"), "VM"),
    })


def test_hcc_multichip(in_tmp):
    """Coupled HCC with the solid side element-sharded: final fields match
    the single-device run."""
    from rdcfes_tpu.drivers import coupled_hcc

    def prep():
        cases.make_hcc_case(".", n=3, n_steps=2, n_loading=1)
        return open("input.dat").read().replace("output_step = 1",
                                                "output_step = 2")

    _run_both(coupled_hcc, prep, {
        "c": lambda o: _vtu_field(os.path.join(o, "out-2.vtu"), "c"),
        "u_z": lambda o: _vtu_field(os.path.join(o, "out-2.vtu"), "u_z"),
    })


def test_hcc_multichip_mixed_mesh(in_tmp):
    """Coupled HCC on a mixed-element mesh with parallel/n_devices: the
    per-step RDC transport runs through the mixed moving-mesh halo step
    (_step_shard_moving_mixed, geometry from ghost-filled current coords
    per block) and the solid half through the mixed halo Newton
    (per-type blocks + per-arity face groups); artifacts match the
    single-device run."""
    from rdcfes_tpu.drivers import coupled_hcc

    def prep():
        cases.make_hcc_case(".", n=3, n_steps=2, n_loading=1, mixed=True)
        return open("input.dat").read().replace("output_step = 1",
                                                "output_step = 2")

    _run_both(coupled_hcc, prep, {
        "c": lambda o: _vtu_field(os.path.join(o, "out-2.vtu"), "c"),
        "u_z": lambda o: _vtu_field(os.path.join(o, "out-2.vtu"), "u_z"),
    })


def test_pihna_multichip_checkpoint_resume(in_tmp):
    """Checkpoints store the gathered global state, so a distributed run
    resumes correctly (scatter on load) and reproduces the uninterrupted
    distributed run's final CSV row."""
    from rdcfes_tpu.drivers import pihna

    cases.make_pihna_case(".", n=4, n_steps=4)
    deck = open("input.dat").read().replace("output_step = 10",
                                            "output_step = 1")
    deck += "parallel/n_devices = 8\ncheckpoint/step = 3\n"
    open("input.dat", "w").write(deck)
    out1 = pihna.run("input.dat")
    full_csv = open(os.path.join(out1, "output.csv")).read()
    shutil.copy(os.path.join(out1, "checkpoint.npz"), "ck.npz")
    shutil.move(out1, out1 + "_full")
    open("input.dat", "w").write(deck + "checkpoint/resume = ck.npz\n")
    out2 = pihna.run("input.dat")
    resumed_csv = open(os.path.join(out2, "output.csv")).read()
    assert full_csv.splitlines()[-1] == resumed_csv.splitlines()[-1]


def test_pihna_multichip_mixed_checkpoint_resume(in_tmp):
    """Checkpoint/resume through the MIXED halo system: the gathered
    global state round-trips the per-block padded slabs (gather on
    save, scatter_state on load) and the resumed distributed run
    reproduces the uninterrupted one's final CSV row."""
    from rdcfes_tpu.drivers import pihna

    cases.make_pihna_case(".", n=4, n_steps=4, mixed=True)
    deck = open("input.dat").read().replace("output_step = 10",
                                            "output_step = 1")
    deck += "parallel/n_devices = 8\ncheckpoint/step = 3\n"
    open("input.dat", "w").write(deck)
    out1 = pihna.run("input.dat")
    full_csv = open(os.path.join(out1, "output.csv")).read()
    shutil.copy(os.path.join(out1, "checkpoint.npz"), "ck.npz")
    shutil.move(out1, out1 + "_full")
    open("input.dat", "w").write(deck + "checkpoint/resume = ck.npz\n")
    out2 = pihna.run("input.dat")
    resumed_csv = open(os.path.join(out2, "output.csv")).read()
    assert full_csv.splitlines()[-1] == resumed_csv.splitlines()[-1]
