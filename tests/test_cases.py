"""Synthetic case generation + end-to-end driver runs on the generated decks."""

import os

import numpy as np
import pytest

from rdcfes_tpu import cases


@pytest.fixture
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return str(tmp_path)


def test_pihna_case_runs(in_tmp):
    from rdcfes_tpu.drivers import pihna

    cases.make_pihna_case(".", n=5, n_steps=4)
    outdir = pihna.run("input.dat")
    csv = open(os.path.join(outdir, "output.csv")).read().splitlines()
    assert len(csv) >= 2
    vals = np.array([line.split(",") for line in csv[1:]], dtype=float)
    assert np.isfinite(vals).all()


def test_ripf_case_runs(in_tmp):
    from rdcfes_tpu.drivers import ripf

    cases.make_ripf_case(".", n=4, n_steps=3)
    # trim output schedule to the short run
    deck = open("input.dat").read().replace(
        "output_time_points = ' 10 30 60 90 120 '",
        "output_time_points = ' 1 3 '",
    )
    open("input.dat", "w").write(deck)
    outdir = ripf.run("input.dat")
    csv = open(os.path.join(outdir, "output.csv")).read().splitlines()
    assert len(csv) == 3  # initial + 2 scheduled outputs


def test_adpm_case_runs(in_tmp):
    from rdcfes_tpu.drivers import adpm

    cases.make_adpm_case(".", n=4, n_steps=3)
    deck = open("input.dat").read().replace("output_step = 20", "output_step = 1")
    deck = deck.replace("time_step_number = 3", "time_step_number = 3")
    open("input.dat", "w").write(deck)
    outdir = adpm.run("input.dat")
    csv = open(os.path.join(outdir, "output.csv")).read().splitlines()
    # two parcellations in the header
    assert "CONCENTRATION__A_b__10" in csv[0]
    assert "CONCENTRATION__Tau__20" in csv[0]
    assert len(csv) == 1 + 4


def test_pihna_checkpoint_resume(in_tmp):
    """Checkpoint every 2 steps; resume must reproduce the uninterrupted run."""
    import jax.numpy as jnp

    from rdcfes_tpu.drivers import pihna

    cases.make_pihna_case(".", n=4, n_steps=4)
    deck = open("input.dat").read().replace("output_step = 10", "output_step = 1")
    deck = deck + "checkpoint/step = 2\n"
    open("input.dat", "w").write(deck)
    outdir = pihna.run("input.dat")
    full_csv = open(os.path.join(outdir, "output.csv")).read()

    # rerun the last 2 steps from the checkpoint
    deck2 = deck + f"checkpoint/resume = {outdir}/checkpoint.npz\n"
    # the checkpoint was overwritten at step 4; regenerate a step-2 one by
    # rerunning with 2 steps
    deck_short = deck.replace("time_step_number = 4", "time_step_number = 2")
    open("input.dat", "w").write(deck_short)
    import shutil
    shutil.rmtree(outdir)
    pihna.run("input.dat")
    ck = os.path.join(outdir, "checkpoint.npz")
    assert os.path.exists(ck)

    open("input.dat", "w").write(deck2)
    out2 = pihna.run("input.dat")
    resumed_csv = open(os.path.join(out2, "output.csv")).read()
    # resumed run writes only the post-resume output rows; final row must
    # match the tail of the uninterrupted run
    assert full_csv.splitlines()[-1] == resumed_csv.splitlines()[-1]


def test_ripf_checkpoint_resume(in_tmp):
    """RIPF checkpoint carries the TD-field bookkeeping (td, prev_raw);
    resuming reproduces the uninterrupted run's final CSV row."""
    import shutil

    from rdcfes_tpu.drivers import ripf

    cases.make_ripf_case(".", n=4, n_steps=4)
    deck = open("input.dat").read().replace(
        "output_time_points = ' 10 30 60 90 120 '",
        "output_time_points = ' 1 2 3 4 '",
    ) + "checkpoint/step = 2\n"
    open("input.dat", "w").write(deck)
    outdir = ripf.run("input.dat")
    full_csv = open(os.path.join(outdir, "output.csv")).read()

    deck_short = deck.replace("time_step_number = 4", "time_step_number = 2")
    open("input.dat", "w").write(deck_short)
    shutil.rmtree(outdir)
    outdir = ripf.run("input.dat")  # timestamped results dir per run
    assert os.path.exists(os.path.join(outdir, "checkpoint.npz"))

    open("input.dat", "w").write(
        deck + f"checkpoint/resume = {outdir}/checkpoint.npz\n")
    out2 = ripf.run("input.dat")
    resumed_csv = open(os.path.join(out2, "output.csv")).read()
    assert full_csv.splitlines()[-1] == resumed_csv.splitlines()[-1]


def test_adpm_checkpoint_resume(in_tmp):
    import shutil

    from rdcfes_tpu.drivers import adpm

    cases.make_adpm_case(".", n=4, n_steps=4)
    deck = open("input.dat").read().replace("output_step = 20",
                                            "output_step = 1")
    deck = deck.replace("time_step_number = 3", "time_step_number = 4")
    deck += "checkpoint/step = 2\n"
    open("input.dat", "w").write(deck)
    outdir = adpm.run("input.dat")
    full_csv = open(os.path.join(outdir, "output.csv")).read()

    deck_short = deck.replace("time_step_number = 4", "time_step_number = 2")
    open("input.dat", "w").write(deck_short)
    shutil.rmtree(outdir)
    outdir = adpm.run("input.dat")  # timestamped results dir per run
    open("input.dat", "w").write(
        deck + f"checkpoint/resume = {outdir}/checkpoint.npz\n")
    out2 = adpm.run("input.dat")
    resumed_csv = open(os.path.join(out2, "output.csv")).read()
    assert full_csv.splitlines()[-1] == resumed_csv.splitlines()[-1]


def test_proteas_case_generator(in_tmp):
    """PROTEAS synthetic case runs end-to-end via the driver."""
    from rdcfes_tpu.drivers import proteas

    cases.make_proteas_case(".", n=3, n_steps=2)
    outdir = proteas.run("input.dat")
    assert os.path.exists(os.path.join(outdir, "out-2.vtu"))


def test_hcc_case_generator(in_tmp):
    """Coupled-HCC synthetic case (shipped deck values, scaled) runs the
    interleaved RDC + solid loop end-to-end."""
    from rdcfes_tpu.drivers import coupled_hcc

    cases.make_hcc_case(".", n=3, n_steps=4, n_loading=2)
    outdir = coupled_hcc.run("input.dat")
    vtus = [f for f in os.listdir(outdir) if f.endswith(".vtu")]
    assert vtus, "coupled run produced no output"


def test_solid_checkpoint_resume(in_tmp):
    """Solid load ramp checkpoints (x, pseudo_time, fibres, stress fields)
    and resumes to the identical final state."""
    import shutil

    import numpy as np

    from rdcfes_tpu.drivers import solid as solid_driver
    from rdcfes_tpu.mesh import box_hex_mesh, gmsh

    mesh = box_hex_mesh(3, 3, 3, bounds=((0, 1.5), (0, 1.5), (0, 1.5)))
    gmsh.write(mesh, "input.msh")
    deck = """
directory = simulation
input_GMSH = input.msh
output_PARAVIEW = out
loading_step = 0.25
output_step = 1
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
checkpoint/step = 3
"""
    open("input.dat", "w").write(deck)
    # full run: 4 load steps (1/loading_step); checkpoint survives at step 3
    outdir = solid_driver.run("input.dat")
    full = open(os.path.join(outdir, "out-4.vtu")).read()
    # copy the checkpoint outside the results dir (a resumed run may reuse
    # and clear it), then resume for step 4
    shutil.copy(os.path.join(outdir, "checkpoint.npz"), "ck.npz")
    open("input.dat", "w").write(deck + "checkpoint/resume = ck.npz\n")
    out2 = solid_driver.run("input.dat")
    resumed = open(os.path.join(out2, "out-4.vtu")).read()

    def field(txt, name):
        import re
        m = re.search(rf'Name="{name}"[^>]*>(.*?)</DataArray>', txt, re.S)
        return np.array(m.group(1).split(), dtype=float)

    for name in ("u_z", "VM"):
        a, b = field(full, name), field(resumed, name)
        assert np.allclose(a, b, rtol=1e-9, atol=1e-12), name


def test_hcc_checkpoint_resume(in_tmp):
    """Coupled-HCC checkpoints both the RDC state and the solid positions;
    resume reproduces the uninterrupted final output."""
    import shutil

    import numpy as np

    from rdcfes_tpu.drivers import coupled_hcc

    cases.make_hcc_case(".", n=3, n_steps=4, n_loading=2)
    deck = open("input.dat").read().replace(
        "output_step = 2", "output_step = 1") + "checkpoint/step = 3\n"
    open("input.dat", "w").write(deck)
    outdir = coupled_hcc.run("input.dat")
    full = open(os.path.join(outdir, "out-4.vtu")).read()
    # the results dir is wiped on every coupled run: move the step-3
    # checkpoint out before resuming
    shutil.copy(os.path.join(outdir, "checkpoint.npz"), "ck.npz")
    open("input.dat", "w").write(deck + "checkpoint/resume = ck.npz\n")
    out2 = coupled_hcc.run("input.dat")
    resumed = open(os.path.join(out2, "out-4.vtu")).read()

    def field(txt, name):
        import re
        m = re.search(rf'Name="{name}"[^>]*>(.*?)</DataArray>', txt, re.S)
        return np.array(m.group(1).split(), dtype=float)

    for name in ("c", "u_z"):
        a, b = field(full, name), field(resumed, name)
        assert np.allclose(a, b, rtol=1e-9, atol=1e-12), name
