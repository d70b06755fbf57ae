"""Measure the CPU oracle wall-clock on the bench.py workload.

Replaces the guessed reference baseline in bench.py with a measured number:
the reference libMesh/PETSc stack cannot be built here (no PETSc/libMesh,
no network egress — see PARITY.md), so the independent NumPy/scipy oracle
(same physics, scipy.sparse assembly + ILU-GMRES solve, the closest
available stand-in for the reference's single-node CPU pipeline) is timed
on the identical brain-scale workload bench.py runs: 24,389 nodes x 5 vars,
131,712 TET4, run/PIHNA deck parameters, dt=0.1.

Prints one JSON line {"oracle_steps_per_sec": ..., "n_steps": ...}.
"""

import json
import time

import numpy as np

from pihna_numpy import PihnaOracle


def bench_case():
    import sys

    sys.path.insert(0, "/root/repo")
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import default_params

    n = 28
    mesh = box_tet_mesh(n, n, n, bounds=((0, 150.0), (0, 180.0), (0, 150.0)))
    Kk = 2.39e5
    params = default_params()
    params.update(
        dt=0.1, cells_min_capacity=1.0, cells_max_capacity=Kk,
        cells_max_capacity_exponent=3.0, cytokines_max_capacity=1.0e-8,
        necrosis_c=500.0 / Kk, necrosis_h=200.0 / Kk, necrosis_v=300.0 / Kk,
        produce_c=-2.5, switch_c2h=1.0, switch_h2c=1.82, switch_h2n=0.5,
        diffuse_v=0.5, produce_v=10.0,
        secrete_a_c=2.77e-13, secrete_a_h=5.22e-10, decay_a=5678.4,
    )
    rng = np.random.default_rng(0)
    u0 = np.zeros((mesh.n_nodes, 5))
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0[:, 1] = 2000.0 * np.exp(-r2 / (2 * 25.0**2))
    u0[:, 2] = 500.0 * np.exp(-r2 / (2 * 30.0**2))
    u0[:, 3] = 7200.0 * (1.0 + 0.1 * rng.random(mesh.n_nodes))
    u0[:, 4] = 1e-10
    return mesh, params, u0


def adpm_bench_case():
    """The bench.py adpm_bench workload (run/HCP102513 scale + params)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.adpm import default_params

    n = 28
    mesh = box_tet_mesh(n, n, n, bounds=((0, 150.0), (0, 180.0), (0, 150.0)))
    p = default_params()
    p.update(
        dt=0.05,
        decay_PrP=1.0e-4, decay_PrP_pulse0=0.01, decay_PrP_pulse1=10.0,
        taxis1_A_b=50.0, taxis1_A_b_pulse0=-1.0, taxis1_A_b_pulse1=0.01,
        taxis1_Tau=50.0, taxis1_Tau_pulse0=-1.0, taxis1_Tau_pulse1=0.01,
        decay_Tau=1.0e1, decay_Tau_pulse0=0.0005, decay_Tau_pulse1=1.0e20,
        diffuse_A_b=2e-4, diffuse_A_b_pulse0=-1.0, diffuse_A_b_pulse1=1e20,
    )
    rng = np.random.default_rng(0)
    N = mesh.n_nodes
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0 = np.zeros((N, 3))
    u0[:, 0] = 1.0
    u0[:, 1] = 1e-3 * np.exp(-r2 / (2 * 20.0**2))
    u0[:, 2] = 1e-4 * np.exp(-r2 / (2 * 15.0**2))
    tracts = rng.standard_normal((mesh.n_elems, 3))
    tracts /= np.linalg.norm(tracts, axis=1, keepdims=True)
    return mesh, p, u0, tracts


def measure_pihna():
    mesh, params, u0 = bench_case()
    orc = PihnaOracle(mesh.coords, mesh.connectivity, params)
    u = u0.copy()
    # one untimed step (warms scipy/BLAS caches, page-faults the big tables)
    u, _ = orc.step(u, solver="jacobi-bicgstab")
    n_steps = 5
    t0 = time.perf_counter()
    for _ in range(n_steps):
        u, _ = orc.step(u, solver="jacobi-bicgstab")
    wall = time.perf_counter() - t0
    assert np.isfinite(u).all()
    return {
        "workload": "pihna",
        "oracle_steps_per_sec": round(n_steps / wall, 4),
        "sec_per_step": round(wall / n_steps, 3),
        "n_steps": n_steps,
        "n_nodes": mesh.n_nodes,
        "n_elems": mesh.n_elems,
    }


def measure_adpm():
    import sys

    sys.path.insert(0, "/root/repo")
    from oracle.adpm_numpy import AdpmOracle

    mesh, params, u0, tracts = adpm_bench_case()
    orc = AdpmOracle(mesh.coords, mesh.connectivity, tracts, params)
    u = u0.copy()
    u, _ = orc.step(u, 1.0, solver="jacobi-bicgstab")  # warm
    n_steps = 5
    t0 = time.perf_counter()
    for _ in range(n_steps):
        u, _ = orc.step(u, 1.0, solver="jacobi-bicgstab")
    wall = time.perf_counter() - t0
    assert np.isfinite(u).all()
    return {
        "workload": "adpm",
        "oracle_steps_per_sec": round(n_steps / wall, 4),
        "sec_per_step": round(wall / n_steps, 3),
        "n_steps": n_steps,
        "n_nodes": mesh.n_nodes,
        "n_elems": mesh.n_elems,
    }


def measure_solid(n=12):
    """One solid load step at n^3 HEX8 via the nested-loop oracle, with a
    per-element extrapolation hook to the bench's 110,592-HEX8 case: the
    element loop is O(E) and the sparse solve superlinear, so scaling the
    measured per-element cost linearly UNDERSTATES the full-size reference
    cost (conservative for vs_baseline)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from rdcfes_tpu.mesh import box_hex_mesh

    from oracle.solid_numpy import SolidOracle

    mesh = box_hex_mesh(n, n, n, bounds=((0, 1.0), (0, 1.0), (0, 1.0)))
    orc = SolidOracle(mesh, young=1.0e3, poisson=0.3, penalty=1.0e6,
                      bcs={0: (0.0, 0.0, 0.0),
                           5: (np.nan, np.nan, -0.05)})
    x0 = np.asarray(mesh.coords)
    t0 = time.perf_counter()
    x, iters, rnorm = orc.load_step(x0, 0.5)
    wall = time.perf_counter() - t0
    assert np.isfinite(x).all()
    bench_E = 110_592
    return {
        "workload": "solid",
        "oracle_load_step_sec": round(wall, 2),
        "newton_iters": int(iters),
        "n_elems": mesh.n_elems,
        "extrapolated_bench_scale_sec": round(wall * bench_E / mesh.n_elems,
                                              1),
        "bench_elems": bench_E,
    }


def main():
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "pihna"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    fn = {"pihna": measure_pihna, "adpm": measure_adpm,
          "solid": measure_solid}[which]
    print(json.dumps(fn(n) if which == "solid" and n else fn()))


if __name__ == "__main__":
    main()
