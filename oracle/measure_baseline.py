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


def main():
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
    print(json.dumps({
        "oracle_steps_per_sec": round(n_steps / wall, 4),
        "sec_per_step": round(wall / n_steps, 3),
        "n_steps": n_steps,
        "n_nodes": mesh.n_nodes,
        "n_elems": mesh.n_elems,
    }))


if __name__ == "__main__":
    main()
