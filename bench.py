"""Benchmark: PIHNA north-star case at reference scale on real hardware.

Workload (BASELINE.md): the run/PIHNA configuration — ~25k nodes x 5 vars,
~135k TET4 elements, dt=0.1, shipped deck parameters — on a synthetic
brain-scale mesh standing in for the LFS-stripped patient mesh (same
node/element counts, same IC structure: a Gaussian tumour seed over uniform
vasculature).

Metric: time steps/sec over a timed window after jit warmup; also reports
elements assembled per second.  `vs_baseline` compares against a MEASURED
baseline: 0.64 steps/s for the 8-rank MPI CPU reference, derived as the
measured single-core wall-clock of the independent scipy oracle on this
exact workload (0.0802 steps/s, oracle/measure_baseline.py) times ideal
8-rank MPI scaling — see PARITY.md section 4 and BASELINE_MEASURED.json for
the derivation and its caveats.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax

    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import default_params, pihna_physics
    from rdcfes_tpu.systems import TransientRDCSystem

    # ~25k nodes, ~135k tets: 28^3 grid -> 24,389 nodes, 131,712 tets.
    # Brain-like physical extent (mm) so element sizes — and with them the
    # conditioning / Krylov iteration counts of the implicit step — match
    # the real run/PIHNA patient-mesh case (h ~ 5 mm, mass-dominated).
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

    # IC magnitudes follow the deck's own range thresholds
    # (active_tumor/min = 500, vascularity/min = 7200): tumour seed of a few
    # thousand cells/mm^3 over a ~7200 vasculature background — the regime
    # the reference's linearized-CN scheme is stable in at dt = 0.1
    rng = np.random.default_rng(0)
    u0 = np.zeros((mesh.n_nodes, 5))
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0[:, 1] = 2000.0 * np.exp(-r2 / (2 * 25.0**2))
    u0[:, 2] = 500.0 * np.exp(-r2 / (2 * 30.0**2))
    u0[:, 3] = 7200.0 * (1.0 + 0.1 * rng.random(mesh.n_nodes))
    u0[:, 4] = 1e-10

    # mixed precision = f32 inner Krylov + f64 iterative refinement: same
    # converged f64 answer (final preconditioned residual ~1e-13, far below
    # the 1e-8 parity bar) at ~1.3x the solve throughput on TPU
    # precond_refresh: the block-Jacobi inverse is only a preconditioner —
    # the converged answer is tolerance-identical; recomputing every 10
    # steps drops its diag-restrict + inverse cost from most steps
    system = TransientRDCSystem(mesh, 5, pihna_physics, precision="mixed",
                                precond_refresh=10)

    # warmup (compile)
    state = system.initial_state(u0)
    for _ in range(3):
        state, iters, res = system.step(state, params=params)
    jax.block_until_ready(state["u"])

    # timed: the full 120-step reference case from the initial state
    n_timed = 120
    state = system.initial_state(u0)
    t0 = time.perf_counter()
    for _ in range(n_timed):
        state, iters, res = system.step(state, params=params)
    jax.block_until_ready(state["u"])
    dt_wall = time.perf_counter() - t0

    steps_per_sec = n_timed / dt_wall
    elems_per_sec = steps_per_sec * mesh.n_elems
    # measured single-core oracle x 8 ideal MPI ranks (PARITY.md section 4)
    baseline_steps_per_sec = 0.64
    u = np.asarray(state["u"])
    assert np.isfinite(u).all() and (u >= 0).all()

    print(json.dumps({
        "metric": "PIHNA brain-scale (24.4k nodes/131.7k TET4, 5 vars) time steps/sec",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / baseline_steps_per_sec, 2),
        "elements_assembled_per_sec": round(elems_per_sec, 0),
        "krylov_iters_last_step": int(iters),
        "linear_residual": float(res),
        "n_nodes": mesh.n_nodes,
        "n_elems": mesh.n_elems,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
