"""Production-step composition by END-TO-END deltas (the phase
microbench isolates materialized phases, which XLA fusion makes
non-additive — measured: physics_blocks alone 48 ms/iter while the
whole production step is 29.8 ms).

Three variants of the REAL bench step program, 40 steps each:
  A: production (inner sweeps + outer refinement + diag refresh@20)
  B: rtol=1e30  (Krylov skipped after the first outer residual:
     measures assembly + coefficient build + 1 f64 matvec + clamp)
  C: B + precond_refresh=10**9 (diag built once, amortized to zero)
A-B = Krylov cost/step; B-C = diag-build cost/step at refresh=20;
C = the irreducible per-step build cost to attack next.

Run on the TPU: PYTHONPATH=/root/repo python scripts/microbench_stepsplit.py
"""

import os
import time

import numpy as np

os.environ["RDCFES_FAST_SCAN"] = "1"
os.environ.setdefault("RDCFES_SCAN_SEGMENT", "40")


def main():
    import jax

    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import default_params, pihna_blocks, pihna_physics
    from rdcfes_tpu.systems import TransientRDCSystem

    print("device:", jax.devices()[0], flush=True)
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
    params = {k: float(v) for k, v in params.items()}
    rng = np.random.default_rng(0)
    u0 = np.zeros((mesh.n_nodes, 5))
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0[:, 1] = 2000.0 * np.exp(-r2 / (2 * 25.0**2))
    u0[:, 2] = 500.0 * np.exp(-r2 / (2 * 30.0**2))
    u0[:, 3] = 7200.0 * (1.0 + 0.1 * rng.random(mesh.n_nodes))
    u0[:, 4] = 1e-10

    def run(tag, rtol, refresh):
        sys_ = TransientRDCSystem(mesh, 5, pihna_physics,
                                  physics_blocks=pihna_blocks,
                                  precision="mixed", rtol=rtol,
                                  precond_refresh=refresh)
        st, _, _ = sys_.run_steps(sys_.initial_state(u0), 40,
                                  params=params)
        np.asarray(st["u"])  # real sync
        t0 = time.perf_counter()
        st, its, _ = sys_.run_steps(sys_.initial_state(u0), 40,
                                    params=params)
        np.asarray(st["u"])
        ms = (time.perf_counter() - t0) * 1e3 / 40
        print(f"{tag:38s} {ms:7.2f} ms/step   inner iters "
              f"{int(np.asarray(its).sum())}", flush=True)
        return ms

    a = run("A: production (rtol 1e-10, refresh 20)", 1e-10, 20)
    b = run("B: Krylov skipped (rtol 1e30)", 1e30, 20)
    c = run("C: B + diag built once", 1e30, 10**9)
    print(f"Krylov (A-B)            {a - b:7.2f} ms/step")
    print(f"diag build @20 (B-C)    {b - c:7.2f} ms/step")
    print(f"irreducible build (C)   {c:7.2f} ms/step")


if __name__ == "__main__":
    main()
