"""ADPM solver-tolerance calibration against the independent oracle.

The PIHNA calibration (drivers/common.py, round 5) measured 120-step
trajectory parity of 1.6e-9 at rtol 3e-11 — 6x inside the 1e-8 contract
— and rejected 1e-10 (7.0e-9, 1.4x margin).  The ADPM leg is
Krylov-BOUND (26 inner iters/step at the bench), so ITS margin is worth
measuring separately: the operator (3 vars, tract-gated taxis) and its
residual->error amplification differ from PIHNA's.

Setup mirrors the bench regime at reduced node count but IDENTICAL
element size (bounds scale with n), so the taxis CFL and conditioning
match the bench mesh.  The oracle steps with scipy spsolve (direct) —
the trajectory difference is therefore entirely the framework's
linear-solve truncation + formulation.

Run on CPU: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python3 scripts/calibrate_adpm_rtol.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax.numpy as jnp

    from oracle.adpm_numpy import AdpmOracle
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.adpm import adpm_physics, adpm_blocks, default_params
    from rdcfes_tpu.systems import TransientRDCSystem

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    # same element size as the bench mesh (n=28 over 150x180x150 mm)
    s = n / 28.0
    mesh = box_tet_mesh(n, n, n, bounds=((0, 150.0 * s), (0, 180.0 * s),
                                         (0, 150.0 * s)))
    print(f"mesh: {mesh.n_nodes} nodes / {mesh.n_elems} tets "
          f"(bench-matched element size)", flush=True)

    p = default_params()
    p.update(
        dt=0.05,
        decay_PrP=1.0e-4, decay_PrP_pulse0=0.01, decay_PrP_pulse1=10.0,
        taxis1_A_b=50.0, taxis1_A_b_pulse0=-1.0, taxis1_A_b_pulse1=0.01,
        taxis1_Tau=50.0, taxis1_Tau_pulse0=-1.0, taxis1_Tau_pulse1=0.01,
        decay_Tau=1.0e1, decay_Tau_pulse0=0.0005, decay_Tau_pulse1=1.0e20,
        diffuse_A_b=2e-4, diffuse_A_b_pulse0=-1.0, diffuse_A_b_pulse1=1e20,
    )
    p = {k: float(v) for k, v in p.items()}
    rng = np.random.default_rng(0)
    N = mesh.n_nodes
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0 = np.zeros((N, 3))
    u0[:, 0] = 1.0
    u0[:, 1] = 1e-3 * np.exp(-r2 / (2 * (20.0 * s) ** 2))
    u0[:, 2] = 1e-4 * np.exp(-r2 / (2 * (15.0 * s) ** 2))
    tracts = rng.standard_normal((mesh.n_elems, 3))
    tracts /= np.linalg.norm(tracts, axis=1, keepdims=True)
    fields = {"tracts": jnp.asarray(tracts), "time": 1.0}

    # oracle trajectory once (direct solves)
    orc = AdpmOracle(mesh.coords, mesh.connectivity, tracts, p)
    t0 = time.perf_counter()
    uo_traj = []
    uo = u0.copy()
    for _ in range(steps):
        uo, _ = orc.step(uo, time=1.0)
        uo_traj.append(uo.copy())
    print(f"oracle: {steps} direct-solve steps in "
          f"{time.perf_counter() - t0:.1f} s", flush=True)

    for rtol in (3e-11, 1e-10, 1e-9, 3e-9, 1e-8):
        system = TransientRDCSystem(mesh, 3, adpm_physics,
                                    physics_blocks=adpm_blocks, rtol=rtol,
                                    precision="mixed", precond_refresh=10)
        state = system.initial_state(u0)
        worst = 0.0
        iters = 0
        for k in range(steps):
            state, its, _ = system.step(state, fields=fields, params=p)
            iters += int(np.asarray(its))
            ur = np.asarray(state["u"])
            rel = np.linalg.norm(ur - uo_traj[k]) / np.linalg.norm(uo_traj[k])
            worst = max(worst, rel)
        margin = 1e-8 / worst if worst > 0 else float("inf")
        print(f"rtol {rtol:7.0e}: worst rel L2 {worst:.3e} "
              f"(margin {margin:6.1f}x), inner iters {iters} "
              f"({iters / steps:.1f}/step)", flush=True)


if __name__ == "__main__":
    main()
