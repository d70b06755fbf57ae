"""Soak test: the ADPM 400-step bench through RDCFES_FAST_SCAN=1
(scan-batched segments WITH the Pallas kernels inside) vs the default
per-step dispatch.  Both must agree at solver tolerance; prints both
wall rates so bench.py can adopt the faster, validated path.

Workload copied verbatim from bench.py adpm_bench.

Run on the TPU:  python scripts/soak_adpm_scan.py
"""

import os
import time

import numpy as np


def build():
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
    p = {k: float(v) for k, v in p.items()}
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


def main():
    import jax
    import jax.numpy as jnp

    from rdcfes_tpu.models.adpm import adpm_blocks, adpm_physics
    from rdcfes_tpu.systems import TransientRDCSystem

    print("device:", jax.devices()[0], flush=True)
    mesh, p, u0, tracts = build()

    results = {}
    for mode in ("scan", "step"):
        if mode == "scan":
            os.environ["RDCFES_FAST_SCAN"] = "1"
            os.environ["RDCFES_SCAN_SEGMENT"] = "50"
        else:
            os.environ.pop("RDCFES_FAST_SCAN", None)
        system = TransientRDCSystem(mesh, 3, adpm_physics,
                                    physics_blocks=adpm_blocks,
                                    precision="mixed", precond_refresh=10)
        fields = {"tracts": jnp.asarray(tracts), "time": 1.0}
        st_w, _, _ = system.run_steps(system.initial_state(u0), 50,
                                      fields=fields, params=p)  # warmup
        np.asarray(st_w["u"])
        state = system.initial_state(u0)
        total_iters = 0
        t0 = time.perf_counter()
        for _ in range(8):
            state, its, ress = system.run_steps(state, 50, fields=fields,
                                                params=p)
            total_iters += int(np.asarray(its).sum())
        u = np.asarray(state["u"])  # data fetch = real sync
        wall = time.perf_counter() - t0
        assert np.isfinite(u).all()
        results[mode] = (u, 400 / wall, total_iters,
                         float(np.asarray(ress)[-1]))
        print(f"{mode:5s}: {400 / wall:7.2f} steps/s, iters={total_iters},"
              f" res={results[mode][3]:.2e}", flush=True)

    ua, ub = results["scan"][0], results["step"][0]
    rel = np.linalg.norm(ua - ub) / np.linalg.norm(ub)
    print(f"scan-vs-step relative L2: {rel:.3e}", flush=True)
    assert rel < 1e-10, rel
    print("SOAK OK", flush=True)


if __name__ == "__main__":
    main()
