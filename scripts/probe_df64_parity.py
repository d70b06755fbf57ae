"""Trajectory-parity gate for the df64 build path (RDCFES_DF64_BUILD).

Runs the calibration case of PARITY.md §3/§10 — the 4x4x4 TET4 box with
every PIHNA term active, framework (TPU fast path, mixed, rtol 3e-11)
vs the independent SuperLU oracle — for 120 steps, with the df64 build
off and on.  Ship gate: the df64 worst per-step rel L2 must stay in the
same class as the calibrated 1.6e-9 (>=5x inside the 1e-8 contract).

The box stress workload is NOT this gate: its fields collapse 13 orders
and chaos-amplify solver-class noise (microbench_df64.py's 3.6e-8
global L2 against itself at 40 steps says nothing about the contract —
the contract binds on dynamics-stable decks, per PARITY.md §10).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python3 -u scripts/probe_df64_parity.py
"""

import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.pop("RDCFES_FAST_SCAN", None)

import jax


def _case():
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import default_params

    mesh = box_tet_mesh(4, 4, 4, bounds=((0, 20.0),) * 3)
    Kk = 2.39e5
    p = default_params()
    p.update(
        dt=0.1, cells_min_capacity=1.0, cells_max_capacity=Kk,
        cells_max_capacity_exponent=3.0, cytokines_max_capacity=1e-8,
        necrosis_c=500 / Kk, necrosis_h=200 / Kk, necrosis_v=300 / Kk,
        produce_c=-2.5, switch_c2h=1.0, switch_h2c=1.82, switch_h2n=0.5,
        diffuse_c=0.5, taxis_c=2e-5, diffuse_h=1.0, taxis_h=4e-5,
        diffuse_v=0.2, taxis_v=1e-4, produce_v=10.0,
        secrete_a_c=2.77e-13, secrete_a_h=5.22e-10, uptake_a_v=1e-3,
        decay_a=5678.4,
    )
    p = {k: float(v) for k, v in p.items()}
    N = mesh.n_nodes
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(1)
    u0 = np.zeros((N, 5))
    u0[:, 0] = 50.0 * np.exp(-r2 / 20.0)
    u0[:, 1] = 2000.0 * np.exp(-r2 / 30.0)
    u0[:, 2] = 500.0 * np.exp(-r2 / 25.0)
    u0[:, 3] = 7200.0 * np.exp(-r2 / 200.0)
    u0[:, 4] = 1e-10 * np.exp(-r2 / 50.0)
    return mesh, p, u0


def main():
    import sys
    sys.path.insert(0, "/root/repo")
    from oracle import PihnaOracle

    from rdcfes_tpu.models.pihna import pihna_blocks, pihna_physics
    from rdcfes_tpu.systems import TransientRDCSystem

    print("device:", jax.devices()[0], flush=True)
    mesh, p, u0 = _case()
    n_steps = 120

    def run(df64):
        os.environ["RDCFES_DF64_BUILD"] = "1" if df64 else "0"
        system = TransientRDCSystem(mesh, 5, pihna_physics, rtol=3e-11,
                                    physics_blocks=pihna_blocks,
                                    precision="mixed")
        ft = system._fast_tables()
        active = bool(ft and ft.get("use_df64"))
        assert active == df64, (active, df64)
        orc = PihnaOracle(mesh.coords, mesh.connectivity, p)
        state = system.initial_state(u0)
        uo = u0.copy()
        worst = 0.0
        for i in range(n_steps):
            state, _, _ = system.step(state, params=p)
            uo, _ = orc.step(uo)
            rel = (np.linalg.norm(np.asarray(state["u"]) - uo)
                   / np.linalg.norm(uo))
            worst = max(worst, rel)
        print(f"df64={int(df64)}: worst per-step rel L2 over {n_steps} "
              f"steps = {worst:.3e}", flush=True)
        return worst

    w0 = run(False)
    w1 = run(True)
    bar = 1e-8
    print(f"contract bar 1e-8: f64 margin {bar / max(w0, 1e-300):.1f}x, "
          f"df64 margin {bar / max(w1, 1e-300):.1f}x", flush=True)
    print("SHIP" if w1 < 2e-9 else ("OK (opt-in)" if w1 < bar / 2
                                    else "FAIL"), flush=True)


if __name__ == "__main__":
    main()
