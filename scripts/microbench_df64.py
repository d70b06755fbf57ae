"""End-to-end delta for the df64 build interp (RDCFES_DF64_BUILD).

Same instrument as microbench_buildsplit.py (the bench PIHNA workload,
40-step scans, one device sync per run): production step with the
XLA-f64 interp vs the paired-f32 Pallas interp kernel, plus the
Krylov-skipped build floor both ways.  Also reports the 40-step state
drift between the two paths (must sit in the ~1e-11 class, far inside
the 1e-8/step parity contract).

Run on the TPU: PYTHONPATH=/root/repo:$PYTHONPATH python3 -u scripts/microbench_df64.py
"""

import os
import time

import numpy as np

os.environ["RDCFES_FAST_SCAN"] = "1"
os.environ.setdefault("RDCFES_SCAN_SEGMENT", "40")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main():
    import jax
    import jax.numpy as jnp

    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import (default_params, pihna_blocks,
                                         pihna_physics)
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

    def run(tag, rtol, refresh, df64):
        os.environ["RDCFES_DF64_BUILD"] = "1" if df64 else "0"
        sys_ = TransientRDCSystem(mesh, 5, pihna_physics,
                                  physics_blocks=pihna_blocks,
                                  precision="mixed", rtol=rtol,
                                  precond_refresh=refresh)
        st, _, _ = sys_.run_steps(sys_.initial_state(u0.astype(np.float64)),
                                  40, params=params)
        np.asarray(st["u"])  # real sync
        t0 = time.perf_counter()
        st, its, _ = sys_.run_steps(sys_.initial_state(u0), 40,
                                    params=params)
        u = np.asarray(st["u"])
        ms = (time.perf_counter() - t0) * 1e3 / 40
        print(f"{tag:48s} {ms:7.2f} ms/step   inner iters "
              f"{int(np.asarray(its).sum())}", flush=True)
        return ms, u

    a0, u_ref = run("A: production rtol 3e-11 (XLA f64 interp)",
                    3e-11, 20, False)
    a1, u_df = run("Adf: production rtol 3e-11 (df64 interp)",
                   3e-11, 20, True)
    # the CONTRACT metric: global relative L2 (PARITY.md) — a per-var
    # relative metric is meaningless for AIF, which sits at ~5e-11
    # absolute scale where solver-tolerance-class differences look O(1)
    l2 = np.linalg.norm(u_df - u_ref) / np.linalg.norm(u_ref)
    print(f"40-step state drift, global rel L2 (contract metric): {l2:.3e}")
    for v in range(u_ref.shape[1]):
        sc = np.abs(u_ref[:, v]).max()
        d = np.abs(u_df[:, v] - u_ref[:, v]).max()
        print(f"  var {v}: scale {sc:.3e}  max|diff| {d:.3e}")
    c0, _ = run("C: Krylov skipped (XLA f64 interp)", 1e30, 10**9, False)
    c1, _ = run("Cdf: Krylov skipped (df64 interp)", 1e30, 10**9, True)
    print(f"df64 interp delta: production {a0 - a1:+.2f} ms/step, "
          f"build floor {c0 - c1:+.2f} ms/step")


if __name__ == "__main__":
    main()
