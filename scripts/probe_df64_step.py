"""One-step drift debug for the df64 build path on hardware.

The 40-step instrument showed drift 0.54 (scripts/microbench_df64.py,
2026-08-20) — far outside the ~1e-13/step class the kernel validates
standalone.  This isolates: per-variable drift after ONE step, and the
u_qp/gx comparison on the system's real gather/geometry tables.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python3 -u scripts/probe_df64_step.py
"""

import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.pop("RDCFES_FAST_SCAN", None)

import jax
import jax.numpy as jnp


def main():
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import (default_params, pihna_blocks,
                                         pihna_physics)
    from rdcfes_tpu.systems import TransientRDCSystem

    print("device:", jax.devices()[0], flush=True)
    n = 12  # small: fast compiles, same code path
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

    def mk(df64):
        os.environ["RDCFES_DF64_BUILD"] = "1" if df64 else "0"
        return TransientRDCSystem(mesh, 5, pihna_physics,
                                  physics_blocks=pihna_blocks,
                                  precision="mixed", rtol=3e-11,
                                  precond_refresh=20)

    s0 = mk(False)
    s1 = mk(True)
    assert s1._fast_tables()["use_df64"], "df64 path not active"

    # direct u_qp / gx comparison on the system's own tables
    from rdcfes_tpu.fem.assembly import interpolate_ue_affine
    from rdcfes_tpu.fem.pallas_df64 import (interp_affine_df64, join_f64,
                                            split_f64)
    fp = s1._fast_tables()["plans"]
    EL = s1._fast_tables()["EL"]
    conn_T = s0.conn_T
    uT = jnp.asarray(u0.T)
    ue = uT[:, conn_T]  # (V, K, E) reference gather
    uq_ref, gx_ref = jax.jit(
        lambda u: interpolate_ue_affine(u, s0.phi, s0.dphi))(ue)
    dpair = s1._fast_tables()["args"][4]

    uep = split_f64(jnp.pad(ue, ((0, 0), (0, 0), (0, EL - fp.E))))
    (uqh, uql), (gxh, gxl) = jax.jit(
        lambda up, dp: interp_affine_df64(up, np.asarray(s0.phi), dp))(
            uep, dpair)
    uq = (np.asarray(uqh, np.float64) + np.asarray(uql, np.float64))[:, :, :fp.E]
    gx = (np.asarray(gxh, np.float64) + np.asarray(gxl, np.float64))[:, :, :fp.E]
    su = np.abs(np.asarray(uq_ref)).max()
    print("u_qp abs err / scale:",
          np.abs(uq - np.asarray(uq_ref)).max() / su, flush=True)
    sg = np.abs(np.asarray(gx_ref)).max()
    print("gx   abs err / scale:",
          np.abs(gx - np.asarray(gx_ref)).max() / sg, flush=True)

    # one transient step, per-var drift
    st0 = s0.initial_state(u0)
    st1 = s1.initial_state(u0)
    r0 = s0.step(st0, params=params)
    r1 = s1.step(st1, params=params)
    ua = np.asarray(r0[0]["u"])
    ub = np.asarray(r1[0]["u"])
    for v in range(5):
        sc = max(np.abs(ua[:, v]).max(), 1e-300)
        print(f"var {v}: scale {sc:.3e}  drift {np.abs(ub[:, v] - ua[:, v]).max() / sc:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
