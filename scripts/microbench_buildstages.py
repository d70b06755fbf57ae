"""Stage-level decomposition of the f64 build tax (buildsplit follow-up).

STATUS: the standalone-stage methodology is UNRELIABLE over the axon
tunnel — measured 2026-08-19: stage "f64 permute alone" (17.4 ms) cost
12x its own superset "permute + C_x sum" (1.5 ms), and the f64 coef
build standalone (251 ms) exceeded the WHOLE production step (29.8 ms)
by 8x.  Per-dispatch artifacts (argument re-upload / queue behavior of
the remote runtime) dominate small standalone programs.  Use
microbench_buildsplit.py (end-to-end deltas on the real 40-step scan
program) as the only trustworthy instrument; this file is kept as a
record of the failed approach.
"""

import os
import time
from functools import partial

import numpy as np

os.environ.setdefault("RDCFES_FAST_SCAN", "0")


def main():
    import jax
    import jax.numpy as jnp

    from rdcfes_tpu.fem.pallas_apply import stack_blocks_affine
    from rdcfes_tpu.fem.pallas_perm import (gather_corners_f64,
                                            grid_permute_f64)
    from rdcfes_tpu.fem.weakform import (block_diag_affine, block_rhs_affine,
                                         diffusion_presum)
    from rdcfes_tpu.fem.assembly import interpolate_ue_affine
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import default_params, pihna_blocks, \
        pihna_physics
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

    sys_ = TransientRDCSystem(mesh, 5, pihna_physics,
                              physics_blocks=pihna_blocks,
                              precision="mixed", precond_refresh=20)
    V = 5
    fast = sys_._fast_tables()
    fp = fast["plans"]
    fa = sys_._fast_args()
    g = sys_._geom_args()
    EL = fast["EL"]
    phi = sys_.phi

    def plans_from(fa):
        fwd = fast["fwd"]._replace(**dict(zip(
            ("iL1", "iB1t", "jA1", "rA", "jA2", "iB2t", "iL2"), fa[0])))
        rev = fast["rev"]._replace(**dict(zip(
            ("iL1", "iB1t", "jA1", "rA", "jA2", "iB2t", "iL2"), fa[1])))
        return fwd, rev

    u_T = jnp.asarray(u0.T)

    def timeit(tag, fn, *args, reps=50):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x).ravel()[:1], out)  # sync
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        ms = (time.perf_counter() - t0) * 1e3 / reps
        print(f"{tag:46s} {ms:8.3f} ms", flush=True)
        return out, ms

    # ---- stage 1: f64 corner gather of u -------------------------------
    @partial(jax.jit)
    def s1_gather(fa, x):
        dfwd, _ = plans_from(fa)
        xp = jnp.pad(x, ((0, 0), (0, fp.NR * 128 - fp.N)))
        ue = gather_corners_f64(dfwd, xp.reshape(V, fp.NR, 128), fp.C_x,
                                interpret=False, channels=2 * V)
        return ue.reshape(V, fp.K, fp.E_pad)

    ue_pad, t1 = timeit("1: f64 corner gather (hi/lo kernel)", s1_gather,
                        fa, u_T)

    # ---- stage 2: interp + physics + Fe + Epre (f64 XLA) ----------------
    @partial(jax.jit)
    def s2_coef(ue_pad, JxW, dphi):
        ue = ue_pad[:, :, :fp.E]
        u_qp, gx1 = interpolate_ue_affine(ue, phi, dphi)
        grad_qp = jnp.broadcast_to(
            gx1[:, None], (V,) + u_qp.shape[1:2] + gx1.shape[1:])
        wfb = pihna_blocks(u_qp, grad_qp, {}, params)
        Fe = block_rhs_affine(wfb, phi, JxW, dphi)
        Epre = diffusion_presum(wfb, JxW)
        return wfb, Fe, Epre

    (wfb, Fe, Epre), t2 = timeit("2: interp+physics+Fe+Epre (f64, mat.)",
                                 s2_coef, ue_pad, g["JxW"], g["dphi"])

    # ---- stage 2b: same but all-f32 (bounding the f64 arithmetic tax) --
    @partial(jax.jit)
    def s2b_coef32(ue_pad, JxW32, dphi32):
        ue = ue_pad[:, :, :fp.E].astype(jnp.float32)
        u_qp, gx1 = interpolate_ue_affine(ue, phi, dphi32)
        grad_qp = jnp.broadcast_to(
            gx1[:, None], (V,) + u_qp.shape[1:2] + gx1.shape[1:])
        wfb = pihna_blocks(u_qp, grad_qp, {}, params)
        Fe = block_rhs_affine(wfb, phi, JxW32, dphi32)
        Epre = diffusion_presum(wfb, JxW32)
        return wfb, Fe, Epre

    _, t2b = timeit("2b: interp+physics+Fe+Epre (all f32)",
                    s2b_coef32, ue_pad, g["JxW32"], g["dphi32"])

    # ---- stage 3: f64 restrict of Fe -> b -------------------------------
    @partial(jax.jit)
    def s3_restrict(fa, Fe):
        _, drev = plans_from(fa)
        yb = jnp.pad(Fe, ((0, 0), (0, 0), (0, fp.E_pad - fp.E)))
        gperm = grid_permute_f64(drev, yb.reshape(V, fp.A * 128, 128),
                                 interpret=False, channels=2 * V)
        return gperm.reshape(V, fp.C_x, fp.NR * 128).sum(axis=1)[:, :fp.N]

    b, t3 = timeit("3: f64 restrict (permute + C_x sum)", s3_restrict,
                   fa, Fe)

    # ---- stage 3b: the permute alone (isolating the XLA f64 C_x sum) ---
    @partial(jax.jit)
    def s3b_permute(fa, Fe):
        _, drev = plans_from(fa)
        yb = jnp.pad(Fe, ((0, 0), (0, 0), (0, fp.E_pad - fp.E)))
        return grid_permute_f64(drev, yb.reshape(V, fp.A * 128, 128),
                                interpret=False, channels=2 * V)

    _, t3b = timeit("3b: f64 permute alone (no C_x sum)", s3b_permute,
                    fa, Fe)

    # ---- stage 4: f32 cast + stack for the fused apply -----------------
    @partial(jax.jit)
    def s4_stacks(wfb, JxW32):
        wfb32 = wfb.cast(jnp.float32)
        Epre32 = diffusion_presum(wfb32, JxW32)
        return stack_blocks_affine(wfb32, Epre32, EL)

    stacks, t4 = timeit("4: f32 cast + stack_blocks_affine", s4_stacks,
                        wfb, g["JxW32"])

    # ---- stage 5: diag build (amortized /20 in production) -------------
    @partial(jax.jit)
    def s5_diag(wfb, JxW, dphi, node_gather):
        diag_e = block_diag_affine(wfb, phi, JxW, dphi)
        return sys_._diag_blocks(diag_e, node_gather)

    _, t5 = timeit("5: f64 diag blocks (full, /20 in prod)", s5_diag,
                   wfb, g["JxW"], g["dphi"], g["node_gather"])

    # ---- stage 6: one f64 fast matvec (the r0 residual) -----------------
    from rdcfes_tpu.fem.weakform import qp_apply_affine

    @partial(jax.jit)
    def s6_mv64(fa, wfb, Epre, JxW, dphi, x):
        dfwd, drev = plans_from(fa)
        xp = jnp.pad(x, ((0, 0), (0, fp.NR * 128 - fp.N)))
        ue = gather_corners_f64(dfwd, xp.reshape(V, fp.NR, 128), fp.C_x,
                                interpret=False, channels=2 * V)
        ue = ue.reshape(V, fp.K, fp.E_pad)[:, :, :fp.E]
        x_qp, gx = interpolate_ue_affine(ue, phi, dphi)
        Ye = qp_apply_affine(wfb, Epre, phi, JxW, dphi, x_qp, gx)
        yb = jnp.pad(Ye, ((0, 0), (0, 0), (0, fp.E_pad - fp.E)))
        gperm = grid_permute_f64(drev, yb.reshape(V, fp.A * 128, 128),
                                 interpret=False, channels=2 * V)
        return gperm.reshape(V, fp.C_x, fp.NR * 128).sum(axis=1)[:, :fp.N]

    _, t6 = timeit("6: one full f64 matvec (r0)", s6_mv64,
                   fa, wfb, Epre, g["JxW"], g["dphi"], u_T)

    print(f"\nsum 1+2+3+4+6 (step build w/o diag)  "
          f"{t1 + t2 + t3 + t4 + t6:8.3f} ms  (C was ~17.9)")
    print(f"f64 coef-arithmetic tax (2 - 2b)      {t2 - t2b:8.3f} ms")
    print(f"C_x-sum share of restrict (3 - 3b)    {t3 - t3b:8.3f} ms")


if __name__ == "__main__":
    main()
