"""Round-5 solid follow-up: quality-pinned variants + tangent-cost split.

microbench_solid3.py surprises:
  - f32 tangent assembly costs ~5.5 s vs f64's 6.0 s — the tangent cost
    is DTYPE-INSENSITIVE (not the f64-emulation tax).  This script
    splits the assemble into (eval sigma+tan) / (+ Ke contraction) /
    (+ scatter) to find where the 6 s lives.
  - The default relative_step_tolerance=1e-3 let the fast variants stop
    a Newton iteration early at visibly worse residuals (D: 3.8e-3 vs
    A: 1.03e-5).  Variants here pin step_tol=1e-6 so the RESIDUAL rule
    (rel 1e-6, the compiled C++ baseline's stopping rule) binds.

Run on the TPU: PYTHONPATH="/root/repo:$PYTHONPATH" python3 -u scripts/microbench_solid4.py
"""

import os
import sys
import time

import numpy as np

os.environ["RDCFES_SOLID_FAST"] = "1"


def timeit(label, fn, n=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{label:<56}{1e3 * dt:10.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from rdcfes_tpu.fem.assembly import assemble_matrix
    from rdcfes_tpu.fem.geometry import geometry_factors
    from rdcfes_tpu.mesh import box_hex_mesh
    from rdcfes_tpu.models.hyperelastic import stress_and_tangent_cf
    from rdcfes_tpu.solvers.newton import NewtonOptions
    from rdcfes_tpu.systems.solid import SolidSystem, element_kernels_cf

    print("device:", jax.devices()[0], flush=True)
    n = 48
    mesh = box_hex_mesh(n, n, n, bounds=((0, 1.0),) * 3)
    print(f"mesh: {mesh.n_elems} HEX8 / {mesh.n_nodes} nodes", flush=True)
    kw = dict(
        materials={0: {"young": 1.0e3, "poisson": 0.3}},
        bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.05)},
        penalty=1.0e6,
    )
    base = NewtonOptions(max_nonlinear_iterations=30,
                         relative_step_tolerance=1e-6,
                         relative_residual_tolerance=1e-6,
                         linear_precision="mixed")

    which = set(sys.argv[1:]) or {"split", "C", "D"}

    if "split" in which:
        s = SolidSystem(mesh, tangent_precision="f32", **kw)
        blk = s.eblocks[0]
        f32 = jnp.float32
        x32 = jnp.asarray(np.asarray(s.initial_positions()), f32)
        X032 = blk["X0e_cf"].astype(f32)
        yg, ps = blk["young"].astype(f32), blk["poisson"].astype(f32)
        fk, rt = blk["fibre_k"].astype(f32), blk["rates"].astype(f32)
        fb = blk["fibres"].astype(f32)
        pt32 = jnp.asarray(0.5, f32)
        conn = blk["conn"]

        def eval_only(x):
            phi, JxW, dphi = geometry_factors(x, conn, "HEX8")
            Q, K = phi.shape
            grad_X = [[sum(dphi[:, k, r, :] * X032[k, d, :]
                           for k in range(K)) for r in range(3)]
                      for d in range(3)]
            lam_e = 1.0 + pt32 * rt
            sigma, tangent, _ = stress_and_tangent_cf(
                grad_X, [lam_e[:, d] for d in range(3)],
                [fb[:, d] for d in range(3)], yg, ps, fk)
            return (sum(jnp.sum(r_) for row in sigma for r_ in row)
                    + sum(jnp.sum(r_) for row in tangent for r_ in row))

        def kernels(x):
            Fe, Ke = element_kernels_cf("HEX8", x, conn, X032, yg, ps,
                                        fk, rt, fb, pt32)
            return jnp.sum(Fe) + jnp.sum(Ke)

        def kernels_scatter(x):
            Fe, Ke = element_kernels_cf("HEX8", x, conn, X032, yg, ps,
                                        fk, rt, fb, pt32)
            v = assemble_matrix(Ke, blk["slots_flat_cf"], s.sp.nnz)
            return jnp.sum(Fe) + jnp.sum(v)

        from rdcfes_tpu.fem.assembly import assemble_matrix_gather

        def kernels_gather(x):
            Fe, Ke = element_kernels_cf("HEX8", x, conn, X032, yg, ps,
                                        fk, rt, fb, pt32)
            v = assemble_matrix_gather(Ke, blk["slot_gather"])
            return jnp.sum(Fe) + jnp.sum(v)

        je = jax.jit(eval_only)
        jk = jax.jit(kernels)
        js = jax.jit(kernels_scatter)
        jg = jax.jit(kernels_gather)
        timeit("f32 sigma+tangent eval only, scalar out",
               lambda: float(je(x32)))
        timeit("f32 eval + Ke contraction (no scatter), scalar out",
               lambda: float(jk(x32)))
        timeit("f32 eval + contraction + scatter, scalar out",
               lambda: float(js(x32)))
        timeit("f32 eval + contraction + GATHER assemble, scalar out",
               lambda: float(jg(x32)))

    variants = {
        "A": ("A': exact f64, step_tol 1e-6", base, "f64"),
        "B": ("B': f32 tangent, step_tol 1e-6", base, "f32"),
        "C": ("C': reuse tangent, step_tol 1e-6",
              base._replace(reuse_tangent=True), "f64"),
        "D": ("D': f32 tangent + reuse, step_tol 1e-6",
              base._replace(reuse_tangent=True), "f32"),
    }
    ref = None
    for key, (tag, opts, tp) in variants.items():
        if key not in which:
            continue
        s = SolidSystem(mesh, newton=opts, tangent_precision=tp, **kw)
        x0 = s.initial_positions()
        r = s.run_solver(x0, 0.5)
        t0 = time.perf_counter()
        r = s.run_solver(x0, 0.5)
        x = np.asarray(r.x)
        wall = time.perf_counter() - t0
        dscale = np.abs(x - np.asarray(x0)).max()
        if ref is None:
            ref = x
        drift = np.abs(x - ref).max() / dscale
        print(f"{tag:44s} {wall:7.2f} s  conv {r.converged} "
              f"iters {int(r.iters):2d}  res {float(r.residual_norm):.2e} "
              f"r0 {float(r.initial_residual_norm):.2e}  "
              f"drift {drift:.2e}", flush=True)


if __name__ == "__main__":
    main()
