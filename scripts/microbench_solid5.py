"""Round-5 solid slot-pull measurement: gather-assemble sub-stage + e2e.

microbench_solid4 split measured (TPU v5e, 48^3 HEX8, f32 tangent,
scalar-out programs): eval 26 ms, +contraction 494 ms, +scatter 5668 ms.
This script measures the GATHER-assemble replacement (the production
path since commit 1012f56) and the end-to-end load-step variants on the
new assembly.  Persistent compile cache so re-runs are cheap.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python3 -u scripts/microbench_solid5.py [gather] [A] [C] [D]
"""

import os
import sys
import time

import numpy as np

os.environ["RDCFES_SOLID_FAST"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


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

    from rdcfes_tpu.fem.assembly import assemble_matrix_gather
    from rdcfes_tpu.mesh import box_hex_mesh
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

    which = set(sys.argv[1:]) or {"gather", "A", "C", "D"}

    if "gather" in which:
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

        def kernels_gather(x):
            Fe, Ke = element_kernels_cf("HEX8", x, conn, X032, yg, ps,
                                        fk, rt, fb, pt32)
            v = assemble_matrix_gather(Ke, blk["slot_gather"])
            return jnp.sum(Fe) + jnp.sum(v)

        jg = jax.jit(kernels_gather)
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
