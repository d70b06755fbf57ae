"""Solid load-step phase split with SCALAR-output programs.

microbench_solid.py's sync() fetched each stage's full output over the
axon tunnel — for the (3, 3, nnz) tangent values that is ~220 MB, so its
"assemble 15.3 s" was mostly network, not compute.  Here every timed
program reduces its outputs to ONE scalar inside jit (jnp.sum forces the
computation; 8 bytes cross the tunnel).

Stages at the bench scale (110,592 HEX8 / 117,649 nodes):
  1. assemble f64 (R + tangent values)       [once per Newton iter]
  2. assemble residual-only f64              [line-search trials]
  3. assemble f32 (R + tangent values)       [the tangent-precision lever]
  4. to_ell + block-Jacobi build (f64 / f32)
  5. full linear solve at Newton tolerance (mixed path, via the real
     NewtonSolver._linear_solve — iters/res are scalars already)

Run on the TPU: PYTHONPATH="/root/repo:$PYTHONPATH" python3 -u scripts/microbench_solid2.py
"""

import os
import time

import numpy as np

# profile the BENCH configuration: Beneš x-gather + mixed-precision
# linear stage (bench.py solid_bench sets the same env)
os.environ["RDCFES_SOLID_FAST"] = "1"


def timeit(label, fn, n=5):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{label:<52}{1e3 * dt:10.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0], flush=True)

    from rdcfes_tpu.fem.bcsr import to_ell
    from rdcfes_tpu.mesh import box_hex_mesh
    from rdcfes_tpu.solvers.krylov import block_jacobi_inverse
    from rdcfes_tpu.solvers.newton import NewtonOptions
    from rdcfes_tpu.systems.solid import SolidSystem

    n = 48
    mesh = box_hex_mesh(n, n, n, bounds=((0, 1.0),) * 3)
    print(f"mesh: {mesh.n_elems} HEX8 / {mesh.n_nodes} nodes", flush=True)
    sys_ = SolidSystem(
        mesh,
        materials={0: {"young": 1.0e3, "poisson": 0.3}},
        bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.05)},
        penalty=1.0e6,
        newton=NewtonOptions(max_nonlinear_iterations=20,
                             relative_residual_tolerance=1e-6,
                             linear_precision="mixed"),
    )
    pt = jnp.asarray(0.5, jnp.float64)
    x0 = sys_.initial_positions().T  # (3, N)

    s = lambda t: sum(jnp.sum(v) for v in t if v is not None)

    a_full = jax.jit(lambda x: s(sys_.assemble(x, pt)))
    a_res = jax.jit(lambda x: s((sys_.assemble_residual(x, pt),)))

    timeit("assemble f64 (R + tangent), scalar out",
           lambda: float(a_full(x0)), n=3)
    timeit("assemble residual-only f64, scalar out",
           lambda: float(a_res(x0)), n=5)

    nwt = sys_._newton
    R, values = sys_._assemble_jit(x0, pt)
    jax.block_until_ready(values)
    prep64 = jax.jit(lambda v: jnp.sum(to_ell(v, nwt._ell_slot))
                     + jnp.sum(block_jacobi_inverse(v, nwt._diag_slots)))
    prep32 = jax.jit(lambda v: jnp.sum(
        to_ell(v.astype(jnp.float32), nwt._ell_slot))
        + jnp.sum(block_jacobi_inverse(v, nwt._diag_slots)))
    timeit("to_ell + block-Jacobi f64, scalar out",
           lambda: float(prep64(values)), n=5)
    timeit("cast->f32 to_ell + f64 Jacobi, scalar out",
           lambda: float(prep32(values)), n=5)

    solve = jax.jit(lambda v, rhs: nwt._linear_solve(v, rhs, 1e-3)[1:])
    def lin():
        it, res = solve(values, -R)
        return int(it), float(res)
    it, res = lin()
    print(f"   linear solve: {it} iters, res {res:.2e}", flush=True)
    timeit(f"full mixed linear solve (rtol 1e-3), scalar out", lin, n=3)

    # one full load step end-to-end for the anchor
    t0 = time.perf_counter()
    r = sys_.run_solver(x0.T, 0.5)
    _ = np.asarray(r.x)
    print(f"run_solver end-to-end: {time.perf_counter()-t0:.2f} s, "
          f"{int(r.iters)} Newton iters", flush=True)


if __name__ == "__main__":
    main()
