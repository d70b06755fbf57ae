"""Phase split of the solid load step at bench scale (110k HEX8).

Times, with forced host-fetch syncs (the axon tunnel makes
block_until_ready a no-op — PERF.md section 1):

  1. constitutive assemble (R + tangent values)   [once per Newton iter]
  2. residual-only assemble                       [line-search trials]
  3. ELL conversion + block-Jacobi build          [once per Newton iter]
  4. one preconditioned ELL matvec                [per Krylov iter]
  5. the full linear_solve at the bench tolerance [once per Newton iter]

Decides where the solid perf attack goes (the Beneš-gather question:
is the ELL matvec's x-gather the dominant cost the way the qp-apply
gathers were for the RDC step?).

Run on the TPU:  PYTHONPATH="/root/repo:$PYTHONPATH" python3 scripts/microbench_solid.py
"""

import time

import numpy as np


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(label, fn, n=5):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{label:<44}{1e3 * dt:10.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0], flush=True)

    from functools import partial

    from rdcfes_tpu.fem.bcsr import ell_matvec, to_ell
    from rdcfes_tpu.mesh import box_hex_mesh
    from rdcfes_tpu.solvers.krylov import (apply_block_jacobi, bicgstab,
                                           block_jacobi_inverse)
    from rdcfes_tpu.solvers.newton import NewtonOptions
    from rdcfes_tpu.systems.solid import SolidSystem

    n = 48  # 110,592 HEX8 / 117,649 nodes — the bench.py solid workload
    mesh = box_hex_mesh(n, n, n)
    print(f"mesh: {mesh.n_elems} HEX8 / {mesh.n_nodes} nodes", flush=True)
    sys_ = SolidSystem(
        mesh,
        materials={0: {"young": 1.0e3, "poisson": 0.3}},
        bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.2)},
        penalty=1.0e8,
        newton=NewtonOptions(max_linear_iterations=20000),
    )
    pt = jnp.asarray(0.5, jnp.float64)
    x0 = sys_.initial_positions().T  # (3, N)

    R, values = sys_._assemble_jit(x0, pt)
    sync(R)
    timeit("assemble (R + tangent values)",
           lambda: sync(sys_._assemble_jit(x0, pt)[1]))
    timeit("assemble residual only",
           lambda: sync(sys_._residual_jit(x0, pt)))

    nwt = sys_._newton
    prep = jax.jit(lambda v: (to_ell(v, nwt._ell_slot),
                              block_jacobi_inverse(v, nwt._diag_slots)))
    values_ell, Dinv = prep(values)
    sync(Dinv)
    timeit("ELL conversion + block-Jacobi build",
           lambda: sync(prep(values)[1]))

    mv = jax.jit(lambda y: apply_block_jacobi(
        Dinv, ell_matvec(values_ell, nwt._ell_cols, y)))
    y0 = mv(-R)
    sync(y0)
    timeit("preconditioned ELL matvec (f64)", lambda: sync(mv(-R)), n=20)

    # marginal cost per matvec inside a chained loop (dispatch-free)
    def chain(m):
        def body(i, y):
            return mv(y) + 1e-30 * i
        return jax.jit(partial(jax.lax.fori_loop, 0, m, body))

    c10, c50 = chain(10), chain(50)
    sync(c10(-R))
    sync(c50(-R))
    t10 = timeit("  chain 10 matvecs", lambda: sync(c10(-R)), n=5)
    t50 = timeit("  chain 50 matvecs", lambda: sync(c50(-R)), n=5)
    print(f"  marginal per in-loop matvec: {1e3 * (t50 - t10) / 40:.3f} ms")

    def lin():
        res = bicgstab(mv, apply_block_jacobi(Dinv, -R), rtol=1e-3,
                       maxiter=20000)
        return sync(res.iters)

    iters = lin()
    timeit(f"full linear solve (rtol 1e-3, {iters:.0f} iters)", lin, n=3)


if __name__ == "__main__":
    main()
