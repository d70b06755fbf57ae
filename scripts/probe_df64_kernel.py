"""Validate + time the df64 interp Pallas kernel (fem/pallas_df64.py).

Two questions, in order:
 1. Does Mosaic preserve the compensated arithmetic?  (XLA at the graph
    level does NOT — it folds TwoSum/Dekker networks to plain f32; see
    scripts/probe_df64.py.)  PASS = compiled-kernel accuracy ~1e-13
    relative vs the f64 reference at PIHNA bench shapes.
 2. What does it cost vs the XLA-f64 interpolate_ue_affine?

Run: PYTHONPATH=/root/repo:$PYTHONPATH python3 -u scripts/probe_df64_kernel.py
CPU (interpret-mode semantics only): JAX_PLATFORMS=cpu ... --interpret
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def main():
    from rdcfes_tpu.fem.assembly import interpolate_ue_affine
    from rdcfes_tpu.fem.pallas_df64 import (interp_affine_df64, join_f64,
                                            split_f64)

    interpret = "--interpret" in sys.argv
    print("device:", jax.devices()[0], "interpret:", interpret, flush=True)

    V, Q, K, E = 5, 4, 4, 135168  # 33 * 4096: PIHNA bench class
    rng = np.random.default_rng(0)
    ue = rng.standard_normal((V, K, E)) * np.exp(
        rng.uniform(-3, 3, (V, K, E)))
    phi = rng.uniform(0.05, 0.6, (Q, K))
    dphi = rng.standard_normal((Q, K, 3, E))
    dphi[:] = dphi[0]  # affine: q-invariant

    uej = jnp.asarray(ue)
    phij = jnp.asarray(phi)
    dphij = jnp.asarray(dphi)

    # f64 reference
    ref_fn = jax.jit(lambda u: interpolate_ue_affine(u, phij, dphij))
    uq_ref, gx_ref = ref_fn(uej)
    uq_ref = np.asarray(uq_ref)
    gx_ref = np.asarray(gx_ref)

    ue_pair = split_f64(uej)
    dp_pair = split_f64(dphij[0])

    kern_fn = jax.jit(lambda up, dp: interp_affine_df64(
        up, phi, dp, interpret=interpret))
    (uqh, uql), (gxh, gxl) = kern_fn(ue_pair, dp_pair)
    uq = np.asarray(uqh, np.float64) + np.asarray(uql, np.float64)
    gx = np.asarray(gxh, np.float64) + np.asarray(gxl, np.float64)

    ru = np.abs(uq - uq_ref).max() / np.abs(uq_ref).max()
    rg = np.abs(gx - gx_ref).max() / np.abs(gx_ref).max()
    print(f"u_qp rel err {ru:.3e}   gx rel err {rg:.3e}", flush=True)
    ok = ru < 1e-11 and rg < 1e-11
    print("ACCURACY", "PASS" if ok else "FAIL", flush=True)
    if interpret:
        return

    def timeit(label, fn, n=20):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / n
        print(f"{label:<44}{1e3 * dt:9.3f} ms", flush=True)
        return dt

    # scalar-out timed programs (axon tunnel out of the loop)
    jref = jax.jit(lambda u: sum(jnp.sum(o)
                                 for o in interpolate_ue_affine(u, phij,
                                                                dphij)))
    jdf = jax.jit(lambda up, dp: (lambda r: jnp.sum(r[0][0]) +
                                  jnp.sum(r[0][1]) + jnp.sum(r[1][0]) +
                                  jnp.sum(r[1][1]))(
        interp_affine_df64(up, phi, dp)))
    # df64 including the XLA-side join to f64 (what the physics consumes)
    jdfj = jax.jit(lambda up, dp: (lambda r: jnp.sum(join_f64(*r[0])) +
                                   jnp.sum(join_f64(*r[1])))(
        interp_affine_df64(up, phi, dp)))
    timeit("interp_ue_affine XLA f64", lambda: float(jref(uej)))
    timeit("interp df64 kernel (pairs out)", lambda: float(jdf(ue_pair,
                                                              dp_pair)))
    timeit("interp df64 kernel + f64 join", lambda: float(jdfj(ue_pair,
                                                               dp_pair)))


if __name__ == "__main__":
    main()
