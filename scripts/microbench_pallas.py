"""Microbench: Mosaic (Pallas) sublane-gather and transpose speed, in-loop.

XLA's gather runs at ~0.15-0.2 G indices/s and its take_along_axis
lowering is worse still (microbench_inloop), so the fast-matvec design
hinges on Pallas: Mosaic lowers 2D take_along_axis along axis 0 to the
VPU's per-lane sublane-gather, which should be orders faster.  This
measures it honestly: the kernel runs inside a 20x lax.while_loop with a
scalar data dependency, strict-blocked.

NOTE: runs WITHOUT x64 (Mosaic rejects 64-bit types).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 20


def run_loop(body, init_carry, n=REPS):
    def wl(c):
        def b(s):
            i, c = s
            return i + 1, body(c)
        return jax.lax.while_loop(lambda s: s[0] < n, b, (0, c))[1]

    f = jax.jit(wl)
    jax.block_until_ready(f(init_carry))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(init_carry))
        times.append(time.perf_counter() - t0)
    return np.median(times) * 1e3 / n


def dep(x, y):
    return x * (1.0 + 1e-30 * jnp.sum(y))


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    # ---------------- Pallas TA: small table resident, big idx ----------
    S, M = 192, 4_608          # x-table 192x128 (24.4k nodes), 590k lookups
    TM = 512
    tbl0 = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, S, (M, 128)), jnp.int32)

    def kern(tbl_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

    def ta_call(t):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
            grid=(M // TM,),
            in_specs=[
                pl.BlockSpec((S, 128), lambda m: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, 128), lambda m: (m, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, 128), lambda m: (m, 0),
                                   memory_space=pltpu.VMEM),
        )(t, idx)

    try:
        ms = run_loop(lambda c: dep(c, ta_call(c)), tbl0)
        print(f"Pallas TA 590k lookups (tbl 0.1MB): {ms:7.3f} ms/iter",
              flush=True)
    except Exception as e:
        print("Pallas TA small FAILED:", type(e).__name__, str(e)[:400],
              flush=True)

    # ---------------- Pallas TA: bigger source (restrict-permute shape) --
    S2, M2 = 4_608, 4_608
    tbl2 = jnp.asarray(rng.standard_normal((S2, 128)), jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, S2, (M2, 128)), jnp.int32)

    def ta2_call(t):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M2, 128), jnp.float32),
            grid=(M2 // TM,),
            in_specs=[
                pl.BlockSpec((S2, 128), lambda m: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, 128), lambda m: (m, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, 128), lambda m: (m, 0),
                                   memory_space=pltpu.VMEM),
        )(t, idx2)

    try:
        ms = run_loop(lambda c: dep(c, ta2_call(c)), tbl2)
        print(f"Pallas TA 590k lookups (tbl 2.3MB res): {ms:7.3f} ms/iter",
              flush=True)
    except Exception as e:
        print("Pallas TA big FAILED:", type(e).__name__, str(e)[:400],
              flush=True)

    # ---------------- Pallas transpose (M,128)->(128,M) ------------------
    def tkern(in_ref, out_ref):
        out_ref[:] = in_ref[:].T

    def t_call(t):
        return pl.pallas_call(
            tkern,
            out_shape=jax.ShapeDtypeStruct((128, M2), jnp.float32),
            in_specs=[pl.BlockSpec((M2, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, M2), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(t)

    try:
        ms = run_loop(lambda c: dep(c, t_call(c)), tbl2)
        print(f"Pallas transpose (4608,128): {ms:7.3f} ms/iter", flush=True)
    except Exception as e:
        print("Pallas transpose FAILED:", type(e).__name__, str(e)[:400],
              flush=True)

    # ---------------- XLA transpose same shape (for the T steps) --------
    ms = run_loop(lambda c: dep(c, c.T.reshape(M2, 128)), tbl2)
    print(f"XLA transpose+reshape (4608,128): {ms:7.3f} ms/iter", flush=True)

    # ---------------- Pallas fused: TA + elementwise + reduce ------------
    # emulates one permute pass fused with the apply stream
    NC = 8
    coeff = jnp.asarray(rng.standard_normal((NC, M2, 128)), jnp.float32)

    def fkern(tbl_ref, idx_ref, coeff_ref, out_ref):
        g = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)
        acc = jnp.zeros_like(g)
        for c in range(NC):
            acc = acc + coeff_ref[c] * g
        out_ref[:] = acc

    def f_call(t):
        return pl.pallas_call(
            fkern,
            out_shape=jax.ShapeDtypeStruct((M2, 128), jnp.float32),
            grid=(M2 // TM,),
            in_specs=[
                pl.BlockSpec((S2, 128), lambda m: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, 128), lambda m: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NC, TM, 128), lambda m: (0, m, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, 128), lambda m: (m, 0),
                                   memory_space=pltpu.VMEM),
        )(t, idx2, coeff)

    try:
        ms = run_loop(lambda c: dep(c, f_call(c)), tbl2)
        mb = NC * M2 * 128 * 4 / 1e6
        print(f"Pallas TA+{NC}-coeff stream ({mb:.0f}MB): {ms:7.3f} ms/iter",
              flush=True)
    except Exception as e:
        print("Pallas fused FAILED:", type(e).__name__, str(e)[:400],
              flush=True)


if __name__ == "__main__":
    main()
