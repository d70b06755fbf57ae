"""Microbench: Mosaic same-shape take_along_axis + transpose, fitted.

The Mosaic gather lowering requires indices.shape == operand.shape + (1,)
(within-lane row selection at equal row counts).  That primitive is the
routing stage of a Beneš-style permutation network, which is the planned
fast path for the matvec's gather/restrict.  This measures its real speed
with marginal-cost fitting (t = a + b*iters), plus correctness.
"""

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def loop_time(body, init_carry, n):
    def wl(c):
        def b(s):
            i, c = s
            return i + 1, body(c)
        return jax.lax.while_loop(lambda s: s[0] < n, b, (0, c))[1]

    f = jax.jit(wl)
    jax.block_until_ready(f(init_carry))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(init_carry))
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1e3


def fit(body, init, label, ns=(8, 40)):
    t1 = loop_time(body, init, ns[0])
    t2 = loop_time(body, init, ns[1])
    b = (t2 - t1) / (ns[1] - ns[0])
    a = t1 - b * ns[0]
    print(f"{label}: {b:7.4f} ms/iter marginal, {a:7.2f} ms fixed",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    M = 4_608
    tbl = jnp.asarray(rng.standard_normal((M, 128)), jnp.float32)
    idx_np = rng.integers(0, M, (M, 128)).astype(np.int32)
    idx = jnp.asarray(idx_np)

    # ---- same-shape TA, one channel ---------------------------------
    def kern(tbl_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

    def ta(t):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, idx)

    try:
        out = jax.block_until_ready(jax.jit(ta)(tbl))
        ref = np.take_along_axis(np.asarray(tbl), idx_np, axis=0)
        print("same-shape TA works, max err",
              np.abs(np.asarray(out) - ref).max(), flush=True)
        fit(lambda c: ta(c) * 0.999 + 1e-7, tbl,
            "Pallas same-shape TA 590k (2.3MB)")
    except Exception:
        traceback.print_exc()

    # ---- 5 channels in one kernel (V=5 loop inside) ------------------
    tbl5 = jnp.asarray(rng.standard_normal((5, M, 128)), jnp.float32)

    def kern5(tbl_ref, idx_ref, out_ref):
        for v in range(5):
            out_ref[v] = jnp.take_along_axis(tbl_ref[v], idx_ref[:], axis=0)

    def ta5(t):
        return pl.pallas_call(
            kern5,
            out_shape=jax.ShapeDtypeStruct((5, M, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t)

    try:
        out = jax.block_until_ready(jax.jit(ta5)(tbl5))
        ref = np.stack([np.take_along_axis(np.asarray(tbl5)[v], idx_np, 0)
                        for v in range(5)])
        print("5-channel TA works, max err",
              np.abs(np.asarray(out) - ref).max(), flush=True)
        fit(lambda c: ta5(c) * 0.999 + 1e-7, tbl5,
            "Pallas TA x5 channels (11.5MB)")
    except Exception:
        traceback.print_exc()

    # ---- full permutation pass: TA -> transpose -> TA -> T -> TA -----
    idxB_np = rng.integers(0, 128, (128, M)).astype(np.int32)
    idxB = jnp.asarray(idxB_np)

    def kern_perm(x_ref, i1_ref, i2_ref, i3_ref, out_ref):
        a = jnp.take_along_axis(x_ref[:], i1_ref[:], axis=0)
        b = jnp.take_along_axis(a.T, i2_ref[:], axis=0)
        c = jnp.take_along_axis(b.T, i3_ref[:], axis=0)
        out_ref[:] = c

    def perm(t):
        return pl.pallas_call(
            kern_perm,
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, idx, idxB, idx)

    try:
        out = jax.block_until_ready(jax.jit(perm)(tbl))
        a = np.take_along_axis(np.asarray(tbl), idx_np, 0)
        b = np.take_along_axis(a.T, idxB_np, 0)
        c = np.take_along_axis(b.T, idx_np, 0)
        print("3-stage perm works, max err",
              np.abs(np.asarray(out) - c).max(), flush=True)
        fit(lambda t: perm(t) * 0.999 + 1e-7, tbl,
            "Pallas 3-stage permutation (2.3MB)")
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
