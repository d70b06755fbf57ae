"""Microbench: Mosaic lane-gather (axis-1 TA) and 8-row sublane gather.

tpu.dynamic_gather along sublanes is limited to one vreg (8 f32 rows) of
source; this probes the LANE direction (dimensions=1, 128-wide = one
vreg) at arbitrary row counts — if it works, a full Beneš permutation is
laneTA . transpose . laneTA . transpose . laneTA.
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
    try:
        t1 = loop_time(body, init, ns[0])
        t2 = loop_time(body, init, ns[1])
        b = (t2 - t1) / (ns[1] - ns[0])
        print(f"{label}: {b:7.4f} ms/iter marginal", flush=True)
    except Exception:
        print(f"{label}: TIMING FAILED", flush=True)
        traceback.print_exc()


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    M = 4_608
    tbl_np = rng.standard_normal((M, 128)).astype(np.float32)
    tbl = jnp.asarray(tbl_np)

    # ---- axis-1 (lane) TA at full M ---------------------------------
    idxL_np = rng.integers(0, 128, (M, 128)).astype(np.int32)
    idxL = jnp.asarray(idxL_np)

    def kernL(tbl_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)

    def taL(t):
        return pl.pallas_call(
            kernL,
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, idxL)

    try:
        out = jax.block_until_ready(jax.jit(taL)(tbl))
        ref = np.take_along_axis(tbl_np, idxL_np, axis=1)
        print("lane TA (axis=1) works, max err",
              np.abs(np.asarray(out) - ref).max(), flush=True)
        fit(lambda c: taL(c) * 0.999 + 1e-7, tbl, "Pallas lane TA 590k")
    except Exception:
        print("lane TA FAILED:", flush=True)
        traceback.print_exc()

    # ---- full Beneš permutation pass: laneTA.T.laneTA.T.laneTA -------
    idxL2 = jnp.asarray(rng.integers(0, 128, (M, 128)).astype(np.int32))
    idxT_np = rng.integers(0, M, (128, M)).astype(np.int32)
    # within-row routing of the transposed array = lane dim M: NOT one
    # vreg — instead do the middle stage as axis-0 TA on (128, M)?? No:
    # middle stage routes within columns of the original = within rows of
    # the transposed; lanes of transposed = M wide.  Mosaic lane-gather
    # needs 128 wide, so the middle stage runs as lane TA on the original
    # orientation after a transpose pair puts columns on lanes:
    #   perm = T( laneTA( T( laneTA( T(laneTA(x)) ... ))))
    # i.e. stage2 operates on x.T laid out as (128, M) -> reshape to
    # (M, 128)?  A (128, M) -> (M, 128) reshape moves lanes across rows
    # (relayout).  Probe: transpose + reshape inside the kernel.
    def kernP(tbl_ref, i1_ref, i2_ref, i3_ref, out_ref):
        a = jnp.take_along_axis(tbl_ref[:], i1_ref[:], axis=1)   # rows
        b = a.T.reshape(M, 128)  # columns -> lane-major blocks
        c = jnp.take_along_axis(b, i2_ref[:], axis=1)
        d = c.reshape(128, M).T
        out_ref[:] = jnp.take_along_axis(d, i3_ref[:], axis=1)

    idx2 = jnp.asarray(rng.integers(0, 128, (M, 128)).astype(np.int32))

    def taP(t):
        return pl.pallas_call(
            kernP,
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, idxL, idx2, idxL2)

    try:
        out = jax.block_until_ready(jax.jit(taP)(tbl))
        a = np.take_along_axis(tbl_np, idxL_np, axis=1)
        b = a.T.reshape(M, 128)
        c = np.take_along_axis(b, np.asarray(idx2), axis=1)
        d = c.reshape(128, M).T
        ref = np.take_along_axis(d, np.asarray(idxL2), axis=1)
        print("3-stage lane-Benes works, max err",
              np.abs(np.asarray(out) - ref).max(), flush=True)
        fit(lambda c: taP(c) * 0.999 + 1e-7, tbl,
            "Pallas 3-stage lane-Benes 590k")
    except Exception:
        print("lane-Benes FAILED:", flush=True)
        traceback.print_exc()

    # ---- 8-row sublane TA -------------------------------------------
    t8_np = rng.standard_normal((8, 128)).astype(np.float32)
    i8_np = rng.integers(0, 8, (8, 128)).astype(np.int32)
    t8, i8 = jnp.asarray(t8_np), jnp.asarray(i8_np)

    def kern8(tbl_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

    def ta8(t):
        return pl.pallas_call(
            kern8,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i8)

    try:
        out = jax.block_until_ready(jax.jit(ta8)(t8))
        ref = np.take_along_axis(t8_np, i8_np, axis=0)
        print("8-row sublane TA works, max err",
              np.abs(np.asarray(out) - ref).max(), flush=True)
    except Exception:
        print("8-row sublane TA FAILED:", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
