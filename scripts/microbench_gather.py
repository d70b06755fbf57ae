"""Microbenchmark: gather/permute primitives on the real TPU.

Round-3 kernel design depends on which data-movement primitive is fast:
the production qp-apply matvec is gather-rate-bound (PERF.md section 2)
and the candidate fixes are (a) lane-aligned 2D take_along_axis, (b)
3-pass within-lane routing (take_along_axis + transpose sandwiches), or
(c) a Pallas fused kernel.  This measures each primitive in isolation at
the brain-PIHNA bench scale so the design is chosen from numbers, not
guesses.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python3 scripts/microbench_gather.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    # ------------------------------------------------------------------
    # 1. 1D gather rate vs table size (f32), ~1M lookups
    # ------------------------------------------------------------------
    n_lookup = 1_048_576
    for tbl_elems in (131_072, 655_360, 2_621_440, 16_777_216):
        tbl = jnp.asarray(rng.standard_normal(tbl_elems), jnp.float32)
        idx = jnp.asarray(rng.integers(0, tbl_elems, n_lookup), jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        ms = timeit(f, tbl, idx)
        print(f"1D gather: table {tbl_elems*4/1e6:7.1f} MB, 1M lookups: "
              f"{ms:7.3f} ms  ({n_lookup/ms/1e6:8.1f} M lookups/ms... "
              f"{n_lookup/(ms*1e-3)/1e9:6.2f} G/s)", flush=True)

    # small-table multi-pass: V=5 channels sharing one index (conn gather)
    N = 24_389
    tbl5 = jnp.asarray(rng.standard_normal((5, N)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, 527_000), jnp.int32)
    f = jax.jit(lambda t, i: t[:, i])
    ms = timeit(f, tbl5, idx)
    print(f"1D gather (V=5, N=24389 tbl, 527k idx): {ms:7.3f} ms", flush=True)

    idx2 = jnp.asarray(rng.integers(0, N, 975_560), jnp.int32)
    ms = timeit(f, tbl5, idx2)
    print(f"1D gather (V=5, N=24389 tbl, 975k idx): {ms:7.3f} ms", flush=True)

    # ------------------------------------------------------------------
    # 2. Lane-aligned 2D take_along_axis in XLA (axis=0: per-lane row sel)
    # ------------------------------------------------------------------
    for S, M in ((4_096, 8_192), (20_480, 8_192), (191, 8_192)):
        tbl = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, S, (M, 128)), jnp.int32)
        f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=0))
        ms = timeit(f, tbl, idx)
        look = M * 128
        print(f"2D TA axis0: tbl ({S},128)={S*128*4/1e6:6.1f} MB, "
              f"idx ({M},128)={look/1e3:6.0f}k: {ms:7.3f} ms", flush=True)

    # V=5 channels batched TA (vmap over leading axis, shared idx)
    S, M = 191, 4_096
    tbl = jnp.asarray(rng.standard_normal((5, S, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, S, (M, 128)), jnp.int32)
    f = jax.jit(lambda t, i: jax.vmap(
        lambda tt: jnp.take_along_axis(tt, i, axis=0))(t))
    ms = timeit(f, tbl, idx)
    print(f"2D TA axis0 V=5: tbl (5,{S},128), idx ({M},128): {ms:7.3f} ms",
          flush=True)

    # ------------------------------------------------------------------
    # 3. Transposes at permute-network scale
    # ------------------------------------------------------------------
    for M in (4_096, 8_192):
        x = jnp.asarray(rng.standard_normal((M, 128)), jnp.float32)
        f = jax.jit(lambda a: a.T.copy())
        ms = timeit(f, x)
        print(f"transpose ({M},128)->(128,{M}): {ms:7.3f} ms", flush=True)

    # ------------------------------------------------------------------
    # 4. sort-based permute alternative: argsorted segment-sum via
    #    reshape (C,N) + sum, data already in (C,N) layout
    # ------------------------------------------------------------------
    C = 40
    buf = jnp.asarray(rng.standard_normal((5, C, N)), jnp.float32)
    f = jax.jit(lambda b: b.sum(axis=1))
    ms = timeit(f, buf)
    print(f"(5,{C},{N}) sum over C: {ms:7.3f} ms", flush=True)

    # ------------------------------------------------------------------
    # 5. Pallas: 2D take_along_axis inside a kernel (VMEM-resident table)
    # ------------------------------------------------------------------
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        S, M = 192, 8_192
        TM = 1_024
        tbl = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, S, (M, 128)), jnp.int32)

        def kern(tbl_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

        f = jax.jit(lambda t, i: pl.pallas_call(
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
        )(t, i))
        ms = timeit(f, tbl, idx)
        print(f"Pallas TA: tbl ({S},128), idx ({M},128): {ms:7.3f} ms",
              flush=True)
    except Exception as e:
        print("Pallas TA FAILED:", type(e).__name__, str(e)[:300], flush=True)

    # ------------------------------------------------------------------
    # 6. Pallas: streamed elementwise over a big buffer + VMEM-table TA
    #    (shape of the fused apply kernel: coeff stream + x gather)
    # ------------------------------------------------------------------
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        S = 192          # x table rows (24.4k nodes / 128)
        M = 8_192        # slots rows (~1M slots / 128)
        NC = 24          # coefficient channels streamed per slot
        TM = 512
        tbl = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, S, (M, 128)), jnp.int32)
        coeff = jnp.asarray(rng.standard_normal((NC, M, 128)), jnp.float32)

        def kern(tbl_ref, idx_ref, coeff_ref, out_ref):
            g = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)
            acc = jnp.zeros_like(g)
            for c in range(NC):
                acc = acc + coeff_ref[c] * g
            out_ref[:] = acc

        f = jax.jit(lambda t, i, cf: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
            grid=(M // TM,),
            in_specs=[
                pl.BlockSpec((S, 128), lambda m: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, 128), lambda m: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NC, TM, 128), lambda m: (0, m, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, 128), lambda m: (m, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i, cf))
        ms = timeit(f, tbl, idx, coeff)
        mb = NC * M * 128 * 4 / 1e6
        print(f"Pallas stream+TA: coeff {mb:.0f} MB + gather: {ms:7.3f} ms "
              f"({mb/ms:6.1f} GB/s)", flush=True)
    except Exception as e:
        print("Pallas stream FAILED:", type(e).__name__, str(e)[:300],
              flush=True)

    # ------------------------------------------------------------------
    # 7. f64 variants of the key winner candidates
    # ------------------------------------------------------------------
    S, M = 191, 8_192
    tbl = jnp.asarray(rng.standard_normal((S, 128)), jnp.float64)
    idx = jnp.asarray(rng.integers(0, S, (M, 128)), jnp.int32)
    f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=0))
    ms = timeit(f, tbl, idx)
    print(f"2D TA axis0 f64: tbl ({S},128), idx ({M},128): {ms:7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
