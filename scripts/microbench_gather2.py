"""Microbenchmark v2: strict timing (per-call block, varied inputs) +
bandwidth calibration.

microbench_gather v1 measured 1M-lookup gathers from a 67 MB table at
0.019 ms — below the 32-byte-sector physical bound (~0.05 ms), so v1's
pipelined timing was measuring something other than per-op device time.
v2: block_until_ready after EVERY call, rotate between distinct input
buffers (defeats any caching/elision), and calibrate against a pure
streaming op whose roofline time is known.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def timeit_strict(fn, arg_sets, n=12, warmup=3):
    for i in range(warmup):
        jax.block_until_ready(fn(*arg_sets[i % len(arg_sets)]))
    times = []
    for i in range(n):
        args = arg_sets[i % len(arg_sets)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return np.median(times) * 1e3  # ms


def timeit_pipelined(fn, arg_sets, n=20, warmup=3):
    for i in range(warmup):
        out = fn(*arg_sets[i % len(arg_sets)])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*arg_sets[i % len(arg_sets)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    # ---- calibration: streaming add on 64 MB (read 64 + write 64 MB)
    xs = [jnp.asarray(rng.standard_normal(16_777_216), jnp.float32)
          for _ in range(2)]
    f = jax.jit(lambda a: a + 1.0)
    s = timeit_strict(f, [(x,) for x in xs])
    p = timeit_pipelined(f, [(x,) for x in xs])
    print(f"stream add 64MB(r)+64MB(w): strict {s:7.3f} ms | "
          f"pipelined {p:7.3f} ms | roofline ~0.16 ms", flush=True)

    # ---- 1D gather 1M lookups from 67 MB, distinct index sets
    tbl = jnp.asarray(rng.standard_normal(16_777_216), jnp.float32)
    idxs = [jnp.asarray(rng.integers(0, 16_777_216, 1_048_576), jnp.int32)
            for _ in range(3)]
    g = jax.jit(lambda t, i: t[i])
    s = timeit_strict(g, [(tbl, i) for i in idxs])
    p = timeit_pipelined(g, [(tbl, i) for i in idxs])
    print(f"1D gather 1M from 67MB: strict {s:7.3f} ms | pipelined {p:7.3f} ms"
          f" | sector bound ~0.05 ms", flush=True)

    # ---- 1D gather 1M from small 0.5 MB table
    tbl2 = jnp.asarray(rng.standard_normal(131_072), jnp.float32)
    idx2 = [jnp.asarray(rng.integers(0, 131_072, 1_048_576), jnp.int32)
            for _ in range(3)]
    s = timeit_strict(g, [(tbl2, i) for i in idx2])
    p = timeit_pipelined(g, [(tbl2, i) for i in idx2])
    print(f"1D gather 1M from 0.5MB: strict {s:7.3f} ms | pipelined {p:7.3f} ms",
          flush=True)

    # ---- 2D lane-aligned TA, 1M lookups
    S = 20_480
    tbl3 = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
    idx3 = [jnp.asarray(rng.integers(0, S, (8_192, 128)), jnp.int32)
            for _ in range(3)]
    h = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=0))
    s = timeit_strict(h, [(tbl3, i) for i in idx3])
    p = timeit_pipelined(h, [(tbl3, i) for i in idx3])
    print(f"2D TA 1M from 10.5MB:  strict {s:7.3f} ms | pipelined {p:7.3f} ms",
          flush=True)

    # ---- restrict shapes: C-loop of 24 small gathers vs one batched
    V, N, KE1 = 5, 24_389, 4 * 131_712 + 1
    ng = jnp.asarray(rng.integers(0, KE1, (24, N)), jnp.int32)
    ng_flat = ng.reshape(-1)
    flats = [jnp.asarray(rng.standard_normal((V, KE1)), jnp.float32)
             for _ in range(2)]

    def loop(fb):
        acc = fb[:, ng[0]]
        for c in range(1, 24):
            acc = acc + fb[:, ng[c]]
        return acc

    def batched(fb):
        return fb[:, ng_flat].reshape(V, 24, N).sum(axis=1)

    fl = jax.jit(loop)
    fbt = jax.jit(batched)
    s1 = timeit_strict(fl, [(x,) for x in flats])
    s2 = timeit_strict(fbt, [(x,) for x in flats])
    print(f"restrict f32: loop {s1:7.3f} ms | batched {s2:7.3f} ms",
          flush=True)

    f64s = [x.astype(jnp.float64) for x in flats]
    s1 = timeit_strict(jax.jit(loop), [(x,) for x in f64s])
    s2 = timeit_strict(jax.jit(batched), [(x,) for x in f64s])
    print(f"restrict f64: loop {s1:7.3f} ms | batched {s2:7.3f} ms",
          flush=True)

    # ---- dispatch overhead floor: trivial op, strict
    t1 = jnp.asarray(1.0)
    ftriv = jax.jit(lambda a: a + 1.0)
    s = timeit_strict(ftriv, [(t1,)])
    print(f"trivial op strict (dispatch floor): {s:7.3f} ms", flush=True)

    # ---- 20 chained matvec-ish bodies inside while_loop vs unrolled
    def body_once(x):
        return batched(jnp.concatenate(
            [jnp.tile(x, (1, 22))[:, :KE1 - 1],
             jnp.zeros((V, 1), x.dtype)], axis=1)) * 1e-3

    def wl(x):
        def body(s):
            i, y = s
            return i + 1, body_once(y)
        return jax.lax.while_loop(lambda s: s[0] < 20, body, (0, x))[1]

    xsN = [jnp.asarray(rng.standard_normal((V, N)), jnp.float32)
           for _ in range(2)]
    s = timeit_strict(jax.jit(wl), [(x,) for x in xsN], n=6)
    print(f"20x (tile+batched-restrict) in while_loop: {s:7.3f} ms "
          f"({s/20:6.3f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
