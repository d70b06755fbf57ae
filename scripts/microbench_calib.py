"""Calibrate in-loop timing: fixed per-iteration overhead vs real work.

Fits time = a + b*iters for unfoldable bodies of known roofline cost, and
prints the full Pallas TA failure traceback.
"""

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np


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

    # unfoldable scalar body
    fit(lambda c: jnp.sqrt(c * c + 1.0), jnp.asarray(1.5),
        "scalar sqrt chain")

    # unfoldable 67 MB stream (roofline ~0.16 ms)
    big = jnp.asarray(rng.standard_normal(16_777_216), jnp.float32)
    fit(lambda c: jnp.sqrt(c * c + 1e-9), big, "stream sqrt 67MB")

    # unfoldable 2.3 MB stream (roofline ~0.006 ms)
    sm = jnp.asarray(rng.standard_normal((4_608, 128)), jnp.float32)
    fit(lambda c: jnp.sqrt(c * c + 1e-9), sm, "stream sqrt 2.3MB")

    # transpose 2.3 MB + mix back (unfoldable via sqrt)
    fit(lambda c: jnp.sqrt(c.T.reshape(4_608, 128) ** 2 + 1e-9), sm,
        "transpose 2.3MB + sqrt")

    # restrict gather again, against this calibration
    V, N, C, KE1 = 5, 24_389, 24, 4 * 131_712 + 1
    ngf = jnp.asarray(rng.integers(0, KE1, C * N), jnp.int32)
    buf = jnp.asarray(rng.standard_normal((V, KE1)), jnp.float32)

    def rb(c):
        y = c[:, ngf].reshape(V, C, N).sum(axis=1)
        return c * (1.0 + 1e-30 * jnp.sum(y))

    fit(rb, buf, "restrict batched-gather")

    # Pallas TA: full traceback on failure; measured if it works
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        S, M, TM = 192, 4_608, 512
        tbl = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, S, (M, 128)), jnp.int32)

        def kern(tbl_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

        def ta(t):
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

        out = jax.jit(ta)(tbl)
        jax.block_until_ready(out)
        # correctness
        ref = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=0)
        err = np.abs(np.asarray(out) - ref).max()
        print("Pallas TA works, max err", err, flush=True)
        fit(lambda c: c * (1.0 + 1e-30 * jnp.sum(ta(c))), tbl,
            "Pallas TA 590k lookups")
    except Exception:
        print("Pallas TA traceback:", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
