"""Compile + validate + time the Beneš permutation kernels on the TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rdcfes_tpu.fem.benes import apply_plan, build_grid_permutation
from rdcfes_tpu.fem.pallas_perm import (device_plan, gather_corners,
                                        grid_permute)


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
    print(f"{label}: {(t2 - t1) / (ns[1] - ns[0]):7.4f} ms/iter marginal",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    A, B, L, V = 36, 128, 128, 5
    T = A * B * L
    t0 = time.perf_counter()
    perm = rng.permutation(T)
    plan = build_grid_permutation(perm, A, B, L)
    print(f"plan build {time.perf_counter() - t0:.1f}s", flush=True)
    dp = device_plan(plan)

    x = rng.standard_normal((V, A * B, L)).astype(np.float32)
    xj = jnp.asarray(x)
    t0 = time.perf_counter()
    out = jax.block_until_ready(jax.jit(
        lambda a: grid_permute(dp, a))(xj))
    print(f"compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    ref = np.stack([apply_plan(plan, x[v].reshape(-1)).reshape(A * B, L)
                    for v in range(V)])
    ok = np.array_equal(np.asarray(out), ref)
    print("grid_permute TPU correct:", ok, flush=True)
    assert ok

    fit(lambda c: grid_permute(dp, c) * 0.999 + 1e-7, xj,
        "grid_permute V=5 (5x2.4MB)")

    # gather_corners with rep = 24 (NR = 192)
    rep, NR = 24, (A * B) // 24
    xs = rng.standard_normal((V, NR, L)).astype(np.float32)
    out2 = jax.block_until_ready(jax.jit(
        lambda a: gather_corners(dp, a, rep))(jnp.asarray(xs)))
    xrep = np.tile(xs.reshape(V, 1, NR, L), (1, rep, 1, 1)).reshape(
        V, A * B, L)
    ref2 = np.stack([apply_plan(plan, xrep[v].reshape(-1)).reshape(
        A * B, L) for v in range(V)])
    ok2 = np.array_equal(np.asarray(out2), ref2)
    print("gather_corners TPU correct:", ok2, flush=True)
    assert ok2
    fit(lambda c: gather_corners(dp, c, rep).sum(axis=1)[:, None, :]
        * 0.0 + c, jnp.asarray(xs), "gather_corners V=5")


if __name__ == "__main__":
    main()
