"""Isolated restrict benchmark: loop-of-C-gathers vs one batched gather.

Standalone synthetic tables at bench scale (no system construction — the
eager geometry build over the axon tunnel takes minutes and wedges the
earlier combined script).
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
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    V, N, E, K, C = 5, 24_389, 131_712, 4, 24
    ng = jnp.asarray(rng.integers(0, K * E + 1, (C, N)), jnp.int32)
    ng_flat = ng.reshape(-1)
    for dt, tag in ((jnp.float32, "f32"), (jnp.float64, "f64")):
        flat = jnp.asarray(rng.standard_normal((V, K * E + 1)), dt)

        def loop(f):
            acc = f[:, ng[0]]
            for c in range(1, C):
                acc = acc + f[:, ng[c]]
            return acc

        def batched(f):
            return f[:, ng_flat].reshape(V, C, N).sum(axis=1)

        a = timeit(jax.jit(loop), flat)
        print(f"restrict {tag} loop(C=24):   {a:7.3f} ms", flush=True)
        b = timeit(jax.jit(batched), flat)
        print(f"restrict {tag} batched:      {b:7.3f} ms", flush=True)

        # while_loop context x20
        def in_loop(fn):
            def run(f):
                def body(s):
                    i, y = s
                    return i + 1, fn(f) * 1e-6 + y
                return jax.lax.while_loop(lambda s: s[0] < 20, body,
                                          (0, jnp.zeros((V, N), dt)))[1]
            return run

        a = timeit(jax.jit(in_loop(loop)), flat, n=5)
        b = timeit(jax.jit(in_loop(batched)), flat, n=5)
        print(f"restrict {tag} 20x in while_loop: loop {a/20:7.3f} ms/it | "
              f"batched {b/20:7.3f} ms/it", flush=True)

    # interp-side: conn gather + per-qp unrolled madds vs einsum
    conn_T = jnp.asarray(rng.integers(0, N, (K, E)), jnp.int32)
    phi = rng.random((5, K))
    dphi = jnp.asarray(rng.standard_normal((5, K, 3, E)), jnp.float32)
    x32 = jnp.asarray(rng.standard_normal((V, N)), jnp.float32)

    def interp_unrolled(x):
        ue = x[:, conn_T]
        uq, gq = [], []
        for q in range(5):
            acc = None
            for k in range(K):
                t = float(phi[q, k]) * ue[:, k, :]
                acc = t if acc is None else acc + t
            uq.append(acc)
            dirs = []
            for d in range(3):
                acc = None
                for k in range(K):
                    t = dphi[q, k, d] * ue[:, k, :]
                    acc = t if acc is None else acc + t
                dirs.append(acc)
            gq.append(jnp.stack(dirs, axis=1))
        return jnp.stack(uq, axis=1), jnp.stack(gq, axis=1)

    def interp_einsum(x):
        ue = x[:, conn_T.reshape(-1)].reshape(V, K, E)
        uq = jnp.einsum("qk,vke->vqe", jnp.asarray(phi, x.dtype), ue)
        gq = jnp.einsum("vke,qkde->vqde", ue, dphi)
        return uq, gq

    a = timeit(jax.jit(interp_unrolled), x32)
    print(f"interp f32 unrolled: {a:7.3f} ms", flush=True)
    b = timeit(jax.jit(interp_einsum), x32)
    print(f"interp f32 einsum:   {b:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
