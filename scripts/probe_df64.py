"""Go/no-go probe for the df64 (paired-f32) build lever (PERF.md §8).

Times the SAME constant-coefficient MAC chain (the shape class of
interpolate_ue_affine / block_rhs_affine: sum_k c[k] * x[k] over small
K, at (V*Q, E) width) three ways on the TPU:

  f64    : XLA float64 (the production build arithmetic)
  df64   : hand paired-f32 (hi, lo) with precomputed constant splits,
           sloppy accumulation (TwoSum on the dominant term only) —
           target accuracy ~2^-45 relative, far inside what the 1e-8
           trajectory contract needs
  f32    : plain float32 (the floor)

Each program reduces to ONE scalar so the axon tunnel stays out of the
timing.  Accuracy of df64 vs f64 is printed as max rel err.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python3 -u scripts/probe_df64.py
"""

import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

f32 = jnp.float32
f64 = jnp.float64


# ---- df64 primitives (plain XLA ops; no FMA assumed) -----------------

def split_const(c):
    """Host-side: f64 constant -> (c1, c2) f32 pair plus Dekker split of
    c1 for exact products."""
    c1 = np.float32(c)
    c2 = np.float32(np.float64(c) - np.float64(c1))
    # Dekker split of c1 into high/low 12-bit halves (f32 has 24-bit
    # mantissa; splitter 2^12+1)
    s = np.float32(4097.0) * c1
    c1h = np.float32(s - np.float32(s - c1))
    c1l = np.float32(c1 - c1h)
    return float(c1), float(c2), float(c1h), float(c1l)


def split_x(xh):
    """Runtime Dekker split of the hi plane (amortized across all
    constants that multiply it)."""
    s = f32(4097.0) * xh
    xhh = s - (s - xh)
    xhl = xh - xhh
    return xhh, xhl


def mac_df64(acc, c, x):
    """acc += c * x with acc=(ah, al), x=(xh, xl, xhh, xhl), c from
    split_const.  Dominant product exact via Dekker; cross terms in
    plain f32 (they land at ~2^-48 of the result)."""
    ah, al = acc
    c1, c2, c1h, c1l = c
    p = f32(c1) * x[0]
    # exact error of c1*xh
    e = ((f32(c1h) * x[2] - p) + f32(c1h) * x[3] + f32(c1l) * x[2]) \
        + f32(c1l) * x[3]
    # cross terms
    e = e + (f32(c2) * x[0] + f32(c1) * x[1])
    # TwoSum(ah, p)
    s = ah + p
    bb = s - ah
    err = (ah - (s - bb)) + (p - bb)
    return s, al + err + e


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    V, Q, K, E = 5, 4, 4, 131712
    x64 = rng.standard_normal((V, K, E)) * (1.0 + 1e-8 * rng.standard_normal((V, K, E)))
    C = rng.standard_normal((Q, K))  # "phi" constants

    x64j = jnp.asarray(x64, f64)
    xh = jnp.asarray(x64.astype(np.float32))
    xl = jnp.asarray((x64 - x64.astype(np.float32).astype(np.float64)).astype(np.float32))

    def interp_f64(x):
        out = []
        for q in range(Q):
            acc = None
            for k in range(K):
                t = float(C[q, k]) * x[:, k, :]
                acc = t if acc is None else acc + t
            out.append(acc)
        return sum(jnp.sum(o) for o in out), jnp.stack(out, 1)

    csplits = [[split_const(C[q, k]) for k in range(K)] for q in range(Q)]

    def interp_df64(xh, xl):
        # amortized Dekker splits of each hi plane
        xs = []
        for k in range(K):
            xhh, xhl = split_x(xh[:, k, :])
            xs.append((xh[:, k, :], xl[:, k, :], xhh, xhl))
        outs = []
        for q in range(Q):
            acc = (jnp.zeros_like(xh[:, 0, :]), jnp.zeros_like(xh[:, 0, :]))
            for k in range(K):
                acc = mac_df64(acc, csplits[q][k], xs[k])
            outs.append(acc)
        tot = sum(jnp.sum(h.astype(f64) + l.astype(f64)) for h, l in outs)
        hi = jnp.stack([h for h, _ in outs], 1)
        lo = jnp.stack([l for _, l in outs], 1)
        return tot, (hi, lo)

    def interp_f32(xh):
        out = []
        for q in range(Q):
            acc = None
            for k in range(K):
                t = np.float32(C[q, k]) * xh[:, k, :]
                acc = t if acc is None else acc + t
            out.append(acc)
        return sum(jnp.sum(o) for o in out), jnp.stack(out, 1)

    # accuracy check (host)
    ref = np.einsum("qk,vke->vqe", C, x64)
    _, pair = jax.jit(lambda a, b: interp_df64(a, b))(xh, xl)
    got = np.asarray(pair[0], np.float64) + np.asarray(pair[1], np.float64)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"df64 vs f64 max rel err: {rel:.3e}", flush=True)

    j64 = jax.jit(lambda x: interp_f64(x)[0])
    jdf = jax.jit(lambda a, b: interp_df64(a, b)[0])
    j32 = jax.jit(lambda x: interp_f32(x)[0])

    def timeit(label, fn, n=20):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / n
        print(f"{label:<40}{1e3 * dt:9.3f} ms", flush=True)
        return dt

    timeit("interp f64 (XLA emulated)", lambda: float(j64(x64j)))
    timeit("interp df64 (paired f32)", lambda: float(jdf(xh, xl)))
    timeit("interp f32 (floor)", lambda: float(j32(xh)))

    # longer chain: 25-term MAC at (Q*E,) — the block_rhs shape class
    W = rng.standard_normal((V, Q, E))
    Wj = jnp.asarray(W, f64)
    Wh = jnp.asarray(W.astype(np.float32))
    Wl = jnp.asarray((W - W.astype(np.float32).astype(np.float64)).astype(np.float32))
    C2 = rng.standard_normal(25)
    cs2 = [split_const(c) for c in C2]

    def rhs_f64(w):
        acc = None
        for i, c in enumerate(C2):
            t = float(c) * w[i % V]
            acc = t if acc is None else acc + t
        return jnp.sum(acc)

    def rhs_df64(wh, wl):
        xs = []
        for v in range(V):
            xhh, xhl = split_x(wh[v])
            xs.append((wh[v], wl[v], xhh, xhl))
        acc = (jnp.zeros_like(wh[0]), jnp.zeros_like(wh[0]))
        for i in range(25):
            acc = mac_df64(acc, cs2[i], xs[i % V])
        return jnp.sum(acc[0].astype(f64) + acc[1].astype(f64))

    def rhs_f32(wh):
        acc = None
        for i, c in enumerate(C2):
            t = np.float32(c) * wh[i % V]
            acc = t if acc is None else acc + t
        return jnp.sum(acc)

    jr64 = jax.jit(rhs_f64)
    jrdf = jax.jit(rhs_df64)
    jr32 = jax.jit(rhs_f32)
    timeit("rhs25 f64 (XLA emulated)", lambda: float(jr64(Wj)))
    timeit("rhs25 df64 (paired f32)", lambda: float(jrdf(Wh, Wl)))
    timeit("rhs25 f32 (floor)", lambda: float(jr32(Wh)))


if __name__ == "__main__":
    main()
