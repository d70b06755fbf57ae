"""Microbenchmark v3: ALL primitives timed inside a 20x while_loop.

The axon tunnel has a ~30 ms blocking round-trip floor and pipelined
timings do not reflect device time, so the only trustworthy measurement
is N chained iterations inside ONE device program, strict-blocked, with
the empty-loop floor subtracted.  Every candidate primitive for the fast
matvec is measured that way at bench shape (V=5, N=24389, E=131712).

Iteration bodies carry a scalar data dependency (out.sum() folded into a
live multiplier) so XLA cannot hoist or CSE the work out of the loop.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

REPS = 20


def run_loop(body, init_carry, n=REPS):
    def wl(c):
        def b(s):
            i, c = s
            return i + 1, body(c)
        return jax.lax.while_loop(lambda s: s[0] < n, b, (0, c))[1]

    f = jax.jit(wl)
    out = f(init_carry)  # compile + warm
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(init_carry))
        times.append(time.perf_counter() - t0)
    return np.median(times) * 1e3 / n  # ms per iteration


def dep(x, y):
    """Carry-preserving data dependency: x scaled by a scalar of y."""
    return x * (1.0 + 1e-30 * jnp.sum(y))


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    V, N, E, K, C = 5, 24_389, 131_712, 4, 24
    KE1 = K * E + 1

    # floor: empty-ish loop
    ms = run_loop(lambda c: c * 1.0000001, jnp.asarray(1.0))
    print(f"loop floor (scalar mul): {ms:7.3f} ms/iter", flush=True)

    # calibration: 64 MB stream add
    big = jnp.asarray(rng.standard_normal(16_777_216), jnp.float32)
    ms = run_loop(lambda c: c + 1.0, big)
    print(f"stream add 67MB r+w: {ms:7.3f} ms/iter (roofline ~0.16)",
          flush=True)

    # ---- restrict: one batched gather 2.9M lookups from 10.5 MB ----
    ng_flat = jnp.asarray(
        rng.integers(0, KE1, C * N), jnp.int32)
    buf = jnp.asarray(rng.standard_normal((V, KE1)), jnp.float32)

    def restrict_b(c):
        y = c[:, ng_flat].reshape(V, C, N).sum(axis=1)
        return dep(c, y)

    ms = run_loop(restrict_b, buf)
    print(f"restrict batched-gather (2.9M lookups): {ms:7.3f} ms/iter",
          flush=True)

    # ---- interp-style gather: 2.6M lookups from 0.5 MB table ----
    conn_flat = jnp.asarray(rng.integers(0, N, K * E), jnp.int32)
    x = jnp.asarray(rng.standard_normal((V, N)), jnp.float32)

    def interp_g(c):
        ue = c[:, conn_flat]          # (V, K*E)
        return dep(c, ue)

    ms = run_loop(interp_g, x)
    print(f"conn gather (2.6M lookups, 0.5MB tbl): {ms:7.3f} ms/iter",
          flush=True)

    # ---- 2D lane-aligned take_along_axis: 1M and 2.9M lookups ----
    S = 4_120  # ~ KE/128 rows
    tbl = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
    idx1 = jnp.asarray(rng.integers(0, S, (8_192, 128)), jnp.int32)

    def ta1(c):
        y = jnp.take_along_axis(c, idx1, axis=0)
        return dep(c, y)

    ms = run_loop(ta1, tbl)
    print(f"2D TA 1.05M lookups (tbl 2.1MB): {ms:7.3f} ms/iter", flush=True)

    idx2 = jnp.asarray(rng.integers(0, S, (23_040, 128)), jnp.int32)

    def ta2(c):
        y = jnp.take_along_axis(c, idx2, axis=0)
        return dep(c, y)

    ms = run_loop(ta2, tbl)
    print(f"2D TA 2.9M lookups (tbl 2.1MB): {ms:7.3f} ms/iter", flush=True)

    # ---- one-hot MXU segment-sum restrict (sorted slots, tiled) ----
    # slots sorted by target node; tile nodes by TN, slots by TS = C*TN.
    # y[:, tile] = ye_sorted[:, rows(tile)] @ onehot(rows x TN)
    TN = 512
    TS = 16_384  # covering rows per tile (22 avg deg * 512 = 11.3k < 16k)
    ntile = -(-N // TN)
    # synthetic sorted targets: slot r -> node r // C (uniform fill)
    tgt_sorted = (np.arange(C * N) // C).astype(np.int32)
    row_start = (np.arange(ntile) * TN * C).astype(np.int32)
    tgt_pad = np.full(ntile * TS, N, dtype=np.int32)
    for t in range(ntile):
        lo = row_start[t]
        hi = min(lo + TS, C * N)
        tgt_pad[t * TS: t * TS + (hi - lo)] = tgt_sorted[lo:hi]
    tgt_pad = jnp.asarray(tgt_pad.reshape(ntile, TS))
    buf_sorted = jnp.asarray(rng.standard_normal((V, ntile * TS)),
                             jnp.float32)

    def onehot_restrict(c):
        bt = c.reshape(V, ntile, TS)
        cols = jnp.arange(TN, dtype=jnp.int32)
        # onehot (ntile, TS, TN) bf16; einsum on MXU per tile
        oh = (tgt_pad[:, :, None] % TN == cols[None, None, :]) & (
            tgt_pad[:, :, None] // TN == jnp.arange(ntile, dtype=jnp.int32)[:, None, None])
        ohb = oh.astype(jnp.bfloat16)
        y = jnp.einsum("vts,tsn->vtn", bt.astype(jnp.bfloat16), ohb,
                       preferred_element_type=jnp.float32)
        return dep(c, y)

    ms = run_loop(onehot_restrict, buf_sorted)
    print(f"one-hot MXU restrict (tiled, bf16): {ms:7.3f} ms/iter",
          flush=True)

    # ---- full current production f32 matvec for reference -----------
    ng2 = jnp.asarray(rng.integers(0, KE1, (C, N)), jnp.int32)

    def prod_restrict(c):
        f = jnp.concatenate([c, jnp.zeros((V, 1), c.dtype)], axis=-1)
        acc = f[:, ng2[0]]
        for cc in range(1, C):
            acc = acc + f[:, ng2[cc]]
        return dep(c[:, :-1].reshape(V, K * E), acc)  # keep carry shape

    buf2 = jnp.asarray(rng.standard_normal((V, K * E)), jnp.float32)

    def prod_restrict2(c):
        f = jnp.concatenate([c, jnp.zeros((V, 1), c.dtype)], axis=-1)
        acc = f[:, ng2[0]]
        for cc in range(1, C):
            acc = acc + f[:, ng2[cc]]
        return dep(c, acc)

    ms = run_loop(prod_restrict2, buf2)
    print(f"restrict C-loop (production form): {ms:7.3f} ms/iter",
          flush=True)


if __name__ == "__main__":
    main()
