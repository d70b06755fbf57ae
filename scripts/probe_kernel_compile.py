"""Compile each Mosaic kernel standalone at bench scale and time it
in-loop — isolates which variant OOMs the remote compile helper and how
compile cost scales with the fused kernel's tile size.

Usage: python scripts/probe_kernel_compile.py gather|permute|fused [tile]
"""

import functools
import sys
import time

import numpy as np


def bench_loop(fn, x, iters=50, aux=()):
    """Marginal-cost fit via a chained loop with a data dependency.
    `aux` arrays are threaded through the jit boundary as ARGUMENTS
    (closed-over device arrays bake into the program as constants —
    HTTP 413 on the remote compile)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, n, aux):
        def body(i, z):
            return fn(z, *aux) * 1.0000001
        return jax.lax.fori_loop(0, n, body, x)

    for n in (2, 2 + iters):
        t0 = time.perf_counter()
        out = run(x, n, aux)
        s = float(np.asarray(out.ravel()[:8]).sum())  # forced data sync
        t = time.perf_counter() - t0
        print(f"  n={n}: {t:.3f} s (sync {s:.3e})", flush=True)
        if n == 2:
            t_base = t
    per = (t - t_base) / iters * 1e3
    print(f"  marginal: {per:.3f} ms/iter", flush=True)


def main():
    which = sys.argv[1]
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else None
    import jax.numpy as jnp

    from rdcfes_tpu.fem import pallas_apply
    from rdcfes_tpu.fem.fastpath import build_fast_plans
    from rdcfes_tpu.fem.pallas_perm import (device_plan, gather_corners,
                                            grid_permute)
    from rdcfes_tpu.mesh import box_tet_mesh

    if tile:
        pallas_apply.TILE_E = tile
    n = 28
    mesh = box_tet_mesh(n, n, n,
                        bounds=((0, 150.0), (0, 180.0), (0, 150.0)))
    plans = build_fast_plans(np.asarray(mesh.connectivity), mesh.n_nodes)
    fp = plans
    V = 5
    print(f"grid: A={fp.A} C_x={fp.C_x} NR={fp.NR} E_pad={fp.E_pad}",
          flush=True)
    t0 = time.perf_counter()
    if which == "gather":
        dp = device_plan(plans.fwd)
        meta = dp[:4]
        x = jnp.asarray(
            np.random.default_rng(0).random((V, fp.NR, 128), np.float32))
        fn = lambda z, *t: gather_corners(
            type(dp)(*meta, *t), z, fp.C_x, channels=2 * V)[:, :fp.NR, :]
        bench_loop(fn, x, aux=tuple(dp[4:]))
    elif which == "permute":
        dp = device_plan(plans.rev)
        meta = dp[:4]
        x = jnp.asarray(np.random.default_rng(0).random(
            (V, fp.A * 128, 128), np.float32))
        fn = lambda z, *t: grid_permute(type(dp)(*meta, *t), z,
                                        channels=2 * V)
        bench_loop(fn, x, aux=tuple(dp[4:]))
    elif which == "fused":
        from rdcfes_tpu.fem.weakform import WeakFormBlocks

        Q, K = 4, 4
        rng = np.random.default_rng(0)
        E_pad = fp.E_pad
        mk = lambda *s: jnp.asarray(rng.random(s, np.float32))
        # representative PIHNA sparsity: 13 C planes, 2 D, 5 E
        C = [[0.0] * V for _ in range(V)]
        D = [[0.0] * V for _ in range(V)]
        Ew = [[0.0] * V for _ in range(V)]
        live_C = [(0, 0), (0, 1), (1, 1), (1, 2), (2, 2), (2, 3), (3, 3),
                  (3, 0), (4, 4), (4, 1), (0, 2), (1, 3), (2, 4)]
        for v, w in live_C:
            C[v][w] = jnp.asarray(rng.random((Q, fp.E), np.float32))
        for v, w in [(1, 1), (2, 2)]:
            D[v][w] = jnp.asarray(rng.random((Q, 3, fp.E), np.float32))
        for v, w in [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)]:
            Ew[v][w] = jnp.asarray(rng.random((Q, fp.E), np.float32))
        A = [jnp.asarray(rng.random((Q, fp.E), np.float32))] * V
        B = [0.0] * V
        wfb = WeakFormBlocks(A=tuple(A), B=tuple(B),
                             C=tuple(map(tuple, C)),
                             D=tuple(map(tuple, D)),
                             E=tuple(map(tuple, Ew)))
        stacks = pallas_apply.stack_blocks(wfb, E_pad)
        phi = rng.random((Q, K), np.float32)
        jxw = mk(Q, E_pad)
        dphi = mk(Q, K, 3, E_pad)
        ue = mk(V, K, E_pad)
        idxs = tuple(s[0] for s in stacks)

        def fn(z, jxw_, dphi_, *planes):
            stk = tuple((idx, pl_) for idx, pl_ in zip(idxs, planes))
            return pallas_apply.qp_apply_fused(stk, phi, jxw_, dphi_, z)

        print(f"tile={pallas_apply.TILE_E}", flush=True)
        bench_loop(fn, ue,
                   aux=(jxw, dphi) + tuple(s[1] for s in stacks))
    print(f"total (incl. compile): {time.perf_counter()-t0:.1f} s",
          flush=True)


if __name__ == "__main__":
    main()
