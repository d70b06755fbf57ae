"""Microbenchmark 2: the real qp matvec phases, loop-gather vs batched.

microbench_gather showed isolated big gathers run at ~40-50 G lookups/s —
two orders faster than the per-phase numbers attributed to them in round 2
(PERF.md section 1).  Hypothesis: the round-2 restrict/interp cost is
per-HLO overhead from the C~40 small sequential gathers, not gather
bandwidth.  This times the production phases on the REAL bench tables,
standalone and inside a while_loop (the Krylov context), against batched
single-gather rewrites.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python3 scripts/microbench_matvec.py
"""

import time
from functools import partial

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
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import default_params, pihna_blocks
    from rdcfes_tpu.systems import TransientRDCSystem
    from rdcfes_tpu.fem.assembly import interpolate_at_qp
    from rdcfes_tpu.fem.weakform import qp_apply

    print("device:", jax.devices()[0], flush=True)
    n = 28
    mesh = box_tet_mesh(n, n, n, bounds=((0, 150.0), (0, 180.0), (0, 150.0)))
    sys_ = TransientRDCSystem(mesh, 5, None, physics_blocks=pihna_blocks,
                              precision="mixed", precond_refresh=10)
    V, N = 5, mesh.n_nodes
    E = mesh.n_elems
    K = 4
    rng = np.random.default_rng(0)

    params = default_params()
    params = {k: float(v) for k, v in params.items()}
    params.update(dt=0.1)

    # realistic u for coefficients
    u_T = jnp.asarray(rng.random((V, N)) * 100.0)
    x32 = jnp.asarray(rng.standard_normal((V, N)), jnp.float32)
    flat32 = jnp.asarray(rng.standard_normal((V, K * E + 1)), jnp.float32)

    ng = sys_.node_gather  # (C, N)
    C = ng.shape[0]
    print(f"N={N} E={E} C={C} node_gather {ng.shape}", flush=True)

    # ---------------- restrict: loop vs batched ----------------
    def restrict_loop(f):
        acc = f[:, ng[0]]
        for c in range(1, C):
            acc = acc + f[:, ng[c]]
        return acc

    def restrict_batched(f):
        return f[:, ng.reshape(-1)].reshape(f.shape[0], C, N).sum(axis=1)

    fl = jax.jit(restrict_loop)
    fb = jax.jit(restrict_batched)
    a = timeit(fl, flat32)
    b = timeit(fb, flat32)
    print(f"restrict f32: loop {a:7.3f} ms | batched {b:7.3f} ms", flush=True)

    flat64 = flat32.astype(jnp.float64)
    a = timeit(jax.jit(restrict_loop), flat64)
    b = timeit(jax.jit(restrict_batched), flat64)
    print(f"restrict f64: loop {a:7.3f} ms | batched {b:7.3f} ms", flush=True)

    # ---------------- interp: current vs batched ----------------
    phi32 = np.asarray(sys_.phi)
    dphi32 = sys_.dphi32
    conn_T = sys_.conn_T

    f_cur = jax.jit(lambda x: interpolate_at_qp(x, conn_T, sys_.phi, dphi32))
    a = timeit(f_cur, x32)

    phi_h = np.asarray(sys_.phi)  # (Q, K)

    def interp_batched(x):
        ue = x[:, conn_T.reshape(-1)].reshape(x.shape[0], K, E)  # (V, K, E)
        # u_qp: small matmul over K via tensordot -> (V, Q, E)
        uq = jnp.einsum("qk,vke->vqe", jnp.asarray(phi_h, x.dtype), ue)
        # grad: dphi (Q, K, 3, E) elementwise
        gq = jnp.einsum("vke,qkde->vqde", ue, dphi32.astype(x.dtype))
        return uq, gq

    b = timeit(jax.jit(interp_batched), x32)
    print(f"interp f32: current {a:7.3f} ms | einsum-batched {b:7.3f} ms",
          flush=True)

    # ---------------- full f32 matvec: current vs inside while_loop ------
    u_qp, grad_qp = interpolate_at_qp(u_T, conn_T, sys_.phi, sys_.dphi)
    wfb = pihna_blocks(u_qp, grad_qp, {}, params)
    wfb32 = wfb.cast(jnp.float32)

    def mv(x):
        x_qp, gx_qp = interpolate_at_qp(x, conn_T, sys_.phi, dphi32)
        Ye = qp_apply(wfb32, sys_.phi, sys_.JxW32, dphi32, x_qp, gx_qp)
        return restrict_loop(Ye.reshape(V, -1+ 0) if False else
                             jnp.concatenate([Ye.reshape(V, -1),
                                              jnp.zeros((V, 1), Ye.dtype)],
                                             axis=-1))

    a = timeit(jax.jit(mv), x32)
    print(f"f32 qp matvec (current, standalone): {a:7.3f} ms", flush=True)

    def mv_b(x):
        x_qp, gx_qp = interp_batched(x)
        Ye = qp_apply(wfb32, sys_.phi, sys_.JxW32, dphi32, x_qp, gx_qp)
        f = jnp.concatenate([Ye.reshape(V, -1), jnp.zeros((V, 1), Ye.dtype)],
                            axis=-1)
        return restrict_batched(f)

    b = timeit(jax.jit(mv_b), x32)
    print(f"f32 qp matvec (batched gathers):     {b:7.3f} ms", flush=True)

    # inside a while_loop x50 (Krylov context)
    def loop50(mvfn, x):
        def body(s):
            i, y = s
            return i + 1, mvfn(y) * 0.5 + x
        def cond(s):
            return s[0] < 50
        return jax.lax.while_loop(cond, body, (0, x))[1]

    a = timeit(jax.jit(partial(loop50, mv)), x32, n=5)
    b = timeit(jax.jit(partial(loop50, mv_b)), x32, n=5)
    print(f"50x matvec in while_loop: current {a:8.3f} ms ({a/50:6.3f}/mv) | "
          f"batched {b:8.3f} ms ({b/50:6.3f}/mv)", flush=True)


if __name__ == "__main__":
    main()
