"""Phase-cost fit for the remaining ~49 ms/step (post-kernel era).

The Krylov data movement is down to ~4 ms/step through the Beneš
kernels (PERF.md section 3-4), so the step is now dominated by what
rides around them.  This times each non-kernel phase of the qp step
in-loop at bench shape (V=5, N=24389, E=131712, Q=5), with a HOST DATA
FETCH closing every timed region (block_until_ready over the axon
tunnel is not a real sync — PERF.md section 4).

Run on the TPU:  python scripts/microbench_phases.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

REPS = 20


def run_loop(body, init_carry, n=REPS, label=""):
    """ms/iter over n chained iterations in ONE device program, median
    of 3, timed to a host fetch of a scalar probe of the result."""
    def wl(c):
        def b(s):
            i, c = s
            return i + 1, body(c)
        return jax.lax.while_loop(lambda s: s[0] < n, b, (0, c))[1]

    f = jax.jit(wl)
    out = f(init_carry)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # real sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(init_carry)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    ms = np.median(times) * 1e3 / n
    print(f"{label:44s} {ms:8.3f} ms/iter", flush=True)
    return ms


def dep(x, y):
    leaf = jax.tree_util.tree_leaves(y)[0]
    return jax.tree_util.tree_map(
        lambda a: a * (1.0 + 1e-30 * jnp.sum(leaf).astype(a.dtype)), x)


def main():
    from rdcfes_tpu.fem.assembly import interpolate_at_qp
    from rdcfes_tpu.fem.weakform import block_diag, block_rhs, qp_apply
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import default_params, pihna_blocks
    from rdcfes_tpu.solvers.krylov import (apply_block_jacobi,
                                           small_block_inverse)
    from rdcfes_tpu.systems import TransientRDCSystem
    from rdcfes_tpu.models.pihna import pihna_physics

    print("device:", jax.devices()[0], flush=True)
    n = 28
    mesh = box_tet_mesh(n, n, n,
                        bounds=((0, 150.0), (0, 180.0), (0, 150.0)))
    V = 5
    params = {k: float(v) for k, v in default_params().items()}
    params["dt"] = 0.1
    system = TransientRDCSystem(mesh, V, pihna_physics,
                                physics_blocks=pihna_blocks,
                                precision="mixed", fast_gather="off")
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((V, mesh.n_nodes)) * 100.0)
    conn_T = jnp.asarray(system.conn_T)
    phi, JxW, dphi = system.phi, system.JxW, system.dphi
    u_qp, grad_qp = interpolate_at_qp(u, conn_T, phi, dphi)
    u_qp = jax.block_until_ready(u_qp)

    floor = run_loop(lambda c: c * 1.0000001, jnp.asarray(1.0),
                     label="loop floor")

    # 1. f64 coefficient build: physics_blocks alone (qp inputs carried)
    def coef(c):
        wfb = pihna_blocks(c[0], c[1], {}, params)
        return dep(c, wfb)

    run_loop(coef, (u_qp, grad_qp), label="physics_blocks f64 (coef build)")

    # 1b. same in f32
    def coef32(c):
        wfb = pihna_blocks(c[0], c[1], {}, params)
        return dep(c, wfb)

    run_loop(coef32, (u_qp.astype(jnp.float32),
                      grad_qp.astype(jnp.float32)),
             label="physics_blocks f32 (coef build)")

    # 2. the XLA interp (corner gather + contraction), f64
    def interp(c):
        q, g = interpolate_at_qp(c, conn_T, phi, dphi)
        return dep(c, (q, g))

    run_loop(interp, u, label="interpolate_at_qp f64 (XLA gather)")

    # 3. rhs + diag builds and the small-block inverse.  WeakFormBlocks
    # mixes arrays with structural-zero Python floats; carry only the
    # array leaves and rebuild the blocks (zeros kept static) per iter.
    wfb0 = pihna_blocks(u_qp, grad_qp, {}, params)
    leaves, treedef = jax.tree_util.tree_flatten(wfb0)
    arr_ix = [i for i, l in enumerate(leaves) if getattr(l, "ndim", 0) > 0]

    def rebuild(arrs):
        ls = list(leaves)
        for i, a in zip(arr_ix, arrs):
            ls[i] = a
        return jax.tree_util.tree_unflatten(treedef, ls)

    arrs0 = [leaves[i] for i in arr_ix]

    def rhs(c):
        Fe = block_rhs(rebuild(c), phi, JxW, dphi)
        return dep(c, Fe)

    run_loop(rhs, arrs0, label="block_rhs f64")

    def diag_inv(c):
        de = block_diag(rebuild(c), phi, JxW, dphi)
        Dinv = small_block_inverse(
            system._diag_blocks(de), pivot=False)
        return dep(c, Dinv)

    run_loop(diag_inv, arrs0, label="block_diag+restrict+inverse f64")

    # 4. the f64 qp apply chain (outer refinement matvec minus gathers)
    x_qp, gx_qp = interpolate_at_qp(u, conn_T, phi, dphi)

    def apply64(c):
        blocks, xq, gq = rebuild(c[0]), c[1], c[2]
        Ye = qp_apply(blocks, phi, JxW, dphi, xq, gq)
        return dep(c, Ye)

    run_loop(apply64, (arrs0, x_qp, gx_qp),
             label="qp_apply f64 (outer matvec)")

    arrs32 = [a.astype(jnp.float32) for a in arrs0]

    def apply32(c):
        blocks, xq, gq = rebuild(c[0]), c[1], c[2]
        Ye = qp_apply(blocks, phi, JxW.astype(jnp.float32),
                      dphi.astype(jnp.float32), xq, gq)
        return dep(c, Ye)

    run_loop(apply32, (arrs32, x_qp.astype(jnp.float32),
                       gx_qp.astype(jnp.float32)),
             label="qp_apply f32 (inner matvec)")

    # 5. preconditioner apply + BiCGStab-style vector ops, f32 and f64
    Dinv = small_block_inverse(
        system._diag_blocks(block_diag(wfb0, phi, JxW, dphi)), pivot=False)
    Dinv = jax.block_until_ready(Dinv)

    def pc64(c):
        y = apply_block_jacobi(Dinv, c)
        return dep(c, y)

    run_loop(pc64, u, label="apply_block_jacobi f64")

    def vec32(c):
        # one BiCGStab iteration's worth of non-matvec vector work:
        # ~6 axpys + 4 dots on (V, N)
        r = c
        acc = jnp.asarray(0.0, jnp.float32)
        for _ in range(4):
            acc = acc + jnp.vdot(r, r).real.astype(jnp.float32)
        for _ in range(6):
            r = r + 0.5 * c
        return dep(c, (r, acc))

    run_loop(vec32, u.astype(jnp.float32),
             label="BiCGStab vector ops f32 (per iter)")

    # 6. clamp + norms (per step, f64)
    def clamp(c):
        y = system.clamp(c)
        nrm = jnp.sqrt(jnp.vdot(y, y).real)
        return dep(c, (y, nrm))

    run_loop(clamp, u, label="clamp + norm f64")

    print(f"(subtract loop floor {floor:.3f} ms from each)", flush=True)


if __name__ == "__main__":
    main()
