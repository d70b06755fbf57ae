"""Time the real f32 inner matvec variants in-loop on the bench system.

Variants: XLA gathers (round-2 production), Pallas gathers + XLA apply,
Pallas gathers + fused Pallas apply.  20x while_loop, marginal fit.
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from rdcfes_tpu.fem.assembly import (interpolate_at_qp, interpolate_ue,
                                     interpolate_ue_affine)
from rdcfes_tpu.fem.pallas_apply import (qp_apply_affine_fused,
                                         qp_apply_fused, stack_blocks,
                                         stack_blocks_affine)
from rdcfes_tpu.fem.pallas_perm import gather_corners, grid_permute
from rdcfes_tpu.fem.weakform import (diffusion_presum, qp_apply,
                                     qp_apply_affine)
from rdcfes_tpu.mesh import box_tet_mesh
from rdcfes_tpu.models.pihna import default_params, pihna_blocks
from rdcfes_tpu.systems import TransientRDCSystem


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


def fit(body, init, label, ns=(6, 26)):
    t1 = loop_time(body, init, ns[0])
    t2 = loop_time(body, init, ns[1])
    print(f"{label}: {(t2 - t1) / (ns[1] - ns[0]):7.3f} ms/iter",
          flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    n = 28
    mesh = box_tet_mesh(n, n, n, bounds=((0, 150.0), (0, 180.0), (0, 150.0)))
    sys_ = TransientRDCSystem(mesh, 5, None, physics_blocks=pihna_blocks,
                              precision="mixed", fast_gather="on")
    V, N, E = 5, mesh.n_nodes, mesh.n_elems
    params = {k: float(v) for k, v in default_params().items()}
    params["dt"] = 0.1
    rng = np.random.default_rng(0)
    u_T = jnp.asarray(rng.random((V, N)) * 100.0)
    u_qp, grad_qp = interpolate_at_qp(u_T, sys_.conn_T, sys_.phi, sys_.dphi)
    wfb32 = pihna_blocks(u_qp, grad_qp, {}, params).cast(jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((V, N)), jnp.float32)

    fast = sys_._fast_tables()
    fp = fast["plans"]
    dfwd, drev = fast["fwd"], fast["rev"]
    jxw32p, dphi32p = fast["args"][2], fast["args"][3]
    stacks = stack_blocks(wfb32, fp.E_pad)

    def mv_xla(x):
        x_qp, gx_qp = interpolate_at_qp(x, sys_.conn_T, sys_.phi,
                                        sys_.dphi32)
        Ye = qp_apply(wfb32, sys_.phi, sys_.JxW32, sys_.dphi32, x_qp,
                      gx_qp)
        return sys_._restrict(Ye.reshape(V, -1))

    def mv_pgather(x):
        xp = jnp.pad(x, ((0, 0), (0, fp.NR * 128 - fp.N)))
        ue = gather_corners(dfwd, xp.reshape(V, fp.NR, 128), fp.C_x)
        ue = ue.reshape(V, fp.K, fp.E_pad)[:, :, :fp.E]
        x_qp, gx_qp = interpolate_ue(ue, sys_.phi, sys_.dphi32)
        Ye = qp_apply(wfb32, sys_.phi, sys_.JxW32, sys_.dphi32, x_qp,
                      gx_qp)
        yb = jnp.pad(Ye, ((0, 0), (0, 0), (0, fp.E_pad - fp.E)))
        g = grid_permute(drev, yb.reshape(V, fp.A * 128, 128))
        return g.reshape(V, fp.C_x, fp.NR * 128).sum(axis=1)[:, :fp.N]

    def mv_fused(x):
        xp = jnp.pad(x, ((0, 0), (0, fp.NR * 128 - fp.N)))
        ue = gather_corners(dfwd, xp.reshape(V, fp.NR, 128), fp.C_x)
        ue = ue.reshape(V, fp.K, fp.E_pad)
        Ye = qp_apply_fused(stacks, sys_.phi, jxw32p, dphi32p, ue)
        g = grid_permute(drev, Ye.reshape(V, fp.A * 128, 128))
        return g.reshape(V, fp.C_x, fp.NR * 128).sum(axis=1)[:, :fp.N]

    Epre32 = diffusion_presum(wfb32, sys_.JxW32)
    EL = fast["EL"]
    stacks_aff = stack_blocks_affine(wfb32, Epre32, EL)

    def mv_paffine(x):
        """Pallas gathers + XLA *affine* apply (the production inner)."""
        xp = jnp.pad(x, ((0, 0), (0, fp.NR * 128 - fp.N)))
        ue = gather_corners(dfwd, xp.reshape(V, fp.NR, 128), fp.C_x)
        ue = ue.reshape(V, fp.K, fp.E_pad)[:, :, :fp.E]
        x_qp, gx = interpolate_ue_affine(ue, sys_.phi, sys_.dphi32)
        Ye = qp_apply_affine(wfb32, Epre32, sys_.phi, sys_.JxW32,
                             sys_.dphi32, x_qp, gx)
        yb = jnp.pad(Ye, ((0, 0), (0, 0), (0, fp.E_pad - fp.E)))
        g = grid_permute(drev, yb.reshape(V, fp.A * 128, 128))
        return g.reshape(V, fp.C_x, fp.NR * 128).sum(axis=1)[:, :fp.N]

    def mv_fused_affine(x):
        xp = jnp.pad(x, ((0, 0), (0, fp.NR * 128 - fp.N)))
        ue = gather_corners(dfwd, xp.reshape(V, fp.NR, 128), fp.C_x)
        ue = ue.reshape(V, fp.K, fp.E_pad)
        Ye = qp_apply_affine_fused(stacks_aff, sys_.phi, jxw32p,
                                   dphi32p[0], ue[:, :, :EL])
        Ye = jnp.pad(Ye, ((0, 0), (0, 0), (0, fp.E_pad - EL)))
        g = grid_permute(drev, Ye.reshape(V, fp.A * 128, 128))
        return g.reshape(V, fp.C_x, fp.NR * 128).sum(axis=1)[:, :fp.N]

    # big operands as jit ARGUMENTS (constants overflow the tunnel's
    # HTTP limit); correctness + timing per variant, printed immediately
    dep = lambda mv: (lambda x: mv(x) * 1e-20 + x)
    a = jax.block_until_ready(jax.jit(mv_xla)(x0))
    print("xla variant ready", flush=True)
    fit(dep(mv_xla), x0, "matvec XLA gathers")
    b = jax.block_until_ready(jax.jit(mv_pgather)(x0))
    rel = float(jnp.linalg.norm(b - a) / jnp.linalg.norm(a))
    print(f"pgather vs xla rel: {rel:.2e}", flush=True)
    fit(dep(mv_pgather), x0, "matvec Pallas gathers")
    d = jax.block_until_ready(jax.jit(mv_paffine)(x0))
    rel = float(jnp.linalg.norm(d - a) / jnp.linalg.norm(a))
    print(f"paffine vs xla rel: {rel:.2e}", flush=True)
    fit(dep(mv_paffine), x0, "matvec Pallas gathers+affine apply")
    e = jax.block_until_ready(jax.jit(mv_fused_affine)(x0))
    rel = float(jnp.linalg.norm(e - a) / jnp.linalg.norm(a))
    print(f"fused-affine vs xla rel: {rel:.2e}", flush=True)
    fit(dep(mv_fused_affine), x0, "matvec Pallas gathers+AFFINE fused apply")
    # the generic fused variant LAST: its EL/E_pad operand mismatch
    # (jxw32p is EL-padded, ue passed at full E_pad) aborted the backend
    # on earlier runs — likely OOB block reads, kept for comparison
    c = jax.block_until_ready(jax.jit(mv_fused)(x0))
    rel = float(jnp.linalg.norm(c - a) / jnp.linalg.norm(a))
    print(f"fused vs xla rel: {rel:.2e}", flush=True)
    fit(dep(mv_fused), x0, "matvec Pallas gathers+fused apply")


if __name__ == "__main__":
    main()
