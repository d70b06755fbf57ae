"""Where does the ~18 ms irreducible per-step build go?

Extends microbench_stepsplit (end-to-end deltas on the REAL bench step
program) with two more axes:

  A: production (rtol 1e-10, refresh 20)         -- continuity anchor
  C: Krylov skipped + diag built once            -- the irreducible build
  D: C + CHEAP physics stand-in (same live-block structure as the bench
     deck, ~25 multiplies/qp instead of ~150 f64 ops)  -> C-D = the cost
     of the f64 PIHNA coefficient arithmetic itself
  E: C with the whole system in f32 (dtype=float32)     -> C-E = the
     total f64 tax of the build path (arithmetic emulation + hi/lo
     permutation planes + f64 restrict)

Run on the TPU: PYTHONPATH=/root/repo python scripts/microbench_buildsplit.py
"""

import os
import time

import numpy as np

os.environ["RDCFES_FAST_SCAN"] = "1"
os.environ.setdefault("RDCFES_SCAN_SEGMENT", "40")


def cheap_blocks_factory(jnp, WeakFormBlocks):
    """Bench-live PIHNA block structure (C rows 0-4 as the deck prunes
    them, D row 3, E33, B3) with trivial coefficient arithmetic."""

    def cheap_blocks(u_qp, grad_qp, fields, params):
        n, c, h, v, a = u_qp[0], u_qp[1], u_qp[2], u_qp[3], u_qp[4]
        Gv = grad_qp[3]
        one = jnp.ones_like(n)
        s = 1e-6
        lin = lambda x: one + s * x
        z = 0.0
        A = (n, c, h, v, a)
        B = (z, z, z, -s * Gv, z)
        C = (
            (lin(c), s * n, s * n, s * n, z),
            (s * c, lin(n), s * c, s * c, z),
            (s * h, s * h, lin(h), s * h, z),
            (s * v, s * v, s * v, lin(v), s * v),
            (z, s * one, s * one, z, lin(a)),
        )
        Dv = s * Gv
        D = (
            (z, z, z, z, z),
            (z, z, z, z, z),
            (z, z, z, z, z),
            (Dv, Dv, Dv, Dv, z),
            (z, z, z, z, z),
        )
        E = (
            (z, z, z, z, z),
            (z, z, z, z, z),
            (z, z, z, z, z),
            (z, z, z, s * one, z),
            (z, z, z, z, z),
        )
        return WeakFormBlocks(A=A, B=B, C=C, D=D, E=E)

    return cheap_blocks


def main():
    import jax
    import jax.numpy as jnp

    from rdcfes_tpu.fem.weakform import WeakFormBlocks
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import (default_params, pihna_blocks,
                                         pihna_physics)
    from rdcfes_tpu.systems import TransientRDCSystem

    print("device:", jax.devices()[0], flush=True)
    n = 28
    mesh = box_tet_mesh(n, n, n, bounds=((0, 150.0), (0, 180.0), (0, 150.0)))
    Kk = 2.39e5
    params = default_params()
    params.update(
        dt=0.1, cells_min_capacity=1.0, cells_max_capacity=Kk,
        cells_max_capacity_exponent=3.0, cytokines_max_capacity=1.0e-8,
        necrosis_c=500.0 / Kk, necrosis_h=200.0 / Kk, necrosis_v=300.0 / Kk,
        produce_c=-2.5, switch_c2h=1.0, switch_h2c=1.82, switch_h2n=0.5,
        diffuse_v=0.5, produce_v=10.0,
        secrete_a_c=2.77e-13, secrete_a_h=5.22e-10, decay_a=5678.4,
    )
    params = {k: float(v) for k, v in params.items()}
    rng = np.random.default_rng(0)
    u0 = np.zeros((mesh.n_nodes, 5))
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0[:, 1] = 2000.0 * np.exp(-r2 / (2 * 25.0**2))
    u0[:, 2] = 500.0 * np.exp(-r2 / (2 * 30.0**2))
    u0[:, 3] = 7200.0 * (1.0 + 0.1 * rng.random(mesh.n_nodes))
    u0[:, 4] = 1e-10

    cheap = cheap_blocks_factory(jnp, WeakFormBlocks)

    def run(tag, rtol, refresh, blocks=pihna_blocks, dtype=jnp.float64,
            precision="mixed"):
        sys_ = TransientRDCSystem(mesh, 5, pihna_physics,
                                  physics_blocks=blocks,
                                  precision=precision, rtol=rtol, dtype=dtype,
                                  precond_refresh=refresh)
        st, _, _ = sys_.run_steps(sys_.initial_state(u0.astype(np.float64)),
                                  40, params=params)
        np.asarray(st["u"])  # real sync
        t0 = time.perf_counter()
        st, its, _ = sys_.run_steps(sys_.initial_state(u0), 40,
                                    params=params)
        np.asarray(st["u"])
        ms = (time.perf_counter() - t0) * 1e3 / 40
        print(f"{tag:44s} {ms:7.2f} ms/step   inner iters "
              f"{int(np.asarray(its).sum())}", flush=True)
        return ms

    a = run("A: production (rtol 1e-10, refresh 20)", 1e-10, 20)
    c = run("C: Krylov skipped + diag once", 1e30, 10**9)
    d = run("D: C + cheap-physics stand-in", 1e30, 10**9, blocks=cheap)
    e = run("E: C all-f32 (dtype=float32)", 1e30, 10**9,
            dtype=jnp.float32, precision="f64")
    print(f"f64 physics arithmetic (C-D)   {c - d:7.2f} ms/step")
    print(f"total f64 build tax (C-E)      {c - e:7.2f} ms/step")
    print(f"f32 floor (E)                  {e:7.2f} ms/step")


if __name__ == "__main__":
    main()
