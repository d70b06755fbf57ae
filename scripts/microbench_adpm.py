"""Where does the ADPM bench step (36 ms at taxis-50) go?

The round-5 hardened baseline (oracle/native_adpm.cpp: 10.39 steps/s
single-core x 8 = 83.1) put the TPU ADPM leg at 0.33x — the same
end-to-end-delta instrument as microbench_buildsplit.py, applied to the
ADPM bench workload, decides where the attack goes:

  A : production (rtol 1e-12, refresh 10, per-step dispatch) — anchor
  A10/A9: rtol 1e-10 / 1e-9 (tolerance calibration candidates — the
       parity CONTRACT is 1e-8 per step; the compiled baseline itself
       runs rtol 1e-10)
  S : A but scan-batched (RDCFES_FAST_SCAN=1) — dispatch-overhead check
  C : Krylov skipped + diag built once — the irreducible build
  D : C + cheap-physics stand-in (same live blocks: full C row 0,
      C01..C22, D11/D22, E11/E22, B1/B2 with tract vectors) — C-D =
      the f64 response-function + tract-gate arithmetic
  E : C with the whole system f32 — C-E = the total f64 build tax

Run on the TPU: PYTHONPATH="/root/repo:$PYTHONPATH" python3 scripts/microbench_adpm.py
"""

import os
import sys
import time

import numpy as np

os.environ.pop("RDCFES_FAST_SCAN", None)


def cheap_blocks_factory(jnp, WeakFormBlocks):
    """ADPM bench-live block structure with trivial coefficients."""

    def cheap_blocks(u_qp, grad_qp, fields, params):
        PrP, Ab, Ta = u_qp[0], u_qp[1], u_qp[2]
        GAb, GTa = grad_qp[1], grad_qp[2]
        tracts = fields["tracts"]
        Q, E = PrP.shape
        tqp = jnp.broadcast_to(tracts.T[None, :, :], (Q, 3, E))
        one = jnp.ones_like(PrP)
        s = 1e-6
        z = 0.0
        bv = lambda c, G: c[..., None, :] * G
        A = (PrP, Ab, Ta)
        B = (z, s * bv(Ab, tqp) + s * GAb, s * bv(Ta, tqp) + s * GTa)
        C = (
            (one + s * PrP, s * PrP, s * PrP),
            (s * one, one + s * Ab, z),
            (s * one, z, one + s * Ta),
        )
        D = ((z, z, z), (z, s * tqp, z), (z, z, s * tqp))
        Emat = ((z, z, z), (z, s * one, z), (z, z, s * one))
        return WeakFormBlocks(A=A, B=B, C=C, D=D, E=Emat)

    return cheap_blocks


def main():
    import jax
    import jax.numpy as jnp

    from rdcfes_tpu.fem.weakform import WeakFormBlocks
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.adpm import (adpm_blocks, adpm_physics,
                                        default_params)
    from rdcfes_tpu.systems import TransientRDCSystem

    print("device:", jax.devices()[0], flush=True)
    n = 28
    mesh = box_tet_mesh(n, n, n, bounds=((0, 150.0), (0, 180.0), (0, 150.0)))
    p = default_params()
    p.update(
        dt=0.05,
        decay_PrP=1.0e-4, decay_PrP_pulse0=0.01, decay_PrP_pulse1=10.0,
        taxis1_A_b=50.0, taxis1_A_b_pulse0=-1.0, taxis1_A_b_pulse1=0.01,
        taxis1_Tau=50.0, taxis1_Tau_pulse0=-1.0, taxis1_Tau_pulse1=0.01,
        decay_Tau=1.0e1, decay_Tau_pulse0=0.0005, decay_Tau_pulse1=1.0e20,
        diffuse_A_b=2e-4, diffuse_A_b_pulse0=-1.0, diffuse_A_b_pulse1=1e20,
    )
    p = {k: float(v) for k, v in p.items()}
    rng = np.random.default_rng(0)
    N = mesh.n_nodes
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0 = np.zeros((N, 3))
    u0[:, 0] = 1.0
    u0[:, 1] = 1e-3 * np.exp(-r2 / (2 * 20.0**2))
    u0[:, 2] = 1e-4 * np.exp(-r2 / (2 * 15.0**2))
    tracts = rng.standard_normal((mesh.n_elems, 3))
    tracts /= np.linalg.norm(tracts, axis=1, keepdims=True)

    cheap = cheap_blocks_factory(jnp, WeakFormBlocks)
    n_steps = 50

    def run(tag, rtol, refresh, blocks=adpm_blocks, dtype=jnp.float64,
            precision="mixed", scan=False):
        if scan:
            os.environ["RDCFES_FAST_SCAN"] = "1"
            os.environ.setdefault("RDCFES_SCAN_SEGMENT", "50")
        else:
            os.environ.pop("RDCFES_FAST_SCAN", None)
        try:
            sys_ = TransientRDCSystem(mesh, 3, adpm_physics,
                                      physics_blocks=blocks,
                                      precision=precision, rtol=rtol,
                                      dtype=dtype, precond_refresh=refresh)
            fields = {"tracts": jnp.asarray(tracts), "time": 1.0}
            st, _, _ = sys_.run_steps(
                sys_.initial_state(u0.astype(np.float64)), n_steps,
                fields=fields, params=p)
            np.asarray(st["u"])  # real sync
            t0 = time.perf_counter()
            st, its, ress = sys_.run_steps(sys_.initial_state(u0), n_steps,
                                           fields=fields, params=p)
            np.asarray(st["u"])
            ms = (time.perf_counter() - t0) * 1e3 / n_steps
            print(f"{tag:44s} {ms:7.2f} ms/step   inner iters "
                  f"{int(np.asarray(its).sum())}  res "
                  f"{float(np.asarray(ress)[-1]):.2e}", flush=True)
            return ms
        except Exception as e:
            print(f"{tag:44s} FAILED {type(e).__name__}: {e}", flush=True)
            return float("nan")

    which = set(sys.argv[1:]) or {"A", "A10", "A9", "S", "C", "D", "E"}
    out = {}
    if "A" in which:
        out["a"] = run("A: production (rtol 1e-12, refresh 10)", 1e-12, 10)
    if "A10" in which:
        out["a10"] = run("A10: rtol 1e-10", 1e-10, 10)
    if "A9" in which:
        out["a9"] = run("A9: rtol 1e-9", 1e-9, 10)
    if "S" in which:
        out["s"] = run("S: scan-batched (rtol 1e-12)", 1e-12, 10, scan=True)
    if "C" in which:
        out["c"] = run("C: Krylov skipped + diag once", 1e30, 10**9)
    if "D" in which:
        out["d"] = run("D: C + cheap-physics stand-in", 1e30, 10**9,
                       blocks=cheap)
    if "E" in which:
        out["e"] = run("E: C all-f32 (dtype=float32)", 1e30, 10**9,
                       dtype=jnp.float32, precision="f64")
    if "c" in out and "d" in out:
        print(f"f64 ADPM coefficient arithmetic (C-D) {out['c']-out['d']:7.2f} ms/step")
    if "c" in out and "e" in out:
        print(f"total f64 build tax (C-E)             {out['c']-out['e']:7.2f} ms/step")


if __name__ == "__main__":
    main()
