"""Split the ~11 ms/step f64 build tax (PERF.md section 8) by stage.

Same trusted instrument as microbench_buildsplit (end-to-end deltas on
the REAL bench step program, 40-step scans), but the variants replace
ONE f64 build stage at a time with an f32-computed imposter behind the
same f64 interface (cast in, compute f32, cast out).  The imposter
changes the numerics (fine — these runs measure time, not answers); the
production code is untouched — the stage functions are module globals
resolved at trace time, so a monkeypatch before system construction is
enough.

Variants (all on the Krylov-skipped C config, so deltas isolate build):

  C            anchor: the f64 production build
  C-interp32   interpolate_ue_affine computes in f32
  C-rhs32      block_rhs_affine computes in f32
  C-epre32     diffusion_presum computes in f32
  C-gather32   the u/x corner gather rides single f32 planes (no hi/lo)
  C-restrict32 the Fe restriction rides single f32 planes (no hi/lo)
  C-all32      all five imposters at once (residual vs E = clamp/state/
               diag/cast work not covered by any stage)

Run on the TPU:
  PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/microbench_f64tax.py
"""

import os
import time
from contextlib import contextmanager

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ["RDCFES_FAST_SCAN"] = "1"
os.environ.setdefault("RDCFES_SCAN_SEGMENT", "40")


@contextmanager
def patched(module, **repls):
    olds = {k: getattr(module, k) for k in repls}
    for k, v in repls.items():
        setattr(module, k, v)
    try:
        yield
    finally:
        for k, v in olds.items():
            setattr(module, k, v)


def main():
    import jax
    import jax.numpy as jnp

    import rdcfes_tpu.fem.pallas_perm as pperm
    import rdcfes_tpu.systems.transient as T
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import (default_params, pihna_blocks,
                                         pihna_physics)
    from rdcfes_tpu.systems import TransientRDCSystem

    print("device:", jax.devices()[0], flush=True)
    n = int(os.environ.get("RDCFES_TAX_N", "28"))  # CPU smoke: n=6
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

    f32, f64 = jnp.float32, jnp.float64

    # --- stage imposters: f64 interface, f32 arithmetic -----------------
    orig_interp = T.interpolate_ue_affine
    orig_rhs = T.block_rhs_affine
    orig_epre = T.diffusion_presum
    orig_gc64 = pperm.gather_corners_f64
    orig_gp64 = pperm.grid_permute_f64

    # dtype-preserving: the f32 inner-solve path calls the same module
    # globals, and must keep returning f32 there
    def interp32(ue, phi, dphi):
        dt = ue.dtype
        uq, gx = orig_interp(ue.astype(f32), phi, dphi.astype(f32))
        return uq.astype(dt), gx.astype(dt)

    def rhs32(wfb, phi, JxW, dphi):
        dt = JxW.dtype
        return orig_rhs(wfb.cast(f32), phi, JxW.astype(f32),
                        dphi.astype(f32)).astype(dt)

    def epre32(wfb, JxW):
        dt = JxW.dtype
        pre = orig_epre(wfb.cast(f32), JxW.astype(f32))
        return tuple(tuple(e if isinstance(e, float) else e.astype(dt)
                           for e in row) for row in pre)

    def gc32(dp, x, rep, interpret=False, channels=None):
        ch = None if channels is None else channels // 2
        return pperm.gather_corners(dp, x.astype(f32), rep, interpret,
                                    ch).astype(f64)

    def gp32(dp, x, interpret=False, channels=None):
        ch = None if channels is None else channels // 2
        return pperm.grid_permute(dp, x.astype(f32), interpret,
                                  ch).astype(f64)

    def run(tag, patches_T=None, patches_P=None, dtype=f64,
            blocks=None, **syskw):
        with patched(T, **(patches_T or {})), \
                patched(pperm, **(patches_P or {})):
            sys_ = TransientRDCSystem(mesh, 5, pihna_physics,
                                      physics_blocks=blocks or pihna_blocks,
                                      precision="mixed", rtol=1e30,
                                      dtype=dtype, precond_refresh=10**9,
                                      **syskw)
            st, _, _ = sys_.run_steps(
                sys_.initial_state(u0.astype(np.float64)), 40,
                params=params)
            np.asarray(st["u"])  # compile + warm
            t0 = time.perf_counter()
            st, _, _ = sys_.run_steps(sys_.initial_state(u0), 40,
                                      params=params)
            np.asarray(st["u"])
            ms = (time.perf_counter() - t0) * 1e3 / 40
        print(f"{tag:14s} {ms:7.2f} ms/step", flush=True)
        return ms

    c = run("C")
    deltas = {}
    deltas["interp"] = c - run("C-interp32", {"interpolate_ue_affine":
                                              interp32})
    deltas["rhs"] = c - run("C-rhs32", {"block_rhs_affine": rhs32})
    deltas["epre"] = c - run("C-epre32", {"diffusion_presum": epre32})
    deltas["gather"] = c - run("C-gather32", None,
                               {"gather_corners_f64": gc32})
    deltas["restrict"] = c - run("C-restrict32", None,
                                 {"grid_permute_f64": gp32})
    all32 = run("C-all32",
                {"interpolate_ue_affine": interp32,
                 "block_rhs_affine": rhs32, "diffusion_presum": epre32},
                {"gather_corners_f64": gc32, "grid_permute_f64": gp32})
    for k, v in deltas.items():
        print(f"stage f64 tax: {k:9s} {v:6.2f} ms/step", flush=True)
    print(f"sum of stage taxes  {sum(deltas.values()):6.2f}  "
          f"vs C-all32 delta {c - all32:6.2f} ms/step", flush=True)

    # ---- round 2: what keeps C-all32 (14.31) above the f32 floor
    # (E = 4.13)?  Candidates: the f64 qp_apply in the outer matvec,
    # the physics arithmetic, the f64 Jacobi applications + clamp +
    # state rotation.
    orig_apply = T.qp_apply_affine
    orig_clamp = T.clamp_nonnegative
    orig_M = T.apply_block_jacobi

    def apply32(wfb, Epre, phi, JxW, dphi, x_qp, gx):
        dt = x_qp.dtype
        if dt == f32:
            return orig_apply(wfb, Epre, phi, JxW, dphi, x_qp, gx)
        Epre32_ = tuple(tuple(e if isinstance(e, float) else e.astype(f32)
                              for e in row) for row in Epre)
        return orig_apply(wfb.cast(f32), Epre32_, phi, JxW.astype(f32),
                          dphi.astype(f32), x_qp.astype(f32),
                          gx.astype(f32)).astype(dt)

    def physics32(fn):
        def wrapped(u_qp, grad_qp, fields, params):
            dt = u_qp.dtype
            if dt == f32:
                return fn(u_qp, grad_qp, fields, params)
            f32fields = {k: (v.astype(f32) if hasattr(v, "astype") else v)
                         for k, v in (fields or {}).items()}
            return fn(u_qp.astype(f32), grad_qp.astype(f32),
                      f32fields, params).cast(dt)
        return wrapped

    def clamp32(u):
        dt = u.dtype
        return orig_clamp(u.astype(f32)).astype(dt)  # constructor-bound

    def M32_(Dinv, x):
        dt = x.dtype
        if dt == f32:
            return orig_M(Dinv, x)
        return orig_M(Dinv.astype(f32), x.astype(f32)).astype(dt)

    d2 = {}
    d2["apply"] = all32 - run(
        "C-all32+apply32",
        {"interpolate_ue_affine": interp32, "block_rhs_affine": rhs32,
         "diffusion_presum": epre32, "qp_apply_affine": apply32},
        {"gather_corners_f64": gc32, "grid_permute_f64": gp32})
    run2 = run(
        "C-all32+physics32",
        {"interpolate_ue_affine": interp32, "block_rhs_affine": rhs32,
         "diffusion_presum": epre32},
        {"gather_corners_f64": gc32, "grid_permute_f64": gp32},
        blocks=physics32(pihna_blocks))
    d2["physics"] = all32 - run2
    d2["clamp+M"] = all32 - run(
        "C-all32+clampM32",
        {"interpolate_ue_affine": interp32, "block_rhs_affine": rhs32,
         "diffusion_presum": epre32, "apply_block_jacobi": M32_},
        {"gather_corners_f64": gc32, "grid_permute_f64": gp32},
        clamp=clamp32)
    everything = run(
        "C-everything32",
        {"interpolate_ue_affine": interp32, "block_rhs_affine": rhs32,
         "diffusion_presum": epre32, "qp_apply_affine": apply32,
         "apply_block_jacobi": M32_},
        {"gather_corners_f64": gc32, "grid_permute_f64": gp32},
        blocks=physics32(pihna_blocks), clamp=clamp32)
    for k, v in d2.items():
        print(f"round-2 f64 tax: {k:9s} {v:6.2f} ms/step", flush=True)
    print(f"C-everything32 {everything:6.2f} ms/step "
          f"(f32-floor E was 4.13; the rest = casts/pads/state)",
          flush=True)


if __name__ == "__main__":
    main()
