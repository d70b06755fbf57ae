"""Solid load-step variants at bench scale: f32 tangent + tangent reuse.

microbench_solid2.py's phase split showed the f64 (R + tangent) assembly
at 5.99 s of the ~6.6 s Newton iteration — 92% of the measured 19.5 s
load step (PERF.md section 11).  The two levers that follow:

  - tangent_precision="f32" (SolidSystem): the tangent is evaluated,
    contracted and scattered in f32; the residual the Newton stopping
    rules see stays f64.  CPU drift vs the f64 run: 4.9e-8 of the
    displacement scale.
  - reuse_tangent (NewtonOptions): modified Newton — keep the assembled
    tangent while the residual contracts by >= tangent_refresh_ratio
    per step; extra iterations cost residual-only assembly (0.27 s)
    + linear solve instead of 6 s.

Variants (all warmed, second run_solver timed, like bench.py):
  A: shipped bench config (fast gather + mixed, f64 tangent, exact Newton)
  B: A + f32 tangent
  C: A + reuse
  D: A + f32 tangent + reuse

Run on the TPU: PYTHONPATH="/root/repo:$PYTHONPATH" python3 -u scripts/microbench_solid3.py
"""

import os
import sys
import time

import numpy as np

os.environ["RDCFES_SOLID_FAST"] = "1"


def main():
    import jax

    from rdcfes_tpu.mesh import box_hex_mesh
    from rdcfes_tpu.solvers.newton import NewtonOptions
    from rdcfes_tpu.systems.solid import SolidSystem

    print("device:", jax.devices()[0], flush=True)
    n = 48
    mesh = box_hex_mesh(n, n, n, bounds=((0, 1.0),) * 3)
    print(f"mesh: {mesh.n_elems} HEX8 / {mesh.n_nodes} nodes", flush=True)
    kw = dict(
        materials={0: {"young": 1.0e3, "poisson": 0.3}},
        bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.05)},
        penalty=1.0e6,
    )
    base = NewtonOptions(max_nonlinear_iterations=20,
                         relative_residual_tolerance=1e-6,
                         linear_precision="mixed")
    variants = {
        "A: bench config (f64 tangent, exact)": (base, "f64"),
        "B: f32 tangent": (base, "f32"),
        "C: reuse tangent": (base._replace(reuse_tangent=True), "f64"),
        "D: f32 tangent + reuse": (base._replace(reuse_tangent=True), "f32"),
    }
    which = set(sys.argv[1:]) or {"A", "B", "C", "D"}
    ref = None
    for tag, (opts, tp) in variants.items():
        if tag[0] not in which:
            continue
        s = SolidSystem(mesh, newton=opts, tangent_precision=tp, **kw)
        x0 = s.initial_positions()
        r = s.run_solver(x0, 0.5)  # warmup (compile) + first solve
        t0 = time.perf_counter()
        r = s.run_solver(x0, 0.5)
        x = np.asarray(r.x)  # data fetch = the only real sync over axon
        wall = time.perf_counter() - t0
        dscale = np.abs(x - np.asarray(x0)).max()
        if ref is None:
            ref = x
        drift = np.abs(x - ref).max() / dscale
        print(f"{tag:40s} {wall:7.2f} s  conv {r.converged} "
              f"iters {int(r.iters):2d}  res {float(r.residual_norm):.2e}  "
              f"drift vs A {drift:.2e}", flush=True)


if __name__ == "__main__":
    main()
