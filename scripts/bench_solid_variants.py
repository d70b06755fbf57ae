"""One solid load step (bench.py workload: 110k HEX8) under the staged
perf levers, measured in ONE device claim:

  a. default            (f64 linear stage, XLA ELL x-gather)
  b. RDCFES_SOLID_FAST  (Benes-kernel x-gather, f64 hi/lo planes)
  c. mixed precision    (f32 inner sweeps + f64 residual carry)
  d. fast + mixed       (f32 kernel gather inside the inner sweeps)

RDCFES_SOLID_FAST is read at NewtonSolver construction, so each variant
builds its own SolidSystem.  Each timed region ends in a host data fetch
(block_until_ready is not a real sync over the axon tunnel, PERF.md
section 1).  Variants print as they land so a compile-helper SIGKILL on
a later variant (PERF.md section 5 warns the f64 hi/lo fast path may
hit the wall) does not lose earlier numbers.

Run on the TPU:
  PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/bench_solid_variants.py
"""

import os
import time
import traceback

import numpy as np


def one(tag, fast, precision):
    os.environ["RDCFES_SOLID_FAST"] = "1" if fast else "0"

    from rdcfes_tpu.mesh import box_hex_mesh
    from rdcfes_tpu.solvers.newton import NewtonOptions
    from rdcfes_tpu.systems.solid import SolidSystem

    n = 48  # 110,592 HEX8 / 117,649 nodes — bench.py's solid workload
    mesh = box_hex_mesh(n, n, n, bounds=((0, 1.0), (0, 1.0), (0, 1.0)))
    system = SolidSystem(
        mesh,
        materials={0: {"young": 1.0e3, "poisson": 0.3}},
        bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.05)},
        penalty=1.0e6,
        newton=NewtonOptions(max_nonlinear_iterations=20,
                             relative_residual_tolerance=1e-6,
                             linear_precision=precision),
    )
    x0 = system.initial_positions()
    res = system.run_solver(x0, 0.5)          # compile + first solve
    x_warm = np.asarray(res.x)                # real sync
    t0 = time.perf_counter()
    res = system.run_solver(x0, 0.5)
    x_out = np.asarray(res.x)
    wall = time.perf_counter() - t0
    assert np.isfinite(x_out).all()
    drift = float(np.max(np.abs(x_out - x_warm)))
    print(f"{tag:<28} {wall:8.2f} s   newton_iters={int(res.iters)} "
          f"converged={bool(res.converged)} rerun_drift={drift:.2e}",
          flush=True)
    return wall, x_out


def main():
    import jax

    print("device:", jax.devices()[0], flush=True)
    ref = None
    ref_tag = None
    for tag, fast, precision in (
        ("a. default f64", False, "f64"),
        ("b. fast gather f64", True, "f64"),
        ("c. mixed precision", False, "mixed"),
        ("d. fast + mixed", True, "mixed"),
    ):
        try:
            wall, x = one(tag, fast, precision)
            # the comparison reference is the first variant that ran
            # (normally the default); the label records which one it
            # actually was so a failed default can't mislabel the drift
            if ref is None:
                ref, ref_tag = x, tag
            else:
                # same Newton path to the same tolerances: variants must
                # agree to solver accuracy (fast) or tolerance (mixed)
                print(f"   max|x - x[{ref_tag}]| = "
                      f"{float(np.max(np.abs(x - ref))):.3e}", flush=True)
        except Exception as e:
            print(f"{tag:<28} FAILED: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
