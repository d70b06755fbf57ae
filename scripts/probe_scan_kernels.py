"""Compile + time a scan-batched run_steps segment WITH the Mosaic
kernel variants enabled — previously impossible (the geometry constants
made every scan program OOM the remote compile helper).

Usage: python scripts/probe_scan_kernels.py [n_steps segment]
"""

import os
import sys
import time

import numpy as np


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    segment = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    os.environ.setdefault("RDCFES_FAST_F64", "1")
    os.environ.setdefault("RDCFES_FAST_FUSED", "1")
    os.environ["RDCFES_FAST_SCAN"] = "1"
    import jax

    from scripts.probe_lower_size import build_system

    system, params, mesh = build_system(
        f64=os.environ["RDCFES_FAST_F64"] == "1",
        fused=os.environ["RDCFES_FAST_FUSED"] == "1")
    rng = np.random.default_rng(0)
    u0 = np.zeros((mesh.n_nodes, 5))
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0[:, 1] = 2000.0 * np.exp(-r2 / (2 * 25.0**2))
    u0[:, 2] = 500.0 * np.exp(-r2 / (2 * 30.0**2))
    u0[:, 3] = 7200.0 * (1.0 + 0.1 * rng.random(mesh.n_nodes))
    u0[:, 4] = 1e-10

    t0 = time.time()
    state, its, ress = system.run_steps(system.initial_state(u0), n_steps,
                                        params=params, segment=segment)
    jax.block_until_ready(state["u"])
    print(f"compile+first run: {time.time()-t0:.1f} s", flush=True)

    t0 = time.time()
    state, its, ress = system.run_steps(system.initial_state(u0), n_steps,
                                        params=params, segment=segment)
    total = int(np.asarray(its).sum())  # forces sync
    wall = time.time() - t0
    print(f"{n_steps} steps in {wall:.2f} s = {n_steps/wall:.2f} steps/s, "
          f"{total} inner iters, residual {float(np.asarray(ress)[-1]):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
