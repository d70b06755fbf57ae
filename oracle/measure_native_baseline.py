"""Measure the COMPILED single-core PIHNA baseline (native_baseline.cpp).

Round-4 verdict item 2: the published CPU baseline rested on the scipy
oracle's measured speed with an unmeasured "compiled C++ is similar
per-core" assertion.  This harness:

  1. builds oracle/native_baseline.cpp (g++ -O3 -march=native),
  2. parity-checks one compiled step against oracle/pihna_numpy.py on a
     small mesh (machine-eps agreement or it refuses to publish),
  3. times the compiled implementation on the EXACT bench.py workload
     (24,389 nodes x 5 vars, 131,712 TET4, run/PIHNA deck params), and
  4. prints a JSON line with the compiled steps/sec and the derived
     8-rank ideal-MPI baseline.

The published baseline is the stricter (faster-CPU) of
{scipy oracle, compiled kernel}; see BASELINE_MEASURED.json.

Usage: python oracle/measure_native_baseline.py [n_timed_steps]
"""

import json
import os
import struct
import subprocess
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from measure_baseline import bench_case  # noqa: E402
from pihna_numpy import PihnaOracle  # noqa: E402

# fixed parameter order matching struct Params in native_baseline.cpp
PARAM_ORDER = [
    "dt", "cells_min_capacity", "cells_max_capacity",
    "cells_max_capacity_exponent", "cytokines_max_capacity", "necrosis_c",
    "necrosis_h", "necrosis_v", "produce_c", "produce_v", "switch_c2h",
    "switch_h2c", "switch_h2n", "diffuse_c", "diffuse_h", "diffuse_v",
    "taxis_c", "taxis_h", "taxis_v", "secrete_a_c", "secrete_a_h",
    "uptake_a_v", "decay_a",
]


def build_binary():
    exe = os.path.join(HERE, "native_baseline")
    src = os.path.join(HERE, "native_baseline.cpp")
    if (not os.path.exists(exe)
            or os.path.getmtime(exe) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-o", exe, src],
            check=True,
        )
    return exe


def dump_case(path, coords, conn, u0, params, n_steps):
    with open(path, "wb") as f:
        f.write(struct.pack("<3q", coords.shape[0], conn.shape[0], n_steps))
        f.write(np.ascontiguousarray(coords, np.float64).tobytes())
        f.write(np.ascontiguousarray(conn, np.int64).tobytes())
        f.write(np.ascontiguousarray(u0, np.float64).tobytes())
        f.write(np.array([float(params[k]) for k in PARAM_ORDER],
                         np.float64).tobytes())


def run_native(exe, coords, conn, u0, params, n_steps, dump_u=False):
    with tempfile.TemporaryDirectory() as td:
        case = os.path.join(td, "case.bin")
        uout = os.path.join(td, "u.bin")
        dump_case(case, coords, conn, u0, params, n_steps)
        argv = [exe, case] + ([uout] if dump_u else [])
        out = subprocess.run(argv, check=True, capture_output=True,
                             text=True).stdout
        res = json.loads(out.strip().splitlines()[-1])
        u = None
        if dump_u:
            u = np.fromfile(uout, np.float64).reshape(-1, 5)
        return res, u


def parity_check(exe):
    """One compiled step vs the scipy oracle on a small mesh; both run the
    warm-up step so the compiled u-dump after `n_steps=1` equals TWO oracle
    steps."""
    sys.path.insert(0, "/root/repo")
    from rdcfes_tpu.mesh import box_tet_mesh

    mesh, params, u0 = bench_case()
    small = box_tet_mesh(6, 6, 6, bounds=((0, 150.0), (0, 180.0),
                                          (0, 150.0)))
    rng = np.random.default_rng(1)
    r2 = ((small.coords - small.coords.mean(0)) ** 2).sum(axis=1)
    u0s = np.zeros((small.n_nodes, 5))
    u0s[:, 1] = 2000.0 * np.exp(-r2 / (2 * 25.0**2))
    u0s[:, 2] = 500.0 * np.exp(-r2 / (2 * 30.0**2))
    u0s[:, 3] = 7200.0 * (1.0 + 0.1 * rng.random(small.n_nodes))
    u0s[:, 4] = 1e-10
    _, u_nat = run_native(exe, small.coords, small.connectivity, u0s,
                          params, 1, dump_u=True)
    orc = PihnaOracle(small.coords, small.connectivity, params)
    u_ref = u0s.copy()
    for _ in range(2):  # warm-up + 1 timed step
        u_ref, _ = orc.step(u_ref, solver="jacobi-bicgstab")
    scale = np.abs(u_ref).max(axis=0)
    scale = np.where(scale == 0, 1.0, scale)
    rel = np.abs(u_nat - u_ref).max(axis=0) / scale
    return float(rel.max())


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    exe = build_binary()
    rel = parity_check(exe)
    assert rel < 1e-7, f"native/oracle parity failed: rel={rel:.3e}"
    mesh, params, u0 = bench_case()
    res, _ = run_native(exe, mesh.coords, mesh.connectivity, u0, params,
                        n_steps)
    res["parity_vs_scipy_oracle_rel"] = rel
    res["n_nodes"] = mesh.n_nodes
    res["n_elems"] = mesh.n_elems
    res["derived_mpi8_steps_per_sec"] = round(res["steps_per_sec"] * 8, 4)
    res["hardware"] = "1 core, g++ -O3 -march=native"
    print(json.dumps(res))


if __name__ == "__main__":
    main()
