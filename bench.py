"""Benchmark: reference-scale workloads on real hardware.

Primary metric (BASELINE.md): the run/PIHNA configuration — ~25k nodes x 5
vars, ~135k TET4, dt=0.1, shipped deck parameters — on a synthetic
brain-scale mesh standing in for the LFS-stripped patient mesh.  The full
120-step case runs through `run_steps` (the production scan-batched
qp-apply path, systems/transient.py) in mixed precision.

`vs_baseline` compares against a MEASURED baseline: 18.87 steps/s for the
8-rank MPI CPU reference, derived as the measured single-core wall-clock
of the COMPILED C++ baseline on this exact workload (2.36 steps/s,
oracle/native_baseline.cpp + measure_native_baseline.py — same
linearized-CN step, block-CSR assembly + Jacobi-scaled BiCGStab,
parity-checked against the scipy oracle to machine eps) times ideal
8-rank MPI scaling.  This supersedes the round-3 scipy-oracle-derived
0.64 steps/s: the stricter of the two measured candidates is published
(VERDICT r3 item 2).  See BASELINE_MEASURED.json for both derivations.

Secondary metrics in the same JSON line:
- ADPM at run/HCP102513 scale and parameters (400 steps, dt=0.05,
  taxis-active) — a Krylov-bound regime, with iteration counts.
- ADPM at the deck's NOMINAL taxis amplitude 1e3 (indefinite-operator
  regime) through adaptive dt subcycling — capability evidence.
- One solid load step at production scale (~110k HEX8) through the
  channel-first Newton path.

Prints ONE JSON line.
"""

import json
import os
import threading
import time
import traceback

import numpy as np


def emit(obj):
    """Print one JSON line and flush.  The driver parses the LAST JSON
    line of stdout, so later (more complete) lines supersede earlier
    ones; flushing means a killed process still leaves its best line."""
    print(json.dumps(obj), flush=True)


def pihna_bench():
    import jax

    # scan-batched kernel path: soak-tested on this exact workload
    # (2026-08-17, 20.21 steps/s vs 19.48 per-step dispatch).  Segment
    # 40: a single 120-step program was measured perf-equal (31.82 vs
    # 31.73 steps/s) but its remote compile costs ~20 extra minutes,
    # which starves the ADPM bench out of the time budget
    os.environ["RDCFES_FAST_SCAN"] = "1"
    os.environ.setdefault("RDCFES_SCAN_SEGMENT", "40")

    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import (default_params, pihna_blocks,
                                         pihna_physics)
    from rdcfes_tpu.systems import TransientRDCSystem

    # ~25k nodes, ~135k tets: 28^3 grid -> 24,389 nodes, 131,712 tets,
    # brain-like extent (mm) so element sizes / conditioning match the
    # real run/PIHNA patient-mesh case
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

    # precond_refresh=20: the block-Jacobi inverse only steers the
    # iteration (converged answers identical).  Measured trade at dt=0.1
    # (2026-08-17): inner iterations 795 -> 888 over 120 steps, but the
    # halved diag-build amortization nets +0.4 steps/s (29.82 -> 30.22)
    # rtol 3e-11: the calibrated deck default (drivers/common.py — 120-
    # step oracle parity 1.6e-9, 6x inside the 1e-8 contract; the
    # compiled baseline runs looser, rtol 1e-10), with refine_mixed's
    # adaptive per-pass ceiling sizing the final f32 sweep to it
    # df64 build: interp + rhs ride the paired-f32 Pallas kernels
    # (PERF.md §12: +1.82 ms/step on this program; trajectory parity
    # UNCHANGED at 1.606e-9 with/without — scripts/probe_df64_parity.py
    # on TPU v5e, 2026-08-21)
    os.environ.setdefault("RDCFES_DF64_BUILD", "1")
    system = TransientRDCSystem(mesh, 5, pihna_physics,
                                physics_blocks=pihna_blocks, rtol=3e-11,
                                precision="mixed", precond_refresh=20)
    # warmup (compile); np.asarray = real sync (see below)
    state, its, ress = system.run_steps(system.initial_state(u0), 120,
                                        params=params)
    np.asarray(state["u"])

    t0 = time.perf_counter()
    state, its, ress = system.run_steps(system.initial_state(u0), 120,
                                        params=params)
    # force a REAL device sync: over the axon tunnel block_until_ready
    # returns before remote execution drains (measured: it reported a
    # physically impossible 4485 steps/s); fetching the data is the only
    # trustworthy barrier
    u = np.asarray(state["u"])
    wall = time.perf_counter() - t0
    assert np.isfinite(u).all() and (u >= 0).all()
    steps_per_sec = 120 / wall
    return {
        "value": round(steps_per_sec, 4),
        "elements_assembled_per_sec": round(steps_per_sec * mesh.n_elems, 0),
        "inner_iters_total": int(np.asarray(its).sum()),
        "linear_residual": float(np.asarray(ress)[-1]),
        "n_nodes": mesh.n_nodes,
        "n_elems": mesh.n_elems,
    }


def adpm_bench():
    """Solver-heavy regime: run/HCP102513 scale, dt and response params,
    taxis ACTIVE (the shipped deck's `taxis/A_b` never reaches the solver
    due to the documented taxis_1 key quirk — the reference's effective
    run is taxis-off).  Amplitude 50 here because this leg's measured
    compiled BASELINE (oracle/native_adpm.cpp, 10.39 steps/s single-core,
    parity-gated) was taken in that regime — a genuinely Krylov-bound
    regime against a like-for-like baseline.  The deck's nominal 1e3 is benched
    separately (adpm_deck_regime_bench): at CFL ~10 the linearized-CN
    operator is INDEFINITE — eigenvalues on both sides of the origin;
    measured: unrestarted f64 GMRES + exact block-Jacobi stalls at
    7.6e-5 after 1500 iters and ILU(0) is exactly singular, so the
    reference's PETSc defaults would fail on the same matrix — and the
    framework handles it by adaptive dt subcycling
    (TransientRDCSystem.run_steps(subcycle=...))."""
    import jax
    import jax.numpy as jnp

    # per-step dispatch (the default): the ADPM scan program with kernels
    # is not yet soak-tested on hardware, and at 26 inner iters/step the
    # dispatch overhead is relatively small.  The V=3 affine fused apply
    # is hardware-validated (24.85 vs 23.94 steps/s, 2026-08-17) and
    # rides the TET4 default
    os.environ.pop("RDCFES_FAST_SCAN", None)

    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.adpm import (adpm_blocks, adpm_physics,
                                        default_params)
    from rdcfes_tpu.systems import TransientRDCSystem

    n = 28  # 24,389 nodes / 131,712 tets ~ HCP102513's 25,935 / 125,702
    mesh = box_tet_mesh(n, n, n, bounds=((0, 150.0), (0, 180.0), (0, 150.0)))
    p = default_params()
    p.update(
        dt=0.05,
        decay_PrP=1.0e-4, decay_PrP_pulse0=0.01, decay_PrP_pulse1=10.0,
        taxis1_A_b=50.0, taxis1_A_b_pulse0=-1.0,
        taxis1_A_b_pulse1=0.01,
        taxis1_Tau=50.0, taxis1_Tau_pulse0=-1.0,
        taxis1_Tau_pulse1=0.01,
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

    # rtol 1e-9: the LOCAL-parity calibration for this amplifying regime
    # (PARITY.md section 10): trajectory parity at taxis-active CFL~0.5
    # is intrinsically divergent (~1.3x/step at EVERY solver tolerance),
    # so the 1e-8 contract binds per step from a common state — measured
    # worst local rel L2 1.8e-9 at rtol 1e-9 (5.5x margin; the compiled
    # C++ baseline itself solves at rtol 1e-10).  Microbench: 33.6 ->
    # 29.4 ms/step vs rtol 1e-12 (scripts/microbench_adpm.py).
    system = TransientRDCSystem(mesh, 3, adpm_physics,
                                physics_blocks=adpm_blocks, rtol=1e-9,
                                precision="mixed", precond_refresh=10)
    fields = {"tracts": jnp.asarray(tracts), "time": 1.0}
    # 200 timed steps in 4 segments of 50 (a rate metric — round 4 timed
    # 400, which cost the leg its slot in the driver artifact; a single
    # long device program also trips the ~40 s device watchdog, so
    # segments stay at 50 — identical math, run_steps chains state)
    state, its, _ = system.run_steps(system.initial_state(u0), 50,
                                     fields=fields, params=p)  # warmup
    np.asarray(state["u"])  # data fetch = real sync over the axon tunnel
    state = system.initial_state(u0)
    total_iters = 0
    t0 = time.perf_counter()
    for _ in range(4):
        state, its, ress = system.run_steps(state, 50, fields=fields,
                                            params=p)
        total_iters += int(np.asarray(its).sum())
    jax.block_until_ready(state["u"])
    wall = time.perf_counter() - t0
    u = np.asarray(state["u"])
    assert np.isfinite(u).all()
    return {
        "adpm_steps_per_sec": round(200 / wall, 3),
        "adpm_timed_steps": 200,
        "adpm_inner_iters_total": total_iters,
        "adpm_linear_residual": float(np.asarray(ress)[-1]),
    }


def adpm_deck_regime_bench():
    """ADPM at the shipped deck's NOMINAL taxis amplitude 1e3 (the value
    run/HCP102513/input.dat carries, which the reference never actually
    solved — the taxis_1 key quirk silently dropped it).  At bench-mesh
    spacing this is advection CFL ~10: the linearized-CN operator is
    indefinite and no Krylov/preconditioner pair converges on the full
    dt (see adpm_bench docstring for the measurements).  The framework's
    answer is adaptive dt subcycling: 16 substeps at dt/16 keep each
    substep operator definite (choose_subcycle selects 16 at this scale
    — measured; hardcoded here to spare the probe ladder's k=1..8
    stall-path device compiles inside the bench budget).  CAPABILITY
    metric: converged residual at the deck regime; throughput is
    reported per OUTER step over a 10-step window."""
    import jax
    import jax.numpy as jnp

    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.adpm import (adpm_blocks, adpm_physics,
                                        default_params)
    from rdcfes_tpu.systems import TransientRDCSystem

    os.environ.pop("RDCFES_FAST_SCAN", None)
    n = 28
    mesh = box_tet_mesh(n, n, n, bounds=((0, 150.0), (0, 180.0), (0, 150.0)))
    p = default_params()
    p.update(
        dt=0.05,
        decay_PrP=1.0e-4, decay_PrP_pulse0=0.01, decay_PrP_pulse1=10.0,
        taxis1_A_b=1e3, taxis1_A_b_pulse0=-1.0, taxis1_A_b_pulse1=0.01,
        taxis1_Tau=1e3, taxis1_Tau_pulse0=-1.0, taxis1_Tau_pulse1=0.01,
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

    # rtol 3e-11: the calibrated deck default (see pihna_bench)
    system = TransientRDCSystem(mesh, 3, adpm_physics,
                                physics_blocks=adpm_blocks, rtol=3e-11,
                                precision="mixed", precond_refresh=10)
    fields = {"tracts": jnp.asarray(tracts), "time": 1.0}
    sub = 16
    # warmup (compile the dt/16 substep program)
    state, _, _ = system.run_steps(system.initial_state(u0), 1,
                                   fields=fields, params=p, subcycle=sub)
    np.asarray(state["u"])  # real sync over the axon tunnel
    state = system.initial_state(u0)
    t0 = time.perf_counter()
    state, its, ress = system.run_steps(state, 6, fields=fields,
                                        params=p, subcycle=sub)
    u = np.asarray(state["u"])
    wall = time.perf_counter() - t0
    assert np.isfinite(u).all()
    ress = np.asarray(ress)
    return {
        "adpm_deck_regime_steps_per_sec": round(6 / wall, 4),
        "adpm_deck_regime_subcycle": sub,
        "adpm_deck_regime_inner_iters": int(np.asarray(its).sum()),
        "adpm_deck_regime_max_residual": float(ress.max()),
        "adpm_deck_regime_converged": bool((ress <= 1e-8).all()),
    }


def solid_bench():
    """One load step of the channel-first hyperelastic Newton path at
    production scale (~110k HEX8) — the reference's solid hot loop
    (solid_system.C:146-271) at ~150x the shipped cube case size.

    Runs the measured-fastest variant (scripts/microbench_solid5.py,
    2026-08-20 on TPU v5 lite): slot-pull gather assembly (the 9-slot
    tangent scatter was 5.67 s of the 6 s assembly; inverted gather
    tables run it at 1.79 s), f32 tangent with modified-Newton reuse
    (inexact Newton: the Jacobian only steers; the f64 residual rule at
    rel 1e-6 — the compiled C++ baseline's stopping rule — decides
    convergence, with step_tol pinned to 1e-6 so it binds), Beneš-kernel
    x-gather + mixed-precision linear stage.  Measured 4.48 s/load step
    (exact-f64 path: 9.23 s; round-4 best: 19.5 s); solution drift vs
    the exact-f64 path 7.9e-5 of displacement scale under the same
    residual rule.  Convergence is asserted the same way as the
    default."""
    import jax

    from rdcfes_tpu.mesh import box_hex_mesh
    from rdcfes_tpu.solvers.newton import NewtonOptions
    from rdcfes_tpu.systems.solid import SolidSystem

    os.environ["RDCFES_SOLID_FAST"] = "1"  # read at Newton construction
    n = 48  # 48^3 = 110,592 HEX8, 117,649 nodes
    mesh = box_hex_mesh(n, n, n, bounds=((0, 1.0), (0, 1.0), (0, 1.0)))
    system = SolidSystem(
        mesh,
        materials={0: {"young": 1.0e3, "poisson": 0.3}},
        bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.05)},
        penalty=1.0e6,
        tangent_precision="f32",
        newton=NewtonOptions(max_nonlinear_iterations=20,
                             relative_residual_tolerance=1e-6,
                             relative_step_tolerance=1e-6,
                             reuse_tangent=True,
                             linear_precision="mixed"),
    )
    x0 = system.initial_positions()
    res = system.run_solver(x0, 0.5)  # warmup (compile) + first solve
    t0 = time.perf_counter()
    res = system.run_solver(x0, 0.5)
    x_out = np.asarray(res.x)  # data fetch = the only real sync over axon
    wall = time.perf_counter() - t0
    assert bool(np.isfinite(x_out).all())
    return {
        "solid_hex8_elems": mesh.n_elems,
        "solid_load_step_sec": round(wall, 2),
        "solid_newton_iters": int(res.iters),
        "solid_converged": bool(res.converged),
    }


def main():
    # persistent compilation cache: remote-tunnel compiles cost 7-13 min
    # per program; a primed cache lets a repeat bench run complete well
    # inside the time budget (harmless no-op if the backend cannot
    # serialize executables)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import jax

    metric = ("PIHNA brain-scale (24.4k nodes/131.7k TET4, 5 vars) "
              "time steps/sec")

    # WATCHDOG: the round-3 driver artifact was empty (rc=124, nothing
    # printed) because the axon device claim can HANG rather than raise
    # (observed 2026-08-19: jax.devices() blocked >120 s), so neither the
    # retry loop nor any print was ever reached before the harness
    # timeout.  A daemon thread lands an explanatory fallback line at
    # fixed checkpoints until the first real result prints; later lines
    # supersede it (the driver parses the last JSON line).
    landed = threading.Event()
    t_proc = time.perf_counter()

    def watchdog():
        for checkpoint in (240.0, 600.0, 1500.0, 3000.0):
            wait = checkpoint - (time.perf_counter() - t_proc)
            if wait > 0 and landed.wait(timeout=wait):
                return
            if landed.is_set():
                return
            emit({
                "metric": metric, "unit": "steps/sec", "value": 0.0,
                "vs_baseline": 0.0,
                "error": ("watchdog: no result after "
                          f"{int(time.perf_counter() - t_proc)}s "
                          "(device claim or compile still pending)"),
                "note": ("BENCH_LOCAL_r04.json holds the last "
                         "builder-run hardware measurement of this "
                         "same bench"),
            })

    threading.Thread(target=watchdog, daemon=True).start()

    # the axon device claim is exclusive and keeps a short cooldown after
    # the previous holder exits (measured 2026-08-19: a claim attempt
    # launched right after another process released the chip fails with
    # RuntimeError in under a minute) — retry with backoff before
    # declaring the TPU unavailable
    device = None
    err = None
    for attempt in range(5):
        if attempt:
            time.sleep(45)
            # backend-init FAILURES are cached (xla_bridge._backend_errors)
            # — without clearing, every retry re-raises the first error
            try:
                import jax.extend

                jax.extend.backend.clear_backends()
            except Exception:
                try:
                    from jax._src import xla_bridge

                    xla_bridge._clear_backends()
                except Exception:
                    pass
        try:
            device = str(jax.devices()[0])
            break
        except Exception as e:
            err = e
    if device is None:
        # the axon TPU can also refuse claims for extended windows
        # (observed 2026-08-18: >4 h of UNAVAILABLE); the JSON line must
        # still land so the round artifact records WHY there is no number
        landed.set()
        emit({
            "metric": metric, "unit": "steps/sec", "value": 0.0,
            "vs_baseline": 0.0,
            "error": f"TPU unavailable: {type(err).__name__}: "
                     f"{str(err)[:200]}",
            "note": ("device claim failed; BENCH_LOCAL_r04.json holds the "
                     "last hardware-measured run of this same bench"),
        })
        return
    # budget clock starts AFTER the claim succeeds: claim retries must
    # not starve the secondary benches (round-3 advisor finding)
    t_start = time.perf_counter()
    budget = float(os.environ.get("RDCFES_BENCH_BUDGET", "1500"))
    out = {
        "metric": metric,
        "unit": "steps/sec",
        "device": device,
    }
    try:
        pihna = pihna_bench()
    except Exception as e:
        landed.set()
        out.update({"value": 0.0, "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}"})
        emit(out)
        if os.environ.get("RDCFES_BENCH_DEBUG"):
            traceback.print_exc()
        return
    out.update(pihna)
    # measured single-core COMPILED C++ baseline (2.36 steps/s, best of
    # 3 quiet-machine runs, oracle/native_baseline.cpp) x 8 ideal MPI
    # ranks — the stricter of the two measured candidates
    # (BASELINE_MEASURED.json)
    baseline_steps_per_sec = 18.87
    out["vs_baseline"] = round(pihna["value"] / baseline_steps_per_sec, 2)
    # land the primary (north-star) number IMMEDIATELY: the secondary
    # benches below can overrun the harness timeout (round 3 did, and the
    # PIHNA number died with the process); a fuller line supersedes this
    # one if time remains
    landed.set()
    emit(out)
    # ADPM legs before solid this round (round 4: solid landed but both
    # ADPM legs hit the budget wall; every completed leg lands
    # incrementally, so ordering only allocates the truncation risk —
    # to the leg benched most recently by the builder)
    for fn in (adpm_bench, adpm_deck_regime_bench, solid_bench):
        if time.perf_counter() - t_start > budget:
            # remote-tunnel compiles are slow; guarantee the JSON line
            # lands even under a tight harness timeout
            out[fn.__name__ + "_skipped"] = "bench time budget exhausted"
            continue
        try:
            out.update(fn())
        except Exception as e:  # secondary benches must not kill the line
            out[fn.__name__ + "_error"] = f"{type(e).__name__}: {e}"
            if os.environ.get("RDCFES_BENCH_DEBUG"):
                traceback.print_exc()
        # each secondary leg that completes lands incrementally — a
        # harness kill during the NEXT leg must not erase this one
        emit(out)
    # HARDENED denominators (round 5, BASELINE_MEASURED.json): every leg
    # divides by a measured compiled-C++ single-core baseline x 8 ideal
    # MPI ranks, parity-gated against the scipy/NumPy oracles on every
    # measurement run (oracle/measure_native2.py).  These supersede the
    # scipy-oracle-derived denominators (1.252 steps/s ADPM, 433.8 s
    # solid) the round-4 verdict rejected: compiled C++ measured 66x the
    # ADPM scipy oracle and ~147x the solid Python oracle per element.
    if "adpm_steps_per_sec" in out:
        # native ADPM 10.39 steps/s single-core x 8 ideal ranks
        out["adpm_vs_baseline"] = round(out["adpm_steps_per_sec"] / 83.11, 2)
    if "adpm_deck_regime_steps_per_sec" in out:
        # native ADPM, deck regime (taxis 1e3, same dt/16 subcycling):
        # 0.4394 outer steps/s single-core x 8 ideal ranks
        out["adpm_deck_regime_vs_baseline"] = round(
            out["adpm_deck_regime_steps_per_sec"] / 3.516, 2)
    if "solid_load_step_sec" in out:
        # native solid load step at bench scale: 23.60 s single-core / 8
        out["solid_vs_baseline"] = round(2.95 / out["solid_load_step_sec"], 2)
    emit(out)


if __name__ == "__main__":
    main()
