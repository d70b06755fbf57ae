"""PIHNA driver: 5-species glioma growth (reference src/pihna.C:18-96).

Flow: deck -> results dir -> Gmsh read + processed copy -> nodal ICs
(n, c, h, v, a) + elemental structure (HU, RT) -> time loop
(rotate history, linearized-CN solve, clamp >= 0) -> CSV volumes + VTU/PVD
at the output time points.

AMR (reference src/pihna.C:805-840: KellyErrorEstimator +
flag_elements_by_mean_stddev + refine_and_coarsen + reinit): at every
`refinement_step`, up to `mesh/AMR/max_steps` times, the Kelly face-jump
indicator is computed over all five species, elements are flagged by the
mean-stddev rule, and — when anything is flagged — the mesh is refined with
the conforming uniform 1:8 policy (mesh/refine.py; selective hanging-node
refinement is a documented deviation).  The solution history is P1-prolonged
onto the new mesh and the device system is rebuilt, the TPU analogue of
libMesh's `es.reinit()`.
"""

from __future__ import annotations

import os

import numpy as np

from ..io import dat, provenance
from ..io.csv_metrics import pihna_header, pihna_row
from ..io.getpot import Deck
from ..io.vtu import ParaviewWriter, elemental_to_nodal
from ..mesh import AdaptiveMesh, adapt_flagged, gmsh
from ..models.pihna import PIHNA_VARS, pihna_blocks, pihna_physics

from .common import (PerfLog, make_rdc_system, maybe_profile,
                     output_time_points, step_banner)


def load_params(deck: Deck) -> dict:
    """Deck key -> physics param mapping (src/pihna.C:182-234), including
    the necrosis/* -> /Kappa_k scaling (src/pihna.C:364-366)."""
    p = {}
    p["dt"] = deck("time_step", 1.0e-9)
    p["cells_min_capacity"] = deck("cells_min_capacity", 0.0)
    Kk = deck("cells_max_capacity", 1.0)
    p["cells_max_capacity"] = Kk
    p["cells_max_capacity_exponent"] = deck("cells_max_capacity/exponent", 1.0)
    p["cytokines_max_capacity"] = deck("cytokines_max_capacity", 1.0)
    p["necrosis_c"] = deck("necrosis/c", 0.0) / Kk
    p["necrosis_h"] = deck("necrosis/h", 0.0) / Kk
    p["necrosis_v"] = deck("necrosis/v", 0.0) / Kk
    p["diffuse_c"] = deck("diffuse/c", 0.0)
    p["taxis_c"] = deck("taxis/c", 0.0)
    p["diffuse_h"] = deck("diffuse/h", 0.0)
    p["taxis_h"] = deck("taxis/h", 0.0)
    p["produce_c"] = deck("produce/c", 0.0)
    p["switch_c2h"] = deck("switch/c/to/h", 0.0)
    p["switch_h2c"] = deck("switch/h/to/c", 0.0)
    p["switch_h2n"] = deck("switch/h/to/n", 0.0)
    p["diffuse_v"] = deck("diffuse/v", 0.0)
    p["taxis_v"] = deck("taxis/v", 0.0)
    p["produce_v"] = deck("produce/v", 0.0)
    p["secrete_a_c"] = deck("secrete/a/from/c", 0.0)
    p["secrete_a_h"] = deck("secrete/a/from/h", 0.0)
    p["uptake_a_v"] = deck("uptake/a/from/v", 0.0)
    p["decay_a"] = deck("decay/a", 0.0)
    return p


def load_ranges(deck: Deck) -> dict:
    r = {}
    for key, pkey in [
        ("range/active_tumor", "range_active_tumor"),
        ("range/necrotic", "range_necrotic"),
        ("range/vascularity", "range_vascularity"),
        ("range/total_cell", "range_total_cell"),
    ]:
        r[pkey + "_min"] = deck(key + "/min", 1.0e-12)
        r[pkey + "_max"] = deck(key + "/max", 1.0e12)
    return r


def run(deck_path: str = "input.dat") -> str:
    plog = PerfLog("pihna")
    deck = Deck(deck_path)

    input_gmsh = deck("input_GMSH", "input.msh")
    input_nodal = deck("input_nodal", "input.nodal")
    input_elem = deck("input_elemental", "input.elemental")
    DIR = provenance.prepare_results_dir(
        deck("directory", "") or None, deck_path, [input_nodal, input_elem]
    )
    out_gmsh = os.path.join(DIR, deck("output_GMSH", "output.msh"))
    out_pv = os.path.join(DIR, deck("output_PARAVIEW", "output4paraview"))
    out_csv = os.path.join(DIR, deck("output_CSV", "output.csv"))

    n_steps = deck("time_step_number", 1)
    dt = deck("time_step", 1.0e-9)
    # checkpoint/resume (capability upgrade over the reference, which can
    # only restart from the ICs — SURVEY.md section 5)
    ckpt_step = deck("checkpoint/step", 0)
    ckpt_resume = deck("checkpoint/resume", "")
    refinement_step = deck("refinement_step", 1 + n_steps)
    amr_max_steps = deck("mesh/AMR/max_steps", 0)
    amr_max_level = deck("mesh/AMR/max_level", 3)
    amr_refine_frac = deck("mesh/AMR/refine_percentage", 0.5)
    amr_coarsen_frac = deck("mesh/AMR/coarsen_percentage", 0.5)
    # "bisection" (default): conforming Rivara bisection w/ coarsening
    # (mesh/adapt.py).  "1to8": libMesh-faithful selective 1:8 with
    # hanging-node constraints (mesh/constrain.py; refine-only)
    amr_strategy = str(deck("mesh/AMR/strategy", "bisection"))
    deck("mesh/skip_renumber_nodes_and_elements", True)
    otp = output_time_points(deck, n_steps)

    with plog.scope("mesh io"):
        mesh = gmsh.read(input_gmsh)
        print(mesh.print_info())
        gmsh.write(mesh, out_gmsh)

    with plog.scope("initial conditions"):
        u0 = dat.read_stream(input_nodal, mesh.n_nodes, 5)
        structure = dat.read_stream(input_elem, mesh.n_elems, 2)  # HU, RT

    params = load_params(deck)
    ranges = load_ranges(deck)

    with plog.scope("system setup"):
        # deck key parallel/n_devices > 1 routes through the halo-exchange
        # multi-chip system (the reference runs every case under
        # `mpiexec -n 4`, run/PIHNA/Makefile:6)
        system, get_u, put_state = make_rdc_system(
            mesh, 5, pihna_physics, deck, physics_blocks=pihna_blocks)
        state = put_state(u0)

    def _amr_state(m):
        """(bisection-like forest, constrained-1:8-like mesh) — one is
        live.  TET4 offers both strategies; TET10 refines through its
        corner skeleton (bisection; quadratic hanging constraints are
        out of scope, so a 1to8 deck request falls back with a notice);
        MIXED refines its TET4 block with constrained 1:8 against the
        frozen transition blocks (mesh/adapt_ext.py)."""
        if m.elem_type == "TET10":
            from ..mesh.adapt_ext import Tet10Adaptive

            if amr_strategy == "1to8":
                # deck-layer warning channel (same discipline as
                # unconsumed-key warnings): the key is consumed but its
                # requested behavior cannot be honored
                deck.warn("mesh/AMR/strategy = 1to8 is not honored on "
                          "TET10 meshes (quadratic hanging-node "
                          "constraints are out of scope); refining by "
                          "skeleton bisection instead")
            return Tet10Adaptive.from_mesh(m), None
        if m.elem_type == "MIXED":
            # hanging-node constraints ride the halo plan's ghost closure
            # on mixed meshes too (parallel/halo.py build_mixed_plan), so
            # multi-chip mixed AMR reshards by rebuilding like TET4
            from ..mesh.adapt_ext import MixedConstrained

            return None, MixedConstrained.from_mesh(m)
        if m.elem_type != "TET4":
            return None, None
        if amr_strategy == "1to8":
            from ..mesh import ConstrainedMesh

            return None, ConstrainedMesh(m)
        return AdaptiveMesh(m), None

    amesh, cmesh = _amr_state(mesh)

    paraview = ParaviewWriter(mesh)
    # on resume into the same results dir, append to the existing CSV and
    # extend the existing PVD instead of truncating pre-crash output
    resuming = bool(ckpt_resume) and os.path.exists(out_csv)
    paraview.open_pvd(out_pv, resume=resuming)
    csv = open(out_csv, "a" if resuming else "w")
    if not resuming:
        pihna_header(csv)

    hu_nodal = elemental_to_nodal(mesh, structure[:, 0])
    rt_nodal = elemental_to_nodal(mesh, structure[:, 1])

    def save(t: int, time_value: float):
        u = get_u(state)
        with plog.scope("csv output"):
            pihna_row(csv, mesh, u, time_value, {**params, **ranges})
        with plog.scope("vtu output"):
            fields = [(name, u[:, i]) for i, name in enumerate(PIHNA_VARS)]
            fields += [("HU", hu_nodal), ("RT", rt_nodal)]
            paraview.update_pvd(
                fields, t,
                processor_id=getattr(system, "processor_id", None))

    start_step = 0
    time_value = 0.0
    amr_done = 0
    if ckpt_resume:
        import jax.numpy as jnp

        from ..utils import load_checkpoint

        st, start_step, time_value, extra = load_checkpoint(ckpt_resume, params)
        ck_mesh = os.path.join(os.path.dirname(ckpt_resume),
                               "checkpoint_mesh.msh")
        if "amr_done" in extra and os.path.exists(ck_mesh):
            # the checkpoint was written after AMR: the state lives on the
            # refined mesh saved alongside it, not the deck's input mesh
            mesh = gmsh.read(ck_mesh)
            amr_done = int(extra["amr_done"])
            structure = extra["structure"]
            hu_nodal = elemental_to_nodal(mesh, structure[:, 0])
            rt_nodal = elemental_to_nodal(mesh, structure[:, 1])
            sys_kw = {}
            if "constraints" in extra and len(extra["constraints"]):
                # restore the hanging-node constraints the refined mesh
                # was saved with (the mesh is nonconforming without them)
                sys_kw["constraints"] = np.asarray(extra["constraints"])
            system, get_u, put_state = make_rdc_system(
                mesh, 5, pihna_physics, deck, physics_blocks=pihna_blocks,
                **sys_kw)
            # bisection forest is not serialized (pre-crash refinements
            # cannot coarsen); the 1to8 constraint set IS restored
            amesh, cmesh = _amr_state(mesh)
            if cmesh is not None and "constraints" in sys_kw:
                # MixedConstrained keeps its TET4 ConstrainedMesh inside
                target = getattr(cmesh, "cmesh", cmesh)
                target.hanging = {
                    (int(a), int(b)): int(h)
                    for h, a, b in sys_kw["constraints"]}
            paraview.mesh = mesh
            print(f"resumed on AMR mesh ({mesh.n_elems} elements)")
        state = system.scatter_state(st)
        print(f"resumed from {ckpt_resume} at step {start_step}")
    else:
        save(0, 0.0)

    _profile_cm = maybe_profile()
    _profile_cm.__enter__()
    # production stepping: scan-batched run_steps between event points
    # (output / checkpoint / AMR), falling back to per-step system.step
    # when the system has no block-physics scan path.  The scan path is
    # the same compiled program bench.py measures — drivers no longer pay
    # a per-step host dispatch loop (PIHNA has no per-step scalars, so
    # whole segments are parameter-static).
    use_scan = (getattr(system, "physics_blocks", None) is not None
                and hasattr(system, "run_steps"))

    def next_event(t: int) -> int:
        nxt = n_steps
        if refinement_step > 0 and amr_done < amr_max_steps:
            nxt = min(nxt, ((t // refinement_step) + 1) * refinement_step)
        if ckpt_step:
            nxt = min(nxt, ((t // ckpt_step) + 1) * ckpt_step)
        future = [s for s in otp if s > t]
        if future:
            nxt = min(nxt, min(future))
        return nxt

    t = start_step
    while t < n_steps:
        seg = next_event(t) - t
        if use_scan and seg > 1:
            with plog.scope("solve"):
                state, _its, _res = system.run_steps(state, seg,
                                                     params=params)
            for j in range(seg):
                time_value += dt
                step_banner(t + 1 + j, n_steps, time_value)
            t += seg
        else:
            t += 1
            time_value += dt
            step_banner(t, n_steps, time_value)
            with plog.scope("solve"):
                state, iters, res = system.step(state, params=params)
        if (refinement_step > 0 and t % refinement_step == 0
                and amr_done < amr_max_steps):
            amr_done += 1
            with plog.scope("amr"):
                import jax.numpy as jnp

                from ..fem.amr import flag_by_mean_stddev, kelly_error_indicator
                from ..mesh import refine_flagged
                from ..mesh.adapt_ext import Tet10Adaptive, kelly_mixed

                if mesh.elem_type == "MIXED":
                    # Kelly on the refinable TET4 block (transition
                    # blocks are frozen, mesh/adapt_ext.py)
                    eta = kelly_mixed(mesh, jnp.asarray(get_u(state)),
                                      list(range(5)))
                else:
                    eta = kelly_error_indicator(
                        mesh, jnp.asarray(get_u(state)), list(range(5))
                    )
                flags, coarsen = flag_by_mean_stddev(
                    np.asarray(eta), amr_refine_frac, amr_coarsen_frac
                )
                sys_kw = {}
                if cmesh is not None:
                    # libMesh-faithful strategy: coarsen collapsible
                    # sibling groups, then selective 1:8 with hanging-node
                    # constraints (refine_and_coarsen_elements order,
                    # reference src/pihna.C:833-837).  On MIXED meshes
                    # cmesh is a MixedConstrained — same call, the TET4
                    # block refines against the frozen transition blocks
                    r = cmesh.refine_and_coarsen(flags, coarsen,
                                                 max_level=amr_max_level)
                elif amesh is not None:
                    # selective bisection refine + sibling coarsen honoring
                    # mesh/AMR/max_level (reference refine_and_coarsen_elements,
                    # src/pihna.C:833-837); Tet10Adaptive carries its own
                    # skeleton forest + quadratic transfer
                    if isinstance(amesh, Tet10Adaptive):
                        r = amesh.refine_and_coarsen(
                            flags, coarsen, max_level=amr_max_level)
                    else:
                        r = adapt_flagged(amesh, flags, coarsen,
                                          max_level=amr_max_level)
                else:
                    r = refine_flagged(mesh, flags)
                if r is None:
                    print(f"AMR step {t}: nothing flagged, mesh unchanged")
                else:
                    if cmesh is not None:
                        if hasattr(r, "constrained"):   # TET4 1:8
                            cmesh = r.constrained
                            mesh = cmesh.mesh
                            cons = cmesh.constraints
                        else:                            # MIXED
                            cmesh = r.adaptive
                            mesh = r.mesh
                            cons = r.constraints
                        structure = r.transfer_elemental(structure)
                        if len(cons):
                            sys_kw["constraints"] = cons
                        print(f"AMR step {t}: adapted to {mesh.n_elems} "
                              f"elements ({len(cons)} "
                              f"hanging nodes)")
                    else:
                        mesh = r.mesh
                        if amesh is not None:
                            amesh = r.adaptive
                        structure = r.restrict_elemental(structure)
                        print(f"AMR step {t}: adapted to "
                              f"{mesh.n_elems} elements")
                    hu_nodal = elemental_to_nodal(mesh, structure[:, 0])
                    rt_nodal = elemental_to_nodal(mesh, structure[:, 1])
                    gstate = system.gather_state(state)
                    system, get_u, put_state = make_rdc_system(
                        mesh, 5, pihna_physics, deck,
                        physics_blocks=pihna_blocks, **sys_kw)
                    state = system.scatter_state(
                        {k: r.prolong(v) for k, v in gstate.items()})
                    paraview.mesh = mesh
        if ckpt_step and t % ckpt_step == 0:
            from ..utils import save_checkpoint

            with plog.scope("checkpoint"):
                ck_extras = {}
                if amr_done:
                    gmsh.write(mesh,
                               os.path.join(DIR, "checkpoint_mesh.msh"))
                    ck_extras = {"structure": structure,
                                 "amr_done": np.asarray(amr_done)}
                    if cmesh is not None and len(cmesh.constraints):
                        # hanging-node constraints must survive resume:
                        # the refined mesh is nonconforming, and an
                        # unconstrained solve on it would be wrong
                        ck_extras["constraints"] = cmesh.constraints
                save_checkpoint(
                    os.path.join(DIR, "checkpoint.npz"),
                    system.gather_state(state), t, time_value,
                    params, **ck_extras,
                )
        if t in otp:
            save(t, time_value)

    csv.close()
    paraview.close_pvd()
    _profile_cm.__exit__(None, None, None)
    deck.warn_unused()
    plog.report()
    return DIR
