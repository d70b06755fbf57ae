"""Coupled HCC driver: two-way RDC <-> solid mechanics
(reference src/coupled_hcc.C:17-142).

Interleaved time loop: the 3-species HCC transport system solves EVERY step
on the current deformed geometry; the solid equilibrium advances only at the
loading time points (every number_of_time_steps / number_of_loading_steps
steps), with growth driven by the per-material volumetric stretch rates at
the accumulated pseudo-time.  Coupling directions, exactly as in the
reference: solid -> RDC through the moved geometry (and the scaffolded
mechano-taxis term, inert because GRAD_sigma == 0, src/coupled_hcc.C:508);
RDC -> solid only through the shared pseudo-time growth schedule.
"""

from __future__ import annotations

import os

import numpy as np

from ..io import dat, provenance
from ..io.getpot import Deck
from ..io.vtu import ParaviewWriter, elemental_to_nodal
from ..mesh import gmsh
from ..models.hcc import HCC_VARS, hcc_blocks, hcc_physics
from ..systems import SolidSystem
from .common import (make_rdc_system, make_solid_device_mesh, PerfLog,
                     step_banner)
from .solid import (load_bcs, load_fibres, load_materials,
                    load_newton_options, load_tangent_precision)


def load_params(deck: Deck) -> dict:
    """Deck key -> HCC physics params (src/coupled_hcc.C:350-370), with the
    necrosis/* -> /Kappa_k scaling (src/coupled_hcc.C:459-461)."""
    Kk = deck("cells/max_capacity", 1.0)
    return {
        "dt": deck("time_step", 1.0),
        "cells_min_capacity": deck("cells/min_capacity", 0.0),
        "cells_max_capacity": Kk,
        "cells_max_capacity_exponent": deck("cells/max_capacity/exponent", 1.0),
        "produce_l": deck("produce/l", 0.0),
        "diffuse_c": deck("diffuse/c", 0.0),
        "mechano_c": deck("mechano/c", 0.0),
        "produce_c": deck("produce/c", 0.0),
        "necrosis_l": deck("necrosis/l", 0.0) / Kk,
        "necrosis_c": deck("necrosis/c", 0.0) / Kk,
        "necrosis_pressure": deck("necrosis/pressure", 0.0) / Kk,
    }


def run(deck_path: str = "input.dat") -> str:
    plog = PerfLog("coupled_hcc")
    deck = Deck(deck_path)

    input_gmsh = deck("input_GMSH", "input.msh")
    input_nodal = deck("input_nodal", "input.nodal")
    DIR = provenance.prepare_results_dir(
        deck("directory", "") or None, deck_path, [input_nodal], wipe=True
    )
    out_gmsh = os.path.join(DIR, deck("output_GMSH", "output.msh"))
    out_pv = os.path.join(DIR, deck("output_PARAVIEW", "output4paraview"))

    dt = deck("time_step", 1.0)
    n_steps = deck("number_of_time_steps", 1)
    n_loading = deck("number_of_loading_steps", 1)
    loading_step = (dt * n_steps) / n_loading
    if n_steps % n_loading:
        raise ValueError(
            "number_of_time_steps must be a multiple of number_of_loading_steps "
            "(src/coupled_hcc.C:202-206)"
        )
    stride = n_steps // n_loading
    ltp = set(range(stride, n_steps + 1, stride))

    out_step = deck("output_step", 0)
    otp = set(range(out_step, n_steps + 1, out_step)) if out_step else {n_steps}
    rem_step = deck("remeshing_step", 0)
    rtp = set(range(rem_step, n_steps + 1, rem_step)) if rem_step else set()
    deck("mesh/skip_renumber_nodes_and_elements", True)
    amr_max_steps = deck("mesh/AMR/max_steps", 0)
    amr_max_level = deck("mesh/AMR/max_level", 3)
    amr_refine_frac = deck("mesh/AMR/refine_percentage", 0.5)
    amr_coarsen_frac = deck("mesh/AMR/coarsen_percentage", 0.5)

    amesh = None  # lazy AdaptiveMesh (TET4 bisection forest)
    with plog.scope("mesh io"):
        mesh = gmsh.read(input_gmsh)
        print(mesh.print_info())
        gmsh.write(mesh, out_gmsh)

    with plog.scope("initial conditions"):
        u0 = dat.read_stream(input_nodal, mesh.n_nodes, 3)

    params = load_params(deck)
    fibres = load_fibres(deck, mesh)

    dmesh = make_solid_device_mesh(deck)
    with plog.scope("system setup"):
        # parallel/n_devices routes BOTH halves through the distributed
        # machinery: the RDC transport through the moving-mesh halo step
        # (geometry from current coords inside the shard program) and the
        # solid through the node-partitioned halo Newton
        rds, get_u, put_state = make_rdc_system(
            mesh, 3, hcc_physics, deck, moving_mesh=True,
            physics_blocks=hcc_blocks)
        solid = SolidSystem(
            mesh,
            materials=load_materials(deck),
            bcs=load_bcs(deck),
            penalty=deck("BCs/displacement_penalty", 1.0e5),
            fibres=fibres,
            newton=load_newton_options(deck),
            tangent_precision=load_tangent_precision(deck),
            device_mesh=dmesh,
        )
    state = put_state(u0)
    x = solid.initial_positions()

    # checkpoint/resume (capability upgrade — SURVEY.md section 5); the
    # coupled run is the longest shipped case (400 steps + 40 Newton
    # solves, run/Coupled/HCC/input.dat)
    ckpt_step = deck("checkpoint/step", 0)
    ckpt_resume = deck("checkpoint/resume", "")
    ck_params = dict(params)
    ck_params.update(loading_step=loading_step,
                     penalty=deck("BCs/displacement_penalty", 1.0e5))

    paraview = ParaviewWriter(mesh)
    paraview.open_pvd(out_pv, resume=bool(ckpt_resume))

    p_elem = np.zeros(mesh.n_elems)
    vm_elem = np.zeros(mesh.n_elems)
    fibre_cur = fibres.copy()

    def save(t: int):
        u = get_u(state)
        xs = np.asarray(x)
        disp = np.asarray(solid.displacement(x))
        with plog.scope("vtu output"):
            fields = [(name, u[:, i]) for i, name in enumerate(HCC_VARS)]
            fields += [
                ("x", xs[:, 0]), ("y", xs[:, 1]), ("z", xs[:, 2]),
                ("undeformed_x", mesh.coords[:, 0]),
                ("undeformed_y", mesh.coords[:, 1]),
                ("undeformed_z", mesh.coords[:, 2]),
                ("u_x", disp[:, 0]), ("u_y", disp[:, 1]), ("u_z", disp[:, 2]),
                ("fibre_reference_x", elemental_to_nodal(mesh, fibres[:, 0])),
                ("fibre_reference_y", elemental_to_nodal(mesh, fibres[:, 1])),
                ("fibre_reference_z", elemental_to_nodal(mesh, fibres[:, 2])),
                ("fibre_current_x", elemental_to_nodal(mesh, fibre_cur[:, 0])),
                ("fibre_current_y", elemental_to_nodal(mesh, fibre_cur[:, 1])),
                ("fibre_current_z", elemental_to_nodal(mesh, fibre_cur[:, 2])),
                ("p", elemental_to_nodal(mesh, p_elem)),
                ("VM", elemental_to_nodal(mesh, vm_elem)),
            ]
            paraview.update_pvd(fields, t, coords=xs)

    start_step = 0
    time_value = 0.0
    pseudo_time = 0.0
    amr_done = 0
    if ckpt_resume:
        import jax.numpy as jnp

        from ..utils import load_checkpoint

        st, start_step, time_value, extra = load_checkpoint(
            ckpt_resume, ck_params)
        ck_mesh = os.path.join(os.path.dirname(ckpt_resume),
                               "checkpoint_mesh.msh")
        if "amr_done" in extra and os.path.exists(ck_mesh):
            mesh = gmsh.read(ck_mesh)
            amr_done = int(extra["amr_done"])
            fibres = extra["fibres"]
            ck_cons = None
            if "constraints" in extra and len(extra["constraints"]):
                # the refined mixed mesh is non-conforming without its
                # hanging-node constraints (single-chip path)
                ck_cons = np.asarray(extra["constraints"])
            rds, get_u, put_state = make_rdc_system(
                mesh, 3, hcc_physics, deck, moving_mesh=True,
                physics_blocks=hcc_blocks, constraints=ck_cons)
            solid = SolidSystem(
                mesh, materials=load_materials(deck), bcs=load_bcs(deck),
                penalty=deck("BCs/displacement_penalty", 1.0e5),
                fibres=fibres, newton=load_newton_options(deck),
            tangent_precision=load_tangent_precision(deck),
                device_mesh=None if ck_cons is not None else dmesh,
                constraints=ck_cons,
            )
            paraview.mesh = mesh
            print(f"resumed on remeshed grid ({mesh.n_elems} elements)")
        x = jnp.asarray(extra["x"])
        pseudo_time = float(extra["pseudo_time"])
        p_elem = extra.get("p_elem", p_elem)
        vm_elem = extra.get("vm_elem", vm_elem)
        fibre_cur = extra.get("fibre_cur", fibre_cur)
        state = rds.scatter_state(st)
        print(f"resumed from {ckpt_resume} at step {start_step}")
    else:
        save(0)

    # production stepping: between event points (loading / remeshing /
    # output / checkpoint) the coordinates are CONSTANT, so the RDC
    # transport scans as one device program on the frozen deformed
    # geometry (run_steps(coords=...) rebuilds the qp tables once per
    # segment); events fall back to per-step dispatch.  The multi-chip
    # halo system keeps its per-step moving-mesh shard program.
    def next_event(tc: int) -> int:
        nxt = n_steps
        for ev in (ltp, otp, rtp):
            future = [s for s in ev if s > tc]
            if future:
                nxt = min(nxt, min(future))
        if ckpt_step:
            nxt = min(nxt, ((tc // ckpt_step) + 1) * ckpt_step)
        return nxt

    t = start_step
    while t < n_steps:
        can_scan = (all(isinstance(v, (int, float))
                        for v in params.values())
                    and ((hasattr(rds, "_geom_from_coords")
                          and getattr(rds, "physics_blocks", None)
                          is not None)               # single-chip qp scan
                         or hasattr(rds, "_multi_shard_moving_fn")))
        seg = next_event(t) - t if can_scan else 1
        if can_scan and seg > 1:
            with plog.scope("rds solve"):
                state, _its, _res = rds.run_steps(state, seg,
                                                  params=params, coords=x)
            for j in range(seg):
                time_value += dt
                step_banner(t + 1 + j, n_steps, time_value, label="time")
            t += seg
        else:
            t += 1
            time_value += dt
            step_banner(t, n_steps, time_value, label="time")
            # RDC transport on the current deformed geometry
            with plog.scope("rds solve"):
                state, iters, res = rds.step(state, params=params,
                                             coords=x)
        if t in ltp:
            pseudo_time += loading_step

        # solid equilibrium only at loading points
        if t in ltp:
            with plog.scope("solid solve"):
                nres = solid.run_solver(x, pseudo_time)
                x = nres.x
            print(f"   Newton: {int(nres.iters)} iterations, "
                  f"|R| {float(nres.residual_norm):.3e}")
            with plog.scope("post process"):
                p_j, vm_j, fc_j = solid.post_process(x, pseudo_time)
                p_elem, vm_elem, fibre_cur = (
                    np.asarray(p_j), np.asarray(vm_j), np.asarray(fc_j)
                )
        if (t in rtp and amr_done < amr_max_steps
                and mesh.elem_type == "MIXED" and dmesh is not None):
            # constraints are single-chip in both the mixed RDC system and
            # the solid Newton; multi-chip mixed runs keep the fixed mesh
            print(f"remeshing step {t}: mixed-element remeshing is "
                  "single-chip only; continuing on the fixed mesh")
        elif (t in rtp and amr_done < amr_max_steps
                and mesh.elem_type == "MIXED"):
            # mixed-element coupled remeshing (src/coupled_hcc.C:733-780
            # is mesh-generic): Kelly on pressure + tumor c over the TET4
            # block, constrained 1:8 against frozen transition blocks;
            # the RDC side solves C^T A C (systems/mixed.py) and the
            # solid Newton the same algebra (solvers/newton.py)
            amr_done += 1
            with plog.scope("remeshing"):
                import jax.numpy as jnp

                from ..fem.amr import flag_by_mean_stddev
                from ..mesh.adapt_ext import MixedConstrained, kelly_mixed

                u_np = np.asarray(state["u"])
                ind = np.stack([elemental_to_nodal(mesh, p_elem),
                                u_np[:, 1]], axis=1)
                eta = kelly_mixed(mesh, jnp.asarray(ind), [0, 1])
                flags, coarsen = flag_by_mean_stddev(
                    np.asarray(eta), amr_refine_frac, amr_coarsen_frac)
                if amesh is None or getattr(amesh, "mixed",
                                            None) is not mesh:
                    amesh = MixedConstrained.from_mesh(mesh)
                out = amesh.refine_and_coarsen(flags, coarsen,
                                               max_level=amr_max_level)
                if out is None:
                    print(f"remeshing step {t}: nothing flagged")
                else:
                    amesh = out.adaptive
                    mesh = out.mesh
                    cons = (out.constraints if len(out.constraints)
                            else None)
                    print(f"remeshing step {t}: adapted to "
                          f"{mesh.n_elems} elements "
                          f"({0 if cons is None else len(cons)} hanging "
                          "constraints)")
                    fibres = out.transfer_elemental(fibres)
                    p_elem = out.transfer_elemental(p_elem)
                    vm_elem = out.transfer_elemental(vm_elem)
                    fibre_cur = out.transfer_elemental(fibre_cur)
                    x_new = out.prolong(np.asarray(x))
                    gstate = rds.gather_state(state)
                    rds, get_u, put_state = make_rdc_system(
                        mesh, 3, hcc_physics, deck, moving_mesh=True,
                        physics_blocks=hcc_blocks, constraints=cons)
                    solid = SolidSystem(
                        mesh,
                        materials=load_materials(deck),
                        bcs=load_bcs(deck),
                        penalty=deck("BCs/displacement_penalty", 1.0e5),
                        fibres=fibres,
                        newton=load_newton_options(deck),
            tangent_precision=load_tangent_precision(deck),
                        constraints=cons,
                    )
                    state = rds.scatter_state(
                        {k: out.prolong(np.asarray(v))
                         for k, v in gstate.items()})
                    x = jnp.asarray(x_new)
                    paraview.mesh = mesh
        elif t in rtp and amr_done < amr_max_steps:
            # adaptive remeshing (src/coupled_hcc.C:733-780): Kelly on
            # hydrostatic pressure + tumor concentration, mean-stddev
            # flagging, conforming 1:8 refinement; both the RDC state and
            # the solid positions are P1-prolonged and BOTH systems rebuilt
            amr_done += 1
            with plog.scope("remeshing"):
                import jax.numpy as jnp

                from ..fem.amr import (flag_by_mean_stddev,
                                       kelly_error_indicator)
                from ..mesh import AdaptiveMesh, adapt_flagged, refine_flagged

                u_np = np.asarray(state["u"])
                ind = np.stack([elemental_to_nodal(mesh, p_elem),
                                u_np[:, 1]], axis=1)
                eta = kelly_error_indicator(mesh, jnp.asarray(ind), [0, 1])
                flags, coarsen = flag_by_mean_stddev(
                    np.asarray(eta), amr_refine_frac, amr_coarsen_frac
                )
                if mesh.elem_type == "TET4":
                    # selective bisection refine + coarsen (mesh/adapt.py);
                    # HEX8 falls back to the uniform conforming policy
                    if amesh is None or amesh.mesh is not mesh:
                        amesh = AdaptiveMesh(mesh)
                    r = adapt_flagged(amesh, flags, coarsen,
                                      max_level=amr_max_level)
                    if r is not None:
                        amesh = r.adaptive
                else:
                    r = refine_flagged(mesh, flags)
                if r is None:
                    print(f"remeshing step {t}: nothing flagged")
                else:
                    mesh = r.mesh
                    print(f"remeshing step {t}: adapted to "
                          f"{mesh.n_elems} elements")
                    fibres = r.restrict_elemental(fibres)
                    p_elem = r.restrict_elemental(p_elem)
                    vm_elem = r.restrict_elemental(vm_elem)
                    fibre_cur = r.restrict_elemental(fibre_cur)
                    x_new = r.prolong(np.asarray(x))
                    gstate = rds.gather_state(state)
                    rds, get_u, put_state = make_rdc_system(
                        mesh, 3, hcc_physics, deck, moving_mesh=True,
                physics_blocks=hcc_blocks)
                    solid = SolidSystem(
                        mesh,
                        materials=load_materials(deck),
                        bcs=load_bcs(deck),
                        penalty=deck("BCs/displacement_penalty", 1.0e5),
                        fibres=fibres,
                        newton=load_newton_options(deck),
            tangent_precision=load_tangent_precision(deck),
                        device_mesh=dmesh,
                    )
                    state = rds.scatter_state(
                        {k: r.prolong(np.asarray(v))
                         for k, v in gstate.items()})
                    x = jnp.asarray(x_new)
                    paraview.mesh = mesh
        if ckpt_step and t % ckpt_step == 0:
            from ..utils import save_checkpoint

            with plog.scope("checkpoint"):
                ck_extras = {"x": np.asarray(x),
                             "pseudo_time": np.asarray(pseudo_time),
                             "fibres": fibres, "p_elem": p_elem,
                             "vm_elem": vm_elem, "fibre_cur": fibre_cur}
                if amr_done:
                    gmsh.write(mesh,
                               os.path.join(DIR, "checkpoint_mesh.msh"))
                    ck_extras["amr_done"] = np.asarray(amr_done)
                    if (mesh.elem_type == "MIXED" and amesh is not None
                            and len(getattr(amesh, "constraints", ()))):
                        ck_extras["constraints"] = amesh.constraints
                save_checkpoint(
                    os.path.join(DIR, "checkpoint.npz"),
                    rds.gather_state(state), t,
                    time_value, ck_params, **ck_extras,
                )
        if t in otp:
            save(t)

    paraview.close_pvd()
    deck.warn_unused()
    plog.report()
    return DIR
