"""Solid driver: quasi-static hyperelastic load stepping (reference
src/solid.C:14-112).

Flow: deck -> (wiped) results dir -> Gmsh read + processed copy -> optional
fibre file -> pseudo-time ramp: Newton equilibrium solve, stress
post-processing (pressure/Von Mises/fibre push-forward), VTU output.

Deck notes (faithful to the reference's sharp edges):
  * number_of_loading_steps = int(1.0 / loading_step) (src/solid.C:153-154)
  * material keys are read under `material/<id>/Hyperelastic/...`; the
    shipped decks write `Neohookean` so the reference silently uses the
    defaults E=1e3, nu=0.3 — our unused-key warning surfaces this
  * BC displacement components parse NAN = unconstrained axis
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..io import dat, provenance
from ..io.getpot import Deck, export_integers
from ..io.vtu import ParaviewWriter, elemental_to_nodal
from ..mesh import gmsh
from ..solvers.newton import NewtonOptions
from ..systems import SolidSystem
from ..utils import on_tpu
from .common import make_solid_device_mesh, PerfLog, step_banner


def load_newton_options(deck: Deck) -> NewtonOptions:
    """solver/* knobs (src/solid.C:216-238, src/solid_system.C:86-100)."""
    deck("solver/quiet", False)
    deck("solver/assembly_use_symmetry", False)
    return NewtonOptions(
        max_nonlinear_iterations=deck("solver/nonlinear/max_nonlinear_iterations", 100),
        relative_step_tolerance=deck("solver/nonlinear/relative_step_tolerance", 1e-3),
        relative_residual_tolerance=deck("solver/nonlinear/relative_residual_tolerance", 1e-8),
        absolute_residual_tolerance=deck("solver/nonlinear/absolute_residual_tolerance", 1e-8),
        require_residual_reduction=deck("solver/nonlinear/require_reduction", False),
        max_linear_iterations=deck("solver/linear/max_linear_iterations", 50000),
        initial_linear_tolerance=deck("solver/linear/initial_linear_tolerance", 1e-3),
        # platform-aware default (VERDICT r4 item 6: the benched config
        # must be the shipped TPU default): "mixed" = f32 inner sweeps +
        # f64 residual carry with the f64 stall rescue on TPU (drift
        # 2.8e-8 vs the f64 stage, 36x inside the 1e-6 Newton
        # tolerance — PERF.md section 8); f64 on CPU (artifact parity,
        # matching the reference's PETSc KSP).  Deck key overrides.
        linear_precision=deck("solver/linear/precision", "")
        or ("mixed" if on_tpu() else "f64"),
        # Beneš-kernel x-gather for the inner SpMV: bit-identical to the
        # XLA gather and 1.27x faster (PERF.md section 8) but requires
        # TPU hardware — on by default there, off on CPU; deck key or
        # RDCFES_SOLID_FAST env overrides.
        fast_gather=deck("solver/linear/fast_gather", "")
        or os.environ.get("RDCFES_SOLID_FAST")
        or ("1" if on_tpu() else None),
        # modified Newton (keep the assembled tangent while the residual
        # contracts; refresh-on-degradation — solvers/newton.py).  Off by
        # default: the iterate path is genuinely different, so artifact
        # parity vs exact Newton holds only to the residual->solution
        # conditioning slack of the stopping rule (~1e-5 of displacement
        # scale at the deck defaults), not the 1e-8 artifact bar.
        reuse_tangent=deck("solver/nonlinear/reuse_tangent", False),
    )


def load_tangent_precision(deck: Deck) -> str:
    """solver/nonlinear/tangent_precision: "f32" evaluates/contracts/
    scatters the tangent in single precision (the residual the Newton
    stopping rules see stays f64 — inexact Newton; measured 92% of the
    110k-HEX8 load step is the f64 tangent assembly, PERF.md section
    11).  Platform-aware default: f32 on TPU (drift 4.9e-8 of the
    displacement scale vs the f64 tangent), f64 on CPU (artifact parity
    with the reference's stack)."""
    return (deck("solver/nonlinear/tangent_precision", "")
            or ("f32" if on_tpu() else "f64"))


def load_bcs(deck: Deck) -> dict:
    """BCs table (src/solid.C:240-259): id -> (dx, dy, dz), NaN = free."""
    bcs = {}
    for bc in export_integers(deck("BCs", " 0 ")):
        disp = tuple(
            deck(f"BC/{bc}/displacement/{d}", 0.0) for d in range(3)
        )
        bcs[bc] = disp
    return bcs


def load_materials(deck: Deck) -> dict:
    """Materials table (src/solid.C:261-280)."""
    mats = {}
    for m in export_integers(deck("materials", " 0 ")):
        mats[m] = {
            "young": deck(f"material/{m}/Hyperelastic/Young", 1.0e3),
            "poisson": deck(f"material/{m}/Hyperelastic/Poisson", 0.3),
            "fibre_stiffness": deck(f"material/{m}/Hyperelastic/FibreStiffness", 0.0),
            "stretch_rate_0": deck(f"material/{m}/Hyperelastic/VolumetricStretchRatio/rate_0", 0.0),
            "stretch_rate_1": deck(f"material/{m}/Hyperelastic/VolumetricStretchRatio/rate_1", 0.0),
            "stretch_rate_2": deck(f"material/{m}/Hyperelastic/VolumetricStretchRatio/rate_2", 0.0),
        }
    return mats


def load_fibres(deck: Deck, mesh) -> np.ndarray:
    """Per-element fibre unit vectors; errors on degenerate rows
    (src/solid.C:285-328)."""
    name = deck("input_fibres", ".")
    if name == ".":
        return np.zeros((mesh.n_elems, 3))
    raw = dat.read_stream(name, mesh.n_elems, 3)
    norms = np.linalg.norm(raw, axis=1)
    if (norms <= 1.0e-6).any():
        raise ValueError(f"{name}: degenerate fibre vector (|v| <= 1e-6)")
    return raw / norms[:, None]


def schedule(deck: Deck, n_steps: int, step_key: str, default_past_end: bool):
    """output/remeshing schedules (src/solid.C:156-200): step==0 means only
    the final step (output) or never (remeshing: 1+n_steps)."""
    step = deck(step_key, 0)
    if step == 0:
        return {n_steps + 1} if default_past_end else {n_steps}
    return set(range(step, n_steps + 1, step))


def run(deck_path: str = "input.dat") -> str:
    plog = PerfLog("solid")
    deck = Deck(deck_path)

    input_gmsh = deck("input_GMSH", "input.msh")
    DIR = provenance.prepare_results_dir(
        deck("directory", "") or None, deck_path, wipe=True
    )
    out_gmsh = os.path.join(DIR, deck("output_GMSH", "output.msh"))
    out_pv = os.path.join(DIR, deck("output_PARAVIEW", "output4paraview"))

    loading_step = deck("loading_step", 1.0)
    n_load_steps = int(1.0 / loading_step)
    otp = (set(export_integers(deck("output_time_points", "")))
           if deck.have("output_time_points")
           else schedule(deck, n_load_steps, "output_step", False))
    if deck.have("output_time_points"):
        deck("output_step", 0)
    rtp = schedule(deck, n_load_steps, "remeshing_step", True)
    deck("mesh/skip_renumber_nodes_and_elements", True)
    amr_max_steps = deck("mesh/AMR/max_steps", 0)
    amr_max_level = deck("mesh/AMR/max_level", 3)
    amr_refine_frac = deck("mesh/AMR/refine_percentage", 0.5)
    amr_coarsen_frac = deck("mesh/AMR/coarsen_percentage", 0.5)

    with plog.scope("mesh io"):
        mesh = gmsh.read(input_gmsh)
        print(mesh.print_info())
        gmsh.write(mesh, out_gmsh)

    # checkpoint/resume (capability upgrade over the reference, which can
    # only restart a load ramp from scratch — SURVEY.md section 5)
    ckpt_step = deck("checkpoint/step", 0)
    ckpt_resume = deck("checkpoint/resume", "")

    fibres = load_fibres(deck, mesh)
    dmesh = make_solid_device_mesh(deck)
    with plog.scope("system setup"):
        system = SolidSystem(
            mesh,
            materials=load_materials(deck),
            bcs=load_bcs(deck),
            penalty=deck("BCs/displacement_penalty", 1.0e5),
            fibres=fibres,
            newton=load_newton_options(deck),
            tangent_precision=load_tangent_precision(deck),
            device_mesh=dmesh,
        )
    x = system.initial_positions()

    amesh = None  # lazy AdaptiveMesh (TET4 bisection forest)
    resuming = bool(ckpt_resume)
    paraview = ParaviewWriter(mesh)
    paraview.open_pvd(out_pv, resume=resuming)

    p_elem = np.zeros(mesh.n_elems)
    vm_elem = np.zeros(mesh.n_elems)
    fibre_cur = fibres.copy()
    ck_params = {"loading_step": loading_step,
                 "penalty": deck("BCs/displacement_penalty", 1.0e5)}

    def save(t: int):
        xs = np.asarray(x)
        u = np.asarray(system.displacement(x))
        with plog.scope("vtu output"):
            fields = [
                ("x", xs[:, 0]), ("y", xs[:, 1]), ("z", xs[:, 2]),
                ("undeformed_x", mesh.coords[:, 0]),
                ("undeformed_y", mesh.coords[:, 1]),
                ("undeformed_z", mesh.coords[:, 2]),
                ("u_x", u[:, 0]), ("u_y", u[:, 1]), ("u_z", u[:, 2]),
                ("fibre_reference_x", elemental_to_nodal(mesh, fibres[:, 0])),
                ("fibre_reference_y", elemental_to_nodal(mesh, fibres[:, 1])),
                ("fibre_reference_z", elemental_to_nodal(mesh, fibres[:, 2])),
                ("fibre_current_x", elemental_to_nodal(mesh, fibre_cur[:, 0])),
                ("fibre_current_y", elemental_to_nodal(mesh, fibre_cur[:, 1])),
                ("fibre_current_z", elemental_to_nodal(mesh, fibre_cur[:, 2])),
                ("p", elemental_to_nodal(mesh, p_elem)),
                ("VM", elemental_to_nodal(mesh, vm_elem)),
            ]
            # current positions travel as the Points array too
            paraview.update_pvd(fields, t, coords=xs)

    start_step = 0
    pseudo_time = 0.0
    amr_done = 0
    if ckpt_resume:
        import jax.numpy as jnp

        from ..utils import load_checkpoint

        st, start_step, pseudo_time, extra = load_checkpoint(
            ckpt_resume, ck_params)
        ck_mesh = os.path.join(os.path.dirname(ckpt_resume),
                               "checkpoint_mesh.msh")
        if "amr_done" in extra and os.path.exists(ck_mesh):
            # the checkpoint was written after remeshing: the state lives
            # on the refined mesh saved alongside it
            mesh = gmsh.read(ck_mesh)
            amr_done = int(extra["amr_done"])
            fibres = extra["fibres"]
            sys_kw = {}
            if "constraints" in extra and len(extra["constraints"]):
                # restore the hanging-node constraints the refined mixed
                # mesh was checkpointed with (single-chip path)
                sys_kw["constraints"] = np.asarray(extra["constraints"])
            system = SolidSystem(
                mesh, materials=load_materials(deck), bcs=load_bcs(deck),
                penalty=deck("BCs/displacement_penalty", 1.0e5),
                fibres=fibres, newton=load_newton_options(deck),
            tangent_precision=load_tangent_precision(deck),
                device_mesh=None if sys_kw else dmesh, **sys_kw,
            )
            paraview.mesh = mesh
            print(f"resumed on remeshed grid ({mesh.n_elems} elements)")
        x = jnp.asarray(st["x"])
        p_elem = extra.get("p_elem", p_elem)
        vm_elem = extra.get("vm_elem", vm_elem)
        fibre_cur = extra.get("fibre_cur", fibre_cur)
        print(f"resumed from {ckpt_resume} at load step {start_step}")
    else:
        save(0)

    for l in range(start_step + 1, n_load_steps + 1):
        pseudo_time += loading_step
        step_banner(l, n_load_steps, pseudo_time, label="pseudo-time")
        with plog.scope("newton solve"):
            res = system.run_solver(x, pseudo_time)
            x = res.x
        print(f"   Newton: {int(res.iters)} iterations, "
              f"|R| {float(res.residual_norm):.3e}")
        with plog.scope("post process"):
            p_j, vm_j, fc_j = system.post_process(x, pseudo_time)
            p_elem, vm_elem, fibre_cur = (
                np.asarray(p_j), np.asarray(vm_j), np.asarray(fc_j)
            )
        if (l in rtp and amr_done < amr_max_steps
                and mesh.elem_type == "MIXED" and dmesh is not None):
            # hanging-node constraints in the solid Newton are single-chip
            # only (the multi-chip halo Newton does not close its ghost
            # set over constraint endpoints); multi-chip mixed runs keep
            # the fixed mesh with a notice instead of crashing mid-run
            print(f"remeshing step {l}: mixed-element solid remeshing is "
                  "single-chip only; continuing on the fixed mesh",
                  file=sys.stderr)
        elif (l in rtp and amr_done < amr_max_steps
                and mesh.elem_type == "MIXED"):
            # mixed-element remeshing (reference src/solid.C:330-369 is
            # mesh-generic): Kelly on pressure + Von Mises over the TET4
            # block, constrained 1:8 against the frozen transition
            # blocks, and the Newton path solves C^T K C matrix-free
            # (solvers/newton.py, gated by test_solid_constrained.py)
            amr_done += 1
            with plog.scope("remeshing"):
                import jax.numpy as jnp

                from ..fem.amr import flag_by_mean_stddev
                from ..mesh.adapt_ext import MixedConstrained, kelly_mixed

                ind = np.stack([elemental_to_nodal(mesh, p_elem),
                                elemental_to_nodal(mesh, vm_elem)], axis=1)
                eta = kelly_mixed(mesh, jnp.asarray(ind), [0, 1])
                flags, coarsen = flag_by_mean_stddev(
                    np.asarray(eta), amr_refine_frac, amr_coarsen_frac)
                if amesh is None or getattr(amesh, "mixed",
                                            None) is not mesh:
                    amesh = MixedConstrained.from_mesh(mesh)
                out = amesh.refine_and_coarsen(flags, coarsen,
                                               max_level=amr_max_level)
                if out is None:
                    print(f"remeshing step {l}: nothing flagged")
                else:
                    amesh = out.adaptive
                    mesh = out.mesh
                    cons = out.constraints
                    print(f"remeshing step {l}: adapted to "
                          f"{mesh.n_elems} elements "
                          f"({len(cons)} hanging constraints)")
                    # prolong CURRENT positions: new mid-edge nodes land
                    # at the midpoint of their (deformed) masters, so the
                    # prolonged x satisfies every constraint exactly
                    x_new = out.prolong(np.asarray(x))
                    fibres = out.transfer_elemental(fibres)
                    p_elem = out.transfer_elemental(p_elem)
                    vm_elem = out.transfer_elemental(vm_elem)
                    fibre_cur = out.transfer_elemental(fibre_cur)
                    system = SolidSystem(
                        mesh,
                        materials=load_materials(deck),
                        bcs=load_bcs(deck),
                        penalty=deck("BCs/displacement_penalty", 1.0e5),
                        fibres=fibres,
                        newton=load_newton_options(deck),
            tangent_precision=load_tangent_precision(deck),
                        constraints=cons if len(cons) else None,
                    )
                    x = jnp.asarray(x_new)
                    paraview.mesh = mesh
        elif l in rtp and amr_done < amr_max_steps:
            # adaptive remeshing (src/solid.C:330-369): Kelly on the
            # pressure + Von Mises fields, mean-stddev flagging, conforming
            # 1:8 refinement; positions are P1-prolonged (the undeformed
            # configuration refines exactly, the deformed one by midpoint
            # interpolation) and the system is rebuilt
            amr_done += 1
            with plog.scope("remeshing"):
                import jax.numpy as jnp

                from ..fem.amr import (flag_by_mean_stddev,
                                       kelly_error_indicator)
                from ..mesh import AdaptiveMesh, adapt_flagged, refine_flagged

                ind = np.stack([elemental_to_nodal(mesh, p_elem),
                                elemental_to_nodal(mesh, vm_elem)], axis=1)
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
                elif mesh.elem_type == "TET10":
                    # skeleton bisection + exact quadratic transfer
                    # (mesh/adapt_ext.py) — conforming, so the Newton
                    # path needs no constraint handling
                    from ..mesh.adapt_ext import Tet10Adaptive

                    if amesh is None or getattr(amesh, "mesh",
                                                None) is not mesh:
                        amesh = Tet10Adaptive.from_mesh(mesh)
                    r = amesh.refine_and_coarsen(
                        flags, coarsen, max_level=amr_max_level)
                    if r is not None:
                        amesh = r.adaptive
                else:
                    r = refine_flagged(mesh, flags)
                if r is None:
                    print(f"remeshing step {l}: nothing flagged")
                else:
                    mesh = r.mesh
                    print(f"remeshing step {l}: adapted to "
                          f"{mesh.n_elems} elements")
                    x_new = r.prolong(np.asarray(x))
                    fibres = r.restrict_elemental(fibres)
                    p_elem = r.restrict_elemental(p_elem)
                    vm_elem = r.restrict_elemental(vm_elem)
                    fibre_cur = r.restrict_elemental(fibre_cur)
                    system = SolidSystem(
                        mesh,
                        materials=load_materials(deck),
                        bcs=load_bcs(deck),
                        penalty=deck("BCs/displacement_penalty", 1.0e5),
                        fibres=fibres,
                        newton=load_newton_options(deck),
            tangent_precision=load_tangent_precision(deck),
                        device_mesh=dmesh,
                    )
                    x = jnp.asarray(x_new)
                    paraview.mesh = mesh
        elif l in rtp and amr_max_steps == 0:
            print("NOTE: remeshing step reached but mesh/AMR/max_steps = 0",
                  file=sys.stderr)
        if ckpt_step and l % ckpt_step == 0:
            from ..utils import save_checkpoint

            with plog.scope("checkpoint"):
                ck_extras = {"fibres": fibres, "p_elem": p_elem,
                             "vm_elem": vm_elem, "fibre_cur": fibre_cur}
                if amr_done:
                    gmsh.write(mesh,
                               os.path.join(DIR, "checkpoint_mesh.msh"))
                    ck_extras["amr_done"] = np.asarray(amr_done)
                    if (mesh.elem_type == "MIXED" and amesh is not None
                            and len(amesh.constraints)):
                        # hanging-node constraints must survive resume:
                        # the refined mesh is non-conforming without them
                        ck_extras["constraints"] = amesh.constraints
                save_checkpoint(
                    os.path.join(DIR, "checkpoint.npz"), {"x": np.asarray(x)},
                    l, pseudo_time, ck_params, **ck_extras,
                )
        if l in otp:
            save(l)

    paraview.close_pvd()
    deck.warn_unused()
    plog.report()
    return DIR
