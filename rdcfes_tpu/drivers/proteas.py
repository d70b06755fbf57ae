"""PROTEAS driver: radiotherapy tumour response (reference src/proteas.C:17-91).

The only reference driver that takes its deck path from the CLI
(`input=<file>`, src/main.C:22-36).  Flow: deck -> results dir -> Gmsh read
-> nodal ICs (hos, tum, nec, vsc, oed) + nodal AUX (HU, RTD) with the
comment-tolerant parser -> time loop -> VTU/PVD (the reference opens a CSV
but never writes rows — src/proteas.C:53-55 with no save_solution — and we
keep that behavior).

AUX sampling (documented deviation, see models/proteas.py): default is the
correct full P1 interpolation of RTD to quadrature points; set deck key
`proteas/aux_sampling = reference` to reproduce the reference's quirk
(phi_1(qp) * HU at local node 1, src/proteas.C:479-482).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..io import dat, provenance
from ..io.getpot import Deck
from ..io.vtu import ParaviewWriter
from ..mesh import gmsh
from ..models.proteas import PROTEAS_VARS, proteas_blocks, proteas_physics
from .common import (PerfLog, make_rdc_system, maybe_profile,
                     output_time_points, step_banner)

_PARAM_KEYS = [
    ("cells/total_capacity", "cells_total_capacity"),
    ("radiotherapy/max_dosage", "radiotherapy_max_dosage"),
    ("host/proliferation", "host_proliferation"),
    ("host/vsc_threshold", "host_vsc_threshold"),
    ("host/RT_death_rate", "host_RT_death_rate"),
    ("host/RT_exp_a", "host_RT_exp_a"),
    ("host/RT_exp_b", "host_RT_exp_b"),
    ("host/necrosis_rate", "host_necrosis_rate"),
    ("tumour/diffusion", "tumour_diffusion"),
    ("tumour/diffusion_host", "tumour_diffusion_host"),
    ("tumour/proliferation", "tumour_proliferation"),
    ("tumour/vsc_threshold", "tumour_vsc_threshold"),
    ("tumour/RT_death_rate", "tumour_RT_death_rate"),
    ("tumour/RT_exp_a", "tumour_RT_exp_a"),
    ("tumour/RT_exp_b", "tumour_RT_exp_b"),
    ("tumour/necrosis_rate", "tumour_necrosis_rate"),
    ("necrosis/clearance", "necrosis_clearance"),
    ("necrosis/slope", "necrosis_slope"),
    ("necrosis/vsc_threshold", "necrosis_vsc_threshold"),
    ("vascular/proliferation", "vascular_proliferation"),
    ("vascular/necrosis_rate", "vascular_necrosis_rate"),
    ("oedema/diffusion", "oedema_diffusion"),
    ("oedema/proliferation", "oedema_proliferation"),
    ("oedema/vsc_threshold", "oedema_vsc_threshold"),
    ("oedema/oedema_threshold", "oedema_oedema_threshold"),
    ("oedema/RT_coeff", "oedema_RT_coeff"),
    ("oedema/RT_exp", "oedema_RT_exp"),
    ("oedema/reabsorption_rate", "oedema_reabsorption_rate"),
]


def load_params(deck: Deck) -> dict:
    """Deck key -> physics params; all model defaults are 1.0
    (src/proteas.C:178-213)."""
    p = {"dt": deck("time_step", 1.0e-9)}
    for deck_key, pkey in _PARAM_KEYS:
        p[pkey] = deck(deck_key, 1.0)
    return p


def run(deck_path: str = "input.dat") -> str:
    plog = PerfLog("proteas")
    deck = Deck(deck_path)

    input_gmsh = deck("input_GMSH", "input.msh")
    input_nodal = deck("input_nodal", "input.nd")
    input_aux = deck("input_nodal_aux", "input_aux.nd")
    DIR = provenance.prepare_results_dir(deck("directory", "") or None, deck_path)
    pv_base = os.path.basename(DIR.rstrip("/"))
    out_pv = os.path.join(DIR, deck("output_Paraview", pv_base))
    out_csv = os.path.join(DIR, deck("output_CSV", pv_base + ".csv"))

    n_steps = deck("time_step_number", 1)
    dt = deck("time_step", 1.0e-9)
    deck("refinement_step", 1 + n_steps)  # AMR is a stub in the reference too
    deck("mesh/skip_renumber_nodes_and_elements", True)
    for k, d in [("mesh/AMR/max_steps", 0), ("mesh/AMR/max_level", 3)]:
        deck(k, d)
    deck("mesh/AMR/refine_percentage", 0.5)
    deck("mesh/AMR/coarsen_percentage", 0.5)
    otp = output_time_points(deck, n_steps)

    with plog.scope("mesh io"):
        mesh = gmsh.read(input_gmsh)
        print(mesh.print_info())

    with plog.scope("initial conditions"):
        u0 = dat.read_rows_tolerant(input_nodal, mesh.n_nodes, 5)
        aux = dat.read_rows_tolerant(input_aux, mesh.n_nodes, 2)  # HU, RTD

    params = load_params(deck)
    sampling = deck("proteas/aux_sampling", "full")

    with plog.scope("system setup"):
        # deck key parallel/n_devices > 1 routes through the halo-exchange
        # multi-chip system (reference: every case runs `mpiexec -n 4`)
        system, get_u, put_state = make_rdc_system(
            mesh, 5, proteas_physics, deck, physics_blocks=proteas_blocks)
        state = put_state(u0)
    sharded = hasattr(system, "shard_elem_field")

    # RTD at quadrature points (fixed for the whole run: AUX is static);
    # shape-function table from the element tables, system-independent.
    # Mixed meshes sample per type block (per-block Q differs) and pass
    # the per-block tuple the mixed systems expect.
    from ..fem.elements import tabulate
    if mesh.elem_type == "MIXED":
        cblocks = [(np.asarray(b.connectivity), tabulate(b.elem_type)[0])
                   for b in mesh.blocks]
    else:
        cblocks = [(np.asarray(mesh.connectivity),
                    tabulate(mesh.elem_type)[0])]
    RTD_list = []
    for conn, phi in cblocks:
        if sampling == "reference":
            # the reference's sampling quirk: phi_1(qp) * HU(local node 1)
            # channel-first (Q, E)
            RTD_list.append(phi[:, 1][:, None] * aux[conn[:, 1], 0][None, :])
        else:
            RTD_list.append(np.einsum("qk,ek->qe", phi, aux[conn, 1]))
    if mesh.elem_type == "MIXED":
        RTD_f = (system.shard_elem_field(tuple(RTD_list), axis=-1)
                 if sharded else tuple(jnp.asarray(r) for r in RTD_list))
    else:
        RTD_f = (system.shard_elem_field(RTD_list[0]) if sharded
                 else jnp.asarray(RTD_list[0]))
    fields = {"RTD": RTD_f}

    paraview = ParaviewWriter(mesh)
    # on resume into the same results dir, extend instead of truncating
    resuming = bool(deck("checkpoint/resume", "")) and os.path.exists(out_csv)
    paraview.open_pvd(out_pv, resume=resuming)
    csv = open(out_csv, "a" if resuming else "w")  # never written, as in the reference

    def save(t: int):
        u = get_u(state)
        with plog.scope("vtu output"):
            out_fields = [(name, u[:, i]) for i, name in enumerate(PROTEAS_VARS)]
            out_fields += [("HU", aux[:, 0]), ("RTD", aux[:, 1])]
            paraview.update_pvd(
                out_fields, t,
                processor_id=getattr(system, "processor_id", None))

    # checkpoint/resume (capability upgrade over the reference)
    ckpt_step = deck("checkpoint/step", 0)
    ckpt_resume = deck("checkpoint/resume", "")
    start_step = 0
    time_value = 0.0
    if ckpt_resume:
        from ..utils import load_checkpoint

        st, start_step, time_value, _ = load_checkpoint(ckpt_resume, params)
        state = system.scatter_state(st)
        print(f"resumed from {ckpt_resume} at step {start_step}")
    else:
        save(0)

    _profile_cm = maybe_profile()
    _profile_cm.__enter__()
    # production stepping: scan-batched run_steps between event points
    # (output / checkpoint) — PROTEAS's fields (RTD aux sampling) are
    # static over the whole run, so segments are parameter-static like
    # PIHNA's.
    use_scan = (getattr(system, "physics_blocks", None) is not None
                and hasattr(system, "run_steps"))

    def next_event(t: int) -> int:
        nxt = n_steps
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
                                                     fields=fields,
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
                state, iters, res = system.step(state, fields=fields,
                                                params=params)
        if ckpt_step and t % ckpt_step == 0:
            from ..utils import save_checkpoint

            with plog.scope("checkpoint"):
                save_checkpoint(
                    os.path.join(DIR, "checkpoint.npz"),
                    system.gather_state(state), t, time_value, params,
                )
        if t in otp:
            save(t)

    csv.close()
    paraview.close_pvd()
    _profile_cm.__exit__(None, None, None)
    deck.warn_unused()
    plog.report()
    return DIR
