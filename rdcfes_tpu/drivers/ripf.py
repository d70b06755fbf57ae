"""RIPF driver: radiation-induced pulmonary fibrosis (reference src/ripf.C:13-96).

Three coupled field groups as in the reference: the implicit RIPF system
(HU, cc, fb), the finite-difference time-derivative fields, and the RT dose
fields (broad, focus, total).  Per step (src/ripf.C:69-93 + check_solution
:675-775):

  1. linearized-CN solve of (HU, cc, fb)
  2. clamp: HU to [HU/min, HU/max], cc/fb >= 0
  3. TD fields = (clamped - previous RAW solution)/dt — the reference keeps
     the PRE-clamp solver output as "previous" (src/ripf.C:770)
  4. accumulate the fractionated RT dose by simulation day and publish
     RT_dose/total/max (used as the fallback for fb/lambda/RT/r and
     fb/omicro/RT/r when the deck sets them to 0, with the reference's
     Real -> int truncation, src/ripf.C:397-403, :772)
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..fem.assembly import interpolate_at_qp
from ..io import dat, provenance
from ..io.csv_metrics import ripf_row
from ..io.getpot import Deck
from ..io.vtu import ParaviewWriter
from ..mesh import gmsh
from ..models.ripf import ripf_blocks, RIPF_VARS, ripf_physics, rt_dose_schedule
from .common import (PerfLog, make_rdc_system, maybe_profile,
                     output_time_points, step_banner)


def load_params(deck: Deck) -> dict:
    """Deck key -> physics params with the reference's hard validation
    (src/ripf.C:171-250: libmesh_error() on out-of-range values)."""
    def req(name, default, check=None, msg=""):
        v = deck(name, default)
        if check is not None and not check(v):
            raise ValueError(f"input parameter out of range: {name} = {v} {msg}")
        return v

    p = {"dt": deck("time_step", 1.0e-9)}
    p["volfr_stroma"] = deck("volume_fraction/stroma", 0.0)
    p["volfr_parenchyma"] = deck("volume_fraction/parenchyma", 0.0)
    p["volfr_exponent"] = req("volume_fraction/exponent", 1.0, lambda v: v >= 0.0)
    p["volfr_min_vacant"] = deck("volume_fraction/min_vacant", 1.0e-12)
    deck("volume_fraction/max_vacant", 1.0 - p["volfr_min_vacant"])
    p["phi_cc_build"] = req("HU/phi/cc/build", 0.0, lambda v: v >= 0.0)
    p["phi_cc_decay"] = req("HU/phi/cc/decay", 0.0, lambda v: v <= 0.0)
    p["phi_cc_rate"] = req("HU/phi/cc/rate", 0.0, lambda v: v >= 0.0)
    p["phi_fb_build"] = req("HU/phi/fb/build", 0.0, lambda v: v >= 0.0)
    p["phi_fb_decay"] = req("HU/phi/fb/decay", 0.0, lambda v: v <= 0.0)
    p["phi_fb_rate"] = req("HU/phi/fb/rate", 0.0, lambda v: v >= 0.0)
    p["phi_tolerance"] = req("HU/phi/tolerance", 0.0, lambda v: v >= 0.0)
    p["cc_kappa"] = req("cc/kappa", 0.0, lambda v: v >= 0.0)
    p["cc_kappa_RT_c"] = req("cc/kappa/RT/c", 0.0, lambda v: v >= 0.0)
    p["cc_delta"] = req("cc/delta", 0.0, lambda v: v >= 0.0)
    p["cc_delta_RT_a"] = req("cc/delta/RT/a", 0.0, lambda v: v > 0.0)
    p["cc_delta_RT_b"] = req("cc/delta/RT/b", 0.0, lambda v: v > 0.0)
    p["fb_lambda"] = req("fb/lambda", 0.0, lambda v: v >= 0.0)
    p["_fb_lambda_RT_r"] = req("fb/lambda/RT/r", 0.0, lambda v: v >= 0.0)
    p["lambda_HU_r"] = req("fb/lambda/HU/r", -1.0, lambda v: v < 0.0)
    p["fb_omicro"] = req("fb/omicro", 0.0, lambda v: v >= 0.0)
    p["_fb_omicro_RT_r"] = req("fb/omicro/RT/r", 0.0, lambda v: v >= 0.0)
    p["omicro_fb_b"] = req("fb/omicro/fb/b", 0.0, lambda v: 0.0 <= v <= 1.0)
    p["fb_omega"] = req("fb/omega", 0.0, lambda v: v >= 0.0)
    p["fb_diffusion"] = req("fb/diffusion", 0.0, lambda v: v >= 0.0)
    p["fb_haptotaxis"] = req("fb/haptotaxis", 0.0, lambda v: v >= 0.0)
    p["fb_radiotaxis"] = req("fb/radiotaxis", 0.0, lambda v: v >= 0.0)
    return p


def run(deck_path: str = "input.dat") -> str:
    plog = PerfLog("ripf")
    deck = Deck(deck_path)

    input_gmsh = deck("input_GMSH", "input.msh")
    input_nodal = deck("input_nodal", "input.nodal")
    input_rt = deck("input_nodal_RT", "input.nodal~RT")
    DIR = provenance.prepare_results_dir(
        deck("directory", "") or None, deck_path, [input_nodal, input_rt]
    )
    out_gmsh = os.path.join(DIR, deck("output_GMSH", "output.msh"))
    out_pv = os.path.join(DIR, deck("output_PARAVIEW", "output4paraview"))
    out_csv = os.path.join(DIR, deck("output_CSV", "output.csv"))

    n_steps = deck("time_step_number", 1)
    dt = deck("time_step", 1.0e-9)
    # checkpoint/resume (capability upgrade over the reference — SURVEY.md
    # section 5); the RIPF bookkeeping state (TD fields, previous raw
    # solution) is serialized alongside the solver state
    ckpt_step = deck("checkpoint/step", 0)
    ckpt_resume = deck("checkpoint/resume", "")
    deck("mesh/skip_renumber_nodes_and_elements", True)
    otp = output_time_points(deck, n_steps)

    HU_min = deck("HU/min", -1000.0)
    HU_max = deck("HU/max", 1000.0)
    broad_frac = deck("RT_dose/broad/fractions", 1)
    focus_frac = deck("RT_dose/focus/fractions", 1)
    ranges = {
        "range_cc_HU_min": deck("range_cc/HU/min", HU_min),
        "range_cc_HU_max": deck("range_cc/HU/max", HU_max),
        "range_cc_min": deck("range_cc/min", 1.0e-9),
        "range_fb_HU_min": deck("range_fb/HU/min", HU_min),
        "range_fb_HU_max": deck("range_fb/HU/max", HU_max),
        "range_fb_min": deck("range_fb/min", 1.0e-9),
    }
    params = load_params(deck)

    with plog.scope("mesh io"):
        mesh = gmsh.read(input_gmsh)
        print(mesh.print_info())
        gmsh.write(mesh, out_gmsh)

    with plog.scope("initial conditions"):
        u0 = dat.read_stream(input_nodal, mesh.n_nodes, 3)
        rt = dat.read_stream(input_rt, mesh.n_nodes, 2)  # broad, focus

    def clamp(u):
        # channel-first solver layout u (V, N): HU row clipped to the deck
        # bounds, cc/fb rows nonnegative (src/ripf.C:718-721)
        HU = jnp.clip(u[0], HU_min, HU_max)
        rest = jnp.maximum(u[1:], 0.0)
        return jnp.concatenate([HU[None, :], rest], axis=0)

    with plog.scope("system setup"):
        # deck key parallel/n_devices > 1 routes through the halo-exchange
        # multi-chip system (reference: every case runs `mpiexec -n 4`)
        system, get_u, put_state = make_rdc_system(
            mesh, 3, ripf_physics, deck, clamp=clamp,
            physics_blocks=ripf_blocks)
        state = put_state(u0)
    sharded = hasattr(system, "shard_elem_field")
    # driver-local geometry for the TD qp fields (system-independent);
    # mixed meshes sample per type block
    from ..fem.geometry import geometry_factors
    _coords = jnp.asarray(mesh.coords)
    _mixed = mesh.elem_type == "MIXED"
    if _mixed:
        _geo = [(jnp.asarray(b.connectivity.T),)
                + geometry_factors(_coords, jnp.asarray(b.connectivity),
                                   b.elem_type)
                for b in mesh.blocks]
    else:
        _geo = [(jnp.asarray(mesh.connectivity.T),)
                + geometry_factors(_coords, jnp.asarray(mesh.connectivity),
                                   mesh.elem_type)]

    # --- check_solution state (TD fields, RT schedule) --------------------
    td = np.zeros((mesh.n_nodes, 3))
    prev_raw = u0.copy()
    rt_total = np.zeros(mesh.n_nodes)

    def check(time_value: float):
        """Post-solve bookkeeping (src/ripf.C:675-775)."""
        nonlocal td, prev_raw, rt_total
        gst = system.gather_state(state)
        raw = gst["u_raw"]
        clamped = gst["u"]
        td = (clamped - prev_raw) / dt
        prev_raw = raw
        rt_total = np.asarray(
            rt_dose_schedule(rt[:, 0], rt[:, 1], time_value, broad_frac, focus_frac)
        )
        rt_total_max = rt_total.max()
        if rt_total_max <= 0.0:
            raise RuntimeError("maximum total RT dose <= 0 (reference aborts here)")
        # deck value 0 -> fall back to int(max total dose) (src/ripf.C:397-403)
        params["lambda_RT_r"] = params["_fb_lambda_RT_r"] or float(int(rt_total_max))
        params["omicro_RT_r"] = params["_fb_omicro_RT_r"] or float(int(rt_total_max))

    def qp_fields():
        stacked = jnp.asarray(np.stack([td[:, 1], td[:, 2], rt_total], axis=0))
        parts = {"cc_dtime": [], "fb_dtime": [], "RT": [], "RT_grad_unit": []}
        for _conn_T, _phi, _JxW, _dphi in _geo:
            vals_qp, grads_qp = interpolate_at_qp(stacked, _conn_T, _phi,
                                                  _dphi)
            g = grads_qp[2]  # (Q, 3, E)
            norm = jnp.linalg.norm(g, axis=-2, keepdims=True)
            parts["cc_dtime"].append(vals_qp[0])
            parts["fb_dtime"].append(vals_qp[1])
            parts["RT"].append(vals_qp[2])
            parts["RT_grad_unit"].append(jnp.where(
                norm > 0.0, g / jnp.where(norm == 0, 1.0, norm), 0.0))
        if _mixed:
            out = {k: tuple(v) for k, v in parts.items()}
            if sharded:
                out = {k: system.shard_elem_field(
                    tuple(np.asarray(b) for b in v), axis=-1)
                    for k, v in out.items()}
        else:
            out = {k: v[0] for k, v in parts.items()}
            if sharded:
                out = {k: system.shard_elem_field(np.asarray(v))
                       for k, v in out.items()}
        return out

    # initial check before the loop (src/ripf.C:50-53)
    check(0.0)

    paraview = ParaviewWriter(mesh)
    # on resume into the same results dir, append instead of truncating
    resuming = bool(ckpt_resume) and os.path.exists(out_csv)
    paraview.open_pvd(out_pv, resume=resuming)
    # header intentionally absent (src/ripf.C:800-807)
    csv = open(out_csv, "a" if resuming else "w")

    def save(t: int, time_value: float):
        u = get_u(state)
        with plog.scope("csv output"):
            ripf_row(csv, mesh, u, time_value, ranges)
        with plog.scope("vtu output"):
            fields = [(name, u[:, i]) for i, name in enumerate(RIPF_VARS)]
            fields += [
                ("HU_TimeDeriv", td[:, 0]),
                ("cc_TimeDeriv", td[:, 1]),
                ("fb_TimeDeriv", td[:, 2]),
                ("RT_dose/broad", rt[:, 0]),
                ("RT_dose/focus", rt[:, 1]),
                ("RT_dose/total", rt_total),
            ]
            paraview.update_pvd(
                fields, t,
                processor_id=getattr(system, "processor_id", None))

    ckpt_params = {k: v for k, v in params.items()
                   if not k.startswith("_") and k not in
                   ("lambda_RT_r", "omicro_RT_r")}
    start_step = 0
    time_value = 0.0
    if ckpt_resume:
        from ..utils import load_checkpoint

        st, start_step, time_value, extra = load_checkpoint(
            ckpt_resume, ckpt_params)
        state = system.scatter_state(st)
        td = extra["td"]
        prev_raw = extra["prev_raw"]
        rt_total = np.asarray(rt_dose_schedule(
            rt[:, 0], rt[:, 1], time_value, broad_frac, focus_frac))
        params["lambda_RT_r"] = (params["_fb_lambda_RT_r"]
                                 or float(int(rt_total.max())))
        params["omicro_RT_r"] = (params["_fb_omicro_RT_r"]
                                 or float(int(rt_total.max())))
        print(f"resumed from {ckpt_resume} at step {start_step}")
    else:
        save(0, 0.0)

    # the params dict carries resolved lambda_RT_r before the first step
    _ = params.pop("_fb_lambda_RT_r_unused", None)
    step_params = {k: v for k, v in params.items()
                   if not k.startswith("_")
                   and k not in ("lambda_RT_r", "omicro_RT_r")}

    # --- scan path: check_solution's per-step feedback, in-device -------
    # The TD qp fields for step t derive from the carried solution
    # ((u_{t-1} - raw_{t-2})/dt, src/ripf.C:675-775) and the RT schedule
    # from time alone, so both ride run_steps' field_update hook instead
    # of a per-step host gather-and-rebuild loop.  The RT-resolved rate
    # scalars (int-truncated max-dose fallback, src/ripf.C:397-403)
    # depend only on time and are precomputed as scalar trajectories.
    use_scan = (not _mixed
                and getattr(system, "physics_blocks", None) is not None
                and hasattr(system, "run_steps")
                and all(isinstance(v, (int, float))
                        for v in step_params.values()))
    abort_t = None
    if use_scan:
        _conn_T, _phi_g, _JxW_g, _dphi_g = _geo[0]
        _rt_b = jnp.asarray(rt[:, 0])
        _rt_f = jnp.asarray(rt[:, 1])
        _bf, _ff = float(broad_frac), float(focus_frac)
        _dtf = float(dt)
        # phi is a tiny (Q, K) table inspected host-side inside
        # interpolate_at_qp — close it over the program (constant);
        # the E-sized tables (conn_T, dphi) stay jit ARGUMENTS
        _phi_host = np.asarray(_phi_g)

        def _qp_pack(vals_qp, grads_qp):
            g = grads_qp[2]
            norm = jnp.linalg.norm(g, axis=-2, keepdims=True)
            return {"cc_dtime": vals_qp[0], "fb_dtime": vals_qp[1],
                    "RT": vals_qp[2],
                    "RT_grad_unit": jnp.where(
                        norm > 0.0, g / jnp.where(norm == 0, 1.0, norm),
                        0.0)}

        if sharded:
            # multi-chip hook: owned channel-first (1, V, No_max) slabs,
            # ghost-filled once before shard-local qp sampling; the RT
            # node doses travel as a distributed (D, 2, No_max) slab
            _rt_slab = system.scatter_nodal(np.asarray(rt))

            def rt_field_update(blk, prev_raw2, tr, gf, conn, dphi,
                                rt_slab):
                td_cc = (blk["u"][0, 1] - prev_raw2[0, 1]) / _dtf
                td_fb = (blk["u"][0, 2] - prev_raw2[0, 2]) / _dtf
                rt_tot = rt_dose_schedule(rt_slab[0, 0], rt_slab[0, 1],
                                          tr["RT_time"], _bf, _ff)
                sg = gf(jnp.stack([td_cc, td_fb, rt_tot], axis=0))
                vals_qp, grads_qp = interpolate_at_qp(sg, conn,
                                                      _phi_host, dphi)
                return _qp_pack(vals_qp, grads_qp), blk["u_raw"]
        else:
            def rt_field_update(st, prev_raw2, tr, rt_b, rt_f, conn_T,
                                dphi):
                """In-scan rebuild of check_solution's qp fields:
                prev_raw2 carries the raw solution from TWO steps back
                (the value check() had stored before the previous
                step)."""
                td_d = (st["u"] - prev_raw2) / _dtf             # (N, V)
                rt_tot = rt_dose_schedule(rt_b, rt_f, tr["RT_time"],
                                          _bf, _ff)
                stacked = jnp.stack([td_d[:, 1], td_d[:, 2], rt_tot],
                                    axis=0)
                vals_qp, grads_qp = interpolate_at_qp(stacked, conn_T,
                                                      _phi_host, dphi)
                return _qp_pack(vals_qp, grads_qp), st["u_raw"]

        # host trajectories of the RT-resolved scalars over the run
        times_all = dt * np.arange(n_steps + 1)
        tot_all = np.asarray(rt_dose_schedule(
            rt[None, :, 0], rt[None, :, 1],
            jnp.asarray(times_all)[:, None], broad_frac, focus_frac))
        rtmax_traj = tot_all.max(axis=1)
        lam_traj = np.where(params["_fb_lambda_RT_r"],
                            params["_fb_lambda_RT_r"],
                            rtmax_traj.astype(np.int64).astype(np.float64))
        omi_traj = np.where(params["_fb_omicro_RT_r"],
                            params["_fb_omicro_RT_r"],
                            rtmax_traj.astype(np.int64).astype(np.float64))
        # the reference aborts at the check AFTER the step where the max
        # total dose hits zero — bound segments there so artifacts match
        abort_t = next((tt for tt in range(start_step + 1, n_steps + 1)
                        if rtmax_traj[tt] <= 0.0), None)

    def next_event(tc: int) -> int:
        nxt = n_steps if abort_t is None else min(n_steps, abort_t)
        if ckpt_step:
            nxt = min(nxt, ((tc // ckpt_step) + 1) * ckpt_step)
        future = [s for s in otp if s > tc]
        if future:
            nxt = min(nxt, min(future))
        return nxt

    _profile_cm = maybe_profile()
    _profile_cm.__enter__()
    t = start_step
    while t < n_steps:
        seg = next_event(t) - t if use_scan else 1
        if use_scan and seg > 1:
            # steps t+1..t+seg; step t+1+j sees values resolved at step t+j
            idx = np.arange(t, t + seg)
            straj = {"lambda_RT_r": lam_traj[idx],
                     "omicro_RT_r": omi_traj[idx],
                     "RT_time": dt * idx}
            # raw_{t-1}, reconstructed from the td identity (exact)
            aux0 = get_u(state) - dt * td
            if sharded:
                aux0 = system.scatter_nodal(np.asarray(aux0))
                fargs = (_rt_slab,)
            else:
                aux0 = jnp.asarray(aux0)
                fargs = (_rt_b, _rt_f, _conn_T, _dphi_g)
            with plog.scope("solve"):
                state, _its, _res, aux = system.run_steps(
                    state, seg, params=step_params, scalar_traj=straj,
                    field_update=rt_field_update, field_aux=aux0,
                    field_args=fargs)
            for j in range(seg):
                time_value += dt
                step_banner(t + 1 + j, n_steps, time_value)
            t += seg
            # host bookkeeping at the segment boundary == check(t)
            gst = system.gather_state(state)
            aux_np = system.gather(aux) if sharded else np.asarray(aux)
            td = (gst["u"] - aux_np) / dt
            prev_raw = gst["u_raw"]
            rt_total = tot_all[t]
            if rt_total.max() <= 0.0:
                raise RuntimeError(
                    "maximum total RT dose <= 0 (reference aborts here)")
            params["lambda_RT_r"] = float(lam_traj[t])
            params["omicro_RT_r"] = float(omi_traj[t])
        else:
            t += 1
            time_value += dt
            step_banner(t, n_steps, time_value)
            # the RT-schedule-resolved rates travel as per-step SCALARS so
            # the deck params stay static (enables the qp matrix-free path)
            step_scalars = {"lambda_RT_r": params["lambda_RT_r"],
                            "omicro_RT_r": params["omicro_RT_r"]}
            with plog.scope("solve"):
                state, iters, res = system.step(state, fields=qp_fields(),
                                                params=step_params,
                                                scalars=step_scalars)
            check(time_value)
        if ckpt_step and t % ckpt_step == 0:
            from ..utils import save_checkpoint

            with plog.scope("checkpoint"):
                save_checkpoint(
                    os.path.join(DIR, "checkpoint.npz"),
                    system.gather_state(state), t, time_value,
                    ckpt_params, td=td, prev_raw=prev_raw,
                )
        if t in otp:
            save(t, time_value)

    csv.close()
    paraview.close_pvd()
    _profile_cm.__exit__(None, None, None)
    deck.warn_unused()
    plog.report()
    return DIR
