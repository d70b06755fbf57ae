"""Jacobian-vs-autodiff consistency for ADPM / PROTEAS / RIPF / HCC.

Each model's transcribed Jacobian blocks must equal the exact derivative of
its transcribed RHS almost everywhere; the documented reference deviations
(PROTEAS Ke[1][1]/Ke[3][1] omissions, the HCC anomalies) are encoded as
explicit `extra` corrections so any OTHER discrepancy fails the test.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rdcfes_tpu.fem import WeakForm
from rdcfes_tpu.mesh import box_tet_mesh
from rdcfes_tpu.models import adpm, hcc, proteas, ripf
from rdcfes_tpu.models.pihna import crowding_factor

from helpers import assemble_extra, check_jacobian_consistency


@pytest.fixture(scope="module")
def mesh():
    return box_tet_mesh(2, 2, 2)


# ----------------------------------------------------------------------
# ADPM
# ----------------------------------------------------------------------
def test_adpm_jacobian(mesh):
    rng = np.random.default_rng(11)
    p = adpm.default_params()
    p.update(
        dt=0.05,
        decay_PrP=1e-4, decay_PrP_pulse0=0.01, decay_PrP_pulse1=10.0,
        decay_PrP_time_exponent=0.5,
        transform_A_b=1e-3, transform_A_b_t0=0.01, transform_A_b_t1=0.05,
        transform_A_b_t2=0.5, transform_A_b_t3=0.9,
        transform_Tau=2e-3, transform_Tau_t0=0.01, transform_Tau_t1=0.05,
        transform_Tau_t2=0.5, transform_Tau_t3=0.9,
        diffuse_A_b=0.3, diffuse_A_b_pulse0=0.001, diffuse_A_b_pulse1=10.0,
        taxis1_A_b=0.9, taxis1_A_b_pulse0=-1.0, taxis1_A_b_pulse1=0.9,
        taxis2_A_b=0.4, taxis2_A_b_pulse0=-1.0, taxis2_A_b_pulse1=0.9,
        produce_A_b=0.7, produce_A_b_s0=0.2, produce_A_b_s1=0.8,
        decay_A_b=0.5, decay_A_b_pulse0=0.0005, decay_A_b_pulse1=10.0,
        diffuse_Tau=0.2, diffuse_Tau_pulse0=0.001, diffuse_Tau_pulse1=10.0,
        taxis1_Tau=0.8, taxis1_Tau_pulse0=-1.0, taxis1_Tau_pulse1=0.9,
        taxis2_Tau=0.3, taxis2_Tau_pulse0=-1.0, taxis2_Tau_pulse1=0.9,
        produce_Tau=0.6, produce_Tau_s0=0.2, produce_Tau_s1=0.8,
        decay_Tau=10.0, decay_Tau_pulse0=0.0005, decay_Tau_pulse1=10.0,
    )
    u = rng.uniform(0.1, 0.45, (mesh.n_nodes, 3))
    tracts = rng.standard_normal((mesh.n_elems, 3))
    tracts /= np.linalg.norm(tracts, axis=1, keepdims=True)
    fields = {"tracts": jnp.asarray(tracts), "time": 1.7}
    check_jacobian_consistency(mesh, 3, adpm.adpm_physics, fields, p, u)


# ----------------------------------------------------------------------
# PROTEAS
# ----------------------------------------------------------------------
def _proteas_extra(u_qp, grad_qp, fields, params):
    """Encode the two reference omissions (see models/proteas.py docstring):
    Ke[1][1] missing D_c_h derivative terms; Ke[3][1] missing
    rho_v*Kappa*vsc."""
    p = params
    dt2 = p["dt"] / 2.0
    hos, tum, nec, vsc, oed = u_qp
    Ghos = grad_qp[0]
    T_max = p["cells_total_capacity"]
    Kappa = jnp.clip(1.0 - (hos + tum + nec + vsc) / T_max, 0.0, 1.0)
    dKappa = -1.0 / T_max
    D_c_h = p["tumour_diffusion_host"]
    rho_v = p["vascular_proliferation"]
    zero = jnp.zeros_like(hos)
    zero3 = jnp.zeros_like(Ghos)
    C = jnp.zeros((5, 5) + hos.shape)
    C = C.at[3, 1].set(dt2 * rho_v * Kappa * vsc)
    D = jnp.zeros((5, 5) + Ghos.shape)
    D = D.at[1, 1].set(-dt2 * (D_c_h * (dKappa * tum + Kappa))[..., None, :] * Ghos)
    return WeakForm(C=C, D=D)


def test_proteas_jacobian(mesh):
    rng = np.random.default_rng(13)
    p = proteas.default_params()
    p.update(
        dt=0.02,
        cells_total_capacity=2.0,
        radiotherapy_max_dosage=60.0,
        host_proliferation=0.4, host_vsc_threshold=0.05,
        host_RT_death_rate=0.3, host_RT_exp_a=0.3, host_RT_exp_b=0.03,
        host_necrosis_rate=0.2,
        tumour_diffusion=0.5, tumour_diffusion_host=0.3,
        tumour_proliferation=0.6, tumour_vsc_threshold=0.04,
        tumour_RT_death_rate=0.4, tumour_RT_exp_a=0.3, tumour_RT_exp_b=0.03,
        tumour_necrosis_rate=0.25,
        necrosis_clearance=0.3, necrosis_slope=2.0, necrosis_vsc_threshold=0.5,
        vascular_proliferation=0.2, vascular_necrosis_rate=0.15,
        oedema_diffusion=0.35, oedema_proliferation=0.3,
        oedema_vsc_threshold=0.06, oedema_RT_coeff=0.2, oedema_RT_exp=2.0,
        oedema_reabsorption_rate=0.1,
    )
    # states strictly inside all branch interiors: 0 < Kappa < 1, vsc away
    # from the heaviside thresholds
    u = np.stack(
        [
            rng.uniform(0.1, 0.3, mesh.n_nodes),
            rng.uniform(0.1, 0.3, mesh.n_nodes),
            rng.uniform(0.05, 0.2, mesh.n_nodes),
            rng.uniform(0.1, 0.3, mesh.n_nodes),
            rng.uniform(0.05, 0.2, mesh.n_nodes),
        ],
        axis=1,
    )
    E = mesh.n_elems
    from rdcfes_tpu.fem import elements

    Q = elements.quadrature("TET4")[1].shape[0]
    fields = {"RTD": jnp.asarray(rng.uniform(1.0, 10.0, (Q, E)))}
    extra = assemble_extra(mesh, 5, _proteas_extra, fields, p, u)
    check_jacobian_consistency(mesh, 5, proteas.proteas_physics, fields, p, u,
                               extra=extra)


# ----------------------------------------------------------------------
# RIPF
# ----------------------------------------------------------------------
def test_ripf_jacobian(mesh):
    rng = np.random.default_rng(17)
    p = ripf.default_params()
    p.update(
        dt=0.1,
        volfr_stroma=0.3, volfr_parenchyma=0.2, volfr_exponent=2.5,
        volfr_min_vacant=1e-5,
        phi_cc_build=0.1, phi_cc_decay=-0.05, phi_cc_rate=0.2,
        phi_fb_build=0.15, phi_fb_decay=-0.08, phi_fb_rate=0.1,
        phi_tolerance=1e-3,
        cc_kappa=0.01, cc_kappa_RT_c=0.1,
        cc_delta=0.0864, cc_delta_RT_a=0.3, cc_delta_RT_b=0.03,
        fb_lambda=0.01, lambda_RT_r=1.0, lambda_HU_r=-500.0,
        fb_omicro=0.05, omicro_RT_r=60.0, omicro_fb_b=0.1,
        fb_omega=0.1, fb_diffusion=0.2, fb_haptotaxis=0.05,
        fb_radiotaxis=0.03,
    )
    u = np.stack(
        [
            rng.uniform(-400.0, -50.0, mesh.n_nodes),  # HU in the ramp branch
            rng.uniform(0.15, 0.2, mesh.n_nodes),       # cc in (0,1)
            rng.uniform(0.15, 0.25, mesh.n_nodes),      # fb in (b,1)
        ],
        axis=1,
    )
    E = mesh.n_elems
    from rdcfes_tpu.fem import elements

    Q = elements.quadrature("TET4")[1].shape[0]
    g = rng.standard_normal((Q, 3, E))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    fields = {
        "cc_dtime": jnp.asarray(rng.uniform(0.01, 0.1, (Q, E))),
        "fb_dtime": jnp.asarray(rng.uniform(-0.1, -0.01, (Q, E))),
        "RT": jnp.asarray(rng.uniform(5.0, 30.0, (Q, E))),
        "RT_grad_unit": jnp.asarray(g),
    }
    check_jacobian_consistency(mesh, 3, ripf.ripf_physics, fields, p, u)


def test_ripf_rt_schedule():
    """Fractionated dose accumulation by day (src/ripf.C:752-757)."""
    br, fo = 28.0, 8.0
    RT_b, RT_f = jnp.asarray(56.0), jnp.asarray(16.0)
    # day 0: first broad fraction
    np.testing.assert_allclose(
        ripf.rt_dose_schedule(RT_b, RT_f, 0.5, br, fo), 56.0 / 28.0
    )
    # last broad day
    np.testing.assert_allclose(
        ripf.rt_dose_schedule(RT_b, RT_f, 27.9, br, fo), 56.0
    )
    # first focus day
    np.testing.assert_allclose(
        ripf.rt_dose_schedule(RT_b, RT_f, 28.2, br, fo), 56.0 + 16.0 / 8.0
    )
    # after the course
    np.testing.assert_allclose(
        ripf.rt_dose_schedule(RT_b, RT_f, 100.0, br, fo), 72.0
    )


# ----------------------------------------------------------------------
# HCC (with the reference anomalies)
# ----------------------------------------------------------------------
def _hcc_extra(u_qp, grad_qp, fields, params):
    """The four coupled_hcc assembly anomalies (see models/hcc.py docstring)."""
    p = params
    dt2 = p["dt"] / 2.0
    l, c, n = u_qp
    Gc = grad_qp[1]
    Gsig = jnp.zeros_like(Gc)
    Kk = p["cells_max_capacity"]
    tau, dtau = crowding_factor((l + c + n) / Kk, Kk,
                                p["cells_max_capacity_exponent"])
    dif_c = jnp.where(c > p["cells_min_capacity"], p["diffuse_c"], 0.0)
    mech_c = jnp.where(c > p["cells_min_capacity"], p["mechano_c"], 0.0)
    prod_c, nec_c = p["produce_c"], p["necrosis_c"]
    one = jnp.ones_like(l)
    misplaced_C = dt2 * (prod_c * dtau * c - nec_c * c)
    Dtau_c = -dt2 * (-(dif_c * dtau)[..., None, :] * Gc
                     - (mech_c * dtau * c)[..., None, :] * Gsig)
    C = jnp.zeros((3, 3) + l.shape)
    C = C.at[0, 1].set(one)
    C = C.at[0, 2].set(one)
    C = C.at[1, 0].set(one)
    C = C.at[1, 1].set(one - misplaced_C)
    C = C.at[1, 2].set(misplaced_C)
    D = jnp.zeros((3, 3) + Gc.shape)
    D = D.at[1, 1].set(Dtau_c)
    D = D.at[1, 2].set(-Dtau_c)
    return WeakForm(C=C, D=D)


def test_hcc_jacobian(mesh):
    rng = np.random.default_rng(19)
    p = hcc.default_params()
    p.update(
        dt=0.01,
        cells_min_capacity=0.0, cells_max_capacity=1.0,
        cells_max_capacity_exponent=3.0,
        produce_l=0.3, diffuse_c=0.4, mechano_c=0.2, produce_c=0.5,
        necrosis_l=0.25, necrosis_c=0.35,
    )
    u = np.stack(
        [
            rng.uniform(0.1, 0.25, mesh.n_nodes),
            rng.uniform(0.1, 0.25, mesh.n_nodes),
            rng.uniform(0.05, 0.2, mesh.n_nodes),
        ],
        axis=1,
    )
    extra = assemble_extra(mesh, 3, _hcc_extra, {}, p, u)
    check_jacobian_consistency(mesh, 3, hcc.hcc_physics, {}, p, u, extra=extra)
