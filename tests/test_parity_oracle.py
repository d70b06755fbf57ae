"""External parity oracle: rdcfes_tpu vs an independent scipy transcription.

The reference stack (libMesh/PETSc) cannot be built in this environment, so
the parity contract (BASELINE.json: 1e-8 relative L2 per step) is checked
against `oracle/pihna_numpy.py` — a second, independent transcription of
pihna.C assembled with scipy.sparse and solved DIRECTLY (SuperLU).  The two
implementations share no code: a transcription error on either side of any
of the 5 RHS / 25 Jacobian blocks, the coefficient branches, the quadrature
or the geometry shows up here (this harness caught a transposed
Jacobian-inverse in the oracle's geometry during development).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oracle import PihnaOracle  # noqa: E402

from rdcfes_tpu.mesh import box_tet_mesh  # noqa: E402
from rdcfes_tpu.models.pihna import default_params, pihna_physics  # noqa: E402
from rdcfes_tpu.systems import TransientRDCSystem  # noqa: E402


def _case():
    """Small brain-like PIHNA case with EVERY term active (diffusion,
    taxis, switching, necrosis, angiogenesis) at dynamics-stable rates."""
    mesh = box_tet_mesh(4, 4, 4, bounds=((0, 20.0), (0, 20.0), (0, 20.0)))
    Kk = 2.39e5
    p = default_params()
    p.update(
        dt=0.1, cells_min_capacity=1.0, cells_max_capacity=Kk,
        cells_max_capacity_exponent=3.0, cytokines_max_capacity=1e-8,
        necrosis_c=500 / Kk, necrosis_h=200 / Kk, necrosis_v=300 / Kk,
        produce_c=-2.5, switch_c2h=1.0, switch_h2c=1.82, switch_h2n=0.5,
        diffuse_c=0.5, taxis_c=2e-5, diffuse_h=1.0, taxis_h=4e-5,
        diffuse_v=0.2, taxis_v=1e-4, produce_v=10.0,
        secrete_a_c=2.77e-13, secrete_a_h=5.22e-10, uptake_a_v=1e-3,
        decay_a=5678.4,
    )
    N = mesh.n_nodes
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(1)
    u0 = np.zeros((N, 5))
    u0[:, 0] = 50.0 * np.exp(-r2 / 20.0)
    u0[:, 1] = 2000.0 * np.exp(-r2 / 30.0)
    u0[:, 2] = 500.0 * np.exp(-r2 / 25.0)
    u0[:, 3] = 7200.0 * np.exp(-r2 / 200.0)
    u0[:, 4] = 1e-10 * np.exp(-r2 / 50.0)
    return mesh, p, u0


def test_single_step_assembly_matches_oracle():
    """K and F agree with the independent transcription to machine eps."""
    import jax.numpy as jnp

    from tests.helpers import dense_from_bcsr

    mesh, p, u0 = _case()
    N = mesh.n_nodes
    orc = PihnaOracle(mesh.coords, mesh.connectivity, p)
    Ko, Fo = orc.assemble(u0)
    system = TransientRDCSystem(mesh, 5, pihna_physics)
    vals, b = system.assemble(jnp.asarray(u0).T, {}, p)
    Kr = dense_from_bcsr(vals, system.sp, 5)
    # oracle dofs are var-major (var*N + node); repo dense is node-major
    operm = (np.arange(5)[None, :] * N + np.arange(N)[:, None]).ravel()
    Ko_nm = Ko.toarray()[np.ix_(operm, operm)]
    assert np.abs(Kr - Ko_nm).max() / np.abs(Ko_nm).max() < 1e-13
    assert np.abs(np.asarray(b).T.ravel() - Fo[operm]).max() / np.abs(Fo).max() < 1e-13


def test_trajectory_parity():
    """Per-step relative L2 vs the oracle stays under the 1e-8 parity bar
    (BASELINE.json) — oracle solves DIRECTLY, rdcfes_tpu iteratively."""
    mesh, p, u0 = _case()
    orc = PihnaOracle(mesh.coords, mesh.connectivity, p)
    system = TransientRDCSystem(mesh, 5, pihna_physics)
    state = system.initial_state(u0)
    uo = u0.copy()
    worst = 0.0
    for _ in range(40):
        state, _, _ = system.step(state, params=p)
        uo, _ = orc.step(uo)
        rel = np.linalg.norm(np.asarray(state["u"]) - uo) / np.linalg.norm(uo)
        worst = max(worst, rel)
    assert np.isfinite(uo).all()
    assert worst < 1e-8, f"parity violated: worst rel L2 {worst:.3e}"


def test_trajectory_parity_calibrated_default():
    """The CALIBRATED deck-default tolerance (solver/linear/tolerance =
    3e-11, drivers/common.py) keeps the 1e-8 trajectory-parity contract
    with margin — this pins the default against drift.  Full-trajectory
    measurements (round-5 calibration): worst rel L2 over 120 steps =
    1.6e-9 at 3e-11, 7.0e-9 at 1e-10 (rejected: 1.4x margin), 8e-11 at
    the libMesh-default 1e-12."""
    mesh, p, u0 = _case()
    orc = PihnaOracle(mesh.coords, mesh.connectivity, p)
    from rdcfes_tpu.models.pihna import pihna_blocks

    system = TransientRDCSystem(mesh, 5, pihna_physics, rtol=3e-11,
                                physics_blocks=pihna_blocks,
                                precision="mixed")
    state = system.initial_state(u0)
    uo = u0.copy()
    worst = 0.0
    for _ in range(40):
        state, _, _ = system.step(state, params=p)
        uo, _ = orc.step(uo)
        rel = np.linalg.norm(np.asarray(state["u"]) - uo) / np.linalg.norm(uo)
        worst = max(worst, rel)
    assert worst < 5e-9, f"calibrated-default parity degraded: {worst:.3e}"


def test_adpm_trajectory_parity():
    """ADPM vs the independent scipy oracle: assembly at machine eps and
    a 30-step trajectory under the 1e-8 bar, with response functions,
    tract-gated taxis and diffusion all active."""
    import jax.numpy as jnp

    from oracle.adpm_numpy import AdpmOracle

    from rdcfes_tpu.models.adpm import adpm_physics, default_params
    from tests.helpers import dense_from_bcsr

    mesh = box_tet_mesh(4, 4, 4, bounds=((0, 20.0), (0, 20.0), (0, 20.0)))
    p = default_params()
    p.update(dt=0.05,
             decay_PrP=1e-4, decay_PrP_pulse0=0.01, decay_PrP_pulse1=10.0,
             diffuse_A_b=0.05, taxis1_A_b=0.5, taxis2_A_b=0.2,
             produce_A_b=0.3, produce_A_b_s0=0.2, produce_A_b_s1=0.8,
             transform_A_b=0.1, transform_A_b_t0=0.01, transform_A_b_t1=0.1,
             transform_A_b_t2=0.5, transform_A_b_t3=0.9,
             decay_A_b=0.05,
             diffuse_Tau=0.02, taxis1_Tau=0.3, decay_Tau=1.0)
    rng = np.random.default_rng(5)
    N = mesh.n_nodes
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(1)
    u0 = np.zeros((N, 3))
    u0[:, 0] = 1.0
    u0[:, 1] = 0.3 * np.exp(-r2 / 30.0)
    u0[:, 2] = 0.1 * np.exp(-r2 / 20.0)
    tracts = rng.standard_normal((mesh.n_elems, 3))
    tracts /= np.linalg.norm(tracts, axis=1, keepdims=True)

    orc = AdpmOracle(mesh.coords, mesh.connectivity, tracts, p)
    system = TransientRDCSystem(mesh, 3, adpm_physics)
    fields = {"tracts": jnp.asarray(tracts), "time": 1.0}

    # single-step assembly agreement
    Ko, Fo = orc.assemble(u0, time=1.0)
    vals, b = system.assemble(jnp.asarray(u0).T, fields, p)
    Kr = dense_from_bcsr(vals, system.sp, 3)
    operm = (np.arange(3)[None, :] * N + np.arange(N)[:, None]).ravel()
    Ko_nm = Ko.toarray()[np.ix_(operm, operm)]
    assert np.abs(Kr - Ko_nm).max() / np.abs(Ko_nm).max() < 1e-13
    assert np.abs(np.asarray(b).T.ravel() - Fo[operm]).max() \
        / np.abs(Fo).max() < 1e-13

    # trajectory
    state = system.initial_state(u0)
    uo = u0.copy()
    worst = 0.0
    for _ in range(30):
        state, _, _ = system.step(state, fields=fields, params=p)
        uo, _ = orc.step(uo, time=1.0)
        rel = np.linalg.norm(np.asarray(state["u"]) - uo) / np.linalg.norm(uo)
        worst = max(worst, rel)
    assert np.isfinite(uo).all()
    assert worst < 1e-8, f"ADPM parity violated: worst rel L2 {worst:.3e}"


def test_proteas_trajectory_parity():
    """PROTEAS vs the independent scipy oracle: assembly at machine eps
    and a 30-step trajectory under the 1e-8 bar, all terms active incl.
    the reference's Ke[1][1]/Ke[3][1] omission quirks on both sides."""
    import jax.numpy as jnp

    from oracle.proteas_numpy import ProteasOracle

    from rdcfes_tpu.fem.elements import tabulate
    from rdcfes_tpu.models.proteas import default_params, proteas_physics
    from tests.helpers import dense_from_bcsr

    mesh = box_tet_mesh(4, 4, 4, bounds=((0, 20.0), (0, 20.0), (0, 20.0)))
    p = default_params()
    p.update(dt=0.01, cells_total_capacity=2.0,
             radiotherapy_max_dosage=60.0,
             host_proliferation=0.4, host_vsc_threshold=0.05,
             tumour_diffusion=0.1, tumour_diffusion_host=0.05,
             tumour_proliferation=0.5, tumour_vsc_threshold=0.05,
             necrosis_slope=2.0, oedema_diffusion=0.1)
    rng = np.random.default_rng(6)
    N = mesh.n_nodes
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(1)
    u0 = np.stack([
        np.clip(0.8 - 0.4 * np.exp(-r2 / 30.0), 0, None),
        0.4 * np.exp(-r2 / 30.0),
        0.1 * np.exp(-r2 / 20.0),
        0.12 * np.ones(N),
        0.02 * np.exp(-r2 / 40.0),
    ], axis=1)
    aux = np.stack([rng.uniform(20, 80, N),
                    60.0 * np.exp(-r2 / 50.0)], axis=1)

    orc = ProteasOracle(mesh.coords, mesh.connectivity, aux, p)
    system = TransientRDCSystem(mesh, 5, proteas_physics)
    # the framework takes RTD sampled at qp (full interpolation mode)
    phi = tabulate(mesh.elem_type)[0]
    RTD_qp = np.einsum("qk,ek->qe", phi, aux[mesh.connectivity, 1])
    fields = {"RTD": jnp.asarray(RTD_qp)}
    p = {k: float(v) for k, v in p.items()}

    Ko, Fo = orc.assemble(u0)
    vals, b = system.assemble(jnp.asarray(u0).T, fields, p)
    Kr = dense_from_bcsr(vals, system.sp, 5)
    operm = (np.arange(5)[None, :] * N + np.arange(N)[:, None]).ravel()
    Ko_nm = Ko.toarray()[np.ix_(operm, operm)]
    assert np.abs(Kr - Ko_nm).max() / np.abs(Ko_nm).max() < 1e-13
    assert np.abs(np.asarray(b).T.ravel() - Fo[operm]).max() \
        / np.abs(Fo).max() < 1e-13

    state = system.initial_state(u0)
    uo = u0.copy()
    worst = 0.0
    for _ in range(30):
        state, _, _ = system.step(state, fields=fields, params=p)
        uo, _ = orc.step(uo)
        rel = np.linalg.norm(np.asarray(state["u"]) - uo) / np.linalg.norm(uo)
        worst = max(worst, rel)
    assert np.isfinite(uo).all()
    assert worst < 1e-8, f"PROTEAS parity violated: worst rel L2 {worst:.3e}"


def test_ripf_trajectory_parity():
    """RIPF vs the independent scipy oracle: assembly at machine eps and a
    20-step trajectory under the 1e-8 bar, with the FD time-derivative
    bookkeeping (TD from pre-clamp raw solutions, src/ripf.C:770)
    replicated on both sides from their own states."""
    import jax.numpy as jnp

    from oracle.ripf_numpy import RipfOracle

    from rdcfes_tpu.fem.assembly import interpolate_at_qp
    from rdcfes_tpu.fem.geometry import geometry_factors
    from rdcfes_tpu.models.ripf import default_params, ripf_physics
    from tests.helpers import dense_from_bcsr

    mesh = box_tet_mesh(4, 4, 4, bounds=((0, 40.0), (0, 40.0), (0, 40.0)))
    p = default_params()
    p.update(dt=0.1,
             volfr_stroma=0.30, volfr_parenchyma=0.20, volfr_exponent=2.5,
             volfr_min_vacant=1e-5,
             phi_cc_build=20.0, phi_cc_decay=-10.0, phi_cc_rate=5.0,
             phi_fb_build=30.0, phi_fb_decay=-15.0, phi_fb_rate=8.0,
             phi_tolerance=1e-3,
             cc_kappa=0.2, cc_kappa_RT_c=0.02,
             cc_delta=0.0864, cc_delta_RT_a=0.3, cc_delta_RT_b=0.03,
             fb_lambda=0.01, lambda_RT_r=56.0, lambda_HU_r=-500.0,
             fb_omicro=0.05, omicro_RT_r=56.0, omicro_fb_b=0.1,
             fb_omega=0.1, fb_diffusion=0.02, fb_haptotaxis=1e-4,
             fb_radiotaxis=0.01)
    rng = np.random.default_rng(8)
    N = mesh.n_nodes
    u0 = np.stack([
        rng.uniform(-500, -100, N),
        rng.uniform(0.1, 0.3, N),
        rng.uniform(0.1, 0.3, N),
    ], axis=1)
    rt_total = 40.0 + 16.0 * np.exp(
        -((mesh.coords - 20.0) ** 2).sum(1) / 200.0)
    hu_min, hu_max = -1000.0, 0.0

    def clamp(u):
        HU = jnp.clip(u[0], hu_min, hu_max)
        return jnp.concatenate([HU[None, :], jnp.maximum(u[1:], 0.0)], axis=0)

    orc = RipfOracle(mesh.coords, mesh.connectivity, p)
    system = TransientRDCSystem(mesh, 3, ripf_physics, clamp=clamp)
    conn_T = jnp.asarray(mesh.connectivity.T)
    phi, JxW, dphi = geometry_factors(
        jnp.asarray(mesh.coords), jnp.asarray(mesh.connectivity),
        mesh.elem_type)

    def qp_fields(td):
        stacked = jnp.asarray(np.stack([td[:, 1], td[:, 2], rt_total],
                                       axis=0))
        vals_qp, grads_qp = interpolate_at_qp(stacked, conn_T, phi, dphi)
        g = grads_qp[2]
        norm = jnp.linalg.norm(g, axis=-2, keepdims=True)
        return {
            "cc_dtime": vals_qp[0],
            "fb_dtime": vals_qp[1],
            "RT": vals_qp[2],
            "RT_grad_unit": jnp.where(
                norm > 0.0, g / jnp.where(norm == 0, 1.0, norm), 0.0),
        }

    # single-step assembly agreement (TD = zero fields initially)
    td = np.zeros((N, 3))
    p = {k: float(v) for k, v in p.items()}
    Ko, Fo = orc.assemble(u0, td, rt_total)
    vals, bvec = system.assemble(jnp.asarray(u0).T, qp_fields(td), p)
    Kr = dense_from_bcsr(vals, system.sp, 3)
    operm = (np.arange(3)[None, :] * N + np.arange(N)[:, None]).ravel()
    Ko_nm = Ko.toarray()[np.ix_(operm, operm)]
    assert np.abs(Kr - Ko_nm).max() / np.abs(Ko_nm).max() < 1e-13
    assert np.abs(np.asarray(bvec).T.ravel() - Fo[operm]).max() \
        / np.abs(Fo).max() < 1e-13

    # trajectory with TD bookkeeping on both sides
    state = system.initial_state(u0)
    td_r = np.zeros((N, 3))
    prev_raw_r = u0.copy()
    uo = u0.copy()
    td_o = np.zeros((N, 3))
    prev_raw_o = u0.copy()
    worst = 0.0
    for _ in range(20):
        state, _, _ = system.step(state, fields=qp_fields(td_r), params=p)
        clamped_r = np.asarray(state["u"])
        raw_r = np.asarray(state["u_raw"])
        td_r = (clamped_r - prev_raw_r) / p["dt"]
        prev_raw_r = raw_r

        uo, raw_o = orc.step(uo, td_o, rt_total, hu_min, hu_max)
        td_o = (uo - prev_raw_o) / p["dt"]
        prev_raw_o = raw_o

        rel = np.linalg.norm(clamped_r - uo) / np.linalg.norm(uo)
        worst = max(worst, rel)
    assert np.isfinite(uo).all()
    assert worst < 1e-8, f"RIPF parity violated: worst rel L2 {worst:.3e}"


def test_hcc_trajectory_parity():
    """Coupled-HCC transport step vs the independent scipy oracle, on a
    DEFORMED configuration (geometry rebuilt per call on both sides) —
    locks the anomalous capacity blocks and the doubled Ke[1][1] too."""
    import jax.numpy as jnp

    from oracle.hcc_numpy import HccOracle

    from rdcfes_tpu.models.hcc import hcc_physics

    mesh = box_tet_mesh(4, 4, 4, bounds=((0, 10.0), (0, 10.0), (0, 10.0)))
    p = {"dt": 0.01, "cells_min_capacity": 0.0, "cells_max_capacity": 1.0,
         "cells_max_capacity_exponent": 3.0, "produce_l": 0.2,
         "diffuse_c": 0.01, "mechano_c": 0.5, "produce_c": 0.5,
         "necrosis_l": 0.1, "necrosis_c": 0.1, "necrosis_pressure": 0.0}
    rng = np.random.default_rng(9)
    N = mesh.n_nodes
    r2 = ((mesh.coords - 5.0) ** 2).sum(1)
    u0 = np.stack([
        np.clip(0.6 - 0.4 * np.exp(-r2 / 4.0), 0, None),
        0.4 * np.exp(-r2 / 4.0),
        0.05 * np.exp(-r2 / 2.0),
    ], axis=1)
    # a smoothly deformed configuration (moving-mesh assembly)
    coords = mesh.coords + 0.05 * np.sin(mesh.coords / 3.0)

    orc = HccOracle(mesh.connectivity, p)
    system = TransientRDCSystem(mesh, 3, hcc_physics, moving_mesh=True)

    state = system.initial_state(u0)
    uo = u0.copy()
    worst = 0.0
    cj = jnp.asarray(coords)
    for _ in range(20):
        state, _, _ = system.step(state, params=p, coords=cj)
        uo, _ = orc.step(coords, uo)
        rel = np.linalg.norm(np.asarray(state["u"]) - uo) / np.linalg.norm(uo)
        worst = max(worst, rel)
    assert np.isfinite(uo).all()
    assert worst < 1e-8, f"HCC parity violated: worst rel L2 {worst:.3e}"


def test_hyperelastic_cf_matches_reference_chain():
    """Both constitutive evaluators (the batched einsum stress_and_tangent
    and the rank-structured channel-first stress_and_tangent_cf) match a
    LITERAL transcription of the reference's derivation chain
    (hyperlastic_inline.h:17-189) on random states with growth (Fp != I)
    and active fibres — this pins the cf reduction against the
    reference's own math, not just against autodiff."""
    import jax.numpy as jnp

    from oracle.hyperelastic_numpy import calculate_stress

    from rdcfes_tpu.models.hyperelastic import (stress_and_tangent,
                                                stress_and_tangent_cf)

    rng = np.random.default_rng(11)
    B = 40
    grad_X = np.eye(3)[None] + 0.15 * rng.standard_normal((B, 3, 3))
    F = np.linalg.inv(grad_X)
    lam = 1.0 + 0.2 * rng.random((B, 3))
    eta = rng.standard_normal((B, 3))
    eta /= np.linalg.norm(eta, axis=1, keepdims=True)
    young = rng.uniform(500.0, 2000.0, B)
    poisson = rng.uniform(0.2, 0.45, B)
    fibre_k = np.where(rng.random(B) < 0.5, rng.uniform(10.0, 100.0, B), 0.0)

    # reference-chain oracle, pointwise
    sig_ref = np.zeros((B, 3, 3))
    tan_ref = np.zeros((B, 6, 6))
    for b in range(B):
        sig_ref[b], tan_ref[b] = calculate_stress(
            F[b], np.diag(lam[b]), eta[b], young[b], poisson[b], fibre_k[b])

    # batched einsum evaluator (leading batch axis)
    sig_a, tan_a, _ = stress_and_tangent(
        jnp.asarray(grad_X), jnp.asarray(lam), jnp.asarray(eta),
        jnp.asarray(young), jnp.asarray(poisson), jnp.asarray(fibre_k))
    assert np.allclose(np.asarray(sig_a), sig_ref, rtol=1e-10, atol=1e-10)
    assert np.allclose(np.asarray(tan_a), tan_ref, rtol=1e-9, atol=1e-8)

    # channel-first evaluator (trailing batch axis, nested lists)
    gx = [[jnp.asarray(grad_X[:, d, r]) for r in range(3)] for d in range(3)]
    sig_c, tan_c, _ = stress_and_tangent_cf(
        gx, [jnp.asarray(lam[:, d]) for d in range(3)],
        [jnp.asarray(eta[:, d]) for d in range(3)],
        jnp.asarray(young), jnp.asarray(poisson), jnp.asarray(fibre_k))
    sig_c = np.stack([np.stack([np.asarray(sig_c[i][j]) for j in range(3)],
                               axis=-1) for i in range(3)], axis=-2)
    tan_c = np.stack([np.stack([np.asarray(tan_c[r][c]) for c in range(6)],
                               axis=-1) for r in range(6)], axis=-2)
    assert np.allclose(sig_c, sig_ref, rtol=1e-10, atol=1e-10)
    assert np.allclose(tan_c, tan_ref, rtol=1e-9, atol=1e-8)
