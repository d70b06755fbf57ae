"""Block-sparse weak forms: the structural contracts.

1. to_dense(blocks) == the legacy dense WeakForm for every model that has
   both forms, with and without deck-zero parameters.
2. The qp-apply matrix-free matvec equals the materialized element-matrix
   matvec (same operator, applied two ways).
3. block_rhs / block_diag match their dense counterparts.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rdcfes_tpu.fem.assembly import interpolate_at_qp
from rdcfes_tpu.fem.weakform import (
    block_diag,
    block_element_matrices,
    block_rhs,
    element_matrices,
    element_vectors,
    qp_apply,
)
from rdcfes_tpu.mesh import box_tet_mesh


def _pihna_setup(zero_deck):
    from rdcfes_tpu.models.pihna import default_params, pihna_blocks

    mesh = box_tet_mesh(3, 3, 3)
    Kk = 2.39e5
    p = default_params()
    p.update(dt=0.1, cells_min_capacity=1.0, cells_max_capacity=Kk,
             cells_max_capacity_exponent=3.0, cytokines_max_capacity=1e-8,
             necrosis_c=500 / Kk, necrosis_h=200 / Kk, necrosis_v=300 / Kk,
             produce_c=-2.5, switch_c2h=1.0, switch_h2c=1.82,
             switch_h2n=0.5, produce_v=10.0, secrete_a_c=2.77e-13,
             secrete_a_h=5.22e-10, uptake_a_v=1e-3, decay_a=5678.4)
    if not zero_deck:
        p.update(diffuse_c=0.5, taxis_c=2e-5, diffuse_h=1.0, taxis_h=4e-5,
                 diffuse_v=0.2, taxis_v=1e-4)
    rng = np.random.default_rng(0)
    u = rng.uniform(0.0, 1000.0, (mesh.n_nodes, 5))
    return mesh, p, u, pihna_blocks, 5, {}


def _adpm_setup(zero_deck):
    from rdcfes_tpu.models.adpm import adpm_blocks, default_params

    mesh = box_tet_mesh(3, 3, 3)
    p = default_params()
    p.update(dt=0.05, decay_PrP=1e-4, decay_Tau=1.0)
    if not zero_deck:
        p.update(diffuse_A_b=0.05, taxis1_A_b=0.5, diffuse_Tau=0.01,
                 taxis1_Tau=0.2)
    rng = np.random.default_rng(1)
    u = rng.uniform(0.0, 1.0, (mesh.n_nodes, 3))
    tracts = rng.standard_normal((mesh.n_elems, 3))
    return mesh, p, u, adpm_blocks, 3, {
        "tracts": jnp.asarray(tracts), "time": 1.0}


def _proteas_setup(zero_deck):
    from rdcfes_tpu.models.proteas import default_params, proteas_blocks

    mesh = box_tet_mesh(3, 3, 3)
    p = default_params()
    p.update(dt=0.01)
    if zero_deck:
        p.update(tumour_diffusion=0.0, tumour_diffusion_host=0.0,
                 oedema_diffusion=0.0)
    rng = np.random.default_rng(2)
    u = rng.uniform(0.0, 0.4, (mesh.n_nodes, 5))
    Q = 5
    rtd = rng.uniform(0.0, 30.0, (Q, mesh.n_elems))
    return mesh, p, u, proteas_blocks, 5, {"RTD": jnp.asarray(rtd)}


def _hcc_setup(zero_deck):
    from rdcfes_tpu.models.hcc import default_params, hcc_blocks

    mesh = box_tet_mesh(3, 3, 3)
    p = default_params()
    p.update(dt=0.5, cells_min_capacity=1e-3, cells_max_capacity=1.0,
             cells_max_capacity_exponent=2.0, produce_l=0.3, produce_c=0.5,
             necrosis_l=0.05, necrosis_c=0.08)
    rng = np.random.default_rng(4)
    fields = {}
    if not zero_deck:
        p.update(diffuse_c=0.02, mechano_c=0.01)
        fields["grad_sigma"] = jnp.asarray(
            rng.standard_normal((5, 3, mesh.n_elems)))
    u = rng.uniform(0.0, 0.5, (mesh.n_nodes, 3))
    return mesh, p, u, hcc_blocks, 3, fields


SETUPS = {"pihna": _pihna_setup, "adpm": _adpm_setup,
          "proteas": _proteas_setup, "hcc": _hcc_setup}


@pytest.mark.parametrize("zero_deck", [False, True])
@pytest.mark.parametrize("with_gsig", [False, True])
def test_hcc_blocks_match_dense_physics(zero_deck, with_gsig):
    """hcc_blocks.to_dense() == hcc_physics exactly (same formulas, incl.
    the coupled_hcc.C:566-637 anomaly blocks), with the mechano-taxis
    scaffold both absent and supplied."""
    from rdcfes_tpu.fem.geometry import geometry_factors
    from rdcfes_tpu.models.hcc import hcc_blocks, hcc_physics

    mesh, p, u, _, V, fields = _hcc_setup(zero_deck)
    if not with_gsig:
        fields.pop("grad_sigma", None)
    conn_T = jnp.asarray(mesh.connectivity.T)
    phi, JxW, dphi = geometry_factors(
        jnp.asarray(mesh.coords), jnp.asarray(mesh.connectivity),
        mesh.elem_type)
    u_qp, g_qp = interpolate_at_qp(jnp.asarray(u.T), conn_T, phi, dphi)
    p = {k: float(v) for k, v in p.items()}
    dense = hcc_physics(u_qp, g_qp, fields, p)
    blk = hcc_blocks(u_qp, g_qp, fields, p).to_dense()
    for name in ("A", "B", "C", "D", "E"):
        a, b = getattr(dense, name), getattr(blk, name)
        assert np.allclose(np.asarray(a), np.asarray(b),
                           rtol=1e-14, atol=1e-14), name


@pytest.mark.parametrize("model", sorted(SETUPS))
@pytest.mark.parametrize("zero_deck", [False, True])
def test_qp_apply_equals_element_matrices(model, zero_deck):
    mesh, p, u, blocks_fn, V, fields = SETUPS[model](zero_deck)
    from rdcfes_tpu.fem.geometry import geometry_factors

    conn_T = jnp.asarray(mesh.connectivity.T)
    phi, JxW, dphi = geometry_factors(
        jnp.asarray(mesh.coords), jnp.asarray(mesh.connectivity),
        mesh.elem_type)
    u_T = jnp.asarray(u.T)
    u_qp, g_qp = interpolate_at_qp(u_T, conn_T, phi, dphi)
    p = {k: float(v) for k, v in p.items()}
    wfb = blocks_fn(u_qp, g_qp, fields, p)
    wf = wfb.to_dense()

    # dense element matrices from the two forms agree
    Ke_dense = element_matrices(wf, phi, JxW, dphi, grad_const=True)
    Ke_block = block_element_matrices(wfb, phi, JxW, dphi, grad_const=True)
    assert np.allclose(np.asarray(Ke_dense), np.asarray(Ke_block),
                       rtol=1e-12, atol=1e-12)

    # rhs agrees
    Fe_dense = element_vectors(wf, phi, JxW, dphi)
    Fe_block = block_rhs(wfb, phi, JxW, dphi)
    assert np.allclose(np.asarray(Fe_dense), np.asarray(Fe_block),
                       rtol=1e-12, atol=1e-12)

    # matrix-free qp application == materialized Ke application
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((V, mesh.n_nodes)))
    x_qp, gx_qp = interpolate_at_qp(x, conn_T, phi, dphi)
    Ye = qp_apply(wfb, phi, JxW, dphi, x_qp, gx_qp)          # (V, K, E)
    xe = x[:, conn_T]                                         # (V, K, E)
    Ye_ref = jnp.einsum("vwije,wje->vie", Ke_dense, xe)
    scale = float(jnp.abs(Ye_ref).max()) + 1e-30
    assert np.allclose(np.asarray(Ye), np.asarray(Ye_ref),
                       rtol=1e-10, atol=1e-10 * scale)

    # diagonal blocks agree with Ke's (i, i) entries
    dg = block_diag(wfb, phi, JxW, dphi)
    dg_ref = jnp.einsum("vwiie->vwie", Ke_dense)
    assert np.allclose(np.asarray(dg), np.asarray(dg_ref),
                       rtol=1e-11, atol=1e-11 * scale)


def test_run_steps_matches_per_step():
    """The scan-batched multi-step advance equals the per-step path,
    including element fields and the preconditioner refresh schedule."""
    from rdcfes_tpu.models.adpm import adpm_blocks, adpm_physics, default_params
    from rdcfes_tpu.systems import TransientRDCSystem

    mesh = box_tet_mesh(4, 4, 4)
    p = default_params()
    p.update(dt=0.05, decay_PrP=1e-4, diffuse_A_b=0.05, taxis1_A_b=0.5,
             decay_Tau=1.0)
    p = {k: float(v) for k, v in p.items()}
    rng = np.random.default_rng(3)
    u0 = rng.uniform(0.0, 1.0, (mesh.n_nodes, 3))
    tracts = rng.standard_normal((mesh.n_elems, 3))
    fields = {"tracts": jnp.asarray(tracts), "time": 1.0}

    a = TransientRDCSystem(mesh, 3, adpm_physics, physics_blocks=adpm_blocks,
                           precond_refresh=3)
    b = TransientRDCSystem(mesh, 3, adpm_physics, physics_blocks=adpm_blocks,
                           precond_refresh=3)
    sa, sb = a.initial_state(u0), b.initial_state(u0)
    for _ in range(7):
        sa, _, _ = a.step(sa, fields=fields, params=p)
    sb, its, ress = b.run_steps(sb, 7, fields=fields, params=p)
    ua, ub = np.asarray(sa["u"]), np.asarray(sb["u"])
    assert np.linalg.norm(ua - ub) / np.linalg.norm(ua) < 1e-12
    assert np.isfinite(np.asarray(ress)).all()


def test_run_steps_scalar_traj_matches_per_step():
    """A per-step-varying scalar (ADPM's advancing `time`, which gates the
    time^gamma PrP decay — src/adpm.C:268-296) rides the scan via
    scalar_traj and equals per-step dispatch with the stepped value,
    including across segment boundaries."""
    from rdcfes_tpu.models.adpm import adpm_blocks, adpm_physics, default_params
    from rdcfes_tpu.systems import TransientRDCSystem

    mesh = box_tet_mesh(4, 4, 4)
    p = default_params()
    p.update(dt=0.05, decay_PrP=1e-2, decay_PrP_time_exponent=0.7,
             diffuse_A_b=0.05, taxis1_A_b=0.5, decay_Tau=1.0)
    p = {k: float(v) for k, v in p.items()}
    rng = np.random.default_rng(11)
    u0 = rng.uniform(0.0, 1.0, (mesh.n_nodes, 3))
    tracts = jnp.asarray(rng.standard_normal((mesh.n_elems, 3)))
    n, dt = 7, p["dt"]
    times = dt * np.arange(1, n + 1)

    a = TransientRDCSystem(mesh, 3, adpm_physics, physics_blocks=adpm_blocks,
                           precond_refresh=3)
    b = TransientRDCSystem(mesh, 3, adpm_physics, physics_blocks=adpm_blocks,
                           precond_refresh=3)
    sa, sb = a.initial_state(u0), b.initial_state(u0)
    for j in range(n):
        sa, _, _ = a.step(sa, fields={"tracts": tracts,
                                      "time": float(times[j])}, params=p)
    # segment=3 forces chaining (3+3+1) so the traj offset is exercised
    sb, its, ress = b.run_steps(sb, n, fields={"tracts": tracts}, params=p,
                                scalar_traj={"time": times}, segment=3)
    ua, ub = np.asarray(sa["u"]), np.asarray(sb["u"])
    assert np.linalg.norm(ua - ub) / np.linalg.norm(ua) < 1e-12
    assert np.isfinite(np.asarray(ress)).all() and len(np.asarray(its)) == n


@pytest.mark.parametrize("model", sorted(SETUPS))
@pytest.mark.parametrize("zero_deck", [False, True])
def test_affine_apply_matches_generic(model, zero_deck):
    """The TET4-affine reassociated forms (diffusion q-sum hoisted, flux
    projection without the Q factor) equal the generic q-loop forms."""
    from rdcfes_tpu.fem.assembly import interpolate_ue, interpolate_ue_affine
    from rdcfes_tpu.fem.geometry import geometry_factors
    from rdcfes_tpu.fem.weakform import (block_rhs_affine, diffusion_presum,
                                         qp_apply_affine)

    mesh, p, u, blocks_fn, V, fields = SETUPS[model](zero_deck)
    conn_T = jnp.asarray(mesh.connectivity.T)
    phi, JxW, dphi = geometry_factors(
        jnp.asarray(mesh.coords), jnp.asarray(mesh.connectivity),
        mesh.elem_type)
    u_T = jnp.asarray(u.T)
    u_qp, g_qp = interpolate_at_qp(u_T, conn_T, phi, dphi)
    p = {k: float(v) for k, v in p.items()}
    wfb = blocks_fn(u_qp, g_qp, fields, p)

    # rhs: affine == generic
    Fe = block_rhs(wfb, phi, JxW, dphi)
    Fe_aff = block_rhs_affine(wfb, phi, JxW, dphi)
    scale = float(jnp.abs(Fe).max()) + 1e-30
    assert np.allclose(np.asarray(Fe_aff), np.asarray(Fe),
                       rtol=1e-12, atol=1e-12 * scale)

    # apply: affine (hoisted diffusion q-sum, gx computed once) == generic
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((V, mesh.n_nodes)))
    ue = x[:, conn_T]
    x_qp, gx_qp = interpolate_ue(ue, phi, dphi)
    x_qp2, gx = interpolate_ue_affine(ue, phi, dphi)
    assert np.allclose(np.asarray(x_qp2), np.asarray(x_qp), rtol=1e-13,
                       atol=1e-13)
    # TET4 gradients really are q-independent
    assert np.allclose(np.asarray(gx_qp[:, 0]), np.asarray(gx),
                       rtol=1e-13, atol=1e-13)
    Ye = qp_apply(wfb, phi, JxW, dphi, x_qp, gx_qp)
    Epre = diffusion_presum(wfb, JxW)
    Ye_aff = qp_apply_affine(wfb, Epre, phi, JxW, dphi, x_qp2, gx)
    scale = float(jnp.abs(Ye).max()) + 1e-30
    assert np.allclose(np.asarray(Ye_aff), np.asarray(Ye),
                       rtol=1e-12, atol=1e-12 * scale)


@pytest.mark.parametrize("model", sorted(SETUPS))
def test_affine_diag_matches_generic(model):
    from rdcfes_tpu.fem.geometry import geometry_factors
    from rdcfes_tpu.fem.weakform import block_diag_affine

    mesh, p, u, blocks_fn, V, fields = SETUPS[model](False)
    conn_T = jnp.asarray(mesh.connectivity.T)
    phi, JxW, dphi = geometry_factors(
        jnp.asarray(mesh.coords), jnp.asarray(mesh.connectivity),
        mesh.elem_type)
    u_qp, g_qp = interpolate_at_qp(jnp.asarray(u.T), conn_T, phi, dphi)
    p = {k: float(v) for k, v in p.items()}
    wfb = blocks_fn(u_qp, g_qp, fields, p)
    dg = block_diag(wfb, phi, JxW, dphi)
    dg_aff = block_diag_affine(wfb, phi, JxW, dphi)
    scale = float(jnp.abs(dg).max()) + 1e-30
    assert np.allclose(np.asarray(dg_aff), np.asarray(dg),
                       rtol=1e-12, atol=1e-12 * scale)
