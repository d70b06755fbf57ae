import numpy as np
import pytest

from rdcfes_tpu.mesh import box_tet_mesh
from rdcfes_tpu.models.pihna import default_params, pihna_physics
from rdcfes_tpu.systems import TransientRDCSystem

import jax.numpy as jnp

from helpers import assemble_extra, check_jacobian_consistency
from rdcfes_tpu.fem import WeakForm
from rdcfes_tpu.models.pihna import crowding_factor


def _k33_quirk(u_qp, grad_qp, fields, params):
    """The reference's Ke[3][3] omits the produce_v*Tau*Ua mass-derivative
    term that the analogous Ke[1][1] includes (src/pihna.C:708-718 vs
    :607-621); our transcription preserves that, so the autodiff oracle
    needs the corresponding correction  +dt/2 * produce_v * Tau * Ua."""
    p = params
    n, c, h, v, a = u_qp
    tau, _ = crowding_factor(
        (n + c + h + v) / p["cells_max_capacity"],
        p["cells_max_capacity"], p["cells_max_capacity_exponent"],
    )
    Ua = a / (a + p["cytokines_max_capacity"])
    C = jnp.zeros((5, 5) + n.shape)
    C = C.at[3, 3].set(0.5 * p["dt"] * p["produce_v"] * tau * Ua)
    return WeakForm(C=C)


def run_deck_params():
    """The shipped PIHNA case parameters (run/PIHNA/input.dat), with the
    necrosis/* -> /Kappa_k scaling the driver applies at load."""
    Kk = 2.39e5
    p = default_params()
    p.update(
        dt=0.1,
        cells_min_capacity=1.0,
        cells_max_capacity=Kk,
        cells_max_capacity_exponent=3.0,
        cytokines_max_capacity=1.0e-8,
        necrosis_c=500.0 / Kk,
        necrosis_h=200.0 / Kk,
        necrosis_v=300.0 / Kk,
        produce_c=-2.5,
        switch_c2h=1.0,
        switch_h2c=1.82,
        switch_h2n=0.5,
        diffuse_v=0.5,
        produce_v=10.0,
        secrete_a_c=2.77e-13,
        secrete_a_h=5.22e-10,
        decay_a=5678.4,
    )
    return p


@pytest.fixture(scope="module")
def mesh():
    return box_tet_mesh(2, 2, 2)


def _random_state(mesh, rng, Kk):
    """Random physical state away from branch boundaries: densities within
    (0, Kk), a > 0."""
    N = mesh.n_nodes
    u = np.empty((N, 5))
    u[:, 0] = rng.uniform(0.01, 0.2) * Kk * rng.uniform(0.5, 1.0, N)
    u[:, 1] = rng.uniform(0.05, 0.15) * Kk * rng.uniform(0.5, 1.0, N)
    u[:, 2] = rng.uniform(0.02, 0.1) * Kk * rng.uniform(0.5, 1.0, N)
    u[:, 3] = rng.uniform(0.02, 0.1) * Kk * rng.uniform(0.5, 1.0, N)
    u[:, 4] = rng.uniform(1e-9, 1e-7, N)
    return u


def test_jacobian_matches_autodiff_of_rhs(mesh):
    """All 25 Jacobian blocks == exact derivative of the RHS (a.e.)."""
    rng = np.random.default_rng(7)
    params = run_deck_params()
    u = _random_state(mesh, rng, params["cells_max_capacity"])
    extra = assemble_extra(mesh, 5, _k33_quirk, {}, params, u)
    check_jacobian_consistency(mesh, 5, pihna_physics, {}, params, u, extra=extra)


def test_jacobian_with_taxis_terms(mesh):
    """Exercise the taxis D/E blocks (zero in the shipped deck)."""
    rng = np.random.default_rng(8)
    params = run_deck_params()
    params.update(taxis_c=0.3, taxis_h=0.2, taxis_v=0.1, diffuse_c=0.4,
                  diffuse_h=0.25, uptake_a_v=1e-6)
    u = _random_state(mesh, rng, params["cells_max_capacity"])
    extra = assemble_extra(mesh, 5, _k33_quirk, {}, params, u)
    check_jacobian_consistency(mesh, 5, pihna_physics, {}, params, u, extra=extra)


def test_pihna_transient_stability(mesh):
    """Ten steps of the shipped deck on a small box: fields stay finite,
    nonnegative (post-clamp) and tumor dynamics activate."""
    params = run_deck_params()
    sys = TransientRDCSystem(mesh, 5, pihna_physics)
    rng = np.random.default_rng(9)
    Kk = params["cells_max_capacity"]
    u0 = np.zeros((mesh.n_nodes, 5))
    u0[:, 1] = 0.1 * Kk * np.exp(
        -10 * ((mesh.coords - 0.5) ** 2).sum(axis=1)
    )  # normoxic seed
    u0[:, 3] = 0.03 * Kk
    u0[:, 4] = 1e-9
    state = sys.initial_state(u0)
    for _ in range(10):
        state, iters, res = sys.step(state, params=params)
        u = np.asarray(state["u"])
        assert np.isfinite(u).all()
        assert (u >= 0).all()
    # hypoxic and necrotic compartments must have been populated by switching
    assert u[:, 2].max() > 0.0
    assert u[:, 0].max() > 0.0
    assert float(res) < 1e-10
