"""End-to-end transient slice: single-species reaction-diffusion.

This is the 'minimum end-to-end slice' of SURVEY.md section 7: a logistic
reaction-diffusion problem integrated with the exact linearized-CN scheme the
reference uses for every RDC driver, validated against (a) an independent
dense linear-algebra step and (b) the analytic solution of the spatially
homogeneous logistic ODE.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rdcfes_tpu.fem import WeakForm
from rdcfes_tpu.mesh import box_hex_mesh, box_tet_mesh
from rdcfes_tpu.systems import TransientRDCSystem


def logistic_rd_physics(D=0.1, rho=1.0):
    """u_t = div(D grad u) + rho u (1 - u), linearized-CN weak form.

    RHS  : u phi + dt/2 (rho u(1-u) phi - D grad u . grad phi)
    LHS K: phi phi - dt/2 (rho(1-2u) phi phi - D grad phi . grad phi)
    """

    def physics(u_qp, grad_qp, fields, params):
        dt2 = params["dt"] / 2.0
        u = u_qp[0]
        A = (u + dt2 * rho * u * (1.0 - u))[None]
        B = (-dt2 * D) * grad_qp[:1]
        C = (1.0 - dt2 * rho * (1.0 - 2.0 * u))[None, None]
        E = (dt2 * D) * jnp.ones_like(u)[None, None]
        return WeakForm(A=A, B=B, C=C, E=E)

    return physics


@pytest.mark.parametrize("mesh_fn", [box_tet_mesh, box_hex_mesh])
def test_logistic_uniform_matches_ode(mesh_fn):
    """Spatially uniform IC + Neumann BCs => u stays uniform and follows the
    linearized-CN update of the logistic ODE exactly."""
    m = mesh_fn(2, 2, 2)
    sys = TransientRDCSystem(m, 1, logistic_rd_physics(D=0.1, rho=2.0))
    dt = 0.05
    u0 = 0.1
    state = sys.initial_state(np.full((m.n_nodes, 1), u0))
    # scalar recurrence of the same scheme: (1 - dt/2 rho(1-2u)) x = u + dt/2 rho u(1-u)
    u_ref = u0
    for _ in range(10):
        state, iters, res = sys.step(state, params={"dt": dt})
        u_ref = (u_ref + 0.5 * dt * 2.0 * u_ref * (1 - u_ref)) / (
            1.0 - 0.5 * dt * 2.0 * (1 - 2 * u_ref)
        )
        u = np.asarray(state["u"])
        assert np.ptp(u) < 1e-9, "solution must remain spatially uniform"
        np.testing.assert_allclose(u.mean(), u_ref, rtol=1e-9)
    assert float(res) < 1e-11


def test_diffusion_conserves_mass_and_decays():
    """Pure diffusion with Neumann BCs conserves integral(u) and contracts
    towards the mean."""
    m = box_tet_mesh(4, 4, 4)
    sys = TransientRDCSystem(m, 1, logistic_rd_physics(D=0.5, rho=0.0))
    x = m.coords
    u0 = 1.0 + np.cos(np.pi * x[:, 0])  # Neumann-compatible mode
    state = sys.initial_state(u0[:, None])

    # lumped nodal volumes for integration
    from rdcfes_tpu.fem import (
        WeakForm as WF,
        element_matrices,
        assemble_vector,
        element_vectors,
    )

    onewf = WF(A=jnp.ones((1,) + sys.JxW.shape))
    lumped = np.asarray(
        assemble_vector(
            element_vectors(onewf, sys.phi, sys.JxW, sys.dphi),
            sys.conn_flat_cf,
            m.n_nodes,
        )
    )[0]
    mass0 = (lumped * u0).sum()

    dt = 0.01
    amp = [np.ptp(np.asarray(state["u"]))]
    for _ in range(5):
        state, *_ = sys.step(state, params={"dt": dt})
        amp.append(np.ptp(np.asarray(state["u"])))
    u = np.asarray(state["u"])[:, 0]
    np.testing.assert_allclose((lumped * u).sum(), mass0, rtol=1e-10)
    assert amp[-1] < amp[0], "diffusion must contract the profile"
    # decay rate ~ exp(-D pi^2 t): after 5 steps of dt=0.01, factor ~ 0.78
    expected = np.exp(-0.5 * np.pi**2 * 5 * dt)
    assert abs(amp[-1] / amp[0] - expected) < 0.05


def test_clamp_negative_solutions():
    """check_solution parity: solver output below zero is clamped to 0
    (reference src/pihna.C:786-790 semantics)."""

    def decay_physics(u_qp, grad_qp, fields, params):
        dt2 = params["dt"] / 2.0
        u = u_qp[0]
        # strong constant sink drives u negative in one step: F = u - dt/2*5
        A = (u - dt2 * 5.0)[None]
        C = jnp.ones_like(u)[None, None]
        return WeakForm(A=A, C=C)

    m = box_tet_mesh(2, 2, 2)
    sys = TransientRDCSystem(m, 1, decay_physics)
    state = sys.initial_state(np.full((m.n_nodes, 1), 0.01))
    state, *_ = sys.step(state, params={"dt": 0.1})
    u = np.asarray(state["u"])
    assert np.all(u >= 0.0)
    assert np.all(u == 0.0)  # the sink pushes everything below zero


def test_float32_mode_tracks_f64():
    """dtype=float32 fast mode: trajectories track the f64 reference run to
    single-precision accuracy over several steps."""
    import jax.numpy as jnp

    m = box_tet_mesh(3, 3, 3)
    phys = logistic_rd_physics(D=0.2, rho=1.5)
    s64 = TransientRDCSystem(m, 1, phys)
    s32 = TransientRDCSystem(m, 1, phys, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    u0 = 0.2 * rng.random((m.n_nodes, 1))
    st64 = s64.initial_state(u0)
    st32 = s32.initial_state(u0.astype(np.float32))
    for _ in range(5):
        st64, *_ = s64.step(st64, params={"dt": 0.05})
        st32, *_ = s32.step(st32, params={"dt": np.float32(0.05)})
    a = np.asarray(st64["u"])
    b = np.asarray(st32["u"])
    assert b.dtype == np.float32
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_mixed_precision_matches_f64():
    """precision="mixed" (f32 inner Krylov + f64 iterative refinement) must
    reproduce the pure-f64 trajectory to refinement tolerance — far below
    the 1e-8 reference-parity bar."""
    m = box_tet_mesh(3, 3, 3)
    phys = logistic_rd_physics(D=0.2, rho=1.5)
    s64 = TransientRDCSystem(m, 1, phys)
    smx = TransientRDCSystem(m, 1, phys, precision="mixed")
    rng = np.random.default_rng(1)
    u0 = 0.2 * rng.random((m.n_nodes, 1))
    st64 = smx_st = None
    st64 = s64.initial_state(u0)
    smx_st = smx.initial_state(u0)
    for _ in range(5):
        st64, *_ = s64.step(st64, params={"dt": 0.05})
        smx_st, it, res = smx.step(smx_st, params={"dt": 0.05})
    a = np.asarray(st64["u"])
    b = np.asarray(smx_st["u"])
    assert b.dtype == np.float64
    assert float(res) <= 1e-10
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-10 * np.abs(a).max())


def test_precond_refresh_matches_every_step():
    """Stale block-Jacobi (precond_refresh>1) must converge to the same
    trajectory as per-step refresh: the preconditioner only steers the
    iteration, the converged answer satisfies the same tolerance."""
    m = box_tet_mesh(3, 3, 3)
    phys = logistic_rd_physics(D=0.2, rho=1.5)
    s1 = TransientRDCSystem(m, 1, phys)
    s8 = TransientRDCSystem(m, 1, phys, precond_refresh=8)
    rng = np.random.default_rng(2)
    u0 = 0.2 * rng.random((m.n_nodes, 1))
    st1, st8 = s1.initial_state(u0), s8.initial_state(u0)
    for _ in range(6):
        st1, *_ = s1.step(st1, params={"dt": 0.05})
        st8, it, res = s8.step(st8, params={"dt": 0.05})
    assert float(res) < 1e-11
    np.testing.assert_allclose(np.asarray(st1["u"]), np.asarray(st8["u"]),
                               rtol=0, atol=1e-10)


def test_moving_mesh_run_steps_matches_per_step():
    """Moving-mesh scan path: with coordinates fixed within a segment (the
    coupled-HCC invariant — they only move at loading points), run_steps
    rebuilds the geometry tables ONCE and scans the qp-apply step; it must
    match the per-step dense moving path (system.step(coords=...)) on a
    genuinely deformed configuration."""
    from rdcfes_tpu.models.hcc import default_params, hcc_blocks, hcc_physics

    mesh = box_tet_mesh(4, 4, 4)
    p = default_params()
    p.update(dt=0.2, cells_min_capacity=1e-3, cells_max_capacity=1.0,
             cells_max_capacity_exponent=2.0, produce_l=0.3, produce_c=0.5,
             necrosis_l=0.05, necrosis_c=0.08, diffuse_c=0.02)
    p = {k: float(v) for k, v in p.items()}
    rng = np.random.default_rng(9)
    u0 = rng.uniform(0.0, 0.4, (mesh.n_nodes, 3))
    # deformed configuration: interior nodes jittered (boundary kept so
    # elements stay valid), well away from mesh.coords
    x = mesh.coords.copy()
    interior = ~np.isin(np.arange(mesh.n_nodes),
                        np.unique(mesh.boundary_faces))
    x[interior] += 0.15 * rng.standard_normal(x[interior].shape) / 4
    x = jnp.asarray(x)

    a = TransientRDCSystem(mesh, 3, hcc_physics, moving_mesh=True,
                           physics_blocks=hcc_blocks, precond_refresh=3)
    b = TransientRDCSystem(mesh, 3, hcc_physics, moving_mesh=True,
                           physics_blocks=hcc_blocks, precond_refresh=3)
    sa, sb = a.initial_state(u0), b.initial_state(u0)
    for _ in range(5):
        sa, _, _ = a.step(sa, params=p, coords=x)
    sb, its, ress = b.run_steps(sb, 5, params=p, coords=x, segment=2)
    ua, ub = np.asarray(sa["u"]), np.asarray(sb["u"])
    assert np.linalg.norm(ua - ub) / np.linalg.norm(ua) < 1e-8
    assert np.isfinite(np.asarray(ress)).all() and len(np.asarray(its)) == 5


def _adpm_advection_case(n=5, amp=3000.0, dt=0.01):
    """ADPM configuration in the advection-dominated band: taxis
    amplitude `amp` at mesh spacing 150/(n-1) puts the linearized-CN
    operator (src/adpm.C:324-652 analogue) between "f32 inner sweeps
    stagnate" (amp ~3e3) and "the operator itself is indefinite and no
    Krylov stack converges" (amp >~ 1e4)."""
    from rdcfes_tpu.models.adpm import (adpm_blocks, adpm_physics,
                                        default_params)

    mesh = box_tet_mesh(n, n, n, bounds=((0, 150.0), (0, 150.0), (0, 150.0)))
    p = default_params()
    p.update(dt=dt,
             taxis1_A_b=amp, taxis1_A_b_pulse0=-1.0, taxis1_A_b_pulse1=0.01,
             taxis1_Tau=amp, taxis1_Tau_pulse0=-1.0, taxis1_Tau_pulse1=0.01,
             diffuse_A_b=2e-4, diffuse_A_b_pulse0=-1.0,
             diffuse_A_b_pulse1=1e20)
    p = {k: float(v) for k, v in p.items()}
    N = mesh.n_nodes
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0 = np.zeros((N, 3))
    u0[:, 0] = 1.0
    u0[:, 1] = 1e-3 * np.exp(-r2 / (2 * 21.0**2))
    u0[:, 2] = 1e-4 * np.exp(-r2 / (2 * 15.0**2))
    rng = np.random.default_rng(0)
    tracts = rng.standard_normal((mesh.n_elems, 3))
    tracts /= np.linalg.norm(tracts, axis=1, keepdims=True)
    fields = {"tracts": jnp.asarray(tracts), "time": 1.0}
    return mesh, p, u0, fields, adpm_physics, adpm_blocks


def test_fast_path_f64_stall_rescue(monkeypatch):
    """The kernel fast path detects f32 stagnation in-step and recovers
    through the XLA-matvec f64 rescue (VERDICT r3 item 4): at taxis
    amplitude 3e3 the f32 inner sweeps diverge (residual ~7e2) while the
    f64 operator converges, so the rescue is what makes the step land at
    the solver tolerance."""
    mesh, p, u0, fields, phys, blocks = _adpm_advection_case()
    sysm = TransientRDCSystem(mesh, 3, phys, physics_blocks=blocks,
                              precision="mixed", fast_gather="interpret")
    st = sysm.initial_state(u0)
    st1, _, res = sysm.step(st, fields=fields, params=p)
    assert float(res) < 1e-8
    assert np.isfinite(np.asarray(st1["u"])).all()

    # hardness guard: the same step WITHOUT the rescue stalls.  The step
    # program looks refine_mixed up as a module global at trace time, so
    # patching it and building a fresh system traces the no-rescue form.
    import rdcfes_tpu.systems.transient as T

    orig = T.refine_mixed

    def no_rescue(mv32, mv64, b, x0, rtol, maxiter, **kw):
        return orig(mv32, mv64, b, x0, rtol, maxiter)

    monkeypatch.setattr(T, "refine_mixed", no_rescue)
    sys2 = TransientRDCSystem(mesh, 3, phys, physics_blocks=blocks,
                              precision="mixed", fast_gather="interpret")
    _, _, res0 = sys2.step(st, fields=fields, params=p)
    assert float(res0) > 1e-8


def test_subcycle_converges_where_operator_indefinite():
    """run_steps(subcycle=k): at taxis amplitude 1e4 the CN operator has
    eigenvalues on both sides of the origin and the full-dt solve fails
    outright (measured residual >1); 8 substeps at dt/8 keep each
    substep operator definite and the standard mixed stack converges to
    machine precision.  Aggregation contract: one iters/residual entry
    per OUTER step."""
    mesh, p, u0, fields, phys, blocks = _adpm_advection_case(amp=1e4)
    sysm = TransientRDCSystem(mesh, 3, phys, physics_blocks=blocks,
                              precision="mixed")
    st = sysm.initial_state(u0)
    _, _, res1 = sysm.step(st, fields=fields, params=p)
    assert float(res1) > 1e-8  # guards that the regime is genuinely hard
    st2, its, ress = sysm.run_steps(st, 2, fields=fields, params=p,
                                    subcycle=8)
    assert np.asarray(ress).shape == (2,)
    assert (np.asarray(ress) <= 1e-8).all()
    assert np.asarray(its).shape == (2,)
    u = np.asarray(st2["u"])
    assert np.isfinite(u).all() and (u >= 0).all()
    # the adaptive chooser lands on a k that converges (>1 here)
    k = sysm.choose_subcycle(st, fields=fields, params=p)
    assert k > 1
