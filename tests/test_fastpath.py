"""Fast-gather path: Beneš routing, permutation kernels, system parity.

The round-3 performance work (PERF.md section 5) replaces the XLA gathers
of the qp matvec with Mosaic Beneš permutation kernels.  These tests pin
the three layers on CPU: the host routing (pure NumPy), the Pallas
kernels in interpreter mode, and end-to-end step parity of the
fast-gather system against the reference path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rdcfes_tpu.fem.benes import apply_plan, build_grid_permutation
from rdcfes_tpu.fem.fastpath import build_fast_plans
from rdcfes_tpu.fem.pallas_perm import (device_plan, gather_corners,
                                        grid_permute)
from rdcfes_tpu.mesh import box_tet_mesh


def test_benes_routing_random_grids():
    # (8, ...) and (16, ...) exercise AP == A (A already a multiple of
    # 8): the kernel's A-stage pad is skipped — a zero-row pad is an
    # illegal zero-sized vector in Mosaic (hit by the solid ELL plan,
    # A=216, on hardware 2026-08-19; interpret/XLA masked it)
    rng = np.random.default_rng(0)
    for (A, B, L) in [(3, 4, 4), (5, 8, 8), (11, 16, 16), (8, 8, 8),
                      (16, 8, 8)]:
        T = A * B * L
        perm = rng.permutation(T)
        plan = build_grid_permutation(perm, A, B, L)
        x = rng.standard_normal(T).astype(np.float32)
        assert np.array_equal(apply_plan(plan, x), x[perm])
        if A % 8 == 0:
            # run the PALLAS kernel (interpret) through the no-pad
            # branch of _run_perm as well
            assert plan.AP == A
            g = grid_permute(device_plan(plan),
                             jnp.asarray(x.reshape(1, A * B, L)),
                             interpret=True)
            assert np.array_equal(np.asarray(g).ravel(), x[perm])


def test_fastpath_plans_match_fem_gathers():
    """P_fwd reproduces ue = x[conn]; P_rev + c-sum reproduces the
    scatter-add restriction — pure NumPy, the routing contract."""
    mesh = box_tet_mesh(4, 4, 4)
    conn = mesh.connectivity
    E, K = conn.shape
    N = mesh.n_nodes
    fp = build_fast_plans(conn, N)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(N).astype(np.float32)
    xp = np.zeros(fp.NR * 128, np.float32)
    xp[:N] = x
    ue = apply_plan(fp.fwd, np.tile(xp, fp.C_x)).reshape(
        K, fp.E_pad)[:, :E]
    assert np.array_equal(ue, x[conn.T])

    ye = rng.standard_normal((K, E)).astype(np.float32)
    T = fp.A * 128 * 128
    buf = np.zeros(T, np.float32)
    buf.reshape(K, fp.E_pad)[:, :E] = ye
    y = apply_plan(fp.rev, buf).reshape(fp.C_x, -1).sum(axis=0)[:N]
    yref = sum(np.bincount(conn[:, k], weights=ye[k], minlength=N)
               for k in range(K))
    np.testing.assert_allclose(y, yref, atol=1e-4)


def test_kernels_interpret_mode():
    """The Pallas kernels (interpreter mode) match the NumPy executor."""
    mesh = box_tet_mesh(3, 3, 3)
    conn = mesh.connectivity
    E, K = conn.shape
    N = mesh.n_nodes
    fp = build_fast_plans(conn, N)
    dpf, dpr = device_plan(fp.fwd), device_plan(fp.rev)
    rng = np.random.default_rng(2)
    V = 2
    x = rng.standard_normal((V, N)).astype(np.float32)
    xp = np.zeros((V, fp.NR * 128), np.float32)
    xp[:, :N] = x
    ue = gather_corners(dpf, jnp.asarray(xp.reshape(V, fp.NR, 128)),
                        fp.C_x, interpret=True)
    ue = np.asarray(ue).reshape(V, K, fp.E_pad)[:, :, :E]
    assert np.array_equal(ue, np.stack([x[v][conn.T] for v in range(V)]))

    ye = rng.standard_normal((V, K, E)).astype(np.float32)
    buf = np.zeros((V, K, fp.E_pad), np.float32)
    buf[:, :, :E] = ye
    g = grid_permute(dpr, jnp.asarray(buf.reshape(V, fp.A * 128, 128)),
                     interpret=True)
    y = np.asarray(g).reshape(V, fp.C_x, -1).sum(axis=1)[:, :N]
    yref = np.stack([
        sum(np.bincount(conn[:, k], weights=ye[v, k], minlength=N)
            for k in range(K)) for v in range(V)
    ])
    np.testing.assert_allclose(y, yref, atol=1e-4)


def test_system_parity_fast_vs_reference():
    """3 mixed-precision PIHNA steps with fast_gather='interpret' match
    the XLA-gather path to solver tolerance (identical math, only the
    restriction's summation order differs)."""
    from rdcfes_tpu.models.pihna import (default_params, pihna_blocks,
                                         pihna_physics)
    from rdcfes_tpu.systems import TransientRDCSystem

    mesh = box_tet_mesh(4, 4, 4)
    Kk = 2.39e5
    p = default_params()
    p.update(dt=0.1, cells_min_capacity=1.0, cells_max_capacity=Kk,
             cells_max_capacity_exponent=3.0, cytokines_max_capacity=1e-8,
             necrosis_c=500.0 / Kk, necrosis_h=200.0 / Kk,
             necrosis_v=300.0 / Kk, produce_c=-2.5, switch_c2h=1.0,
             switch_h2c=1.82, switch_h2n=0.5, diffuse_v=0.5,
             produce_v=10.0, secrete_a_c=2.77e-13, secrete_a_h=5.22e-10,
             decay_a=5678.4)
    p = {k: float(v) for k, v in p.items()}
    rng = np.random.default_rng(0)
    u0 = np.zeros((mesh.n_nodes, 5))
    r2 = ((mesh.coords - 0.5) ** 2).sum(axis=1)
    u0[:, 1] = 2000 * np.exp(-r2 / 0.1)
    u0[:, 2] = 500 * np.exp(-r2 / 0.1)
    u0[:, 3] = 7200 * (1 + 0.1 * rng.random(mesh.n_nodes))
    u0[:, 4] = 1e-10

    a = TransientRDCSystem(mesh, 5, pihna_physics,
                           physics_blocks=pihna_blocks,
                           precision="mixed", fast_gather="off")
    b = TransientRDCSystem(mesh, 5, pihna_physics,
                           physics_blocks=pihna_blocks,
                           precision="mixed", fast_gather="interpret")
    sa, sb = a.initial_state(u0), b.initial_state(u0)
    for _ in range(3):
        sa, _, ra = a.step(sa, params=p)
        sb, _, rb = b.step(sb, params=p)
        ua, ub = np.asarray(sa["u"]), np.asarray(sb["u"])
        rel = np.linalg.norm(ua - ub) / np.linalg.norm(ua)
        assert rel < 1e-10, rel
        assert float(rb) < 1e-10


def test_solid_ell_matvec_fast_interpret(monkeypatch):
    """The opt-in Beneš x-gather of the solid inner SpMV
    (RDCFES_SOLID_FAST, solvers/newton.py): a full Newton solve with
    the interpreter-mode kernels matches the default ELL path.  ELL pad
    slots are remapped to the row's own node, so every node's incidence
    count is exactly L and the pad products hit the appended zero
    block."""
    from rdcfes_tpu.mesh import box_hex_mesh
    from rdcfes_tpu.solvers.newton import NewtonOptions
    from rdcfes_tpu.systems.solid import SolidSystem

    opts = NewtonOptions(
        max_nonlinear_iterations=12, relative_step_tolerance=1e-10,
        relative_residual_tolerance=1e-10,
        absolute_residual_tolerance=1e-10,
        max_linear_iterations=50000, initial_linear_tolerance=1e-3)
    kw = dict(materials={0: {"young": 1.0e3, "poisson": 0.3}},
              bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.3)},
              penalty=1.0e8, newton=opts)
    m = box_hex_mesh(4, 4, 4)
    monkeypatch.setenv("RDCFES_SOLID_FAST", "interpret")
    fast = SolidSystem(m, **kw)
    r_fast = fast.run_solver(fast.initial_positions(), 0.5)
    monkeypatch.setenv("RDCFES_SOLID_FAST", "0")
    ref = SolidSystem(m, **kw)
    r_ref = ref.run_solver(ref.initial_positions(), 0.5)
    assert bool(r_ref.converged) and bool(r_fast.converged)
    a, b = np.asarray(r_ref.x), np.asarray(r_fast.x)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 1e-10, f"solid fast-gather divergence {rel:.3e}"


def test_solid_fast_gather_option(monkeypatch):
    """NewtonOptions.fast_gather (deck key solver/linear/fast_gather)
    overrides the RDCFES_SOLID_FAST env var; None defers to it."""
    from rdcfes_tpu.mesh import box_hex_mesh
    from rdcfes_tpu.solvers.newton import NewtonOptions
    from rdcfes_tpu.systems.solid import SolidSystem

    opts = NewtonOptions(
        max_nonlinear_iterations=12, relative_step_tolerance=1e-10,
        relative_residual_tolerance=1e-10,
        absolute_residual_tolerance=1e-10,
        fast_gather="interpret")
    kw = dict(materials={0: {"young": 1.0e3, "poisson": 0.3}},
              bcs={0: (0.0, 0.0, 0.0), 5: (np.nan, np.nan, -0.3)},
              penalty=1.0e8)
    m = box_hex_mesh(3, 3, 3)
    # env says OFF; the option must still engage the kernel path
    monkeypatch.setenv("RDCFES_SOLID_FAST", "0")
    fast = SolidSystem(m, newton=opts, **kw)
    assert fast._newton._fast is not None
    r_fast = fast.run_solver(fast.initial_positions(), 0.5)
    ref = SolidSystem(m, newton=opts._replace(fast_gather="0"), **kw)
    assert ref._newton._fast is None
    r_ref = ref.run_solver(ref.initial_positions(), 0.5)
    assert bool(r_ref.converged) and bool(r_fast.converged)
    a, b = np.asarray(r_ref.x), np.asarray(r_fast.x)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 1e-10, f"fast_gather option divergence {rel:.3e}"
