"""df64 (paired-f32) build kernel: structure + numerics.

The COMPILED kernel's accuracy class (~1e-14 relative vs the XLA-f64
interp) is hardware-validated by scripts/probe_df64_kernel.py — it
cannot be asserted here because interpret mode lowers the kernel body
to XLA ops, whose algebraic simplifier folds the compensated arithmetic
to plain f32 (the very reason the kernel exists; see
fem/pallas_df64.py's module docstring).  On CPU we therefore pin:

  - the XLA-level split/join round trip is lossless for f32-pair
    representable values and ~2^-49 for general f64;
  - the primitives ARE correct when evaluated eagerly (op-by-op, no
    whole-graph simplification) — the same path numpy validated;
  - the kernel in interpret mode matches the f64 interp to the f32
    class (shape/wiring check) and exactly at f32-exact inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rdcfes_tpu.fem.assembly import interpolate_ue_affine
from rdcfes_tpu.fem.pallas_df64 import (_add_dd, _const_pair, _mul_dd,
                                        interp_affine_df64, join_f64,
                                        split_f64)


def test_split_join_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(1000) * np.exp(
        rng.uniform(-20, 20, 1000)))
    h, l = split_f64(x)
    back = np.asarray(join_f64(h, l), np.float64)
    rel = np.abs(back - np.asarray(x)) / np.abs(np.asarray(x))
    assert rel.max() < 2.0 ** -48


def test_primitives_eager_accuracy():
    """Eager evaluation compiles op-by-op, so the compensation survives
    (whole-graph folding needs the ops in one program)."""
    rng = np.random.default_rng(1)
    K, E = 4, 256
    x64 = rng.standard_normal((K, E))
    C = rng.standard_normal(K)
    xh = jnp.asarray(x64.astype(np.float32))
    xl = jnp.asarray((x64 - x64.astype(np.float32).astype(np.float64))
                     .astype(np.float32))
    acc = None
    for k in range(K):
        ch, cl = _const_pair(C[k])
        p = _mul_dd((jnp.float32(ch), jnp.float32(cl)), (xh[k], xl[k]))
        acc = p if acc is None else _add_dd(acc, p)
    got = np.asarray(acc[0], np.float64) + np.asarray(acc[1], np.float64)
    ref = np.einsum("k,ke->e", C, x64)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 1e-13, rel


@pytest.mark.parametrize("exact_inputs", [True, False])
def test_rhs_kernel_interpret(exact_inputs):
    """rhs_affine_df64 vs block_rhs_affine; exact at f32-exact inputs,
    f32-class otherwise (interpret mode — see module docstring)."""
    from rdcfes_tpu.fem.pallas_df64 import rhs_affine_df64
    from rdcfes_tpu.fem.weakform import WeakFormBlocks, block_rhs_affine

    rng = np.random.default_rng(3)
    V, Q, K, E = 3, 4, 4, 512
    if exact_inputs:
        mk = lambda *s: rng.integers(-100, 100, s).astype(np.float64)
        phi = rng.integers(1, 9, (Q, K)).astype(np.float64) / 8.0
    else:
        mk = lambda *s: rng.standard_normal(s)
        phi = rng.uniform(0.05, 0.6, (Q, K))
    jxw = np.abs(mk(Q, E)) + 1.0
    dph0 = mk(K, 3, E)
    dphi = np.broadcast_to(dph0[None], (Q, K, 3, E)).copy()
    A = (jnp.asarray(mk(Q, E)), 0.0, jnp.asarray(mk(Q, E)))
    B = (0.0, jnp.asarray(mk(Q, 3, E)), 0.0)
    z = 0.0
    wfb = WeakFormBlocks(A=A, B=B,
                         C=((z,) * V,) * V, D=((z,) * V,) * V,
                         E=((z,) * V,) * V)
    ref = np.asarray(block_rhs_affine(wfb, phi, jnp.asarray(jxw),
                                      jnp.asarray(dphi)))
    feh, fel = rhs_affine_df64(wfb, phi, split_f64(jnp.asarray(jxw)),
                               split_f64(jnp.asarray(dph0)),
                               interpret=True)
    got = np.asarray(feh, np.float64) + np.asarray(fel, np.float64)
    tol = 0.0 if exact_inputs else 1e-4
    s = np.abs(ref).max()
    assert np.abs(got - ref).max() <= tol * max(s, 1.0), (
        np.abs(got - ref).max(), s)


def test_df64_step_wiring_interpret():
    """Force the df64 build path through a real transient step in
    interpret mode and compare against the default step at the f32
    class — pins the gather-pair/interp/rhs/restrict plumbing (shapes,
    slicing, zero tails), not the compiled accuracy."""
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import (default_params, pihna_blocks,
                                         pihna_physics)
    from rdcfes_tpu.systems import TransientRDCSystem

    mesh = box_tet_mesh(4, 4, 4, bounds=((0, 10.0),) * 3)
    params = {k: float(v) for k, v in default_params().items()}
    rng = np.random.default_rng(4)
    u0 = np.zeros((mesh.n_nodes, 5))
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0[:, 1] = 100.0 * np.exp(-r2 / 8.0)
    u0[:, 3] = 7200.0 * (1.0 + 0.1 * rng.random(mesh.n_nodes))

    def run(df64):
        s = TransientRDCSystem(mesh, 5, pihna_physics,
                               physics_blocks=pihna_blocks,
                               precision="mixed",
                               fast_gather="interpret")
        if df64:
            s._fast_tables()["use_df64"] = True
        st, _, _ = s.run_steps(s.initial_state(u0), 2, params=params)
        return np.asarray(st["u"])

    u_ref = run(False)
    u_df = run(True)
    scale = np.abs(u_ref).max(axis=0)
    scale[scale == 0] = 1.0
    drift = (np.abs(u_df - u_ref) / scale[None, :]).max()
    # interpret mode carries f32-class interp/rhs (the XLA fold);
    # anything beyond this class means the plumbing is wrong
    assert drift < 1e-4, drift


@pytest.mark.parametrize("exact_inputs", [True, False])
def test_interp_kernel_interpret(exact_inputs):
    """Wiring/shape check via interpret mode.  With f32-exact inputs and
    constants the interp is exact in ANY arithmetic, so the interpret-
    mode result must match f64 exactly; with general inputs interpret
    mode only guarantees the f32 class (the XLA fold — see module
    docstring)."""
    rng = np.random.default_rng(2)
    V, Q, K, E = 5, 4, 4, 512
    if exact_inputs:
        ue = rng.integers(-1000, 1000, (V, K, E)).astype(np.float64)
        phi = rng.integers(1, 9, (Q, K)).astype(np.float64) / 8.0
        dph0 = rng.integers(-100, 100, (K, 3, E)).astype(np.float64)
    else:
        ue = rng.standard_normal((V, K, E))
        phi = rng.uniform(0.05, 0.6, (Q, K))
        dph0 = rng.standard_normal((K, 3, E))
    dphi = np.broadcast_to(dph0[None], (Q, K, 3, E)).copy()
    uq_ref, gx_ref = interpolate_ue_affine(jnp.asarray(ue),
                                           jnp.asarray(phi),
                                           jnp.asarray(dphi))
    up, gp = interp_affine_df64(split_f64(jnp.asarray(ue)), phi,
                                split_f64(jnp.asarray(dph0)),
                                interpret=True)
    uq = np.asarray(join_f64(*up), np.float64)
    gx = np.asarray(join_f64(*gp), np.float64)
    tol = 0.0 if exact_inputs else 1e-5
    su = np.abs(np.asarray(uq_ref)).max()
    assert np.abs(uq - np.asarray(uq_ref)).max() <= tol * max(su, 1.0)
    sg = np.abs(np.asarray(gx_ref)).max()
    assert np.abs(gx - np.asarray(gx_ref)).max() <= tol * max(sg, 1.0)
