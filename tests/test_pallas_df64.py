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
