"""Pallas TPU kernels executing Beneš grid permutations (fem/benes.py).

The two hot gathers of the matrix-free qp matvec — corner gather
(x -> ue) and restriction (ye -> y) — are fixed bijections of an
(A, B=128, L=128) grid.  XLA executes them as gathers at ~0.2 G
indices/s; these kernels run the same data movement through Mosaic's
fast primitives (lane gather, 8-row sublane gather, block rolls,
minor-dim transposes) at ~7 G elements/s (scripts/microbench_pallas3.py).

Kernels (channel-gridded so VMEM holds one channel's buffers at a time):
  gather_corners(x, plan_tables)  : (V, NR, 128) -> (V, R, 128)
      broadcast x along the incidence axis, then permute to corner-slot
      order (the ue buffer; caller views it as (V, K, E_pad)).
  permute_restrict(ye, plan_tables): (V, R, 128) -> (V, C, NR, 128)
      permute corner contributions into (c, node) order; the caller
      reduces over c (the scatter-free restriction).

Plan tables are uint8 (every routed axis has <= 128 positions) and are
cast to int32 in-kernel.  All kernels support interpret=True so the CPU
test suite exercises them without a TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .benes import GridPermPlan


class DevicePlan(NamedTuple):
    """Device-resident kernel-layout tables for one grid permutation."""

    A: int
    B: int
    L: int
    AP: int
    iL1: jnp.ndarray    # (A*B, L)   u8
    iB1t: jnp.ndarray   # (A*L, B)   u8  (B-stage pre-swapped)
    jA1: jnp.ndarray    # (AP, B*L)  u8
    rA: jnp.ndarray     # (AP, B*L)  u8
    jA2: jnp.ndarray    # (AP, B*L)  u8
    iB2t: jnp.ndarray   # (A*L, B)   u8
    iL2: jnp.ndarray    # (A*B, L)   u8


def device_plan(plan: GridPermPlan) -> DevicePlan:
    A, B, L = plan.A, plan.B, plan.L
    # B-stage tables arrive as (A, B, L) target-driven b-gathers; the
    # kernel runs them after a (B, L) swap, so pre-swap to (A*L, B)
    iB1t = np.ascontiguousarray(
        np.transpose(plan.iB1, (0, 2, 1))).reshape(A * L, B)
    iB2t = np.ascontiguousarray(
        np.transpose(plan.iB2, (0, 2, 1))).reshape(A * L, B)
    as8 = lambda a: jnp.asarray(a, jnp.uint8)
    return DevicePlan(
        A=A, B=B, L=L, AP=plan.AP,
        iL1=as8(plan.iL1), iB1t=as8(iB1t), jA1=as8(plan.jA1),
        rA=as8(plan.rA), jA2=as8(plan.jA2), iB2t=as8(iB2t),
        iL2=as8(plan.iL2),
    )


def _roll_rows(z, shift):
    """np.roll along axis 0 via concat (static shift; Mosaic-safe)."""
    if shift == 0:
        return z
    return jnp.concatenate([z[-shift:], z[:-shift]], axis=0)


def _run_perm(z, iL1, iB1t, jA1, rA, jA2, iB2t, iL2, A, B, L, AP):
    """The five permutation stages on one (A*B, L) f32 buffer."""
    i32 = lambda a: a.astype(jnp.int32)
    nb = AP // 8
    # stage 1: lane gather
    z = jnp.take_along_axis(z, i32(iL1), axis=1)
    # stage 2: b gather (swap minor dims, lane gather, swap back)
    z = z.reshape(A, B, L).swapaxes(1, 2).reshape(A * L, B)
    z = jnp.take_along_axis(z, i32(iB1t), axis=1)
    z = z.reshape(A, L, B).swapaxes(1, 2).reshape(A, B * L)
    # stage 3: A-axis on (AP, B*L): within-block, across-block, within
    if AP > A:
        # Mosaic rejects zero-sized vector operands, so the pad must be
        # skipped when A is already a multiple of 8 (AP == A) — hit by
        # the solid ELL plan (A=216); the transient plans pad normally
        z = jnp.concatenate(
            [z, jnp.zeros((AP - A, B * L), z.dtype)], axis=0)
    zb = z.reshape(nb, 8, B * L)
    j1 = i32(jA1).reshape(nb, 8, B * L)
    z1 = jnp.concatenate(
        [jnp.take_along_axis(zb[u], j1[u], axis=0)[None]
         for u in range(nb)], axis=0).reshape(AP, B * L)
    # pure select chain (no arithmetic): the stages must be BIT-EXACT
    # data movement so f64 buffers can ride through as bitcast u32->f32
    # planes (adding 0.0 would canonicalize NaN-aliasing bit patterns)
    rAi = i32(rA)
    acc = z1
    for d in range(1, nb):
        acc = jnp.where(rAi == d, _roll_rows(z1, 8 * d), acc)
    z2 = acc.reshape(nb, 8, B * L)
    j3 = i32(jA2).reshape(nb, 8, B * L)
    z = jnp.concatenate(
        [jnp.take_along_axis(z2[v], j3[v], axis=0)[None]
         for v in range(nb)], axis=0).reshape(AP, B * L)[:A]
    # stage 4: b gather
    z = z.reshape(A, B, L).swapaxes(1, 2).reshape(A * L, B)
    z = jnp.take_along_axis(z, i32(iB2t), axis=1)
    z = z.reshape(A, L, B).swapaxes(1, 2).reshape(A * B, L)
    # stage 5: lane gather
    return jnp.take_along_axis(z, i32(iL2), axis=1)


def _perm_kernel(x_ref, iL1, iB1t, jA1, rA, jA2, iB2t, iL2, out_ref,
                 *, A, B, L, AP, rep):
    """One channel per grid step.  rep > 0: the input block has `rep`-fold
    fewer rows than the grid; it is broadcast along the incidence axis
    before permuting (the corner-gather x-replication, free in VMEM).

    Traced under disable_x64: jnp.take_along_axis picks the DEFAULT int
    dtype for its index conversion, and int64 is unrepresentable in
    Mosaic (the package enables x64 globally for f64 physics)."""
    with jax.enable_x64(False):
        z = x_ref[0]
        if rep:
            z = jnp.broadcast_to(z[None],
                                 (rep,) + z.shape).reshape(A * B, L)
        out_ref[0] = _run_perm(z, iL1[:], iB1t[:], jA1[:], rA[:], jA2[:],
                               iB2t[:], iL2[:], A, B, L, AP)


def _call(dp: DevicePlan, x, in_rows, rep, interpret=False,
          channels=None):
    """Shared pallas_call wrapper: grid over channels.

    Built and invoked under enable_x64(False): the surrounding package
    runs with x64 on (f64 physics), but Mosaic rejects the int64 scalars
    x64 mode injects into grid bookkeeping and index conversions.

    `channels` pads the channel axis to a canonical count so f32 and
    bit-split-f64 invocations share ONE compiled kernel variant — each
    distinct Mosaic variant in a program costs the per-request remote
    compile helper minutes and GBs (SIGKILL observed at ~6 variants)."""
    W = x.shape[0]
    if channels is not None and channels > W:
        x = jnp.pad(x, ((0, channels - W),) + ((0, 0),) * (x.ndim - 1))
    V = x.shape[0]
    A, B, L, AP = dp.A, dp.B, dp.L, dp.AP
    R = A * B
    from functools import partial

    kern = partial(_perm_kernel, A=A, B=B, L=L, AP=AP, rep=rep)
    tbl_specs = [
        pl.BlockSpec(t.shape, lambda v: (0,) * t.ndim,
                     memory_space=pltpu.VMEM)
        for t in (dp.iL1, dp.iB1t, dp.jA1, dp.rA, dp.jA2, dp.iB2t, dp.iL2)
    ]
    kwargs = {}
    if not interpret:
        # tables + data blocks + stage intermediates peak slightly above
        # the 16M default scoped-vmem budget at bench scale
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((V, R, L), x.dtype),
            grid=(V,),
            in_specs=[
                pl.BlockSpec((1, in_rows, L), lambda v: (v, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + tbl_specs,
            out_specs=pl.BlockSpec((1, R, L), lambda v: (v, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            **kwargs,
        )(x, dp.iL1, dp.iB1t, dp.jA1, dp.rA, dp.jA2, dp.iB2t, dp.iL2)[:W]


def grid_permute(dp: DevicePlan, x, interpret=False, channels=None):
    """(V, A*B, L) -> (V, A*B, L) permuted per the plan."""
    return _call(dp, x, dp.A * dp.B, 0, interpret, channels)


def _perm_reduce_kernel(x_ref, iL1, iB1t, jA1, rA, jA2, iB2t, iL2,
                        out_ref, *, A, B, L, AP, groups):
    """Permute one channel, then fold the incidence-group sum (the
    caller's reshape(C_x, NR*L).sum(axis=0)) in VMEM — the restriction's
    final reduction never round-trips to HBM.  f32 ONLY: the f64 hi/lo
    transport planes must be joined to f64 BEFORE summing (plane-wise
    f32 sums would discard the carries), so f64 keeps the outside sum."""
    with jax.enable_x64(False):
        z = _run_perm(x_ref[0], iL1[:], iB1t[:], jA1[:], rA[:], jA2[:],
                      iB2t[:], iL2[:], A, B, L, AP)
        rows = (A * B) // groups
        out_ref[0] = z.reshape(groups, rows, L).sum(axis=0)


def grid_permute_reduce(dp: DevicePlan, x, groups, interpret=False,
                        channels=None):
    """(V, A*B, L) -> (V, (A*B)//groups, L): grid_permute followed by the
    incidence-group reduction, fused in-kernel (f32 restriction path)."""
    W = x.shape[0]
    if channels is not None and channels > W:
        x = jnp.pad(x, ((0, channels - W),) + ((0, 0),) * (x.ndim - 1))
    V = x.shape[0]
    A, B, L, AP = dp.A, dp.B, dp.L, dp.AP
    R = A * B
    assert R % groups == 0, (R, groups)
    rows = R // groups
    from functools import partial

    kern = partial(_perm_reduce_kernel, A=A, B=B, L=L, AP=AP,
                   groups=groups)
    tbl_specs = [
        pl.BlockSpec(t.shape, lambda v: (0,) * t.ndim,
                     memory_space=pltpu.VMEM)
        for t in (dp.iL1, dp.iB1t, dp.jA1, dp.rA, dp.jA2, dp.iB2t, dp.iL2)
    ]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((V, rows, L), x.dtype),
            grid=(V,),
            in_specs=[
                pl.BlockSpec((1, R, L), lambda v: (v, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + tbl_specs,
            out_specs=pl.BlockSpec((1, rows, L), lambda v: (v, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            **kwargs,
        )(x, dp.iL1, dp.iB1t, dp.jA1, dp.rA, dp.jA2, dp.iB2t, dp.iL2)[:W]


def gather_corners(dp: DevicePlan, x, rep, interpret=False,
                   channels=None):
    """x (V, NR, L) nodal values -> ue (V, A*B, L) corner-slot values.

    The plan's source grid is the rep-fold broadcast of x along the
    incidence axis (rows r read x[r mod NR]); requires A*B == rep*NR."""
    NR = x.shape[1]
    assert dp.A * dp.B == rep * NR, (dp.A * dp.B, rep, NR)
    return _call(dp, x, NR, rep, interpret, channels)


# ----------------------------------------------------------------------
# f64 transport: hi/lo f32 split (Mosaic has no 64-bit types, and the
# TPU backend's x64-emulation pass cannot rewrite 64-bit bitcasts, so an
# exact bit-split is unavailable).  The arithmetic split below carries
# f64 values through the kernels with <= 2^-49 relative error — five
# orders below the 1e-10 solver tolerance and six below the 1e-8
# reference-parity bar.  The permutation stages themselves are pure
# selects, so the two planes move losslessly.
# ----------------------------------------------------------------------
def _split_f64(x):
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _join_f64(hi32, lo32):
    return hi32.astype(jnp.float64) + lo32.astype(jnp.float64)


def gather_corners_f64(dp: DevicePlan, x, rep, interpret=False,
                       channels=None):
    """f64 variant of gather_corners: two hi/lo f32 planes per channel
    share one kernel invocation."""
    V = x.shape[0]
    hi, lo = _split_f64(x)
    g = gather_corners(dp, jnp.concatenate([hi, lo], axis=0), rep,
                       interpret, channels)
    return _join_f64(g[:V], g[V:])


def gather_corners_f64_pair(dp: DevicePlan, x, rep, interpret=False,
                            channels=None):
    """gather_corners_f64 WITHOUT the trailing join: returns the (hi,
    lo) f32 planes for consumers that continue in paired-f32 arithmetic
    (fem/pallas_df64.py) — the join (an emulated f64 add per gathered
    entry) and the consumer's re-split both disappear."""
    V = x.shape[0]
    hi, lo = _split_f64(x)
    g = gather_corners(dp, jnp.concatenate([hi, lo], axis=0), rep,
                       interpret, channels)
    return g[:V], g[V:]


def grid_permute_f64(dp: DevicePlan, x, interpret=False, channels=None):
    """f64 variant of grid_permute (hi/lo f32 transport)."""
    V = x.shape[0]
    hi, lo = _split_f64(x)
    g = grid_permute(dp, jnp.concatenate([hi, lo], axis=0), interpret,
                     channels)
    return _join_f64(g[:V], g[V:])
