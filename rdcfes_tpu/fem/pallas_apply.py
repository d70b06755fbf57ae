"""Fused qp-apply Pallas kernel: interp + coefficient apply in VMEM.

The f32 inner matvec's compute between the two Beneš permutations —
interpolate corner values to quadrature points, apply the block-sparse
weak-form coefficients, project back with the test functions — is pure
elementwise work, but XLA materializes enough of the unrolled q/k/d
intermediate chain to HBM to cost ~10x roofline.  This kernel streams
the live coefficient planes tile-by-tile through VMEM and reuses the
exact same jnp code (fem.weakform.qp_apply / fem.assembly.interpolate_ue)
inside the kernel body, so the math is definitionally identical to the
XLA path.

Layout contract: all element-axis arrays are padded to E_pad (the
fast-gather grid's per-k-plane slot count, a multiple of the tile size);
padded columns carry zeros and produce zero output.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .weakform import WeakFormBlocks, _is_zero

TILE_E = 4096


def stack_blocks(wfb: WeakFormBlocks, E_pad: int):
    """Split a block-sparse weak form into stacked live planes + static
    index lists (trace-time; the stacks are step-invariant and hoisted
    out of the Krylov loop by XLA)."""
    V = wfb.n_vars

    def pad(a):
        # slice-or-pad to the kernel's EL width: callers on the padded
        # build path (systems/transient._pad_geom) hand E_pad-sized
        # planes whose tail lanes carry finite coefficient garbage that
        # the kernel's JxW = 0 pad lanes multiply to exactly zero — the
        # same contributions the E-sized path got from zero-padding
        if a.shape[-1] >= E_pad:
            return a[..., :E_pad]
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1)
                       + [(0, E_pad - a.shape[-1])])

    idxC, Cs = [], []
    idxD, Ds = [], []
    idxE, Es = [], []
    for v in range(V):
        for w in range(V):
            if not _is_zero(wfb.C[v][w]):
                idxC.append((v, w))
                Cs.append(pad(wfb.C[v][w]))
            if not _is_zero(wfb.D[v][w]):
                idxD.append((v, w))
                Ds.append(pad(wfb.D[v][w]))
            if not _is_zero(wfb.E[v][w]):
                idxE.append((v, w))
                Es.append(pad(wfb.E[v][w]))
    stk = lambda xs: jnp.stack(xs) if xs else None
    return (tuple(idxC), stk(Cs)), (tuple(idxD), stk(Ds)), \
        (tuple(idxE), stk(Es))


def stack_blocks_affine(wfb: WeakFormBlocks, Epre, E_pad: int):
    """stack_blocks for the affine kernel: C/D planes as usual, but the
    diffusion planes are the PRE-CONTRACTED per-step q-sums
    (fem.weakform.diffusion_presum) — one (E,) plane per live block."""
    V = wfb.n_vars

    def pad(a):
        # slice-or-pad to the kernel's EL width: callers on the padded
        # build path (systems/transient._pad_geom) hand E_pad-sized
        # planes whose tail lanes carry finite coefficient garbage that
        # the kernel's JxW = 0 pad lanes multiply to exactly zero — the
        # same contributions the E-sized path got from zero-padding
        if a.shape[-1] >= E_pad:
            return a[..., :E_pad]
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1)
                       + [(0, E_pad - a.shape[-1])])

    idxC, Cs = [], []
    idxD, Ds = [], []
    idxE, Es = [], []
    for v in range(V):
        for w in range(V):
            if not _is_zero(wfb.C[v][w]):
                idxC.append((v, w))
                Cs.append(pad(wfb.C[v][w]))
            if not _is_zero(wfb.D[v][w]):
                idxD.append((v, w))
                Ds.append(pad(wfb.D[v][w]))
            if not _is_zero(Epre[v][w]):
                idxE.append((v, w))
                Es.append(pad(Epre[v][w]))
    stk = lambda xs: jnp.stack(xs) if xs else None
    return (tuple(idxC), stk(Cs)), (tuple(idxD), stk(Ds)), \
        (tuple(idxE), stk(Es))


def _apply_affine_kernel(*refs, V, idxC, idxD, idxE, has):
    """Affine (TET4) fused apply: gradients computed once (not per q),
    diffusion flux via the pre-contracted q-sum planes.  ~2.4x fewer ops
    and ~4x smaller intermediates than _apply_kernel — the largest
    tensor is (V, Q, K, T)."""
    it = iter(refs)
    phi_ref = next(it)
    ue_ref = next(it)
    jxw_ref = next(it)
    dphi0_ref = next(it)
    cs_ref = next(it) if has[0] else None
    ds_ref = next(it) if has[1] else None
    es_ref = next(it) if has[2] else None
    out_ref = next(it)
    with jax.enable_x64(False):
        ue = ue_ref[:]                       # (V, K, T)
        dphi0 = dphi0_ref[:]                 # (K, 3, T)
        jxw = jxw_ref[:]                     # (Q, T)
        phi_a = phi_ref[:]                   # (Q, K)
        x_qp = (phi_a[None, :, :, None] * ue[:, None, :, :]).sum(axis=2)
        gx = (dphi0[None] * ue[:, :, None, :]).sum(axis=1)  # (V, 3, T)
        accA = [None] * V
        for i, (v, w) in enumerate(idxC):
            t = cs_ref[i] * x_qp[w]
            accA[v] = t if accA[v] is None else accA[v] + t
        zA = jnp.zeros(x_qp.shape[1:], jnp.float32)
        A_coef = jnp.stack([a if a is not None else zA for a in accA])
        accF = [None] * V
        for i, (v, w) in enumerate(idxD):
            # taxis keeps its q-sum (x per q), dphi multiply hoisted
            t = (ds_ref[i] * (jxw[:, None, :] * x_qp[w][:, None, :])
                 ).sum(axis=0)               # (3, T)
            accF[v] = t if accF[v] is None else accF[v] + t
        for i, (v, w) in enumerate(idxE):
            t = es_ref[i][None, :] * gx[w]   # (3, T)
            accF[v] = t if accF[v] is None else accF[v] + t
        zF = jnp.zeros(gx.shape[1:], jnp.float32)
        Fd = jnp.stack([f if f is not None else zF for f in accF])
        Aj = A_coef * jxw[None, :, :]
        out_ref[:] = (
            (phi_a[None, :, :, None] * Aj[:, :, None, :]).sum(axis=1)
            + (dphi0[None] * Fd[:, None, :, :]).sum(axis=2)
        )


def qp_apply_affine_fused(wfb_stacks, phi, JxW_pad, dphi0_pad, ue,
                          interpret=False):
    """ue (V, K, E_pad) f32 -> Ye (V, K, E_pad) f32 through the affine
    fused kernel.  wfb_stacks: stack_blocks_affine output;
    JxW_pad (Q, E_pad); dphi0_pad (K, 3, E_pad)."""
    (idxC, Cs), (idxD, Ds), (idxE, Es) = wfb_stacks
    V, K, E_pad = ue.shape
    Q = JxW_pad.shape[0]
    tile = TILE_E
    while E_pad % tile:
        tile //= 2
    assert tile >= 512, (E_pad, tile)
    has = (Cs is not None, Ds is not None, Es is not None)
    kern = partial(_apply_affine_kernel, V=V, idxC=idxC,
                   idxD=idxD, idxE=idxE, has=has)
    phi_in = jnp.asarray(np.asarray(phi), jnp.float32)
    inputs = [phi_in, ue, JxW_pad, dphi0_pad]
    in_specs = [
        pl.BlockSpec((Q, K), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((V, K, tile), lambda t: (0, 0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Q, tile), lambda t: (0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, 3, tile), lambda t: (0, 0, t),
                     memory_space=pltpu.VMEM),
    ]
    if has[0]:
        inputs.append(Cs)
        in_specs.append(pl.BlockSpec(
            (Cs.shape[0], Q, tile), lambda t: (0, 0, t),
            memory_space=pltpu.VMEM))
    if has[1]:
        inputs.append(Ds)
        in_specs.append(pl.BlockSpec(
            (Ds.shape[0], Q, 3, tile), lambda t: (0, 0, 0, t),
            memory_space=pltpu.VMEM))
    if has[2]:
        inputs.append(Es)
        in_specs.append(pl.BlockSpec(
            (Es.shape[0], tile), lambda t: (0, t),
            memory_space=pltpu.VMEM))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((V, K, E_pad), jnp.float32),
            grid=(E_pad // tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((V, K, tile), lambda t: (0, 0, t),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            **kwargs,
        )(*inputs)


def _apply_kernel(*refs, V, idxC, idxD, idxE, has):
    """refs = (phi, ue, jxw, dphi[, cs][, ds][, es], out).

    Compact broadcast-sum form of interpolate + qp_apply: the fully
    unrolled q/k/d chains compile to 500+ Mosaic ops and OOM the remote
    compile helper; keeping q/k as ARRAY axes with broadcast
    multiply-reduce collapses the body to ~100 ops.  Same math to f32
    reassociation (the mixed-precision outer refinement owns the f64
    tolerance, so the converged step is unchanged)."""
    it = iter(refs)
    phi_ref = next(it)
    ue_ref = next(it)
    jxw_ref = next(it)
    dphi_ref = next(it)
    cs_ref = next(it) if has[0] else None
    ds_ref = next(it) if has[1] else None
    es_ref = next(it) if has[2] else None
    out_ref = next(it)
    with jax.enable_x64(False):
        ue = ue_ref[:]                       # (V, K, T)
        dphi = dphi_ref[:]                   # (Q, K, 3, T)
        jxw = jxw_ref[:]                     # (Q, T)
        phi_a = phi_ref[:]                   # (Q, K)
        # interp: x_qp (V, Q, T); gx_qp (V, Q, 3, T)
        x_qp = (phi_a[None, :, :, None] * ue[:, None, :, :]).sum(axis=2)
        gx_qp = (dphi[None] * ue[:, None, :, None, :]).sum(axis=2)
        # responses: A_coef (V, Q, T) mass; B_coef (V, Q, 3, T) flux.
        # Accumulate per-v in Python lists and stack — .at[v].add lowers
        # to a scatter-add primitive Mosaic cannot lower, even for a
        # static v
        accA = [None] * V
        for i, (v, w) in enumerate(idxC):
            t = cs_ref[i] * x_qp[w]
            accA[v] = t if accA[v] is None else accA[v] + t
        zA = jnp.zeros(x_qp.shape[1:], jnp.float32)
        A_coef = jnp.stack([a if a is not None else zA for a in accA])
        accB = [None] * V
        for i, (v, w) in enumerate(idxD):
            t = ds_ref[i] * x_qp[w][:, None, :]
            accB[v] = t if accB[v] is None else accB[v] + t
        for i, (v, w) in enumerate(idxE):
            t = es_ref[i][:, None, :] * gx_qp[w]
            accB[v] = t if accB[v] is None else accB[v] + t
        zB = jnp.zeros(gx_qp.shape[1:], jnp.float32)
        B_coef = jnp.stack([b if b is not None else zB for b in accB])
        # project back with test functions: Ye (V, K, T)
        Aj = A_coef * jxw[None, :, :]
        Bj = B_coef * jxw[None, :, None, :]
        out_ref[:] = (
            (phi_a[None, :, :, None] * Aj[:, :, None, :]).sum(axis=1)
            + (dphi[None] * Bj[:, :, None, :, :]).sum(axis=(1, 3))
        )


def qp_apply_fused(wfb_stacks, phi, JxW_pad, dphi_pad, ue,
                   interpret=False):
    """ue (V, K, E_pad) f32 -> Ye (V, K, E_pad) f32.

    wfb_stacks: output of stack_blocks (f32 planes, E_pad-padded);
    JxW_pad (Q, E_pad); dphi_pad (Q, K, 3, E_pad)."""
    (idxC, Cs), (idxD, Ds), (idxE, Es) = wfb_stacks
    V, K, E_pad = ue.shape
    Q = JxW_pad.shape[0]
    # HEX8 grids can have E_pad = A*2048 with odd A; fall back to the
    # largest power-of-two tile that divides E_pad
    tile = TILE_E
    while E_pad % tile:
        tile //= 2
    assert tile >= 512, (E_pad, tile)
    has = (Cs is not None, Ds is not None, Es is not None)
    kern = partial(_apply_kernel, V=V, idxC=idxC,
                   idxD=idxD, idxE=idxE, has=has)
    phi_in = jnp.asarray(np.asarray(phi), jnp.float32)
    inputs = [phi_in, ue, JxW_pad, dphi_pad]
    in_specs = [
        pl.BlockSpec((Q, K), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((V, K, tile), lambda t: (0, 0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Q, tile), lambda t: (0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Q, K, 3, tile), lambda t: (0, 0, 0, t),
                     memory_space=pltpu.VMEM),
    ]
    if has[0]:
        inputs.append(Cs)
        in_specs.append(pl.BlockSpec(
            (Cs.shape[0], Q, tile), lambda t: (0, 0, t),
            memory_space=pltpu.VMEM))
    if has[1]:
        inputs.append(Ds)
        in_specs.append(pl.BlockSpec(
            (Ds.shape[0], Q, 3, tile), lambda t: (0, 0, 0, t),
            memory_space=pltpu.VMEM))
    if has[2]:
        inputs.append(Es)
        in_specs.append(pl.BlockSpec(
            (Es.shape[0], Q, tile), lambda t: (0, 0, t),
            memory_space=pltpu.VMEM))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((V, K, E_pad), jnp.float32),
            grid=(E_pad // tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((V, K, tile), lambda t: (0, 0, t),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            **kwargs,
        )(*inputs)
