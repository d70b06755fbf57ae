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

from .assembly import interpolate_ue
from .weakform import WeakFormBlocks, _is_zero, qp_apply

TILE_E = 4096


def stack_blocks(wfb: WeakFormBlocks, E_pad: int):
    """Split a block-sparse weak form into stacked live planes + static
    index lists (trace-time; the stacks are step-invariant and hoisted
    out of the Krylov loop by XLA)."""
    V = wfb.n_vars

    def pad(a):
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


def _apply_kernel(*refs, phi, V, idxC, idxD, idxE, has):
    """refs = (ue, jxw, dphi[, cs][, ds][, es], out)."""
    it = iter(refs)
    ue_ref = next(it)
    jxw_ref = next(it)
    dphi_ref = next(it)
    cs_ref = next(it) if has[0] else None
    ds_ref = next(it) if has[1] else None
    es_ref = next(it) if has[2] else None
    out_ref = next(it)
    with jax.enable_x64(False):
        x_qp, gx_qp = interpolate_ue(ue_ref[:], phi, dphi_ref[:])
        zero = 0.0
        C = [[zero] * V for _ in range(V)]
        D = [[zero] * V for _ in range(V)]
        E = [[zero] * V for _ in range(V)]
        for i, (v, w) in enumerate(idxC):
            C[v][w] = cs_ref[i]
        for i, (v, w) in enumerate(idxD):
            D[v][w] = ds_ref[i]
        for i, (v, w) in enumerate(idxE):
            E[v][w] = es_ref[i]
        wfb_t = WeakFormBlocks(
            A=(zero,) * V, B=(zero,) * V,
            C=tuple(tuple(r) for r in C),
            D=tuple(tuple(r) for r in D),
            E=tuple(tuple(r) for r in E),
        )
        out_ref[:] = qp_apply(wfb_t, phi, jxw_ref[:], dphi_ref[:],
                              x_qp, gx_qp)


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
    kern = partial(_apply_kernel, phi=np.asarray(phi), V=V, idxC=idxC,
                   idxD=idxD, idxE=idxE, has=has)
    inputs = [ue, JxW_pad, dphi_pad]
    in_specs = [
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
