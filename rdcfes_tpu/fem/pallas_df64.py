"""Paired-f32 (double-f32, "df64") Pallas kernels for the f64 build path.

PERF.md §8-9 measured the PIHNA step's coefficient build paying ~11 ms of
XLA-f64 emulation tax on a chip with no f64 hardware, and staged this
lever: carry the build arithmetic as (hi, lo) f32 pairs — the same
numerical class the Beneš transport kernels already use for f64 payloads
(fem/pallas_perm.py) — through hand-written VPU kernels.

Why kernels and not plain XLA ops: XLA's algebraic simplifier treats the
float graph as real arithmetic and COLLAPSES compensated summation — a
TwoSum/Dekker network written as jnp ops folds to a single f32 multiply-
add chain (measured: a 4-term compensated MAC chain compiled to
`c0*x0 + c1*x1` verbatim, error 1e-8 instead of 4e-15; probe:
scripts/probe_df64.py, 2026-08-20).  Mosaic compiles the kernel body
IEEE-strictly, so the compensation survives there — validated on
hardware by scripts/probe_df64_kernel.py before anything here shipped.

Accuracy class: products are exact via Veltkamp/Dekker splitting (no FMA
assumed); accumulation uses TwoSum on the dominant chain with sloppy
low-order adds.  Worst-case relative error per MAC chain is ~2^-45,
versus f64's 2^-53 — three decades inside the 1e-8/step parity contract
(PARITY.md), and validated against the XLA-f64 build by
test_pallas_df64.py at 1e-11 relative.

Reference parity note: these kernels compute the same interpolation
sums as src/rdc_system.C's interpolate-at-qp loops (SURVEY.md §2.3),
reassociated; the f64 XLA path (fem/assembly.py) remains the default
everywhere except the TPU fast path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_E = 4096
_SPLITTER = 4097.0  # 2^12 + 1: Veltkamp splitter for f32 (24-bit mantissa)


# ---------------------------------------------------------------------------
# double-f32 primitives (ONLY valid inside a Pallas kernel body — at the
# XLA graph level the simplifier folds the compensation away; see module
# docstring)
# ---------------------------------------------------------------------------

def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (6 ops)."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _split(x):
    """Veltkamp split of f32 into 12+12 mantissa halves (4 ops)."""
    t = jnp.float32(_SPLITTER) * x
    h = t - (t - x)
    return h, x - h


def _mul_dd(a, b, a_sp=None, b_sp=None):
    """(ah+al)*(bh+bl) -> (ph, pl) with the dominant product exact via
    Dekker and the cross terms in plain f32 (they land at ~2^-48 of the
    result).  `a_sp`/`b_sp`: precomputed Veltkamp splits of ah/bh."""
    ah, al = a
    bh, bl = b
    ahh, ahl = a_sp if a_sp is not None else _split(ah)
    bhh, bhl = b_sp if b_sp is not None else _split(bh)
    p = ah * bh
    e = ((ahh * bhh - p) + ahh * bhl + ahl * bhh) + ahl * bhl
    e = e + (ah * bl + al * bh)
    return p, e


def _add_dd(a, b):
    """(ah+al)+(bh+bl) -> pair; TwoSum on the dominant terms, sloppy
    low-order add (8 ops)."""
    s, e = _two_sum(a[0], b[0])
    return s, e + (a[1] + b[1])


def split_f64(x):
    """XLA-level split of an f64 array into an (hi, lo) f32 pair.
    Exact: lo = fl32(x - fl64(hi))."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def join_f64(hi, lo):
    """XLA-level join of an (hi, lo) pair back to f64."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def _const_pair(c):
    """Host-side split of an f64 scalar constant into an f32 pair."""
    hi = np.float32(c)
    return float(hi), float(np.float32(np.float64(c) - np.float64(hi)))


# ---------------------------------------------------------------------------
# affine interpolation kernel: ue pair -> (u_qp, gx) pairs
# ---------------------------------------------------------------------------

def _interp_affine_kernel(ueh_ref, uel_ref, dph_ref, dpl_ref,
                          uqh_ref, uql_ref, gxh_ref, gxl_ref,
                          *, phi_pairs, V, Q, K):
    """u_qp[v,q] = sum_k phi[q,k] * ue[v,k]   (phi: exact host constants)
    gx[v,d]   = sum_k dphi0[k,d] * ue[v,k]  (dphi0: per-element pair)

    All arithmetic in paired f32; ue hi-planes Veltkamp-split once and
    reused by every (q, d)."""
    with jax.enable_x64(False):
        ueh = ueh_ref[:]            # (V, K, T)
        uel = uel_ref[:]
        dph = dph_ref[:]            # (K, 3, T)
        dpl = dpl_ref[:]
        ue_sp = [[_split(ueh[v, k]) for k in range(K)] for v in range(V)]
        dp_sp = [[_split(dph[k, d]) for d in range(3)] for k in range(K)]
        for v in range(V):
            for q in range(Q):
                acc = None
                for k in range(K):
                    ch, cl, chh, chl = phi_pairs[q][k]
                    c = (jnp.float32(ch), jnp.float32(cl))
                    c_sp = (jnp.float32(chh), jnp.float32(chl))
                    p = _mul_dd(c, (ueh[v, k], uel[v, k]),
                                a_sp=c_sp, b_sp=ue_sp[v][k])
                    acc = p if acc is None else _add_dd(acc, p)
                uqh_ref[v, q] = acc[0]
                uql_ref[v, q] = acc[1]
            for d in range(3):
                acc = None
                for k in range(K):
                    p = _mul_dd((dph[k, d], dpl[k, d]),
                                (ueh[v, k], uel[v, k]),
                                a_sp=dp_sp[k][d], b_sp=ue_sp[v][k])
                    acc = p if acc is None else _add_dd(acc, p)
                gxh_ref[v, d] = acc[0]
                gxl_ref[v, d] = acc[1]


def _phi_pairs_host(phi_host):
    """Host-side table of (hi, lo, hi_high, hi_low) constant splits."""
    Q, K = phi_host.shape
    out = []
    for q in range(Q):
        row = []
        for k in range(K):
            ch, cl = _const_pair(phi_host[q, k])
            hsp = np.float32(np.float32(_SPLITTER) * np.float32(ch))
            chh = np.float32(hsp - np.float32(hsp - np.float32(ch)))
            chl = np.float32(np.float32(ch) - chh)
            row.append((ch, cl, float(chh), float(chl)))
        out.append(tuple(row))
    return tuple(out)


# ---------------------------------------------------------------------------
# affine rhs kernel: weak-form A/B coefficient pairs -> Fe pairs
# ---------------------------------------------------------------------------

def _rhs_affine_kernel(jh_ref, jl_ref, dph_ref, dpl_ref,
                       ah_ref, al_ref, bh_ref, bl_ref,
                       feh_ref, fel_ref,
                       *, phi_pairs, idxA, idxB, V, Q, K):
    """Fe[v,k] = sum_q (JxW[q]*phi[q,k]) * A[v,q]
               + sum_d dphi0[k,d] * (sum_q JxW[q]*B[v,q,d])
    — block_rhs_affine (fem/weakform.py) in paired-f32 arithmetic.
    idxA/idxB: live rows of A (nA, Q, T) / B (nB, Q, 3, T) stacks."""
    with jax.enable_x64(False):
        jh = jh_ref[:]                    # (Q, T)
        jl = jl_ref[:]
        dph = dph_ref[:]                  # (K, 3, T)
        dpl = dpl_ref[:]
        j_sp = [_split(jh[q]) for q in range(Q)]
        dp_sp = [[_split(dph[k, d]) for d in range(3)] for k in range(K)]
        # JxW[q] * phi[q, k] as pairs, hoisted out of the row loops
        jphi = [[None] * K for _ in range(Q)]
        jphi_sp = [[None] * K for _ in range(Q)]
        for q in range(Q):
            for k in range(K):
                ch, cl, chh, chl = phi_pairs[q][k]
                p = _mul_dd((jh[q], jl[q]),
                            (jnp.float32(ch), jnp.float32(cl)),
                            a_sp=j_sp[q],
                            b_sp=(jnp.float32(chh), jnp.float32(chl)))
                jphi[q][k] = p
                jphi_sp[q][k] = _split(p[0])
        ah = ah_ref[:] if ah_ref is not None else None  # (nA, Q, T)
        al = al_ref[:] if al_ref is not None else None
        bh = bh_ref[:] if bh_ref is not None else None  # (nB, Q, 3, T)
        bl = bl_ref[:] if bl_ref is not None else None
        a_sp = {}
        for i, v in enumerate(idxA):
            for q in range(Q):
                a_sp[(i, q)] = _split(ah[i, q])
        # Bsum[v, d] = sum_q JxW[q] * B[v, q, d]
        bsum = {}
        bsum_sp = {}
        for i, v in enumerate(idxB):
            for d in range(3):
                acc = None
                for q in range(Q):
                    p = _mul_dd((jh[q], jl[q]), (bh[i, q, d], bl[i, q, d]),
                                a_sp=j_sp[q])
                    acc = p if acc is None else _add_dd(acc, p)
                bsum[(i, d)] = acc
                bsum_sp[(i, d)] = _split(acc[0])
        liveA = {v: i for i, v in enumerate(idxA)}
        liveB = {v: i for i, v in enumerate(idxB)}
        zero = jnp.zeros(jh.shape[1:], jnp.float32)
        for v in range(V):
            for k in range(K):
                acc = None
                if v in liveA:
                    i = liveA[v]
                    for q in range(Q):
                        p = _mul_dd(jphi[q][k], (ah[i, q], al[i, q]),
                                    a_sp=jphi_sp[q][k], b_sp=a_sp[(i, q)])
                        acc = p if acc is None else _add_dd(acc, p)
                if v in liveB:
                    i = liveB[v]
                    for d in range(3):
                        p = _mul_dd((dph[k, d], dpl[k, d]), bsum[(i, d)],
                                    a_sp=dp_sp[k][d], b_sp=bsum_sp[(i, d)])
                        acc = p if acc is None else _add_dd(acc, p)
                if acc is None:
                    feh_ref[v, k] = zero
                    fel_ref[v, k] = zero
                else:
                    feh_ref[v, k] = acc[0]
                    fel_ref[v, k] = acc[1]


def rhs_affine_df64(wfb, phi_host, jxw_pair, dphi0_pair, interpret=False):
    """block_rhs_affine on paired-f32 coefficients.

    wfb: WeakFormBlocks with f64 A (per-var (Q, E_pad) or zero) and B
    (per-var (Q, 3, E_pad) or zero) — split here at the XLA level;
    jxw_pair/dphi0_pair: precomputed step-invariant geometry pairs.
    Returns (Feh, Fel) each (V, K, E_pad)."""
    from .weakform import _is_zero

    jh, jl = jxw_pair
    dph, dpl = dphi0_pair
    Q, E_pad = jh.shape
    K = dph.shape[0]
    V = wfb.n_vars
    idxA, As = [], []
    idxB, Bs = [], []
    for v in range(V):
        if not _is_zero(wfb.A[v]):
            idxA.append(v)
            As.append(wfb.A[v])
        if not _is_zero(wfb.B[v]):
            idxB.append(v)
            Bs.append(wfb.B[v])
    def padE(a):
        # coefficient blocks arrive at the live element count E; the
        # kernel runs at the tile-aligned E_pad — pad AFTER the split
        # (two f32 zero-pads beat one emulated-f64 pad); zero tail
        # lanes produce exactly-zero Fe there (JxW pads are zero too)
        if a.shape[-1] == E_pad:
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1)
                       + [(0, E_pad - a.shape[-1])])

    ah = al = bh = bl = None
    ins = [jh, jl, dph, dpl]
    if As:
        ah, al = (padE(x) for x in split_f64(jnp.stack(As)))
        ins += [ah, al]
    if Bs:
        bh, bl = (padE(x) for x in split_f64(jnp.stack(Bs)))
        ins += [bh, bl]
    tile = TILE_E
    while E_pad % tile:
        tile //= 2
    phi_pairs = _phi_pairs_host(np.asarray(phi_host))

    def kern(*refs):
        it = iter(refs)
        jh_r, jl_r, dph_r, dpl_r = next(it), next(it), next(it), next(it)
        ah_r = next(it) if As else None
        al_r = next(it) if As else None
        bh_r = next(it) if Bs else None
        bl_r = next(it) if Bs else None
        feh_r, fel_r = next(it), next(it)
        _rhs_affine_kernel(jh_r, jl_r, dph_r, dpl_r, ah_r, al_r,
                           bh_r, bl_r, feh_r, fel_r,
                           phi_pairs=phi_pairs, idxA=tuple(idxA),
                           idxB=tuple(idxB), V=V, Q=Q, K=K)

    qspec = pl.BlockSpec((Q, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM)
    k3spec = pl.BlockSpec((K, 3, tile), lambda t: (0, 0, t),
                          memory_space=pltpu.VMEM)
    in_specs = [qspec, qspec, k3spec, k3spec]
    if As:
        in_specs += [pl.BlockSpec((len(As), Q, tile), lambda t: (0, 0, t),
                                  memory_space=pltpu.VMEM)] * 2
    if Bs:
        in_specs += [pl.BlockSpec((len(Bs), Q, 3, tile),
                                  lambda t: (0, 0, 0, t),
                                  memory_space=pltpu.VMEM)] * 2
    vkspec = pl.BlockSpec((V, K, tile), lambda t: (0, 0, t),
                          memory_space=pltpu.VMEM)
    f32 = jnp.float32
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    with jax.enable_x64(False):
        feh, fel = pl.pallas_call(
            kern,
            grid=(E_pad // tile,),
            in_specs=in_specs,
            out_specs=(vkspec, vkspec),
            out_shape=(
                jax.ShapeDtypeStruct((V, K, E_pad), f32),
                jax.ShapeDtypeStruct((V, K, E_pad), f32),
            ),
            interpret=interpret,
            **kwargs,
        )(*ins)
    return feh, fel


def interp_affine_df64(ue_pair, phi_host, dphi0_pair, interpret=False):
    """interpolate_ue_affine (fem/assembly.py) on (hi, lo) f32 pairs.

    ue_pair: (ueh, uel) each (V, K, E_pad); phi_host: (Q, K) ndarray of
    f64 host constants; dphi0_pair: (dph, dpl) each (K, 3, E_pad).
    Returns ((uqh, uql) (V, Q, E_pad), (gxh, gxl) (V, 3, E_pad))."""
    ueh, uel = ue_pair
    dph, dpl = dphi0_pair
    V, K, E_pad = ueh.shape
    Q = phi_host.shape[0]
    tile = TILE_E
    while E_pad % tile:
        tile //= 2
    phi_pairs = _phi_pairs_host(np.asarray(phi_host))

    kern = partial(_interp_affine_kernel, phi_pairs=phi_pairs,
                   V=V, Q=Q, K=K)
    vkspec = pl.BlockSpec((V, K, tile), lambda t: (0, 0, t),
                          memory_space=pltpu.VMEM)
    k3spec = pl.BlockSpec((K, 3, tile), lambda t: (0, 0, t),
                          memory_space=pltpu.VMEM)
    uqspec = pl.BlockSpec((V, Q, tile), lambda t: (0, 0, t),
                          memory_space=pltpu.VMEM)
    gxspec = pl.BlockSpec((V, 3, tile), lambda t: (0, 0, t),
                          memory_space=pltpu.VMEM)
    f32 = jnp.float32
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    # x64 disabled at trace time: index-map literals otherwise become
    # i64 constants Mosaic cannot legalize (same workaround as
    # pallas_apply.py)
    with jax.enable_x64(False):
        uqh, uql, gxh, gxl = pl.pallas_call(
            kern,
            grid=(E_pad // tile,),
            in_specs=[vkspec, vkspec, k3spec, k3spec],
            out_specs=(uqspec, uqspec, gxspec, gxspec),
            out_shape=(
                jax.ShapeDtypeStruct((V, Q, E_pad), f32),
                jax.ShapeDtypeStruct((V, Q, E_pad), f32),
                jax.ShapeDtypeStruct((V, 3, E_pad), f32),
                jax.ShapeDtypeStruct((V, 3, E_pad), f32),
            ),
            interpret=interpret,
            **kwargs,
        )(ueh, uel, dph, dpl)
    return (uqh, uql), (gxh, gxl)
