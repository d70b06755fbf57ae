"""Fast-gather plans: FEM corner gather / restriction as grid bijections.

Builds the two Beneš permutation plans (fem/benes.py) that replace the
XLA gathers of the matrix-free qp matvec (systems/transient.py):

  P_fwd : ue[k, e] = x[conn[k, e]]
          source grid = the C_x-fold broadcast of the padded nodal vector
          (rows r hold x-row r mod NR — free in VMEM), target grid = the
          k-major corner-slot layout (K, E_pad).
  P_rev : g[c, n] = ye[k, e] for the c-th incidence of node n; the
          restriction is then a plain sum over c (scatter-free, no
          gather at all).

Both are bijections of one (A, 128, 128) grid with
T = A*16384 = C_x * N_pad:  C_x >= max node degree, chosen so the
broadcast tiling divides evenly and the corner layout fits
(E_pad = T/K >= E).  Pad slots route pads -> pads; the ye pad region is
zero-filled by the caller so padded restrict targets contribute zeros.

Replaces the gather under the reference's PETSc SpMV (src/pihna.C:80).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .benes import GridPermPlan, build_grid_permutation


class FastGatherPlans(NamedTuple):
    A: int
    C_x: int          # broadcast factor / incidence rows
    NR: int           # padded nodal rows (N_pad = NR * 128)
    E_pad: int        # corner slots per k-plane (T / K)
    K: int
    N: int
    E: int
    fwd: GridPermPlan
    rev: GridPermPlan


def _plan_cache_path(conn: np.ndarray, n_nodes: int):
    import hashlib
    import os

    h = hashlib.sha1()
    h.update(b"grid-v2:")  # plan-layout version (grid-size search)
    h.update(np.ascontiguousarray(conn).tobytes())
    h.update(str(n_nodes).encode())
    d = os.environ.get("RDCFES_PLAN_CACHE",
                       os.path.expanduser("~/.cache/rdcfes_tpu"))
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"benes_{h.hexdigest()[:16]}.npz")


def build_fast_plans(conn: np.ndarray, n_nodes: int,
                     cache: bool = True) -> FastGatherPlans:
    conn = np.asarray(conn)
    if cache:
        import os

        path = _plan_cache_path(conn, n_nodes)
        if os.path.exists(path):
            z = np.load(path)
            mk = lambda pre: GridPermPlan(
                A=int(z[pre + "A"]), B=int(z[pre + "B"]),
                L=int(z[pre + "L"]), AP=int(z[pre + "AP"]),
                iL1=z[pre + "iL1"], iB1=z[pre + "iB1"],
                jA1=z[pre + "jA1"], rA=z[pre + "rA"],
                jA2=z[pre + "jA2"], iB2=z[pre + "iB2"],
                iL2=z[pre + "iL2"])
            return FastGatherPlans(
                A=int(z["A"]), C_x=int(z["C_x"]), NR=int(z["NR"]),
                E_pad=int(z["E_pad"]), K=int(z["K"]), N=int(z["N"]),
                E=int(z["E"]), fwd=mk("f_"), rev=mk("r_"))
        plans = build_fast_plans(conn, n_nodes, cache=False)
        flat = {"A": plans.A, "C_x": plans.C_x, "NR": plans.NR,
                "E_pad": plans.E_pad, "K": plans.K, "N": plans.N,
                "E": plans.E}
        for pre, pl_ in (("f_", plans.fwd), ("r_", plans.rev)):
            for f in pl_._fields:
                flat[pre + f] = getattr(pl_, f)
        np.savez_compressed(path, **flat)
        return plans
    E, K = conn.shape
    N = n_nodes
    deg = np.bincount(conn.reshape(-1), minlength=N)
    C = max(int(deg.max()), 1)
    # Grid-size search: the kernels move (and the fused apply streams)
    # T = C_x * N_pad = A*16384 slots per channel, so minimize T subject
    # to  C_x >= max degree,  (C_x * NR) % 128 == 0  (integral A)  and
    # T/K >= E.  Padding the nodal rows NR ABOVE ceil(N/128) is often a
    # big win: ceil(24389/128) = 191 is coprime with 128 and forces
    # C_x = 128 (T = 3.13 M, 5.9x the work), while NR = 192 admits
    # C_x = max degree rounded up (T ~ 0.7 M at bench scale).
    from math import gcd

    NR0 = -(-N // 128)
    best = None
    for NRp in range(NR0, NR0 + 129):
        m = 128 // gcd(NRp, 128)          # C_x must be a multiple of m
        c = -(-C // m) * m
        while (c * NRp * 128) // K < E or (c * NRp * 128) % K:
            c += m
        T_try = c * NRp * 128
        if best is None or T_try < best[0]:
            best = (T_try, c, NRp)
    T, C_x, NR = best
    A = (C_x * NR) // 128
    E_pad = T // K
    N_pad = NR * 128

    # incidence ranks: c_of[k*E + e] = rank of (k, e) among the incidences
    # of node conn[e, k] (stable k-major order — same enumeration for both
    # plans, and c_of < deg <= C_x everywhere)
    flat_nodes = conn.T.reshape(-1).astype(np.int64)  # k-major
    order = np.argsort(flat_nodes, kind="stable")
    counts = np.bincount(flat_nodes, minlength=N)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    c_of = np.empty(K * E, dtype=np.int64)
    c_of[order] = np.arange(K * E) - starts[flat_nodes[order]]

    ks = np.repeat(np.arange(K, dtype=np.int64), E)
    es = np.tile(np.arange(E, dtype=np.int64), K)
    dst_slots = ks * E_pad + es                 # corner-slot grid ids
    src_slots = c_of * N_pad + flat_nodes      # broadcast grid ids

    def bijection(dst_real, src_real):
        p = np.full(T, -1, dtype=np.int64)
        p[dst_real] = src_real
        used_src = np.zeros(T, dtype=bool)
        used_src[src_real] = True
        free_dst = np.nonzero(p < 0)[0]
        free_src = np.nonzero(~used_src)[0]
        p[free_dst] = free_src
        return p

    fwd = build_grid_permutation(bijection(dst_slots, src_slots), A)
    rev = build_grid_permutation(bijection(src_slots, dst_slots), A)
    return FastGatherPlans(A=A, C_x=C_x, NR=NR, E_pad=E_pad, K=K, N=N,
                           E=E, fwd=fwd, rev=rev)
