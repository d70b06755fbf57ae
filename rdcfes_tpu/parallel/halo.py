"""Scalable multi-chip solve: node-partitioned Krylov + ppermute halo exchange.

TPU-native equivalent of the reference's *scalable* MPI pipeline — libMesh
ghost-node sync + PETSc VecScatter under every `model.solve()`
(reference src/pihna.C:80; SURVEY.md section 2.2.3-4) — replacing the
round-1 replicated-iterate design (parallel/sharding.py), which psummed the
full (V, N_global) nodal vector per matvec and could not scale.

Layout (built host-side once, in HaloPlan):

  * elements are partitioned by RECURSIVE COORDINATE BISECTION on centroids
    (native meshkit_partition_rcb, the libMesh/METIS analogue) and
    renumbered shard-contiguous, padded to equal blocks;
  * each node is OWNED by the shard touching it most; nodes are renumbered
    owner-contiguous, so every shard holds a dense (V, No_max) slab of the
    distributed solution — per-device memory scales as N/D;
  * each shard's elements reference mostly owned nodes plus a small GHOST
    set on the shard boundary.  Ghosts are grouped by owner into static
    per-offset exchange classes: one `lax.ppermute` per offset delta moves
    exactly the boundary values (the VecScatter-forward), and the transpose
    ppermute returns boundary partial sums to their owners after each
    element apply (the VecScatter-reverse / ADD_VALUES).  Payload per
    matvec is O(boundary), not O(N).
  * dot products are local dots + scalar `psum` — the only O(1) collectives
    in the Krylov loop.

Everything else (element kernels, gather-based restriction, block-Jacobi,
BiCGStab recurrence with breakdown freezes) matches the single-chip design
(systems/transient.py, solvers/krylov.py) so the converged answer is
tolerance-identical.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..fem.assembly import (interpolate_at_qp, interpolate_ue,
                            interpolate_ue_affine)
from ..fem.geometry import geometry_factors
from ..fem.weakform import (
    block_diag,
    block_diag_affine,
    block_rhs,
    block_rhs_affine,
    diffusion_presum,
    element_matrices,
    element_vectors,
    qp_apply,
    qp_apply_affine,
)
from ..mesh.core import Mesh
from ..native import partition_rcb
from ..solvers.krylov import DEFAULT_MAXITER, DEFAULT_RTOL, small_block_inverse
from ..systems.transient import clamp_nonnegative


@dataclass
class HaloPlan:
    """Host-built partition + exchange tables for a D-shard halo solve.

    All (D, ...) tables are stacked per-shard and device_put with the
    leading axis sharded, so each device holds only its own rows."""

    D: int
    n_nodes: int
    n_elems: int
    No_max: int                      # padded owned-node count per shard
    Eb: int                          # padded element count per shard
    Gtot: int                        # total ghost slots (sum over deltas)
    deltas: Tuple[int, ...]          # static ppermute offset classes
    seg_sizes: Tuple[int, ...]       # ghost-segment width per delta
    owned_counts: np.ndarray         # (D,) real owned nodes per shard
    elem_counts: np.ndarray          # (D,) real elements per shard
    node_order: np.ndarray           # new-from-old node permutation (N,)
    node_rank: np.ndarray            # old-from-new inverse (N,)
    node_start: np.ndarray           # (D+1,) owned ranges in renumbered ids
    elem_order: np.ndarray           # new-from-old element permutation (E,)
    conn_local: np.ndarray           # (D, K, Eb) local-slot connectivity
    node_gather: np.ndarray          # (D, C, No_max + Gtot) restriction
    send_idx: List[np.ndarray]       # per delta: (D, S_d) sender local slots
    rev_gather: np.ndarray           # (D, Cr, No_max) reverse-add table
    # hanging-node constraint tables (u_h = (u_a+u_b)/2): per-shard rows
    # [h, a, b] in LOCAL (owned+ghost) slots for every h VISIBLE on the
    # shard, pad = Nloc (out-of-bounds: gathers clamp to discarded values,
    # scatters drop).  hang_mask zeroes OWNED hanging slots (the reduced-
    # space iterate).  has_cons is the static trace-time switch.
    has_cons: bool = False
    cons_all: Optional[np.ndarray] = None    # (D, 3, Hmax)
    hang_mask: Optional[np.ndarray] = None   # (D, No_max)

    @staticmethod
    def build(mesh: Mesh, D: int,
              constraints: Optional[np.ndarray] = None) -> "HaloPlan":
        conn = np.asarray(mesh.connectivity)
        E, K = conn.shape
        N = mesh.n_nodes

        # ---- element partition: RCB on centroids -------------------------
        centers = mesh.coords[conn].mean(axis=1)
        part = partition_rcb(np.asarray(centers, dtype=np.float64), D)
        elem_order = np.argsort(part, kind="stable")
        part_sorted = part[elem_order]
        e_counts = np.bincount(part, minlength=D)
        Eb = int(e_counts.max()) if E else 1
        e_starts = np.concatenate([[0], np.cumsum(e_counts)])

        # ---- node ownership: majority vote of touching shards ------------
        votes = np.zeros((N, D), dtype=np.int32)
        np.add.at(votes, (conn.reshape(-1),
                          np.repeat(part, K)), 1)
        owner = votes.argmax(axis=1).astype(np.int32)
        # renumber nodes owner-contiguous (stable keeps original order)
        node_order = np.argsort(owner, kind="stable")
        node_rank = np.empty(N, dtype=np.int64)
        node_rank[node_order] = np.arange(N)
        owned_counts = np.bincount(owner, minlength=D)
        No_max = int(owned_counts.max())
        node_start = np.concatenate([[0], np.cumsum(owned_counts)])

        conn_new = node_rank[conn]          # renumbered-global node ids
        conn_sorted = conn_new[elem_order]  # elements in shard order

        # ---- per-shard ghost sets, grouped by owner -----------------------
        # pair_nodes[(src, dst)] = ascending renumbered ids owned by src
        # that dst's elements reference (the exchange contract: both sides
        # derive identical buffer orderings from this sorted list)
        # constraints arrive in ORIGINAL node ids; renumber
        cons_r = None
        if constraints is not None and len(constraints):
            cons_r = node_rank[np.asarray(constraints, dtype=np.int64)]

        ghost_by_pair: Dict[Tuple[int, int], np.ndarray] = {}
        shard_nodes: List[np.ndarray] = []
        for s in range(D):
            used = np.unique(conn_sorted[e_starts[s]:e_starts[s + 1]])
            if cons_r is not None:
                # constraint closure: wherever a hanging node h is
                # visible, its endpoints a, b must be too (the local
                # C-apply and C^T-fold read/write them).  One level
                # suffices — endpoints are always master dofs.
                sel = np.isin(cons_r[:, 0], used)
                if sel.any():
                    used = np.union1d(used,
                                      np.unique(cons_r[sel, 1:3]))
            shard_nodes.append(used)
            lo, hi = node_start[s], node_start[s + 1]
            ghosts = used[(used < lo) | (used >= hi)]
            if len(ghosts):
                g_owner = np.searchsorted(node_start, ghosts, side="right") - 1
                for t in np.unique(g_owner):
                    ghost_by_pair[(int(t), s)] = ghosts[g_owner == t]

        deltas = sorted({(dst - src) % D for (src, dst) in ghost_by_pair})
        seg_sizes = []
        send_idx = []
        for d in deltas:
            S = max(
                (len(v) for (src, dst), v in ghost_by_pair.items()
                 if (dst - src) % D == d), default=1,
            )
            seg_sizes.append(S)
            tbl = np.zeros((D, S), dtype=np.int32)  # pad -> slot 0 (unused)
            for src in range(D):
                dst = (src + d) % D
                ids = ghost_by_pair.get((src, dst))
                if ids is not None:
                    tbl[src, : len(ids)] = ids - node_start[src]
            send_idx.append(tbl)
        Gtot = int(np.sum(seg_sizes)) if seg_sizes else 0
        seg_off = np.concatenate([[0], np.cumsum(seg_sizes)]).astype(int)

        # ---- local connectivity: owned slot or ghost slot -----------------
        Nloc = No_max + Gtot
        conn_local = np.zeros((D, K, Eb), dtype=np.int32)
        ghost_slot_maps: List[Dict[int, int]] = []
        for s in range(D):
            gmap: Dict[int, int] = {}
            for di, d in enumerate(deltas):
                src = (s - d) % D
                ids = ghost_by_pair.get((src, s))
                if ids is not None:
                    base = No_max + seg_off[di]
                    for p, g in enumerate(ids):
                        gmap[int(g)] = base + p
            ghost_slot_maps.append(gmap)
            ce = conn_sorted[e_starts[s]:e_starts[s + 1]]  # (E_s, K)
            lo = node_start[s]
            loc = np.empty_like(ce, dtype=np.int32)
            owned_mask = (ce >= lo) & (ce < node_start[s + 1])
            loc[owned_mask] = (ce[owned_mask] - lo).astype(np.int32)
            if (~owned_mask).any():
                loc[~owned_mask] = np.array(
                    [gmap[int(g)] for g in ce[~owned_mask]], dtype=np.int32
                )
            conn_local[s, :, : len(ce)] = loc.T
            # padded elements keep conn 0 and contribute only via zeroed JxW

        # ---- constraint tables in local slots ------------------------------
        # the closure above guarantees a, b have local slots wherever h
        # does, so the shard programs apply C on ghost-filled vectors and
        # fold C^T on local partial sums with no extra communication
        has_cons = cons_r is not None
        cons_all = None
        hang_mask = None
        if has_cons:
            rows_per_shard: List[List[Tuple[int, int, int]]] = []
            for s in range(D):
                lo, hi = node_start[s], node_start[s + 1]
                gmap = ghost_slot_maps[s]
                slot = lambda g: int(g) - lo if lo <= g < hi else gmap[int(g)]
                vis = set(int(g) for g in shard_nodes[s])
                rows_per_shard.append(
                    [(slot(h), slot(a), slot(b)) for h, a, b in cons_r
                     if int(h) in vis])
            Hmax = max(max((len(r) for r in rows_per_shard), default=0), 1)
            cons_all = np.full((D, 3, Hmax), Nloc, dtype=np.int32)
            for s, rows in enumerate(rows_per_shard):
                if rows:
                    cons_all[s, :, : len(rows)] = np.asarray(
                        rows, dtype=np.int64).T
            hang_mask = np.ones((D, No_max))
            for s in range(D):
                lo, hi = node_start[s], node_start[s + 1]
                own_h = cons_r[(cons_r[:, 0] >= lo) & (cons_r[:, 0] < hi), 0]
                hang_mask[s, own_h - lo] = 0.0

        # ---- restriction (inverse-connectivity) tables --------------------
        node_gather = _restriction_tables(
            conn_local, e_starts[1:] - e_starts[:-1], Nloc)

        # ---- reverse-add tables -------------------------------------------
        # After the transpose ppermute, shard t holds rcat = concat over
        # deltas of returned partial-sum buffers; owned slot n accumulates
        # rcat positions seg_off[di] + p wherever n sits at position p of
        # t's delta-di send list.  pad = Gtot (appended zero column).
        rev_lists: List[List[List[int]]] = [
            [[] for _ in range(No_max)] for _ in range(D)
        ]
        for di, d in enumerate(deltas):
            for src in range(D):
                ids = ghost_by_pair.get((src, (src + d) % D))
                if ids is None:
                    continue
                for p, g in enumerate(ids):
                    rev_lists[src][g - node_start[src]].append(
                        seg_off[di] + p
                    )
        Cr = max(
            (len(l) for per in rev_lists for l in per), default=0,
        )
        Cr = max(Cr, 1)
        rev_gather = np.full((D, Cr, No_max), Gtot, dtype=np.int32)
        for s in range(D):
            for n, l in enumerate(rev_lists[s]):
                rev_gather[s, : len(l), n] = l

        return HaloPlan(
            D=D, n_nodes=N, n_elems=E, No_max=No_max, Eb=Eb, Gtot=Gtot,
            deltas=tuple(deltas), seg_sizes=tuple(seg_sizes),
            owned_counts=owned_counts, elem_counts=e_counts,
            node_order=node_order,
            node_rank=node_rank, node_start=node_start,
            elem_order=elem_order, conn_local=conn_local,
            node_gather=node_gather, send_idx=send_idx,
            rev_gather=rev_gather,
            has_cons=has_cons, cons_all=cons_all, hang_mask=hang_mask,
        )


def _restriction_tables(conn_local: np.ndarray, elem_counts: np.ndarray,
                        Nloc: int) -> np.ndarray:
    """node_gather[s, c, slot] = flat (k * Eb + e_local) corner index of
    the c-th contribution to local slot, pad = K * Eb (a zero column
    appended by the device program)."""
    D, K, Eb = conn_local.shape
    tables = []
    Cmax = 1
    for s in range(D):
        E_s = int(elem_counts[s])
        flat_targets = conn_local[s].reshape(-1)  # (K * Eb,) k-major
        e_ids = np.tile(np.arange(Eb), K)
        valid = np.nonzero(e_ids < E_s)[0]
        order = valid[np.argsort(flat_targets[valid], kind="stable")]
        tgt = flat_targets[order]
        counts = np.bincount(tgt, minlength=Nloc)
        Cs = int(counts.max()) if len(tgt) else 1
        Cmax = max(Cmax, Cs)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        tbl = np.full((Cs, Nloc), K * Eb, dtype=np.int32)
        pos = np.arange(len(tgt)) - starts[tgt]
        tbl[pos, tgt] = order
        tables.append(tbl)
    node_gather = np.full((D, Cmax, Nloc), K * Eb, dtype=np.int32)
    for s, tbl in enumerate(tables):
        node_gather[s, : tbl.shape[0]] = tbl
    return node_gather


def build_mixed_plan(mesh, D: int, constraints=None):
    """(HaloPlan, per-block host tables) for a MixedMesh.

    The node-side plan (ownership, ghost sets, exchange tables, reverse
    add) is built once over the K_max-padded concatenation of all block
    connectivities — padding repeats each element's corner 0, which adds
    no nodes to any shard's used set, so the exchange contract is
    identical to a per-block derivation.  Element-side tables are then
    split back per block: plan.conn_local's padded corner rows repeat the
    corner-0 slot by construction, so block conn_local is a column
    selection + row truncation of it."""
    from types import SimpleNamespace

    blocks = mesh.blocks
    Kmax = max(b.connectivity.shape[1] for b in blocks)
    conns = []
    block_of = []
    for bi, b in enumerate(blocks):
        c = b.connectivity.astype(np.int64)
        if c.shape[1] < Kmax:
            c = np.concatenate(
                [c, np.repeat(c[:, :1], Kmax - c.shape[1], axis=1)], axis=1)
        conns.append(c)
        block_of.append(np.full(len(c), bi, dtype=np.int64))
    conn_pad = np.concatenate(conns, axis=0)
    block_of = np.concatenate(block_of)
    pseudo = SimpleNamespace(connectivity=conn_pad, n_nodes=mesh.n_nodes,
                             coords=mesh.coords)
    # hanging-node constraints ride the same plan: the closure puts both
    # masters in every shard that sees a hanging node (HaloPlan.build),
    # so the mixed shard step's C / C^T stay communication-free
    plan = HaloPlan.build(pseudo, D, constraints=constraints)

    Nloc = plan.No_max + plan.Gtot
    block_sorted = block_of[plan.elem_order]
    e_starts = np.concatenate([[0], np.cumsum(plan.elem_counts)])
    per_block = []
    for bi, b in enumerate(blocks):
        Kb = b.connectivity.shape[1]
        sel_per_shard = [
            np.nonzero(block_sorted[e_starts[s]:e_starts[s + 1]] == bi)[0]
            for s in range(D)]
        counts_b = np.array([len(x) for x in sel_per_shard])
        Eb_b = max(int(counts_b.max()), 1)
        conn_local_b = np.zeros((D, Kb, Eb_b), dtype=np.int32)
        for s in range(D):
            sel = sel_per_shard[s]
            conn_local_b[s, :, : len(sel)] = plan.conn_local[s][:Kb, sel]
        ng_b = _restriction_tables(conn_local_b, counts_b, Nloc)
        # positions of this block's elements in the shard-sorted concat
        # order, block-local original order (for geometry / field split)
        order_b = np.concatenate(
            [e_starts[s] + sel_per_shard[s] for s in range(D)])
        # renumbered, shard-ordered block connectivity (for geometry)
        conn_sorted_b = plan.node_rank[
            conn_pad[plan.elem_order[order_b]]][:, :Kb]
        per_block.append({
            "elem_type": b.elem_type, "K": Kb, "Eb": Eb_b,
            "counts": counts_b, "conn_local": conn_local_b,
            "node_gather": ng_b, "conn_sorted": conn_sorted_b,
            # concat-order global element ids of this block's elements,
            # in shard order (index into plan.elem_order positions)
            "sorted_concat_idx": order_b,
        })
    return plan, per_block


class HaloExchangeMixin:
    """Shard-program halo-exchange primitives over a HaloPlan (`self.plan`).

    Shared by the transient RDC system below and the multi-chip solid
    (parallel/solid_halo.py) — one implementation of the VecScatter
    forward/reverse contract."""

    def _ghost_fill(self, x, send_tabs):
        """x (V, No_max) -> xg (V, No_max + Gtot) with ghosts filled by one
        ppermute per offset class (VecScatter-forward)."""
        D = self.plan.D
        parts = [x]
        for d, tab in zip(self.plan.deltas, send_tabs):
            buf = x[:, tab[0]]  # (V, S_d) sender-local gather
            buf = lax.ppermute(
                buf, "d", [(i, (i + d) % D) for i in range(D)]
            )
            parts.append(buf)
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else x

    def _c_apply(self, xg, ca):
        """Distribute constraint masters to hanging slots on a ghost-filled
        local vector: xg (V, Nloc) -> xg with x[h] = (x[a] + x[b]) / 2 for
        every locally visible constraint (the C in C^T A C; libMesh's
        hanging-node constraint rows, reference src/pihna.C:752).  Pad rows
        carry out-of-bounds slot Nloc: the scatter drops them."""
        hh, aa, bb = ca[0], ca[1], ca[2]
        return xg.at[..., hh].set(0.5 * (xg[..., aa] + xg[..., bb]),
                                  mode="drop")

    def _cons_fold(self, y_all, ca, w):
        """C^T-fold LOCAL partial sums: y[a] += w*y[h], y[b] += w*y[h],
        y[h] = 0.  Exact under the halo split because C^T is linear and
        each shard folds only its own partials before the reverse-add
        returns them to their owners (w = 0.5 for vectors, 0.25 for the
        block-diagonal's own-row C^T A C contribution)."""
        hh, aa, bb = ca[0], ca[1], ca[2]
        part = w * y_all[..., hh]
        y = y_all.at[..., aa].add(part, mode="drop")
        y = y.at[..., bb].add(part, mode="drop")
        return y.at[..., hh].set(0.0, mode="drop")

    def _reverse_add(self, y_all, rev_gather):
        """Return ghost partial sums to owners (VecScatter-reverse) and add
        into the owned slab.  y_all (V, No_max + Gtot)."""
        plan = self.plan
        y = y_all[:, : plan.No_max]
        if not plan.deltas:
            return y
        D = plan.D
        bufs = []
        off = plan.No_max
        for d, S in zip(plan.deltas, plan.seg_sizes):
            seg = y_all[:, off: off + S]
            off += S
            bufs.append(lax.ppermute(
                seg, "d", [(i, (i - d) % D) for i in range(D)]
            ))
        rcat = jnp.concatenate(
            bufs + [jnp.zeros((y.shape[0], 1), y.dtype)], axis=-1
        )
        rg = rev_gather[0]  # (Cr, No_max)
        acc = rcat[:, rg[0]]
        for c in range(1, rg.shape[0]):
            acc = acc + rcat[:, rg[c]]
        return y + acc


class HaloShardedSystem(HaloExchangeMixin):
    """Distributed linearized-CN transient system (drop-in multi-chip step).

    State is node-partitioned: each device holds a (V, No_max) slab.  Same
    step() semantics as TransientRDCSystem; `gather()` reconstructs the
    global (N, V) solution in the original node order for IO.
    """

    def __init__(
        self,
        mesh: Mesh,
        n_vars: int,
        physics: Callable,
        device_mesh: DeviceMesh,
        clamp: Callable = clamp_nonnegative,
        rtol: float = DEFAULT_RTOL,
        maxiter: int = DEFAULT_MAXITER,
        physics_blocks: Optional[Callable] = None,
        moving_mesh: bool = False,
        constraints: Optional[np.ndarray] = None,
    ):
        self.mesh = mesh
        self.n_vars = n_vars
        self.physics = physics
        # block-sparse physics: when provided and step params are plain
        # Python scalars, the shard program uses the matrix-free qp-apply
        # path (same design as the single-chip production step) — no
        # per-shard element-matrix materialization
        self.physics_blocks = physics_blocks
        self._qp_cache = {}
        self.clamp = clamp
        self.rtol = rtol
        self.maxiter = maxiter
        self.dmesh = device_mesh
        D = int(device_mesh.devices.size)
        shard_last = lambda spec: NamedSharding(device_mesh, spec)
        self._mixed = None
        if getattr(mesh, "elem_type", None) == "MIXED":
            # mixed-element meshes: one exchange plan over the padded
            # concatenation of all blocks, per-type element tables, the
            # dense shard step summing block restrictions
            # (_linear_stage_blocks).  The qp/Pallas fast paths stay
            # single-type; moving_mesh recomputes the per-block geometry
            # inside the shard program (_step_shard_moving_mixed);
            # hanging-node constraints (mixed AMR) ride the plan's ghost
            # closure and the shared _linear_stage_blocks algebra.
            self.physics_blocks = None
            plan, per_block = build_mixed_plan(mesh, D,
                                               constraints=constraints)
            self.plan = plan
            coords_new = jnp.asarray(mesh.coords[plan.node_order])
            tabs = []
            self._phis = []
            self._mixed_types = []
            for pb in per_block:
                phi_b, JxW_b, dphi_b = geometry_factors(
                    coords_new, jnp.asarray(pb["conn_sorted"]),
                    pb["elem_type"])
                Q = np.asarray(JxW_b).shape[0]
                Kb, Eb_b = pb["K"], pb["Eb"]
                # shard-LEADING padded layouts so one P("d") prefix spec
                # covers the whole tabs pytree
                JxW_p = np.zeros((D, Q, Eb_b))
                dphi_p = np.zeros((D, Q, Kb, 3, Eb_b))
                off = np.concatenate([[0], np.cumsum(pb["counts"])])
                for s in range(D):
                    n_s = pb["counts"][s]
                    JxW_p[s, :, :n_s] = np.asarray(
                        JxW_b)[:, off[s]:off[s + 1]]
                    dphi_p[s, ..., :n_s] = np.asarray(
                        dphi_b)[..., off[s]:off[s + 1]]
                # moving-mesh tables: pad columns clone the shard's first
                # element of this block so per-step geometry from current
                # coords stays non-degenerate where possible; `valid`
                # masks pad columns (and _step_shard_moving_mixed
                # nan_to_nums the geometry for shards holding ZERO
                # elements of a block, whose pad conn is all node 0)
                conn_mv_b = pb["conn_local"].copy()
                valid_b = np.zeros((D, Eb_b))
                for s in range(D):
                    n_s = int(pb["counts"][s])
                    valid_b[s, :n_s] = 1.0
                    if n_s > 0:
                        conn_mv_b[s, :, n_s:] = conn_mv_b[s, :, :1]
                tabs.append({
                    "conn": jax.device_put(pb["conn_local"],
                                           shard_last(P("d"))),
                    "connm": jax.device_put(conn_mv_b,
                                            shard_last(P("d"))),
                    "valid": jax.device_put(valid_b, shard_last(P("d"))),
                    "JxW": jax.device_put(JxW_p, shard_last(P("d"))),
                    "dphi": jax.device_put(dphi_p, shard_last(P("d"))),
                    "ng": jax.device_put(pb["node_gather"],
                                         shard_last(P("d"))),
                })
                self._phis.append(phi_b)
                self._mixed_types.append(pb["elem_type"])
            self._mixed = tabs
            # host metadata for per-block elemental aux fields (ADPM
            # tracts etc.): concat-order element ids of each block's
            # elements in shard order + per-shard counts, consumed by
            # shard_elem_field's mixed branch
            starts = np.concatenate(
                [[0], np.cumsum([b.n_elems for b in mesh.blocks])])
            self._mixed_meta = [{
                "counts": pb["counts"], "Eb": pb["Eb"],
                "concat_ids": plan.elem_order[pb["sorted_concat_idx"]],
                "start": int(starts[bi]),
            } for bi, pb in enumerate(per_block)]
            self.rev_gather_s = jax.device_put(
                plan.rev_gather, shard_last(P("d")))
            self.send_idx_s = tuple(
                jax.device_put(t, shard_last(P("d")))
                for t in plan.send_idx)
            mask = np.zeros((D, plan.No_max))
            for s in range(D):
                mask[s, : plan.owned_counts[s]] = 1.0
            self.mask_s = jax.device_put(mask, shard_last(P("d")))
            self._state_sharding = shard_last(P("d"))
            # constraint tables (dummies keep the shard-program signature
            # uniform; plan.has_cons gates their use at trace time)
            if plan.has_cons:
                cons_all, hang_mask = plan.cons_all, plan.hang_mask
            else:
                cons_all = np.full((D, 3, 1), plan.No_max + plan.Gtot,
                                   dtype=np.int32)
                hang_mask = np.ones((D, plan.No_max))
            self.cons_all_s = jax.device_put(cons_all, shard_last(P("d")))
            self.hang_mask_s = jax.device_put(hang_mask,
                                              shard_last(P("d")))
            in_specs = (
                P("d"), P("d"), P(), P(),
                P("d"),             # tabs pytree (all leaves shard-axis-0)
                P("d"), P("d"),     # rev_gather, mask
                P("d"), P("d"),     # cons_all, hang_mask
            ) + tuple(P("d") for _ in plan.send_idx)
            self._step = jax.jit(shard_map(
                self._step_shard_mixed, mesh=device_mesh,
                in_specs=in_specs, out_specs=(P("d"), P(), P())))
            self.moving_mesh = moving_mesh
            self._step_moving = None    # jitted on first use
            self._coords_cache = None
            return
        self.plan = plan = HaloPlan.build(mesh, D, constraints=constraints)
        K = mesh.nodes_per_elem

        # ---- geometry on the renumbered, shard-ordered mesh ---------------
        coords_new = mesh.coords[plan.node_order]
        conn_new = plan.node_rank[np.asarray(mesh.connectivity)]
        conn_sorted = conn_new[plan.elem_order]
        phi, JxW, dphi = geometry_factors(
            jnp.asarray(coords_new), jnp.asarray(conn_sorted), mesh.elem_type
        )
        Q = np.asarray(JxW).shape[0]
        # scatter real elements into per-shard padded blocks
        starts = np.concatenate([[0], np.cumsum(plan.elem_counts)])
        JxW_p = np.zeros((Q, D, plan.Eb))
        dphi_p = np.zeros((Q, K, 3, D, plan.Eb))
        for s in range(D):
            n_s = starts[s + 1] - starts[s]
            JxW_p[:, s, :n_s] = np.asarray(JxW)[:, starts[s]:starts[s + 1]]
            dphi_p[..., s, :n_s] = np.asarray(dphi)[..., starts[s]:starts[s + 1]]
        self.phi = phi

        shard_last = lambda spec: NamedSharding(device_mesh, spec)
        self.conn_local_s = jax.device_put(
            plan.conn_local, shard_last(P("d")))
        self.JxW_s = jax.device_put(JxW_p, shard_last(P(None, "d")))
        self.dphi_s = jax.device_put(
            dphi_p, shard_last(P(None, None, None, "d")))
        self.node_gather_s = jax.device_put(
            plan.node_gather, shard_last(P("d")))
        self.rev_gather_s = jax.device_put(
            plan.rev_gather, shard_last(P("d")))
        self.send_idx_s = tuple(
            jax.device_put(t, shard_last(P("d"))) for t in plan.send_idx
        )
        # owned-slot validity mask (pad columns excluded from dots)
        mask = np.zeros((D, plan.No_max))
        for s in range(D):
            mask[s, : plan.owned_counts[s]] = 1.0
        self.mask_s = jax.device_put(mask, shard_last(P("d")))
        self._state_sharding = shard_last(P("d"))
        # hanging-node constraint tables (dummies keep the shard-program
        # signatures uniform; plan.has_cons gates their use at trace time)
        if plan.has_cons:
            cons_all, hang_mask = plan.cons_all, plan.hang_mask
        else:
            cons_all = np.full((D, 3, 1), plan.No_max + plan.Gtot,
                               dtype=np.int32)
            hang_mask = np.ones((D, plan.No_max))
        self.cons_all_s = jax.device_put(cons_all, shard_last(P("d")))
        self.hang_mask_s = jax.device_put(hang_mask, shard_last(P("d")))

        in_specs = (
            P("d"),                 # u (D, V, No_max)
            P("d"),                 # efields: element-sharded leaves
            P(),                    # scalars: replicated leaves
            P(),                    # params
            P("d"),                 # conn_local
            P(None, "d"),           # JxW
            P(None, None, None, "d"),  # dphi
            P("d"), P("d"), P("d"),    # node_gather, rev_gather, mask
            P("d"), P("d"),            # cons_all, hang_mask
        ) + tuple(P("d") for _ in plan.send_idx)
        fn = shard_map(
            self._step_shard, mesh=device_mesh,
            in_specs=in_specs, out_specs=(P("d"), P(), P()),
        )
        self._step = jax.jit(fn)
        # moving-mesh path (coupled RDC<->solid): padded element columns
        # clone the shard's element 0 so per-step geometry from current
        # coords stays non-degenerate; restriction tables never read them
        self.moving_mesh = moving_mesh
        conn_mv = plan.conn_local.copy()
        for s in range(D):
            n_s = plan.elem_counts[s]
            conn_mv[s, :, n_s:] = conn_mv[s, :, :1]
        self.conn_moving_s = jax.device_put(conn_mv, shard_last(P("d")))
        self._step_moving = None    # jitted on first use
        self._coords_cache = None   # (id(host coords), distributed slab)

    # ------------------------------------------------------------------
    def initial_state(self, u0: np.ndarray) -> Dict[str, jnp.ndarray]:
        u = self.scatter_nodal(np.asarray(u0, dtype=np.float64))
        return {"u": u, "u_old": u, "u_older": u, "u_raw": u}

    def shard_elem_field(self, arr, axis: int = -1) -> jnp.ndarray:
        """Auxiliary field with an element axis -> (D, ...) device array
        sharded along the shard axis, elements permuted into partition
        order and zero-padded, original axis order preserved per shard
        (the reference's aux systems are owner-local the same way, e.g.
        Tracts adpm.C:230-262).

        On mixed meshes the field arrives in block-concat element order
        and returns a TUPLE of per-block (D, Eb_b, ...) slabs (one per
        MixedMesh block, matching _step_shard_mixed's kernel batches)."""
        if self._mixed is not None:
            return self._shard_elem_field_mixed(arr, axis)
        plan = self.plan
        a = np.asarray(arr)
        a = np.moveaxis(a, axis, -1)
        assert a.shape[-1] == plan.n_elems, "axis must index elements"
        perm = a[..., plan.elem_order]
        out = np.zeros((plan.D,) + a.shape[:-1] + (plan.Eb,), a.dtype)
        starts = np.concatenate([[0], np.cumsum(plan.elem_counts)])
        for s in range(plan.D):
            n_s = starts[s + 1] - starts[s]
            out[s][..., :n_s] = perm[..., starts[s]:starts[s + 1]]
        # restore the caller's axis order behind the leading shard axis
        out = np.moveaxis(out, -1, axis if axis < 0 else axis + 1)
        return jax.device_put(jnp.asarray(out), self._state_sharding)

    def _shard_elem_field_mixed(self, arr, axis: int = 0):
        """Mixed-mesh variant -> tuple of per-block (D, ...) padded slabs
        in shard order.  Two input forms:

        - one (n_elems, ...) array in block-concat element order
          (axis=0), e.g. ADPM tracts;
        - a tuple/list of per-block arrays with the element axis LAST
          (axis=-1), e.g. driver-sampled qp fields whose leading Q
          differs per element type."""
        D = self.plan.D
        out = []
        if isinstance(arr, (tuple, list)):
            assert axis == -1, "per-block fields take elements on axis -1"
            assert len(arr) == len(self._mixed_meta)
            for meta, a in zip(self._mixed_meta, arr):
                a = np.asarray(a)
                sel = a[..., meta["concat_ids"] - meta["start"]]
                slab = np.zeros((D,) + a.shape[:-1] + (meta["Eb"],),
                                a.dtype)
                off = 0
                for s in range(D):
                    n_s = int(meta["counts"][s])
                    slab[s][..., :n_s] = sel[..., off:off + n_s]
                    off += n_s
                out.append(jax.device_put(jnp.asarray(slab),
                                          self._state_sharding))
            return tuple(out)
        assert axis == 0, "mixed meshes take elemental fields as (E, ...)"
        a = np.asarray(arr)
        assert a.shape[0] == self.plan.n_elems, "axis 0 must index elements"
        for meta in self._mixed_meta:
            sel = a[meta["concat_ids"]]
            slab = np.zeros((D, meta["Eb"]) + a.shape[1:], a.dtype)
            off = 0
            for s in range(D):
                n_s = int(meta["counts"][s])
                slab[s, :n_s] = sel[off:off + n_s]
                off += n_s
            out.append(jax.device_put(jnp.asarray(slab),
                                      self._state_sharding))
        return tuple(out)

    def scatter_nodal(self, arr: np.ndarray) -> jnp.ndarray:
        """(N, V) global original-order -> (D, V, No_max) distributed."""
        plan = self.plan
        a = arr[plan.node_order]  # renumbered order, (N, V)
        out = np.zeros((plan.D, arr.shape[1], plan.No_max))
        for s in range(plan.D):
            lo, hi = plan.node_start[s], plan.node_start[s + 1]
            out[s, :, : hi - lo] = a[lo:hi].T
        return jax.device_put(jnp.asarray(out), self._state_sharding)

    @property
    def processor_id(self) -> np.ndarray:
        """(E,) owning-shard id per element in ORIGINAL element order — the
        reference exports this per element to VTU (paraview.h:113-117)."""
        plan = self.plan
        part_sorted = np.repeat(np.arange(plan.D), plan.elem_counts)
        out = np.empty(plan.n_elems, dtype=np.int32)
        out[plan.elem_order] = part_sorted
        return out

    def gather_state(self, state: Dict) -> Dict:
        """Distributed state -> global (N, V) numpy arrays (original node
        order) for IO / AMR transfer / checkpointing."""
        return {k: self.gather(v) for k, v in state.items()}

    def scatter_state(self, gstate: Dict) -> Dict:
        return {k: self.scatter_nodal(np.asarray(v)) for k, v in gstate.items()}

    def gather(self, u: jnp.ndarray) -> np.ndarray:
        """(D, V, No_max) distributed -> (N, V) global original order."""
        plan = self.plan
        a = np.asarray(u)  # (D, V, No_max)
        full = np.empty((plan.n_nodes, a.shape[1]))
        for s in range(plan.D):
            lo, hi = plan.node_start[s], plan.node_start[s + 1]
            full[lo:hi] = a[s, :, : hi - lo].T
        out = np.empty_like(full)
        out[plan.node_order] = full
        return out

    # ------------------------------------------------------------------
    def _linear_stage(self, u_blk, Fe, Ke, diag_e, ng, msk, rev_gather,
                      send_tabs, conn, ca=None, hmask=None):
        """Shared linear stage of the dense-Ke shard step (one element
        block); see _linear_stage_blocks."""
        return self._linear_stage_blocks(
            u_blk, ((Fe, Ke, diag_e, ng, conn),), msk, rev_gather,
            send_tabs, ca=ca, hmask=hmask)

    def _linear_stage_blocks(self, u_blk, eblocks, msk, rev_gather,
                             send_tabs, ca=None, hmask=None):
        """Shared linear stage of the dense-Ke shard step: assemble rhs /
        block-Jacobi from element kernels, distributed-BiCGStab, clamp.
        `eblocks` is a tuple of per-element-type (Fe, Ke, diag_e,
        node_gather, conn) — the global operator is the sum of block
        restrictions, so mixed meshes ride the same exchange (one ghost
        fill / reverse-add per matvec regardless of block count).
        With hanging-node constraints (ca/hmask present and plan.has_cons)
        the solve runs on C^T A C: local partial sums are C^T-folded
        BEFORE the reverse-add (each element is owned by exactly one
        shard, so the shard-local folds tile the global fold), iterates
        keep owned hanging slots pinned to zero, and the solved master
        values are redistributed to hanging dofs afterwards — the
        distributed counterpart of TransientRDCSystem's constrained step
        (libMesh constrain_element_matrix_and_vector, reference
        src/pihna.C:752)."""
        V = self.n_vars
        has_cons = self.plan.has_cons and ca is not None
        No = self.plan.No_max
        u = u_blk["u"][0]
        u_old = u_blk["u_old"][0]

        def restrict(ng_, flat_local):
            pad = jnp.zeros(flat_local.shape[:-1] + (1,), flat_local.dtype)
            f = jnp.concatenate([flat_local, pad], axis=-1)
            acc = f[..., ng_[0]]
            for c in range(1, ng_.shape[0]):
                acc = acc + f[..., ng_[c]]
            return acc  # (..., Nloc)

        def pdot(a, b):
            return lax.psum(jnp.vdot(a, b), "d")

        bl = sum(restrict(ng_, Fe.reshape(V, -1))
                 for Fe, _, _, ng_, _ in eblocks)
        if has_cons:
            bl = self._cons_fold(bl, ca, 0.5)
        b = self._reverse_add(bl, rev_gather)
        dl = sum(restrict(ng_, diag_e.reshape(V, V, -1))
                 for _, _, diag_e, ng_, _ in eblocks)
        if has_cons:
            # own-row C^T A C diagonal contribution; zeroed hanging rows
            # fall into the empty->identity branch below, which IS the
            # single-chip identity pinning
            dl = self._cons_fold(dl, ca, 0.25)
        diag = self._reverse_add(
            dl.reshape(V * V, -1), rev_gather,
        ).reshape(V, V, -1)
        empty = jnp.abs(diag).sum(axis=(0, 1)) == 0.0
        diag = jnp.where(
            empty[None, None, :],
            jnp.broadcast_to(jnp.eye(V)[:, :, None], diag.shape), diag,
        )
        Dinv = small_block_inverse(diag, pivot=False)

        def matvec(x):
            xg = self._ghost_fill(x, send_tabs)
            if has_cons:
                xg = self._c_apply(xg, ca)
            yl = None
            for _, Ke, _, ng_, conn in eblocks:
                ue = xg[:, conn]                              # (V, K, Eb)
                ye = jnp.sum(Ke * ue[None, :, None, :, :], axis=(1, 3))
                yb = restrict(ng_, ye.reshape(V, -1))
                yl = yb if yl is None else yl + yb
            if has_cons:
                yl = self._cons_fold(yl, ca, 0.5)
            return self._reverse_add(yl, rev_gather)

        def precond(r):
            return jnp.sum(Dinv * r[None], axis=1)

        msk_it = msk * hmask if has_cons else msk
        pre_matvec = lambda x: precond(matvec(x))
        pre_b = precond(b) * msk_it
        x0 = (2.0 * u - u_old) * msk_it
        x, iters, res = _bicgstab_dist(
            pre_matvec, pre_b, x0, msk_it, pdot, self.rtol, self.maxiter)
        if has_cons:
            # hanging dofs are DERIVED: distribute solved masters, clamp
            # elementwise on the ghost-filled vector (shard-consistent),
            # re-derive after the clamp touches the endpoints
            xg = self._c_apply(self._ghost_fill(x * msk_it, send_tabs), ca)
            u_raw = xg[:, :No] * msk
            u_new = self._c_apply(self.clamp(xg), ca)[:, :No] * msk
        else:
            u_raw = x * msk
            u_new = self.clamp(u_raw)
        new_blk = {
            "u": u_new[None], "u_old": u_blk["u"], "u_older": u_blk["u_old"],
            "u_raw": u_raw[None],
        }
        return new_blk, iters, res

    def _step_shard(self, u_blk, efields, scalars, params, conn_local, JxW,
                    dphi, node_gather, rev_gather, mask, cons_all,
                    hang_mask, *send_tabs):
        V = self.n_vars
        u = u_blk["u"][0]          # (V, No_max) this shard's slab
        ng = node_gather[0]        # (C, Nloc)
        msk = mask[0]              # (No_max,)
        ca = cons_all[0]           # (3, Hmax)
        hmask = hang_mask[0]       # (No_max,)
        conn = conn_local[0]       # (K, Eb)
        JxW = JxW[:, 0]            # (Q, Eb) — squeeze the shard axis
        dphi = dphi[:, :, :, 0]    # (Q, K, 3, Eb)
        # physics sees this shard's element-field blocks + shared scalars
        fields = {k: v[0] for k, v in efields.items()}
        fields.update(scalars)

        # ---- element kernels on ghost-filled old solution -----------------
        ug = self._ghost_fill(u, send_tabs)
        u_qp, grad_qp = interpolate_at_qp(ug, conn, self.phi, dphi)
        wf = self.physics(u_qp, grad_qp, fields, params)
        Fe = element_vectors(wf, self.phi, JxW, dphi)
        Ke, diag_e = element_matrices(
            wf, self.phi, JxW, dphi,
            grad_const=(self.mesh.elem_type == "TET4"), return_diag=True,
        )
        return self._linear_stage(u_blk, Fe, Ke, diag_e, ng, msk,
                                  rev_gather, send_tabs, conn,
                                  ca=ca, hmask=hmask)

    def _step_shard_mixed(self, u_blk, efields, scalars, params, tabs,
                          rev_gather, mask, cons_all, hang_mask,
                          *send_tabs):
        """Mixed-element shard step: per-type element kernels on the
        ghost-filled old solution, block restrictions summed in
        _linear_stage_blocks — the distributed counterpart of
        MixedTransientRDCSystem (one ghost exchange per matvec regardless
        of block count).  Elemental aux fields arrive as per-block
        tuples from shard_elem_field's mixed branch; non-tuple entries
        (nodal / replicated) are shared across blocks."""
        u = u_blk["u"][0]
        msk = mask[0]
        ca = cons_all[0]
        hmask = hang_mask[0]
        ug = self._ghost_fill(u, send_tabs)
        eblocks = []
        for bi, tab in enumerate(tabs):
            conn = tab["conn"][0]      # (Kb, Eb_b)
            JxW = tab["JxW"][0]        # (Q, Eb_b)
            dphi = tab["dphi"][0]      # (Q, Kb, 3, Eb_b)
            ng = tab["ng"][0]
            phi = self._phis[bi]
            fields = {k: (v[bi][0] if isinstance(v, tuple) else v[0])
                      for k, v in efields.items()}
            fields.update(scalars)
            u_qp, grad_qp = interpolate_at_qp(ug, conn, phi, dphi)
            wf = self.physics(u_qp, grad_qp, fields, params)
            Fe = element_vectors(wf, phi, JxW, dphi)
            Ke, diag_e = element_matrices(
                wf, phi, JxW, dphi,
                grad_const=(self._mixed_types[bi] == "TET4"),
                return_diag=True)
            eblocks.append((Fe, Ke, diag_e, ng, conn))
        return self._linear_stage_blocks(u_blk, tuple(eblocks), msk,
                                         rev_gather, send_tabs,
                                         ca=ca, hmask=hmask)

    def _step_shard_moving(self, u_blk, coords_blk, efields, scalars, params,
                           conn_mv, node_gather, rev_gather, mask,
                           cons_all, hang_mask, *send_tabs):
        """Moving-mesh shard step: geometry factors are computed INSIDE the
        shard program from ghost-filled current node positions — the
        multi-chip counterpart of TransientRDCSystem._step_moving_impl
        (the coupled RDC<->solid path assembles on the CURRENT deformed
        configuration every step, reference src/coupled_hcc.C:114).
        `conn_mv` pads with a clone of the shard's element 0 so padded
        elements keep non-degenerate Jacobians; the plan's restriction
        tables never gather padded slots, so they contribute nothing."""
        V = self.n_vars
        u = u_blk["u"][0]
        ng = node_gather[0]
        msk = mask[0]
        ca = cons_all[0]
        hmask = hang_mask[0]
        conn = conn_mv[0]
        xg = self._ghost_fill(coords_blk[0], send_tabs)   # (3, Nloc)
        phi, JxW, dphi = geometry_factors(xg.T, conn.T, self.mesh.elem_type)
        fields = {k: v[0] for k, v in efields.items()}
        fields.update(scalars)

        ug = self._ghost_fill(u, send_tabs)
        u_qp, grad_qp = interpolate_at_qp(ug, conn, phi, dphi)
        wf = self.physics(u_qp, grad_qp, fields, params)
        Fe = element_vectors(wf, phi, JxW, dphi)
        Ke, diag_e = element_matrices(
            wf, phi, JxW, dphi,
            grad_const=(self.mesh.elem_type == "TET4"), return_diag=True,
        )
        return self._linear_stage(u_blk, Fe, Ke, diag_e, ng, msk,
                                  rev_gather, send_tabs, conn,
                                  ca=ca, hmask=hmask)

    def _step_shard_moving_mixed(self, u_blk, coords_blk, efields, scalars,
                                 params, tabs, rev_gather, mask,
                                 cons_all, hang_mask, *send_tabs):
        """Mixed-element moving-mesh shard step: per-block geometry
        factors are computed INSIDE the shard program from ghost-filled
        current node positions (coupled RDC<->solid on a mixed mesh,
        reference src/coupled_hcc.C:114).  A shard may hold ZERO elements
        of some block — its pad connectivity is all node 0, geometry
        there is degenerate (det J = 0), so JxW/dphi are nan_to_num'd
        and masked by the block's `valid` columns; the restriction
        tables never gather pad slots either way."""
        u = u_blk["u"][0]
        msk = mask[0]
        ca = cons_all[0]
        hmask = hang_mask[0]
        xg = self._ghost_fill(coords_blk[0], send_tabs)   # (3, Nloc)
        ug = self._ghost_fill(u, send_tabs)
        eblocks = []
        for bi, tab in enumerate(tabs):
            conn = tab["connm"][0]     # (Kb, Eb_b) pad-cloned columns
            valid = tab["valid"][0]    # (Eb_b,)
            ng = tab["ng"][0]
            phi, JxW, dphi = geometry_factors(
                xg.T, conn.T, self._mixed_types[bi])
            JxW = jnp.nan_to_num(JxW) * valid[None]
            dphi = jnp.nan_to_num(dphi) * valid[None, None, None]
            fields = {k: (v[bi][0] if isinstance(v, tuple) else v[0])
                      for k, v in efields.items()}
            fields.update(scalars)
            u_qp, grad_qp = interpolate_at_qp(ug, conn, phi, dphi)
            wf = self.physics(u_qp, grad_qp, fields, params)
            Fe = element_vectors(wf, phi, JxW, dphi)
            Ke, diag_e = element_matrices(
                wf, phi, JxW, dphi,
                grad_const=(self._mixed_types[bi] == "TET4"),
                return_diag=True)
            eblocks.append((Fe, Ke, diag_e, ng, conn))
        return self._linear_stage_blocks(u_blk, tuple(eblocks), msk,
                                         rev_gather, send_tabs,
                                         ca=ca, hmask=hmask)

    # ------------------------------------------------------------------
    def _step_shard_qp_fn(self, params: Dict):
        """Per-shard program with static params and the qp-apply matvec
        (block-sparse physics; no Ke materialization)."""
        V = self.n_vars

        def step_shard(u_blk, efields, scalars, conn_local, JxW, dphi,
                       node_gather, rev_gather, mask, cons_all, hang_mask,
                       *send_tabs):
            u = u_blk["u"][0]
            u_old = u_blk["u_old"][0]
            ng = node_gather[0]
            msk = mask[0]
            ca = cons_all[0]
            hmask = hang_mask[0]
            has_cons = self.plan.has_cons
            No = self.plan.No_max
            conn = conn_local[0]
            JxW_ = JxW[:, 0]
            dphi_ = dphi[:, :, :, 0]
            fields = {k: v[0] for k, v in efields.items()}
            fields.update(scalars)

            def restrict(flat_local):
                pad = jnp.zeros(flat_local.shape[:-1] + (1,),
                                flat_local.dtype)
                f = jnp.concatenate([flat_local, pad], axis=-1)
                acc = f[..., ng[0]]
                for c in range(1, ng.shape[0]):
                    acc = acc + f[..., ng[c]]
                return acc

            def pdot(a, b):
                return lax.psum(jnp.vdot(a, b), "d")

            affine = self.mesh.elem_type == "TET4"
            ug = self._ghost_fill(u, send_tabs)
            u_qp, grad_qp = interpolate_at_qp(ug, conn, self.phi, dphi_)
            wfb = self.physics_blocks(u_qp, grad_qp, fields, params)
            rhs_fn = block_rhs_affine if affine else block_rhs
            Fe = rhs_fn(wfb, self.phi, JxW_, dphi_)
            bl = restrict(Fe.reshape(V, -1))
            if has_cons:
                bl = self._cons_fold(bl, ca, 0.5)
            b = self._reverse_add(bl, rev_gather)
            diag_fn = block_diag_affine if affine else block_diag
            diag_e = diag_fn(wfb, self.phi, JxW_, dphi_)
            dl = restrict(diag_e.reshape(V, V, -1))
            if has_cons:
                dl = self._cons_fold(dl, ca, 0.25)
            diag = self._reverse_add(
                dl.reshape(V * V, -1), rev_gather,
            ).reshape(V, V, -1)
            empty = jnp.abs(diag).sum(axis=(0, 1)) == 0.0
            diag = jnp.where(
                empty[None, None, :],
                jnp.broadcast_to(jnp.eye(V)[:, :, None], diag.shape), diag,
            )
            Dinv = small_block_inverse(diag, pivot=False)

            # once-per-step diffusion q-sum for the affine matvec (the
            # same reassociation as TransientRDCSystem's single-chip path)
            Epre = diffusion_presum(wfb, JxW_) if affine else None

            def matvec(x):
                xg = self._ghost_fill(x, send_tabs)
                if has_cons:
                    xg = self._c_apply(xg, ca)
                ue = xg[:, conn]
                if affine:
                    x_qp, gx = interpolate_ue_affine(ue, self.phi, dphi_)
                    Ye = qp_apply_affine(wfb, Epre, self.phi, JxW_,
                                         dphi_, x_qp, gx)
                else:
                    x_qp, gx_qp = interpolate_ue(ue, self.phi, dphi_)
                    Ye = qp_apply(wfb, self.phi, JxW_, dphi_, x_qp,
                                  gx_qp)
                yl = restrict(Ye.reshape(V, -1))
                if has_cons:
                    yl = self._cons_fold(yl, ca, 0.5)
                return self._reverse_add(yl, rev_gather)

            def precond(r):
                return jnp.sum(Dinv * r[None], axis=1)

            msk_it = msk * hmask if has_cons else msk
            pre_matvec = lambda x: precond(matvec(x))
            pre_b = precond(b) * msk_it
            x0 = (2.0 * u - u_old) * msk_it
            x, iters, res = _bicgstab_dist(
                pre_matvec, pre_b, x0, msk_it, pdot, self.rtol,
                self.maxiter)
            if has_cons:
                xg = self._c_apply(
                    self._ghost_fill(x * msk_it, send_tabs), ca)
                u_raw = xg[:, :No] * msk
                u_new = self._c_apply(self.clamp(xg), ca)[:, :No] * msk
            else:
                u_raw = x * msk
                u_new = self.clamp(u_raw)
            new_blk = {
                "u": u_new[None], "u_old": u_blk["u"],
                "u_older": u_blk["u_old"], "u_raw": u_raw[None],
            }
            return new_blk, iters, res

        in_specs = (
            P("d"), P("d"), P(),
            P("d"), P(None, "d"), P(None, None, None, "d"),
            P("d"), P("d"), P("d"), P("d"), P("d"),
        ) + tuple(P("d") for _ in self.plan.send_idx)
        fn = shard_map(step_shard, mesh=self.dmesh,
                       in_specs=in_specs, out_specs=(P("d"), P(), P()))
        return jax.jit(fn), step_shard, in_specs

    def _multi_shard_qp_fn(self, params: Dict, n: int, field_update=None):
        """n steps as ONE scan inside the shard program: the multi-chip
        counterpart of TransientRDCSystem.run_steps — collectives
        (ppermute/psum) run inside the scan body; per-step dispatch
        vanishes.

        `field_update(u_blk, aux, tr, ghost_fill, conn, dphi, *fargs)
        -> (shard-local qp fields dict, new_aux)` is the multi-chip form
        of TransientRDCSystem's per-step field hook: it runs INSIDE the
        shard program before each step (RIPF's TD/RT fields,
        src/ripf.C:675-775).  `ghost_fill` extends an owned (V, No_max)
        slab to (V, Nloc); conn/dphi are this shard's element tables;
        fargs arrive as distributed slabs (leading shard axis intact)."""
        _, step_shard, in_specs = self._qp_parts(params)

        def multi_shard(u_blk, efields, scalars, traj, aux, fargs,
                        *tables):
            conn = tables[0][0]                  # (K, Eb)
            dphi_ = tables[2][:, :, :, 0]        # (Q, K, 3, Eb)
            send_tabs = tables[8:]
            gf = lambda arr: self._ghost_fill(arr, send_tabs)

            def body(carry, x):
                _i, tr = x
                blk, ax = carry
                efl = efields
                if field_update is not None:
                    fu, ax = field_update(blk, ax, tr, gf, conn, dphi_,
                                          *fargs)
                    efl = {**efields,
                           **{k: v[None] for k, v in fu.items()}}
                new_blk, it, res = step_shard(blk, efl,
                                              {**scalars, **tr}, *tables)
                return (new_blk, ax), (it, res)

            (final, aux), (its, ress) = lax.scan(
                body, (u_blk, aux), (jnp.arange(n), traj))
            return final, its, ress, aux

        fn = shard_map(multi_shard, mesh=self.dmesh,
                       in_specs=(in_specs[:3] + (P(), P("d"), P("d"))
                                 + in_specs[3:]),
                       out_specs=(P("d"), P(), P(), P("d")))
        return jax.jit(fn)

    def _qp_parts(self, params: Dict):
        key = ("__parts__",) + tuple(sorted(params.items()))
        parts = self._qp_cache.get(key)
        if parts is None:
            parts = self._step_shard_qp_fn(params)
            self._qp_cache[key] = parts
        return parts

    def _multi_shard_moving_fn(self, n: int):
        """n moving-mesh steps as ONE scan inside the shard program.  The
        coordinates are an INVARIANT of the segment (the coupled loop only
        moves them at loading points, reference src/coupled_hcc.C:114), so
        the geometry factors build once from the ghost-filled positions
        and the dense per-step kernels scan over them — the multi-chip
        counterpart of TransientRDCSystem.run_steps(coords=...)."""
        V = self.n_vars

        def multi(u_blk, coords_blk, efields, scalars, traj, params,
                  conn_mv, node_gather, rev_gather, mask, cons_all,
                  hang_mask, *send_tabs):
            ng = node_gather[0]
            msk = mask[0]
            ca = cons_all[0]
            hmask = hang_mask[0]
            conn = conn_mv[0]
            xg = self._ghost_fill(coords_blk[0], send_tabs)   # (3, Nloc)
            phi, JxW, dphi = geometry_factors(xg.T, conn.T,
                                              self.mesh.elem_type)
            base_fields = {k: v[0] for k, v in efields.items()}
            base_fields.update(scalars)

            def body(carry, x):
                _i, tr = x
                fields = {**base_fields, **tr}
                u = carry["u"][0]
                ug = self._ghost_fill(u, send_tabs)
                u_qp, grad_qp = interpolate_at_qp(ug, conn, phi, dphi)
                wf = self.physics(u_qp, grad_qp, fields, params)
                Fe = element_vectors(wf, phi, JxW, dphi)
                Ke, diag_e = element_matrices(
                    wf, phi, JxW, dphi,
                    grad_const=(self.mesh.elem_type == "TET4"),
                    return_diag=True)
                new_blk, it, res = self._linear_stage(
                    carry, Fe, Ke, diag_e, ng, msk, rev_gather,
                    send_tabs, conn, ca=ca, hmask=hmask)
                return new_blk, (it, res)

            final, (its, ress) = lax.scan(body, u_blk,
                                          (jnp.arange(n), traj))
            return final, its, ress

        in_specs = (
            P("d"), P("d"), P("d"), P(), P(), P(),
            P("d"), P("d"), P("d"), P("d"), P("d"), P("d"),
        ) + tuple(P("d") for _ in self.plan.send_idx)
        fn = shard_map(multi, mesh=self.dmesh,
                       in_specs=in_specs, out_specs=(P("d"), P(), P()))
        return jax.jit(fn)

    def run_steps(self, state: Dict, n: int, fields: Optional[Dict] = None,
                  params: Optional[Dict] = None,
                  scalars: Optional[Dict] = None,
                  segment: Optional[int] = None,
                  scalar_traj: Optional[Dict] = None,
                  coords=None,
                  field_update=None, field_aux=None, field_args=()):
        """Advance n steps through compiled scans over the sharded step
        (static scalar params + block physics required).  Returns
        (state, iters_per_step, residual_per_step).

        Chained in device programs of at most `segment` steps (default 50,
        env RDCFES_SCAN_SEGMENT) to stay under the TPU watchdog — same
        policy as TransientRDCSystem.run_steps.  `scalar_traj` maps a
        scalar-field name to (n,) per-step values (replicated across
        devices, scanned inside the shard program) — see
        TransientRDCSystem.run_steps.  `coords` (current node positions,
        constant over the segment) routes through the moving-mesh scan:
        geometry builds once per segment inside the shard program."""
        traj = {k: jnp.asarray(v, state["u"].dtype)
                for k, v in (scalar_traj or {}).items()}
        for k, v in traj.items():
            assert v.shape == (int(n),), (
                f"scalar_traj[{k!r}] must have shape ({int(n)},), got {v.shape}")
        if coords is not None or self._mixed is not None:
            assert field_update is None, (
                "field_update rides the fixed-mesh single-type scan only")
        if coords is not None:
            if self._mixed is not None:
                # mixed moving meshes: per-step dispatch (per-block pad
                # geometry handling keeps the step program simpler)
                its, ress = [], []
                for j in range(int(n)):
                    sc = {**(scalars or {}),
                          **{k: v[j] for k, v in traj.items()}}
                    state, it, res = self.step(state, fields=fields,
                                               params=params, scalars=sc,
                                               coords=coords)
                    its.append(it)
                    ress.append(res)
                return state, jnp.stack(its), jnp.stack(ress)
            if segment is None:
                import os as _os

                segment = int(_os.environ.get("RDCFES_SCAN_SEGMENT", "50"))
            segment = max(1, int(segment))
            coords_blk = self.scatter_coords(coords)

            def run_one_mv(st, m, lo):
                key = ("__multi_mv__", int(m)) + tuple(sorted(traj))
                fn = self._qp_cache.get(key)
                if fn is None:
                    fn = self._multi_shard_moving_fn(int(m))
                    self._qp_cache[key] = fn
                tr = {k: v[lo:lo + m] for k, v in traj.items()}
                return fn(st, coords_blk, fields or {}, scalars or {}, tr,
                          params or {}, self.conn_moving_s,
                          self.node_gather_s, self.rev_gather_s,
                          self.mask_s, self.cons_all_s, self.hang_mask_s,
                          *self.send_idx_s)

            n = int(n)
            if n <= segment:
                return run_one_mv(state, n, 0)
            its_all, ress_all = [], []
            remaining, lo = n, 0
            while remaining > 0:
                m = min(segment, remaining)
                state, its, ress = run_one_mv(state, m, lo)
                its_all.append(its)
                ress_all.append(ress)
                remaining -= m
                lo += m
            return (state, jnp.concatenate(its_all),
                    jnp.concatenate(ress_all))
        if self._mixed is not None:
            # mixed meshes: per-step dispatch through the cached dense
            # program (the scan fast path is a single-type optimization)
            its, ress = [], []
            for j in range(int(n)):
                sc = {**(scalars or {}), **{k: v[j] for k, v in traj.items()}}
                state, it, res = self.step(state, fields=fields,
                                           params=params, scalars=sc)
                its.append(it)
                ress.append(res)
            return state, jnp.stack(its), jnp.stack(ress)
        assert self.physics_blocks is not None, "run_steps needs physics_blocks"
        assert params and all(
            isinstance(v, (int, float)) for v in params.values()
        ), "run_steps needs plain-scalar params"
        p = {k: float(v) for k, v in params.items()}
        if segment is None:
            import os as _os

            segment = int(_os.environ.get("RDCFES_SCAN_SEGMENT", "50"))
        segment = max(1, int(segment))
        aux = field_aux if field_aux is not None \
            else jnp.zeros((self.plan.D, 1))

        def run_one(st, m, lo):
            nonlocal aux
            key = (("__multi__", int(m), id(field_update))
                   + tuple(sorted(traj)) + tuple(sorted(p.items())))
            fn = self._qp_cache.get(key)
            if fn is None:
                fn = self._multi_shard_qp_fn(p, int(m), field_update)
                self._qp_cache[key] = fn
            tr = {k: v[lo:lo + m] for k, v in traj.items()}
            st, its, ress, aux = fn(st, fields or {}, scalars or {}, tr,
                                    aux, tuple(field_args),
                                    self.conn_local_s, self.JxW_s,
                                    self.dphi_s,
                                    self.node_gather_s, self.rev_gather_s,
                                    self.mask_s,
                                    self.cons_all_s, self.hang_mask_s,
                                    *self.send_idx_s)
            return st, its, ress

        n = int(n)
        if n <= segment:
            out = run_one(state, n, 0)
        else:
            its_all, ress_all = [], []
            remaining, lo = n, 0
            while remaining > 0:
                m = min(segment, remaining)
                state, its, ress = run_one(state, m, lo)
                its_all.append(its)
                ress_all.append(ress)
                remaining -= m
                lo += m
            out = (state, jnp.concatenate(its_all),
                   jnp.concatenate(ress_all))
        return out + ((aux,) if field_update is not None else ())

    # ------------------------------------------------------------------
    def scatter_coords(self, coords) -> jnp.ndarray:
        """Current node positions (N, 3) -> distributed (D, 3, No_max)
        slab for the moving-mesh step, cached by host-array identity (the
        coupled driver's positions only change at loading points)."""
        if isinstance(coords, jnp.ndarray) and coords.ndim == 3:
            return coords  # already distributed
        key = id(coords)
        if self._coords_cache is not None and self._coords_cache[0] == key:
            return self._coords_cache[1]
        blk = self.scatter_nodal(np.asarray(coords))
        self._coords_cache = (key, blk)
        return blk

    def step(self, state: Dict, fields: Optional[Dict] = None,
             params: Optional[Dict] = None,
             scalars: Optional[Dict] = None,
             coords=None):
        """fields: dict of element-sharded arrays from shard_elem_field
        (leading shard axis); scalars: replicated per-step values (e.g.
        "time"); coords: current node positions for the moving-mesh path
        ((N, 3) global or an already-distributed (D, 3, No_max) slab)."""
        params = params or {}
        if self._mixed is not None:
            if coords is not None:
                if self._step_moving is None:
                    in_specs = (
                        P("d"), P("d"), P("d"), P(), P(),
                        P("d"),             # tabs pytree
                        P("d"), P("d"),     # rev_gather, mask
                        P("d"), P("d"),     # cons_all, hang_mask
                    ) + tuple(P("d") for _ in self.plan.send_idx)
                    self._step_moving = jax.jit(shard_map(
                        self._step_shard_moving_mixed, mesh=self.dmesh,
                        in_specs=in_specs, out_specs=(P("d"), P(), P())))
                return self._step_moving(
                    state, self.scatter_coords(coords), fields or {},
                    scalars or {}, params, self._mixed,
                    self.rev_gather_s, self.mask_s,
                    self.cons_all_s, self.hang_mask_s, *self.send_idx_s)
            return self._step(state, fields or {}, scalars or {}, params,
                              self._mixed, self.rev_gather_s, self.mask_s,
                              self.cons_all_s, self.hang_mask_s,
                              *self.send_idx_s)
        if coords is not None:
            if self._step_moving is None:
                in_specs = (
                    P("d"), P("d"), P("d"), P(), P(),
                    P("d"), P("d"), P("d"), P("d"), P("d"), P("d"),
                ) + tuple(P("d") for _ in self.plan.send_idx)
                self._step_moving = jax.jit(shard_map(
                    self._step_shard_moving, mesh=self.dmesh,
                    in_specs=in_specs, out_specs=(P("d"), P(), P())))
            return self._step_moving(
                state, self.scatter_coords(coords), fields or {},
                scalars or {}, params, self.conn_moving_s,
                self.node_gather_s, self.rev_gather_s, self.mask_s,
                self.cons_all_s, self.hang_mask_s,
                *self.send_idx_s)
        if (self.physics_blocks is not None and params
                and all(isinstance(v, (int, float)) for v in params.values())):
            fn, _, _ = self._qp_parts(
                {k: float(v) for k, v in params.items()})
            return fn(state, fields or {}, scalars or {},
                      self.conn_local_s, self.JxW_s, self.dphi_s,
                      self.node_gather_s, self.rev_gather_s, self.mask_s,
                      self.cons_all_s, self.hang_mask_s,
                      *self.send_idx_s)
        out = self._step(state, fields or {}, scalars or {}, params,
                         self.conn_local_s, self.JxW_s, self.dphi_s,
                         self.node_gather_s, self.rev_gather_s, self.mask_s,
                         self.cons_all_s, self.hang_mask_s,
                         *self.send_idx_s)
        return out


def _bicgstab_dist(matvec, b, x0, msk, pdot, rtol, maxiter):
    """BiCGStab on node-partitioned vectors: local arithmetic, psum dots.
    Same recurrence + breakdown freezes as solvers.krylov.bicgstab."""
    bnorm = jnp.sqrt(pdot(b, b).real)
    safe_b = jnp.where(bnorm == 0.0, 1.0, bnorm)
    atol2 = (rtol * safe_b) ** 2
    r0 = (b - matvec(x0)) * msk
    rhat = r0

    def cond(s):
        x, r, p, v, rho, alpha, omega, k = s
        return jnp.logical_and(pdot(r, r).real > atol2, k < maxiter)

    def body(s):
        x, r, p, v, rho, alpha, omega, k = s
        rho1 = pdot(rhat, r)
        safe = lambda d: jnp.where(d == 0.0, 1.0, d)
        beta = (rho1 / safe(rho)) * (alpha / safe(omega))
        p_new = r + beta * (p - omega * v)
        v_new = matvec(p_new) * msk
        rtv = pdot(rhat, v_new)
        alpha_new = rho1 / safe(rtv)
        st = r - alpha_new * v_new
        t = matvec(st) * msk
        tt = pdot(t, t)
        omega_new = jnp.where(tt == 0.0, 0.0, pdot(t, st) / safe(tt))
        breakdown = (rho1 == 0.0) | (rtv == 0.0) | (omega == 0.0)
        x_new = x + alpha_new * p_new + omega_new * st
        r_new = st - omega_new * t
        x_new = jnp.where(breakdown, x, x_new)
        r_new = jnp.where(breakdown, r, r_new)
        k_new = jnp.where(breakdown, maxiter, k + 1)
        return (x_new, r_new, p_new, v_new, rho1, alpha_new, omega_new,
                k_new)

    z = jnp.zeros_like(b)
    one = jnp.asarray(1.0, b.dtype)
    init = (x0, r0, z, z, one, one, one, jnp.asarray(0, jnp.int32))
    x, r, *_, k = lax.while_loop(cond, body, init)
    return x, k, jnp.sqrt(pdot(r, r).real) / safe_b
