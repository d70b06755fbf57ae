"""Quasi-static finite-strain solid mechanics system (moving mesh).

TPU-native replacement for the reference's SolidSystem : FEMSystem
(src/solid_system.C) + libMesh NewtonSolver stack:

* the unknowns ARE the current node positions x (N, 3) — the reference's
  "coordinates as primary variables / mesh_position_get-set" machinery
  (src/solid_system.C:49-123) reduces, in a functional formulation, to
  re-evaluating the geometry factors from x inside the Newton loop
* element residual/Jacobian: internal forces B^T sigma and geometric +
  material stiffness from the batched hyperelastic evaluation
  (src/solid_system.C:146-271; constitutive math in models/hyperelastic.py)
* penalty Dirichlet boundary conditions on deformed-vs-reference positions,
  scaled by pseudo-time * 1.000001, with the NaN=unconstrained-axis
  convention (src/solid_system.C:273-371)
* post-processing: per-element averaged Cauchy stress -> principal values ->
  hydrostatic pressure + Von Mises, and fibre push-forward F*eta
  (src/solid_system.C:394-538; eigensolver in models/eig3.py)

The penalty-BC Jacobian uses the same inexact linearization as the
reference (psi_i psi_j * penalty only, geometry treated as frozen).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import (assemble_matrix_gather, assemble_vector_gather,
                            build_sparsity, invert_scatter)
from ..fem.geometry import face_geometry_factors, geometry_factors
from ..mesh.core import FACE_TYPE, Mesh
from ..models.eig3 import principal_stress_invariants
from ..models.hyperelastic import stress_and_tangent_cf
from ..solvers.newton import NewtonOptions, NewtonResult, NewtonSolver

# B-matrix slot table: (axis v, voigt a) -> gradient component, for the
# Voigt ordering (00, 11, 22, 01, 12, 02)
_B_SLOTS = {
    (0, 0): 0, (0, 3): 1, (0, 5): 2,
    (1, 1): 1, (1, 3): 0, (1, 4): 2,
    (2, 2): 2, (2, 4): 1, (2, 5): 0,
}


@dataclass
class SolidBC:
    """One penalty Dirichlet boundary set: displacement per axis, NaN = free."""

    boundary_id: int
    displacement: Tuple[float, float, float]


def element_kernels_cf(elem_type, x, conn, X0e_cf, young, poisson,
                       fibre_k, rates, fibres, pseudo_time,
                       want_tangent=True):
    """Element residual/tangent blocks (Fe (3, K, E)[, Ke (3,3,K,K,E)])
    from current positions x (N, 3) and per-element tables — the
    constitutive hot loop, channel-first throughout (every 3x3/6x6
    tensor is a nested list of (Q, E) arrays with the big axes minor,
    so nothing tile-pads on TPU).  Module-level so both the single-chip
    SolidSystem and the node-partitioned multi-chip solid (parallel/
    solid_halo.py) share one constitutive code path
    (reference src/solid_system.C:146-271)."""
    phi, JxW, dphi = geometry_factors(x, conn, elem_type)
    Q, K = phi.shape
    # grad_X[d][r] (Q, E) = d X0_d / d x_r
    grad_X = [
        [sum(dphi[:, k, r, :] * X0e_cf[k, d, :] for k in range(K))
         for r in range(3)]
        for d in range(3)
    ]
    lam_e = 1.0 + pseudo_time * rates  # (E, 3)
    lam = [lam_e[:, d] for d in range(3)]   # broadcast (E,) vs (Q, E)
    eta = [fibres[:, d] for d in range(3)]
    sigma, tangent, _F = stress_and_tangent_cf(
        grad_X, lam, eta, young, poisson, fibre_k,
        want_tangent=want_tangent,
    )
    # stack the nested-list tensors once: (3, 3, Q, E) / (6, 6, Q, E);
    # all per-(i, j) contractions below are broadcast ops with the big
    # E axis minor — O(100) HLO ops total (a fully unrolled i/j/q loop
    # nest compiled for tens of minutes at HEX8)
    sig = jnp.stack([jnp.stack(r) for r in sigma])        # (3, 3, Q, E)
    if not want_tangent:
        Fe = None
        for q in range(Q):
            sig_q = sig[:, :, q, :] * JxW[q]
            fe_q = (sig_q[:, None, :, :] * dphi[q][None, :, :, :]).sum(2)
            Fe = fe_q if Fe is None else Fe + fe_q
        return Fe, None
    tan = jnp.stack([jnp.stack(r) for r in tangent])      # (6, 6, Q, E)

    Fe = None
    G = None
    Kmat = None
    for q in range(Q):
        sig_q = sig[:, :, q, :] * JxW[q]                  # (3, 3, E)
        dphi_q = dphi[q]                                  # (K, 3, E)
        # residual: (3, K, E) = sum_d sig[v, d] dphi[i, d]
        fe_q = (sig_q[:, None, :, :] * dphi_q[None, :, :, :]).sum(2)
        Fe = fe_q if Fe is None else Fe + fe_q
        # geometric stiffness: s1[i, d] = sum_c dphi[i, c] sig[c, d]
        s1 = (dphi_q[:, :, None, :] * sig_q[None, :, :, :]).sum(1)
        g_q = (s1[:, None, :, :] * dphi_q[None, :, :, :]).sum(2)
        G = g_q if G is None else G + g_q                 # (K, K, E)
        # material stiffness: B (3, 6, K, E) sparse placement of dphi
        Bq = jnp.stack([
            jnp.stack([
                (dphi_q[:, _B_SLOTS[(v, a)], :]
                 if (v, a) in _B_SLOTS else
                 jnp.zeros_like(dphi_q[:, 0, :]))
                for a in range(6)
            ])
            for v in range(3)
        ])                                                # (3, 6, K, E)
        tan_q = tan[:, :, q, :] * JxW[q]                  # (6, 6, E)
        # T1[a, w, j] = sum_b tan[a, b] B[w, b, j]
        T1 = None
        for b in range(6):
            t = (tan_q[:, b][:, None, None, :]
                 * Bq[None, :, b, :, :])                  # (6, 3, K, E)
            T1 = t if T1 is None else T1 + t
        # Kmat[v, w, i, j] = sum_a B[v, a, i] T1[a, w, j]
        for a in range(6):
            t = (Bq[:, a][:, None, :, None, :]
                 * T1[a][None, :, None, :, :])            # (3,3,K,K,E)
            Kmat = t if Kmat is None else Kmat + t

    Ke = (Kmat + jnp.eye(3, dtype=Kmat.dtype)[:, :, None, None, None]
          * G[None, None])
    return Fe, Ke


class SolidSystem:
    """Quasi-static hyperelastic equilibrium with load stepping."""

    def __init__(
        self,
        mesh: Mesh,
        materials: Dict[int, Dict[str, float]],
        bcs: Dict[int, Tuple[float, float, float]],
        penalty: float = 1.0e5,
        fibres: Optional[np.ndarray] = None,
        newton: NewtonOptions = NewtonOptions(),
        device_mesh=None,
        constraints: Optional[np.ndarray] = None,
        tangent_precision: str = "f64",
    ):
        self.mesh = mesh
        self.newton = newton
        self.penalty = float(penalty)
        # "f32": the tangent (and only the tangent — the residual the
        # Newton stopping rules see stays f64) is evaluated and scattered
        # in single precision.  Inexact-Newton argument: the Jacobian only
        # steers the iteration; convergence is measured on the f64
        # residual, so the converged equilibrium is unchanged up to the
        # Newton tolerance.  Measured on the 110k-HEX8 bench (PERF.md
        # section 11): the f64 tangent assembly is ~92% of the load step.
        assert tangent_precision in ("f64", "f32")
        if tangent_precision != "f64" and device_mesh is not None:
            # the node-partitioned halo Newton (parallel/solid_halo.py)
            # assembles inside one fused shard_map program and does not
            # carry the split-precision path; fall back loudly so a
            # multi-chip deck behaves predictably
            print("solid: tangent_precision=f32 is single-chip only; "
                  "multi-chip run keeps the f64 tangent", flush=True)
            tangent_precision = "f64"
        self.tangent_precision = tangent_precision
        # per-element-type blocks: a single-type mesh is the one-block
        # case; MixedMesh assembles every block into the union sparsity
        # (libMesh's polymorphic element loop, src/solid_system.C:146,
        # as fixed-shape batches — same design as systems/mixed.py)
        mixed = getattr(mesh, "elem_type", None) == "MIXED"
        if mesh.elem_type not in ("TET4", "HEX8", "TET10", "MIXED"):
            raise ValueError(
                f"solid mechanics supports TET4/HEX8/TET10/MIXED "
                f"element types, got {mesh.elem_type}")
        if mixed:
            from ..fem.assembly import build_sparsity_mixed

            conns = [(b.elem_type, np.asarray(b.connectivity))
                     for b in mesh.blocks]
            self.sp, slot_lists = build_sparsity_mixed(
                mesh.blocks, mesh.n_nodes)
        else:
            conns = [(mesh.elem_type, np.asarray(mesh.connectivity))]
            self.sp = build_sparsity(mesh.connectivity, mesh.n_nodes)
            slot_lists = [self.sp.slots_flat_cf()]
        self.diag_slots = jnp.asarray(self.sp.diag_slots)
        self.X0 = jnp.asarray(mesh.coords)  # undeformed configuration

        # per-element material tables (subdomain -> element broadcast,
        # replacing the per-element string-keyed parameter lookups of
        # src/solid_system.C:183-190)
        E = mesh.n_elems
        young = np.full(E, 1.0e3)
        poisson = np.full(E, 0.3)
        fibre_k = np.zeros(E)
        rates = np.zeros((E, 3))
        for sid, mat in materials.items():
            sel = mesh.subdomain_id == sid
            young[sel] = mat.get("young", 1.0e3)
            poisson[sel] = mat.get("poisson", 0.3)
            fibre_k[sel] = mat.get("fibre_stiffness", 0.0)
            for d in range(3):
                rates[sel, d] = mat.get(f"stretch_rate_{d}", 0.0)
        if fibres is None:
            fibres = np.zeros((E, 3))
        # multi-chip: the node-partitioned halo Newton (parallel/
        # solid_halo.py) — element tangents stay shard-local, the inner
        # Krylov iterates on distributed slabs with ppermute ghost
        # exchange; per-device memory O(N/D + boundary), replacing the
        # round-2 replicated-Newton design that psummed the full global
        # (3, 3, nnz) values to every device
        self._halo = None
        if device_mesh is not None:
            from ..parallel.solid_halo import HaloSolidSystem

            self._halo = HaloSolidSystem(
                mesh, young, poisson, fibre_k, rates, np.asarray(fibres),
                bcs={k: tuple(v) for k, v in bcs.items()},
                penalty=self.penalty, newton=newton,
                device_mesh=device_mesh)
        self.young = jnp.asarray(young)
        self.poisson = jnp.asarray(poisson)
        self.fibre_k = jnp.asarray(fibre_k)
        self.rates = jnp.asarray(rates)

        if fibres is None:
            fibres = np.zeros((E, 3))
        self.fibres = jnp.asarray(fibres)

        # per-block element tables (channel-first undeformed coords,
        # materials sliced in block-concat element order)
        self.eblocks = []
        off = 0
        for (et, conn), slots_b in zip(conns, slot_lists):
            Eb = conn.shape[0]
            sel = slice(off, off + Eb)
            off += Eb
            self.eblocks.append({
                "elem_type": et,
                "conn": jnp.asarray(conn),
                "conn_flat_cf": jnp.asarray(conn.T.reshape(-1)),
                "slots_flat_cf": jnp.asarray(slots_b),
                # inverted (gather) assembly tables: TPU scatter-adds are
                # quasi-serial — the 9 x 7.08M-contribution tangent
                # scatter measured ~5.5 s of the 6.0 s bench-scale
                # assembly (dtype-INsensitive, PERF.md section 11.3) —
                # so the solid path assembles by slot-pull like the
                # transient production path (fem/assembly.py
                # gather_tables rationale)
                "slot_gather": jnp.asarray(invert_scatter(
                    np.asarray(slots_b), self.sp.nnz)),
                "node_gather": jnp.asarray(invert_scatter(
                    conn.T.reshape(-1), mesh.n_nodes)),
                "X0e_cf": jnp.asarray(
                    np.transpose(mesh.coords[conn], (1, 2, 0))),
                "young": jnp.asarray(young[sel]),
                "poisson": jnp.asarray(poisson[sel]),
                "fibre_k": jnp.asarray(fibre_k[sel]),
                "rates": jnp.asarray(rates[sel]),
                "fibres": jnp.asarray(np.asarray(fibres)[sel]),
            })

        # boundary-condition face tables (static shapes); on MixedMesh
        # boundary_faces are -1-padded to 4 nodes and carry BOTH face
        # arities (pyramids expose tri and quad faces), so penalty BCs
        # are grouped by face type
        bfaces, bmask, bdisp = [], [], []
        for bid, disp in bcs.items():
            sel = mesh.boundary_id == bid
            faces = mesh.boundary_faces[sel]
            if len(faces) == 0:
                continue
            d = np.asarray(disp, dtype=np.float64)
            m = ~np.isnan(d)
            bfaces.append(faces)
            bmask.append(np.broadcast_to(m, (len(faces), 3)).copy())
            bdisp.append(np.broadcast_to(np.nan_to_num(d), (len(faces), 3)).copy())
        self.bc_groups = []
        if bfaces:
            faces = np.concatenate(bfaces)
            mask = np.concatenate(bmask).astype(np.float64)
            disp = np.concatenate(bdisp)
            if mixed:
                quad = faces[:, 3] >= 0
                face_sets = [("QUAD4", quad, 4), ("TRI3", ~quad, 3)]
            else:
                face_sets = [(FACE_TYPE[mesh.elem_type], np.ones(
                    len(faces), dtype=bool), faces.shape[1])]
            # face slot lookup into the union sparsity: pair keys are the
            # sorted uniques, so searchsorted replaces the dict scan
            keys = (self.sp.rows.astype(np.int64) * mesh.n_nodes
                    + self.sp.cols)
            for ft, fsel, kf in face_sets:
                if not fsel.any():
                    continue
                fc = faces[fsel][:, :kf].astype(np.int64)
                fkeys = fc[:, :, None] * mesh.n_nodes + fc[:, None, :]
                fslots = np.searchsorted(keys, fkeys).astype(np.int32)
                self.bc_groups.append({
                    "face_type": ft,
                    "faces": jnp.asarray(fc),
                    "mask": jnp.asarray(mask[fsel]),
                    "disp": jnp.asarray(disp[fsel]),
                    "slots": jnp.asarray(fslots),
                })
        # hanging-node constraints (mixed-mesh AMR, mesh/adapt_ext.py):
        # Newton iterates in the reduced space, C^T K C matrix-free
        # (reference src/solid.C:330-369 refines mesh-generically; the
        # libMesh analogue is DofMap constraint condensation)
        if constraints is not None and len(constraints) and (
                device_mesh is not None):
            raise ValueError(
                "hanging-node constraints in the solid Newton path are "
                "single-chip only (COMPONENTS.md); run with "
                "parallel/n_devices = 1")
        self._newton = NewtonSolver(self.sp, newton, constraints=constraints)
        self.dmesh = device_mesh
        self._assemble_jit = jax.jit(self.assemble)
        self._residual_jit = jax.jit(self.assemble_residual)
        self._post = jax.jit(self._post_impl)

    # ------------------------------------------------------------------
    def initial_positions(self) -> jnp.ndarray:
        return self.X0

    # ------------------------------------------------------------------
    def assemble(self, x_T: jnp.ndarray, pseudo_time) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Residual (3, N) and block tangent values (3, 3, nnz) at current
        positions x_T (3, N) — channel-first at the solver boundary; the
        global operator is the sum of per-type block assemblies."""
        x = x_T.T  # (N, 3)
        if self.tangent_precision == "f32":
            # split assembly: the residual in f64 (the Newton stopping
            # rules and the outer Krylov residual carry see it), the
            # tangent evaluated + contracted + scattered entirely in f32
            # — the tangent only steers (inexact Newton), and its f64
            # evaluation is ~92% of the measured load step
            R = self.assemble_residual(x_T, pseudo_time)
            f32 = jnp.float32
            x32 = x.astype(f32)
            pt32 = jnp.asarray(pseudo_time, f32)
            values = None
            for blk in self.eblocks:
                _, Ke = element_kernels_cf(
                    blk["elem_type"], x32, blk["conn"],
                    blk["X0e_cf"].astype(f32),
                    blk["young"].astype(f32), blk["poisson"].astype(f32),
                    blk["fibre_k"].astype(f32), blk["rates"].astype(f32),
                    blk["fibres"].astype(f32), pt32,
                    want_tangent=True)
                v = assemble_matrix_gather(Ke, blk["slot_gather"])
                values = v if values is None else values + v
            if self.bc_groups:
                values = self._penalty_bc_values(x32, pt32, values)
            return R, values
        R = None
        values = None
        for blk in self.eblocks:
            Fe, Ke = element_kernels_cf(
                blk["elem_type"], x, blk["conn"], blk["X0e_cf"],
                blk["young"], blk["poisson"], blk["fibre_k"],
                blk["rates"], blk["fibres"], pseudo_time,
                want_tangent=True)
            v = assemble_matrix_gather(Ke, blk["slot_gather"])
            r = assemble_vector_gather(Fe, blk["node_gather"])
            values = v if values is None else values + v
            R = r if R is None else R + r

        if self.bc_groups:
            R, values = self._apply_penalty_bcs(x, pseudo_time, R, values)
        return R, values

    def assemble_residual(self, x_T: jnp.ndarray, pseudo_time) -> jnp.ndarray:
        """Residual (3, N) only — no tangent assembly: the constitutive
        evaluation without the (much larger) tangent contraction, used by
        Newton line-search backtracking trials, which only need ||R||."""
        x = x_T.T
        R = None
        for blk in self.eblocks:
            Fe, _ = element_kernels_cf(
                blk["elem_type"], x, blk["conn"], blk["X0e_cf"],
                blk["young"], blk["poisson"], blk["fibre_k"],
                blk["rates"], blk["fibres"], pseudo_time,
                want_tangent=False)
            r = assemble_vector_gather(Fe, blk["node_gather"])
            R = r if R is None else R + r
        if self.bc_groups:
            R = self._penalty_bc_residual(x, pseudo_time, R)
        return R

    def _penalty_bc_residual(self, x, pseudo_time, R):
        """The residual half of _apply_penalty_bcs."""
        ratio = pseudo_time * 1.000001
        for g in self.bc_groups:
            psi, JxWf, xyz, _ = face_geometry_factors(x, g["faces"],
                                                      g["face_type"])
            orig = jnp.einsum("qk,fkd->fqd", psi, self.X0[g["faces"]])
            target = ratio * g["disp"]
            diff = xyz - orig - target[:, None, :]
            masked = diff * g["mask"][:, None, :]
            Rf = self.penalty * jnp.einsum("fq,qi,fqv->vfi", JxWf, psi,
                                           masked)
            bcf = g["faces"].reshape(-1)
            R = jnp.stack([
                R[v].at[bcf].add(Rf[v].reshape(-1)) for v in range(3)
            ])
        return R

    def _apply_penalty_bcs(self, x, pseudo_time, R, values):
        """Penalty Dirichlet contributions (src/solid_system.C:273-371).

        R (3, N); values (3, 3, nnz) — channel-first scatter targets."""
        R = self._penalty_bc_residual(x, pseudo_time, R)
        return R, self._penalty_bc_values(x, pseudo_time, values)

    def _penalty_bc_values(self, x, pseudo_time, values):
        """The tangent half of _apply_penalty_bcs — dtype follows
        `values` (the f32-tangent path feeds x/values in f32)."""
        dt_ = values.dtype
        for g in self.bc_groups:
            psi, JxWf, _, _ = face_geometry_factors(x, g["faces"],
                                                    g["face_type"])
            # jacobian: penalty * psi_i psi_j on constrained axes
            # (diagonal blocks)
            psi_ = psi.astype(dt_)
            Kf_pen = self.penalty * jnp.einsum(
                "fq,qi,qj->fij", JxWf.astype(dt_), psi_, psi_)
            # (3, 3, F, i, j): delta_vw * mask[f, v] * Kf_pen[f, i, j]
            Kblocks = (
                jnp.eye(3, dtype=dt_)[:, :, None, None, None]
                * g["mask"].T.astype(dt_)[:, None, :, None, None]
                * Kf_pen[None, None, :, :, :]
            )
            bcs_flat = g["slots"].reshape(-1)
            values = jnp.stack([
                jnp.stack([
                    values[v, w].at[bcs_flat].add(Kblocks[v, w].reshape(-1))
                    for w in range(3)
                ])
                for v in range(3)
            ])
        return values

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    def run_solver(self, x: jnp.ndarray, pseudo_time: float) -> NewtonResult:
        """One load step: Newton-solve equilibrium at the given pseudo-time
        (reference run_solver, src/solid_system.C:373-392).  The Newton loop
        runs on the host over jitted assemble/linear-solve stages (see
        solvers.newton for why).  Public x is (N, 3); the solver works
        channel-first internally."""
        if self._halo is not None:
            # node-partitioned multi-chip Newton (parallel/solid_halo.py)
            return self._halo.run_solver(np.asarray(x), pseudo_time)
        pt = jnp.asarray(pseudo_time, jnp.float64)
        res = self._newton.solve(
            lambda y: self._assemble_jit(y, pt), x.T,
            residual_only=lambda y: self._residual_jit(y, pt))
        return res._replace(x=res.x.T)

    # ------------------------------------------------------------------
    def _post_impl(self, x: jnp.ndarray, pseudo_time):
        """Per-element pressure, Von Mises, current fibre vector
        (reference post_process, src/solid_system.C:394-538); per-type
        blocks concatenated in block-concat element order."""
        ps, vms, fcs = [], [], []
        for blk in self.eblocks:
            phi, JxW, dphi = geometry_factors(x, blk["conn"],
                                              blk["elem_type"])
            Q, K = phi.shape
            grad_X = [
                [sum(dphi[:, k, r, :] * blk["X0e_cf"][k, d, :]
                     for k in range(K))
                 for r in range(3)]
                for d in range(3)
            ]
            lam_e = 1.0 + pseudo_time * blk["rates"]
            fib = blk["fibres"]
            sigma, _, F = stress_and_tangent_cf(
                grad_X, [lam_e[:, d] for d in range(3)],
                [fib[:, d] for d in range(3)],
                blk["young"], blk["poisson"], blk["fibre_k"],
                want_tangent=False,
            )
            # arithmetic qp mean, as the reference; back to (E, 3, 3)
            # only for the tiny per-element eigensolver input
            nq = Q
            sigma_avg = jnp.stack([
                jnp.stack([sigma[i][j].sum(axis=0) / nq for j in range(3)],
                          axis=-1)
                for i in range(3)
            ], axis=-2)  # (E, 3, 3)
            p, vm = principal_stress_invariants(sigma_avg)
            fibre_cur = jnp.stack([
                (F[i][0] * fib[:, 0] + F[i][1] * fib[:, 1]
                 + F[i][2] * fib[:, 2]).sum(axis=0) / nq
                for i in range(3)
            ], axis=-1)  # (E, 3)
            ps.append(p)
            vms.append(vm)
            fcs.append(fibre_cur)
        if len(ps) == 1:
            return ps[0], vms[0], fcs[0]
        return (jnp.concatenate(ps), jnp.concatenate(vms),
                jnp.concatenate(fcs, axis=0))

    def post_process(self, x: jnp.ndarray, pseudo_time: float):
        return self._post(x, jnp.asarray(pseudo_time, jnp.float64))

    # ------------------------------------------------------------------
    def displacement(self, x: jnp.ndarray) -> jnp.ndarray:
        """u = current - undeformed (reference SolidSystem::update,
        src/solid_system.C:103-123)."""
        return x - self.X0
