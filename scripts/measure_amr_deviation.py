"""Measure the AMR-policy deviation: selective bisection vs uniform 1:8.

libMesh refines flagged elements 1:8 with hanging-node constraints
(reference src/pihna.C:752, :805-840); this build refines selectively by
conforming Rivara bisection (mesh/adapt.py) — a documented deviation.
This experiment bounds the trajectory difference the policy causes on an
AMR-active PIHNA case: run the same case through (a) uniform 1:8
refinement of the whole mesh (libMesh's policy is selective, but its
trajectories are sandwiched between the unrefined and uniformly refined
ones for this smooth problem) and (b) selective bisection on Kelly flags,
then compare both to (c) the unrefined run, all sampled at the ORIGINAL
coarse nodes at the final step.

Run on CPU:  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python3 scripts/measure_amr_deviation.py
"""

import numpy as np


def run_case(refine_mode: str, n=6, steps_before=2, steps_after=6):
    import jax.numpy as jnp

    from rdcfes_tpu.fem.amr import flag_by_mean_stddev, kelly_error_indicator
    from rdcfes_tpu.mesh import (AdaptiveMesh, adapt_flagged, box_tet_mesh,
                                 refine_uniform)
    from rdcfes_tpu.models.pihna import (default_params, pihna_blocks,
                                         pihna_physics)
    from rdcfes_tpu.systems import TransientRDCSystem

    mesh = box_tet_mesh(n, n, n, bounds=((0, 60.0), (0, 60.0), (0, 60.0)))
    N0 = mesh.n_nodes
    Kk = 2.39e5
    p = default_params()
    p.update(dt=0.5, cells_min_capacity=1.0, cells_max_capacity=Kk,
             cells_max_capacity_exponent=3.0, cytokines_max_capacity=1.0e-8,
             necrosis_c=500.0 / Kk, necrosis_h=200.0 / Kk,
             necrosis_v=300.0 / Kk, produce_c=-2.5, switch_c2h=1.0,
             switch_h2c=1.82, switch_h2n=0.5, diffuse_c=1.0,
             diffuse_v=0.5, produce_v=10.0, secrete_a_c=2.77e-13,
             secrete_a_h=5.22e-10, decay_a=5678.4)
    p = {k: float(v) for k, v in p.items()}
    rng = np.random.default_rng(0)
    u0 = np.zeros((N0, 5))
    r2 = ((mesh.coords - mesh.coords.mean(0)) ** 2).sum(axis=1)
    u0[:, 1] = 2000.0 * np.exp(-r2 / (2 * 8.0**2))
    u0[:, 2] = 500.0 * np.exp(-r2 / (2 * 10.0**2))
    u0[:, 3] = 7200.0 * (1.0 + 0.1 * rng.random(N0))
    u0[:, 4] = 1e-10

    system = TransientRDCSystem(mesh, 5, pihna_physics,
                                physics_blocks=pihna_blocks)
    state = system.initial_state(u0)
    for _ in range(steps_before):
        state, _, _ = system.step(state, params=p)

    if refine_mode != "none":
        u = np.asarray(state["u"])
        eta = kelly_error_indicator(mesh, jnp.asarray(u), list(range(5)))
        flags, coarsen = flag_by_mean_stddev(eta, 0.5, 10.0)
        if refine_mode == "uniform":
            r = refine_uniform(mesh)
        elif refine_mode == "bisect":
            am = AdaptiveMesh(mesh)
            r = adapt_flagged(am, flags, np.zeros_like(coarsen),
                              max_level=1)
            assert r is not None, "nothing flagged"
        mesh2 = r.mesh
        print(f"  {refine_mode}: {mesh.n_elems} -> {mesh2.n_elems} elems",
              flush=True)
        gstate = {k: np.asarray(v) for k, v in state.items()}
        system = TransientRDCSystem(mesh2, 5, pihna_physics,
                                    physics_blocks=pihna_blocks)
        state = {k: jnp.asarray(r.prolong(v)) for k, v in gstate.items()}
        # original coarse nodes keep their ids
        assert np.allclose(mesh2.coords[:N0], mesh.coords)

    for _ in range(steps_after):
        state, _, _ = system.step(state, params=p)
    return np.asarray(state["u"])[:N0]


def main():
    print("running unrefined / uniform-1:8 / selective-bisection...",
          flush=True)
    u_none = run_case("none")
    u_unif = run_case("uniform")
    u_bis = run_case("bisect")

    def rel(a, b):
        return float(np.linalg.norm(a - b) / np.linalg.norm(b))

    d_bis_unif = rel(u_bis, u_unif)
    d_none_unif = rel(u_none, u_unif)
    print(f"|bisect  - uniform| / |uniform| = {d_bis_unif:.3e}")
    print(f"|none    - uniform| / |uniform| = {d_none_unif:.3e}")
    print(f"adaptive recovers {100 * (1 - d_bis_unif / d_none_unif):.1f}% "
          f"of the refinement effect at the flagged-region scale")


if __name__ == "__main__":
    main()
