"""Measure the lowered-MLIR size of the PIHNA step program per fast-path
config — the remote compile helper SIGKILLs (OOM) on big programs, so
payload size is the gating resource for enabling the f64/fused kernel
variants.  Lowering is client-side: no TPU round trip.

Usage: python scripts/probe_lower_size.py [f64 fused]...
"""

import os
import re
import sys

import numpy as np


def build_system(f64: bool, fused: bool):
    os.environ["RDCFES_FAST_F64"] = "1" if f64 else "0"
    os.environ["RDCFES_FAST_FUSED"] = "1" if fused else "0"
    from rdcfes_tpu.mesh import box_tet_mesh
    from rdcfes_tpu.models.pihna import (default_params, pihna_blocks,
                                         pihna_physics)
    from rdcfes_tpu.systems import TransientRDCSystem

    n = 28
    mesh = box_tet_mesh(n, n, n, bounds=((0, 150.0), (0, 180.0), (0, 150.0)))
    Kk = 2.39e5
    params = default_params()
    params.update(
        dt=0.1, cells_min_capacity=1.0, cells_max_capacity=Kk,
        cells_max_capacity_exponent=3.0, cytokines_max_capacity=1.0e-8,
        necrosis_c=500.0 / Kk, necrosis_h=200.0 / Kk, necrosis_v=300.0 / Kk,
        produce_c=-2.5, switch_c2h=1.0, switch_h2c=1.82, switch_h2n=0.5,
        diffuse_v=0.5, produce_v=10.0,
        cells_diffusion_c=0.255, cells_diffusion_h=0.255,
    )
    params = {k: float(v) for k, v in params.items()}
    system = TransientRDCSystem(mesh, 5, pihna_physics,
                                physics_blocks=pihna_blocks,
                                precision="mixed", precond_refresh=10)
    return system, params, mesh


def probe(f64: bool, fused: bool):
    import jax

    system, params, mesh = build_system(f64, fused)
    # force fast tables (so flags are read now)
    system._fast = None
    fast = system._fast_tables()
    print(f"config f64={f64} fused={fused}: "
          f"use_f64={fast['use_f64']} use_fused={fast['use_fused']}")
    u0 = np.zeros((mesh.n_nodes, 5))
    u0[:, 3] = 7200.0
    state = system.initial_state(u0)
    fresh, reuse = system._qp_step_fn(params)
    fa = system._fast_args()
    low = fresh.lower(state, {}, fa, system._geom_args())
    txt = low.as_text()
    n_cc = txt.count("tpu_custom_call")
    # serialized Mosaic kernels ride in big string constants; histogram
    # the sizes of all string/dense literals > 100 kB
    bigs = sorted((len(m) for m in re.findall(r'"([^"]{100000,})"', txt)),
                  reverse=True)
    print(f"  MLIR text: {len(txt)/1e6:.1f} MB, "
          f"custom_call mentions: {n_cc}")
    print(f"  big literals (>0.1 MB): "
          f"{[round(b/1e6, 2) for b in bigs[:20]]}")
    # what else is big: count dense constant bytes
    dense = sum(len(m) for m in re.findall(r"dense<[^>]{1000,}>", txt))
    print(f"  dense<> constants total: {dense/1e6:.1f} MB")
    return txt


if __name__ == "__main__":
    cfgs = [(False, False), (True, False), (False, True)]
    if len(sys.argv) > 1:
        cfgs = [(bool(int(sys.argv[1])), bool(int(sys.argv[2])))]
    for i, (f64, fused) in enumerate(cfgs):
        if i > 0:
            # fresh process per config would be cleaner; flags are read at
            # _fast_tables time and systems are rebuilt, so in-process is ok
            pass
        probe(f64, fused)
