"""rdcfes_tpu — a TPU-native reaction-diffusion-convection finite-element framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
InSilicoModellingGroup/rdcFEs (a C++/libMesh/PETSc/MPI unstructured-mesh FE
solver for computational-biology PDE models).  Nothing here is a translation:
the compute path is batched SoA element arrays, gather-quadrature-scatter
assembly, block-CSR sparse operators in HBM and on-device Krylov solvers,
sharded over a `jax.sharding.Mesh` for multi-chip scaling.

Reference surface being re-provided (see SURVEY.md):
  * five transient RDC model drivers: PIHNA, ADPM, PROTEAS, RIPF, HCC
    (reference: src/pihna.C, src/adpm.C, src/proteas.C, src/ripf.C,
     src/coupled_hcc.C)
  * quasi-static finite-strain hyperelastic solid mechanics
    (reference: src/solid.C, src/solid_system.C, src/hyperelastic.h)
  * the two-way coupled RDC <-> solid driver (reference: src/coupled_hcc.C)
  * mesh/IO contracts: Gmsh 2.x, GetPot decks, nodal/elemental `.dat` ICs,
    ParaView VTU/PVD, CSV science metrics (reference: src/paraview.h,
    src/process_mesh.C, run/*/input.dat)

Numerical parity requires float64; we enable x64 mode at import, before any
JAX array is created.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
