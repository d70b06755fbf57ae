"""Application drivers — one per reference model driver (src/main.C:28-57).

Each driver reads a GetPot deck, builds its systems, runs the time loop, and
writes the reference's artifacts (processed Gmsh copy, VTU/PVD time series,
CSV science metrics) into the results directory.
"""

from . import pihna, adpm, proteas, ripf, solid, coupled_hcc, process_mesh

__all__ = ["pihna", "adpm", "proteas", "ripf", "solid", "coupled_hcc",
           "process_mesh"]
