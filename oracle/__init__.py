"""Independent NumPy/SciPy parity oracle.

A *separate* transcription of the reference physics (straight from
/root/reference/src — NOT from rdcfes_tpu), assembled with scipy.sparse and
solved with a direct factorization.  Used to (a) regression-diff the TPU
framework per step at the 1e-8 parity bar with an implementation that shares
no code with it, and (b) measure a real CPU wall-clock baseline for bench.py
(the reference's libMesh/PETSc stack cannot be built in this environment —
see PARITY.md).
"""

from .pihna_numpy import PihnaOracle  # noqa: F401
