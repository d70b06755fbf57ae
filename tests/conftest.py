"""Test configuration: force an 8-device virtual CPU platform.

Multi-node behavior of the reference is only exercised by running MPI
(SURVEY.md section 4); here we go further and fake an 8-chip TPU mesh on CPU
so every sharding path is exercised in CI without hardware.

The ambient environment may pre-register a remote TPU platform via
sitecustomize and force `jax_platforms` through `jax.config.update` (which
overrides the JAX_PLATFORMS env var), so we must update the config AFTER
importing jax, not just set the env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ----------------------------------------------------------------------
# smoke tier: one fast representative per subsystem, selected here so
# the tier definition lives in one place.  `pytest -m smoke` must stay
# under ~10 minutes on this box; the FULL suite remains the round gate.
# ----------------------------------------------------------------------
import fnmatch  # noqa: E402

import pytest  # noqa: E402

_SMOKE_PATTERNS = [
    # fem: bases + quadrature + geometry
    "tests/test_fem.py::test_partition_of_unity*",
    "tests/test_fem.py::test_geometry_volume_and_gradients*",
    # mesh: gmsh IO + boundary + uniform refinement
    "tests/test_mesh.py::test_gmsh_roundtrip",
    "tests/test_mesh.py::test_boundary_ids_cover_all_faces",
    # native C++ meshkit bridge
    "tests/test_native.py::test_native_gmsh_parity",
    "tests/test_native.py::test_native_sparsity_parity",
    # solvers (whole file runs in ~11 s)
    "tests/test_solvers.py::*",
    # transient core: mixed precision + clamp
    "tests/test_transient.py::test_mixed_precision_matches_f64",
    "tests/test_transient.py::test_clamp_negative_solutions",
    # model physics: analytic Jacobian vs autodiff
    "tests/test_pihna.py::test_jacobian_matches_autodiff_of_rhs*",
    # oracle parity (single assembly, not the 120-step trajectory)
    "tests/test_parity_oracle.py::test_single_step_assembly_matches_oracle",
    # hyperelastic constitutive vs autodiff + eig3
    "tests/test_solid.py::test_stress_matches_autodiff_of_energy*",
    "tests/test_solid.py::test_eig3_matches_numpy",
    # AMR: selective refinement + constrained solve acceptance
    "tests/test_constrain.py::test_topology_invariants",
    "tests/test_adapt_ext.py::test_tet10_refine_quadratic_exact",
    # mixed-element step vs direct solve
    "tests/test_mixed.py::test_mixed_step_matches_direct_solve",
    # multi-chip: halo step equality + ONE full multichip driver
    "tests/test_halo.py::test_halo_step_matches_single_chip*",
    "tests/test_drivers_multichip.py::test_pihna_multichip",
    # one full single-chip driver end-to-end
    "tests/test_drivers.py::test_pihna_driver",
    # io: literal reference deck through the CLI (getpot + solid driver)
    "tests/test_drivers.py::test_literal_uniaxial_compression_deck",
]


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid.replace("\\", "/")
        if any(fnmatch.fnmatch(nid, p) for p in _SMOKE_PATTERNS):
            item.add_marker(pytest.mark.smoke)
