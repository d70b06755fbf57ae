"""Test configuration: force an 8-device virtual CPU platform.

Multi-node behavior of the reference is only exercised by running MPI
(SURVEY.md section 4); here we go further and fake an 8-chip TPU mesh on CPU
so every sharding path is exercised in CI without hardware.  Must run before
jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
