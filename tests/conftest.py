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
