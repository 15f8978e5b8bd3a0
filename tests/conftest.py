"""Test harness config: force the CPU backend (the axon TPU plugin in
this image ignores JAX_PLATFORMS and eager dispatch over its tunnel is
pathologically slow) and expose 8 virtual host devices so multi-chip
sharding is testable without a TPU pod (SURVEY.md §4)."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))
