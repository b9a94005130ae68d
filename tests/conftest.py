"""Test env: run on CPU with 8 virtual devices so multi-chip sharding tests
work without a TPU pod (the standard JAX fake-backend, SURVEY.md §4).

Note: this sandbox exports JAX_PLATFORMS=axon and re-pins it even when the
env var is overridden, so we must force the platform through jax.config
before the backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
