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

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-program caches after each module. The full suite
    accumulates hundreds of CPU executables in one process; past ~100 tests
    that deterministically segfaults XLA:CPU's compiler (observed twice at
    the same test, 2026-08-18; every module subset passes in isolation).
    Model/pipeline fixtures are module-scoped, so nothing is shared across
    modules anyway — clearing only trades a little recompile time."""
    yield
    jax.clear_caches()
