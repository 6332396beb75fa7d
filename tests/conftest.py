"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
tests run without a pod (SURVEY.md §4.4).

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
so the backend must be forced via jax.config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_memory():
    """Release compiled executables between test modules: the full suite
    holds hundreds of XLA:CPU programs and the compiler segfaults under the
    resulting memory pressure near the end of the run (observed twice at
    >90%; every module passes in isolation)."""
    yield
    jax.clear_caches()
