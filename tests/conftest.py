"""Test harness: run everything on a virtual 8-device CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (the reference has no tests
at all — SURVEY.md §4; this pyramid is built from scratch)."""

import os
import sys

# Must be set before jax import. FORCE cpu: the driver environment exports
# JAX_PLATFORMS=axon globally (the tunneled TPU), so a setdefault would leave
# every "CPU" test secretly competing for the single remote chip — which is
# exactly the intermittent-suite-stall failure mode we debugged.
os.environ["JAX_PLATFORMS"] = "cpu"
for _var in ("PJRT_LIBRARY_PATH", "TPU_LIBRARY_PATH"):
    os.environ.pop(_var, None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The host sitecustomize imports jax at interpreter start and calls
# jax.config.update("jax_platforms", "axon,cpu") — the env var is already
# overridden by the time conftest runs. Re-update the CONFIG (not the env) so
# tests genuinely run on the 8 virtual CPU devices instead of competing for
# the single tunneled TPU (the cause of the intermittent suite stalls).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
