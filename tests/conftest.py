"""Test harness configuration.

Runs the whole suite on a virtual 8-device CPU mesh so that single-machine CI
exercises the same sharding code paths as a real TPU pod
(the standard JAX substitute for multi-chip testing; see SURVEY.md section 4).
Must set the environment before JAX initialises its backends.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Keep the suite hermetic: don't read or write the persistent XLA cache.
# The package-level default persists EVERY compile (round-5 cold-start fix),
# which under pytest would (a) flood the cache dir with thousands of
# throwaway CPU executables and (b) later LOAD CPU AOT entries compiled
# with different host-feature flags (observed cpu_aot_loader machine-type
# mismatch warnings - a SIGILL hazard).
os.environ.setdefault("MRI_SR_NO_COMPILE_CACHE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment rewrites JAX_PLATFORMS=cpu to "axon,cpu" (the TPU plugin
# prepends itself), so the env var alone does NOT select CPU — the config API
# must be used before backends initialise.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
