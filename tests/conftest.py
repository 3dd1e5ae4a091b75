"""Test config: force an 8-virtual-device CPU platform BEFORE jax initializes.

This is the standard JAX trick for testing multi-chip sharding without TPUs
(SURVEY.md §4): tests exercising pjit/Mesh see 8 devices; everything else just
runs on CPU for speed and bit-stable comparisons against the torch oracle.
"""

import os

# torch's OpenMP pool deadlocks XLA:CPU executable execution when both run in
# one process (reproduced: torch conv -> jitted jax conv never completes).
# Pinning OMP to one thread avoids it; the torch oracle models are tiny.
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The machine's axon sitecustomize force-registers the TPU platform
# programmatically (jax_platforms="axon,cpu"), overriding the env var — pin the
# config back to pure CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
