"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via XLA's host-device
virtualization (the pattern SURVEY.md §4 prescribes for the rebuild). Env
vars must be set before jax initializes, hence the top-of-conftest side
effects.
"""

import os

# FORCE cpu: the machine profile exports JAX_PLATFORMS=axon (a tunneled
# remote TPU) which must never serve unit tests. POSTERIFLOW_TEST_TPU=1
# opts back in for on-hardware checks.
if not os.environ.get("POSTERIFLOW_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize sets jax_platforms='axon,cpu' in jax.config at
# interpreter start (env vars are too late) — override the CONFIG too, or
# every test run initializes the tunneled TPU (minutes of handshake) and
# hits its unimplemented ops.
if not os.environ.get("POSTERIFLOW_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: first run pays XLA:CPU compile time,
# subsequent runs reuse it. Per-platform dir (a shared dir confuses the
# experimental axon TPU backend's cache entries).
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def key():
    return jax.random.PRNGKey(0)
