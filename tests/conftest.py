"""Test configuration: force an 8-virtual-device CPU JAX platform.

Set BEFORE jax is imported anywhere so multi-chip sharding tests can run
without TPU hardware (the standard JAX recipe for testing pjit/shard_map).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The session env pre-sets JAX_PLATFORMS=axon (experimental TPU tunnel) and a
# sitecustomize hook force-updates jax_platforms to "axon,cpu" at interpreter
# start — so the env var alone is NOT enough; explicitly re-update the jax
# config before any backend is touched. Tests must run on the virtual-device
# CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
# keep tests hermetic: CLI mains enable the persistent compilation cache
# unless opted out (tests that exercise it override this per-test)
os.environ.setdefault("E3DIFF_COMPILE_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules dominated by torch-side reference computations (CPU-only torch,
# 1 core here — they are most of the suite's wall clock). Marked so the
# fast half runs locally with:  pytest -m "not torch_parity"
TORCH_PARITY_MODULES = {
    "test_model_parity", "test_end_to_end_parity", "test_torch_export",
    "test_diffusion_parity",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in TORCH_PARITY_MODULES:
            item.add_marker(pytest.mark.torch_parity)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
