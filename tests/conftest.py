"""Test configuration.

Tests run on a virtual 8-device CPU mesh (per SURVEY.md §4's rebuild
implication: multi-chip sharding is validated without TPU hardware). Pallas
kernels run in interpreter mode on CPU automatically (ops/utils.py).
"""
import os

# The suite runs on a virtual 8-device CPU mesh — never the TPU tunnel
# chip. The axon-environment escape hatch lives in axon_guard.py (early
# ``-p`` plugin, see pytest.ini); by the time this file runs the
# environment is already clean.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture
def example_prompts():
    return [
        "Hello, my name is",
        "The president of the United States is",
        "The capital of France is",
        "The future of AI is",
    ]
