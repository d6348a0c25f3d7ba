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
if os.environ.get("NMVLLM_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Eigen threading on the virtual mesh: one shared policy (eigen_tuning.py)
# keyed on the ACTUAL device count in XLA_FLAGS (an externally-set count,
# e.g. 32 devices on a 16-CPU host, must pick multi-threaded Eigen).
from eigen_tuning import apply_to_xla_flags  # noqa: E402 (root conftest path)

os.environ["XLA_FLAGS"] = apply_to_xla_flags(flags)

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


def pytest_collection_modifyitems(config, items):
    """CI-tier test-group gating (reference tests/nm_utils/utils_skip.py:
    every module checks TEST_<GROUP>=DISABLE env vars so CI tiers can
    select groups). Here one collection hook covers the whole suite:
    TEST_KERNELS=DISABLE skips tests/kernels/, TEST_DISTRIBUTED=DISABLE
    skips tests/distributed/, etc."""
    import os
    skips = {}
    for item in items:
        parts = item.nodeid.replace("\\", "/").split("/")
        if len(parts) < 3 or parts[0] != "tests":
            continue
        group = parts[1].upper()
        if group not in skips:
            disabled = os.environ.get(f"TEST_{group}") == "DISABLE"
            skips[group] = (pytest.mark.skip(
                reason=f"TEST_{group}=DISABLE (CI tier gating)")
                if disabled else None)
        if skips[group] is not None:
            item.add_marker(skips[group])
