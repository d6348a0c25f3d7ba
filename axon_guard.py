"""Early pytest plugin: keep the test suite off the TPU tunnel.

The axon sitecustomize imports jax at interpreter startup whenever
PALLAS_AXON_POOL_IPS is set, binding the process to the single tunnel
chip before any conftest can set JAX_PLATFORMS=cpu. The suite is designed
for the virtual 8-device CPU mesh (tests/conftest.py), so if the
interpreter came up on axon we re-exec pytest with a cleaned environment.

Loaded via ``addopts = -p axon_guard`` (pytest.ini): ``-p`` plugins import
before pytest installs fd-level capture, so the re-exec'd process keeps
the real stdout/stderr (a conftest-time execve would write into pytest's
capture tempfiles and appear silent).
"""
import os
import sys

if os.environ.get("NMVLLM_TPU_TESTS") == "1":
    # Hardware test mode (tests/kernels/test_tpu_compile.py): keep the
    # tunnel so Pallas kernels compile with Mosaic instead of interpret
    # mode. Run ONE pytest process at a time in this mode.
    pass
elif os.environ.get("PALLAS_AXON_POOL_IPS") or \
        "axon" in os.environ.get("JAX_PLATFORMS", ""):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
