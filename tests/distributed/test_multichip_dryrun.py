"""Multi-chip sharding validation on a virtual CPU mesh (SURVEY §4 rebuild
implication: the reference has no fake cluster; we validate TP/DP sharding
without hardware via xla_force_host_platform_device_count)."""
import os
import subprocess
import sys

import pytest


@pytest.mark.e2e
def test_dryrun_multichip_8dev():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    result = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                            capture_output=True, text=True, timeout=900)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "dryrun_multichip OK" in result.stdout