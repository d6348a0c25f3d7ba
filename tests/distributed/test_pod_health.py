"""Multi-host pod health checks (parallel/multihost.py::check_pod_health,
the reference's executor_base.check_health chain): a healthy pod passes,
and a DEAD host converts the otherwise-hanging collective into a
descriptive timeout error instead of wedging the surviving engine."""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.e2e


_HEALTHY_WORKER = r"""
import sys
from nmvllm_tpu.parallel.multihost import check_pod_health, init_multihost

coord, pid = sys.argv[1], int(sys.argv[2])
idx = init_multihost(coordinator_address=coord, num_processes=2,
                     process_id=pid)
check_pod_health(timeout_s=120.0)
check_pod_health(timeout_s=120.0)   # repeatable (no one-shot state)
print(f"HEALTH{pid}_OK", flush=True)
"""


_DEAD_HOST_WORKER = r"""
import sys
from nmvllm_tpu.parallel.multihost import check_pod_health, init_multihost

coord, pid = sys.argv[1], int(sys.argv[2])
idx = init_multihost(coordinator_address=coord, num_processes=2,
                     process_id=pid)
if pid == 1:
    # 'Dead' host: joined the cluster, then stopped participating.
    # (sys.exit would tear the coordinator down noisily; just never
    # enter the collective and linger long enough for host 0's probe
    # to time out.)
    import time
    time.sleep(30)
    sys.exit(0)
try:
    check_pod_health(timeout_s=5.0)
except RuntimeError as e:
    assert "health check timed out" in str(e), e
    print("DEAD_HOST_DETECTED", flush=True)
    import os
    os._exit(0)   # the wedged collective thread would block exit
print("UNEXPECTED_PASS", flush=True)
"""


def _run_pod(tmp_path, worker_src, n=2, timeout=300):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = "/root/repo"
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd="/root/repo") for i in range(n)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode())
    return outs, procs


def test_pod_health_ok(tmp_path):
    outs, procs = _run_pod(tmp_path, _HEALTHY_WORKER)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i}:\n{out}"
        assert f"HEALTH{i}_OK" in out


def test_pod_health_detects_dead_host(tmp_path):
    outs, procs = _run_pod(tmp_path, _DEAD_HOST_WORKER)
    assert procs[0].returncode == 0, outs[0]
    assert "DEAD_HOST_DETECTED" in outs[0], outs[0]
    assert "UNEXPECTED_PASS" not in outs[0]
