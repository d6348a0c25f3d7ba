"""Real multi-process 'pod' on CPU: N python processes join via
jax.distributed, build a global mesh, and agree on admissions +
collectives. This is the fake-cluster tier the reference LACKS (its
distributed tests need >=2 physical GPUs, SURVEY.md §4) — here two
'hosts' are two OS processes with 2 local CPU devices each."""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.e2e

_WORKER = r"""
import sys
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from nmvllm_tpu.parallel.multihost import (assert_same_across_hosts,
                                           broadcast_py, build_pod_mesh,
                                           init_multihost)

coord, pid = sys.argv[1], int(sys.argv[2])
idx = init_multihost(coordinator_address=coord, num_processes=2,
                     process_id=pid)
assert idx == pid
assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local x 2 processes

# Host-0 publishes the request stream; both must see host-0's value.
reqs = broadcast_py(["req-a", "req-b"] if idx == 0 else None,
                    is_source=(idx == 0))
assert reqs == ["req-a", "req-b"], reqs
assert_same_across_hosts({"admitted": reqs})

# Global (data=2, tp=2) mesh: tp groups stay within one process
# (host-major ordering); a tp psum crosses the mesh correctly.
mesh = build_pod_mesh(2, 2)
procs = np.vectorize(lambda d: d.process_index)(mesh.devices)
assert (procs == procs[:, :1]).all(), procs  # tp rows intra-host

from jax.experimental.shard_map import shard_map
x = jnp.arange(8.0).reshape(4, 2)
fn = jax.jit(shard_map(
    lambda a: jax.lax.psum(a, "tp"), mesh=mesh,
    in_specs=P("data", "tp"), out_specs=P("data", None)))
y = fn(jax.device_put(x, NamedSharding(mesh, P("data", "tp"))))
expected = np.asarray(x).sum(1, keepdims=True)  # (4, 1) row sums
for shard in y.addressable_shards:
    rows = shard.index[0]
    np.testing.assert_allclose(np.asarray(shard.data), expected[rows])
print(f"WORKER{pid}_OK", flush=True)
"""


_ENGINE_WORKER = r"""
import json
import sys

from nmvllm_tpu.parallel.multihost import broadcast_py, init_multihost

coord, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
idx = init_multihost(coordinator_address=coord, num_processes=nproc,
                     process_id=pid)
import jax
assert jax.process_count() == nproc
assert len(jax.devices()) == nproc  # 1 local device per 'host'

# Host-0 owns the request stream; every host admits the same prompts in
# the same order (host-replicated scheduling).
prompts = broadcast_py(
    ["the quick brown fox", "a b c d e", "hello world",
     "one two three four"] if idx == 0 else None,
    is_source=(idx == 0))

from nmvllm_tpu import LLM, SamplingParams
llm = LLM(model="debug-llama-tp", dtype="float32",
          data_parallel_size=2, tensor_parallel_size=2,
          num_gpu_blocks_override=64, max_num_seqs=8, max_model_len=128)
outs = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=8))
toks = [list(o.outputs[0].token_ids) for o in outs]
print("TOKENS" + str(pid) + "=" + json.dumps(toks), flush=True)
print(f"ENGINE{pid}_OK", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_four_process_engine_pod(tmp_path):
    """4-'host' pod-sim (VERDICT r3 item 9): four OS processes with one
    CPU device each join a global dp=2 x tp=2 mesh and run the FULL
    engine host-replicated, with per-step schedule-fingerprint
    assertions (NMVLLM_MULTIHOST_CHECK). Greedy tokens must agree across
    hosts AND match a single-process engine at the same dp x tp."""
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "engine_worker.py"
    script.write_text(_ENGINE_WORKER)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["NMVLLM_DISABLE_PALLAS"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = "/root/repo"
    env["NMVLLM_MULTIHOST_CHECK"] = "1"
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i), "4"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd="/root/repo") for i in range(4)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
        assert p.returncode == 0, f"worker {i}:\n{outs[-1]}"
    import json as _json
    toks = []
    for i, out in enumerate(outs):
        assert f"ENGINE{i}_OK" in out
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"TOKENS{i}=")][0]
        toks.append(_json.loads(line.split("=", 1)[1]))
    # All hosts produced identical tokens...
    assert all(t == toks[0] for t in toks[1:])

    # ...and they match the single-process engine at the same dp x tp.
    single = subprocess.run(
        [sys.executable, "-c", r"""
import json
from nmvllm_tpu import LLM, SamplingParams
llm = LLM(model="debug-llama-tp", dtype="float32",
          data_parallel_size=2, tensor_parallel_size=2,
          num_gpu_blocks_override=64, max_num_seqs=8, max_model_len=128)
outs = llm.generate(["the quick brown fox", "a b c d e", "hello world",
                     "one two three four"],
                    SamplingParams(temperature=0.0, max_tokens=8))
print("SINGLE=" + json.dumps(
    [list(o.outputs[0].token_ids) for o in outs]))
"""],
        capture_output=True, timeout=600, cwd="/root/repo",
        env={**env, "XLA_FLAGS":
             "--xla_force_host_platform_device_count=4"})
    assert single.returncode == 0, single.stdout.decode() + \
        single.stderr.decode()
    line = [ln for ln in single.stdout.decode().splitlines()
            if ln.startswith("SINGLE=")][0]
    assert _json.loads(line.split("=", 1)[1]) == toks[0]


def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = "/root/repo"
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd="/root/repo") for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
        assert p.returncode == 0, f"worker {i}:\n{outs[-1]}"
    assert "WORKER0_OK" in outs[0]
    assert "WORKER1_OK" in outs[1]


_PP_ENGINE_WORKER = r"""
import json
import sys

from nmvllm_tpu.parallel.multihost import broadcast_py, init_multihost

coord, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
idx = init_multihost(coordinator_address=coord, num_processes=nproc,
                     process_id=pid)
import jax
assert jax.process_count() == nproc
assert len(jax.devices()) == 4  # 2 local x 2 'hosts'

prompts = broadcast_py(
    ["the quick brown fox", "a b c d e", "hello world"]
    if idx == 0 else None, is_source=(idx == 0))

from nmvllm_tpu import LLM, SamplingParams
llm = LLM(model="debug-llama-tp", dtype="float32",
          pipeline_parallel_size=2, tensor_parallel_size=2,
          num_gpu_blocks_override=64, max_num_seqs=8, max_model_len=128)
# Each pipeline stage's (data x tp) block must sit on ONE 'host'.
mesh = llm.llm_engine.executor.mesh
import numpy as np
procs = np.vectorize(lambda d: d.process_index)(mesh.devices)
assert (procs.reshape(2, -1) == procs.reshape(2, -1)[:, :1]).all(), procs
outs = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=8))
toks = [list(o.outputs[0].token_ids) for o in outs]
print("TOKENS" + str(pid) + "=" + json.dumps(toks), flush=True)
print(f"ENGINE{pid}_OK", flush=True)
"""


def test_two_process_engine_pod_pp(tmp_path):
    """Multi-host PIPELINE parallelism (VERDICT r4 item 6): two OS
    'hosts' with 2 CPU devices each run pp=2 x tp=2 — one stage per
    host, the stage ring crossing the process boundary — with
    host-replicated scheduling. Greedy tokens must agree across hosts
    AND match a single-process pp=2 x tp=2 engine."""
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "pp_engine_worker.py"
    script.write_text(_PP_ENGINE_WORKER)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["NMVLLM_DISABLE_PALLAS"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = "/root/repo"
    env["NMVLLM_MULTIHOST_CHECK"] = "1"
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd="/root/repo") for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
        assert p.returncode == 0, f"worker {i}:\n{outs[-1]}"
    import json as _json
    toks = []
    for i, out in enumerate(outs):
        assert f"ENGINE{i}_OK" in out
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"TOKENS{i}=")][0]
        toks.append(_json.loads(line.split("=", 1)[1]))
    assert toks[0] == toks[1]

    single = subprocess.run(
        [sys.executable, "-c", r"""
import json
from nmvllm_tpu import LLM, SamplingParams
llm = LLM(model="debug-llama-tp", dtype="float32",
          pipeline_parallel_size=2, tensor_parallel_size=2,
          num_gpu_blocks_override=64, max_num_seqs=8, max_model_len=128)
outs = llm.generate(["the quick brown fox", "a b c d e", "hello world"],
                    SamplingParams(temperature=0.0, max_tokens=8))
print("SINGLE=" + json.dumps(
    [list(o.outputs[0].token_ids) for o in outs]))
"""],
        capture_output=True, timeout=600, cwd="/root/repo",
        env={**env, "XLA_FLAGS":
             "--xla_force_host_platform_device_count=4"})
    assert single.returncode == 0, single.stdout.decode() + \
        single.stderr.decode()
    line = [ln for ln in single.stdout.decode().splitlines()
            if ln.startswith("SINGLE=")][0]
    assert _json.loads(line.split("=", 1)[1]) == toks[0]
