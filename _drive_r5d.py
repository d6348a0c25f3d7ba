"""Verify drive: 2-process pod engine (dp=2) with the new startup
health barrier active, through the public LLM surface (CPU pod-sim)."""
import json
import os
import socket
import subprocess
import sys

WORKER = r"""
import sys
from nmvllm_tpu.parallel.multihost import broadcast_py, init_multihost
coord, pid = sys.argv[1], int(sys.argv[2])
idx = init_multihost(coordinator_address=coord, num_processes=2,
                     process_id=pid)
prompts = broadcast_py(["the quick brown fox", "hello world"]
                       if idx == 0 else None, is_source=(idx == 0))
from nmvllm_tpu import LLM, SamplingParams
llm = LLM(model="debug-llama-tp", dtype="float32",
          data_parallel_size=2, tensor_parallel_size=2,
          num_gpu_blocks_override=64, max_num_seqs=8, max_model_len=128)
outs = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=8))
toks = [list(o.outputs[0].token_ids) for o in outs]
print("TOKENS%d=%s" % (pid, toks), flush=True)
print("DRIVE%d_OK" % pid, flush=True)
"""

with socket.socket() as s:
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
coord = f"127.0.0.1:{port}"
with open("/tmp/_pod_drive_worker.py", "w") as f:
    f.write(WORKER)
env = dict(os.environ)
env.pop("PALLAS_AXON_POOL_IPS", None)
env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
env["JAX_PLATFORMS"] = "cpu"
env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
env["PYTHONPATH"] = "/root/repo"
procs = [subprocess.Popen(
    [sys.executable, "/tmp/_pod_drive_worker.py", coord, str(i)],
    stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
    cwd="/root/repo") for i in range(2)]
for i, p in enumerate(procs):
    out, _ = p.communicate(timeout=600)
    txt = out.decode()
    assert p.returncode == 0, f"worker {i}:\n{txt[-3000:]}"
    assert f"DRIVE{i}_OK" in txt
    print(txt.splitlines()[-2])
print("VERIFY OK pod drive")
