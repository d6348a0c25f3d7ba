"""OpenAI batch runner (reference entrypoints/openai/run_batch.py)."""
import json
import subprocess
import sys

import pytest

pytestmark = pytest.mark.e2e


def test_run_batch_roundtrip(tmp_path):
    reqs = [
        {"custom_id": "r1", "method": "POST",
         "url": "/v1/chat/completions",
         "body": {"model": "debug-llama",
                  "messages": [{"role": "user", "content": "Hi"}],
                  "max_tokens": 4, "temperature": 0}},
        {"custom_id": "r2", "method": "POST",
         "url": "/v1/chat/completions",
         "body": {"model": "debug-llama",
                  "messages": [{"role": "user", "content": "Again"}],
                  "max_tokens": 4, "temperature": 0}},
        {"custom_id": "bad", "method": "POST", "url": "/v1/unknown",
         "body": {}},
    ]
    inp = tmp_path / "in.jsonl"
    out = tmp_path / "out.jsonl"
    inp.write_text("\n".join(json.dumps(r) for r in reqs) + "\n")
    r = subprocess.run(
        [sys.executable, "-m", "nmvllm_tpu.entrypoints.run_batch",
         "-i", str(inp), "-o", str(out), "--model", "debug-llama",
         "--num-gpu-blocks-override", "64", "--max-num-seqs", "8",
         "--max-model-len", "256"],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in out.read_text().splitlines()]
    by_id = {x["custom_id"]: x for x in lines}
    assert set(by_id) == {"r1", "r2", "bad"}
    for cid in ("r1", "r2"):
        resp = by_id[cid]["response"]
        assert resp["status_code"] == 200
        assert resp["body"]["choices"][0]["message"]["content"] is not None
        assert by_id[cid]["error"] is None
    assert by_id["bad"]["error"] is not None
