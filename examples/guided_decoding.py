"""Guided decoding via the OpenAI server (reference: guided_json /
guided_regex request fields).

Start a server first:
  python -m nmvllm_tpu.entrypoints.api_server --model debug-llama
"""
import json
import urllib.request

BASE = "http://127.0.0.1:8000"


def post(path, body):
    req = urllib.request.Request(
        BASE + path, json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return json.load(urllib.request.urlopen(req))


print(post("/v1/completions", {
    "model": "debug-llama", "prompt": "Answer:", "max_tokens": 24,
    "temperature": 0,
    "guided_regex": "(yes|no), confidence [0-9]{2}%"}))

print(post("/v1/completions", {
    "model": "debug-llama", "prompt": "Data:", "max_tokens": 48,
    "temperature": 0,
    "guided_json": {"type": "object",
                    "properties": {"name": {"type": "string"},
                                   "count": {"type": "integer"}},
                    "required": ["name", "count"]}}))
