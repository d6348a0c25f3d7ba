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


def grammar_example():
    """guided_grammar: Lark-subset CFG constraint (native Earley backend,
    guided_decoding/grammar_fsm.py). Works offline and over the server
    via the OpenAI `guided_grammar` extension field."""
    from nmvllm_tpu.guided_decoding.grammar_fsm import GrammarLogitsProcessor
    grammar = r"""
    start : "(" NUMBER ("," NUMBER)* ")"
    NUMBER: /[0-9]+/
    """
    # Attach through SamplingParams.logits_processors or the server's
    # guided_grammar request field; see tests/entrypoints/
    # test_guided_grammar.py for the mask-level API.
    return grammar
