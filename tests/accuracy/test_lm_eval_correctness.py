"""lm-eval accuracy certification harness
(reference tests/accuracy/test_lm_eval_correctness.py: launches the OpenAI
server, runs lm-eval-harness GSM8K over HTTP, asserts scores within
rtol=0.02 of the per-model ground truths in BASELINE.md).

Requires the `lm_eval` package, network/dataset access, and real model
checkpoints — all absent in the hermetic CI image, so the test skips
unless NMVLLM_LM_EVAL_MODEL points at a local checkpoint directory.
"""
import os
import shlex
import subprocess
import sys
import time

import pytest

RTOL = 0.02
# Ground truths from the reference's certified lm-eval configs
# (.github/lm-eval-configs/models/*.yaml; see BASELINE.md).
def _gt(strict, flexible):
    return {"exact_match,strict-match": strict,
            "exact_match,flexible-extract": flexible}


# All 16 certified configs (reference .github/lm-eval-configs/models/).
GROUND_TRUTHS = {
    "Meta-Llama-3-8B-Instruct": _gt(0.740, 0.740),
    "Meta-Llama-3-8B-Instruct-W4A16": _gt(0.684, 0.688),
    "Meta-Llama-3-8B-Instruct-FP8": _gt(0.744, 0.740),
    "Meta-Llama-3-8B-Instruct-FP8-KV": _gt(0.764, 0.764),
    "Meta-Llama-3-70B-Instruct": _gt(0.888, 0.888),
    "Meta-Llama-3-70B-Instruct-FP8": _gt(0.900, 0.900),
    "Mistral-7B-Instruct-v0.3": _gt(0.524, 0.524),
    "Mixtral-8x7B-Instruct-v0.1": _gt(0.616, 0.628),
    "Mixtral-8x7B-Instruct-v0.1-FP8": _gt(0.616, 0.620),
    "Mixtral-8x22B-Instruct-v0.1": _gt(0.876, 0.880),
    "Mixtral-8x22B-Instruct-v0.1-FP8": _gt(0.840, 0.844),
    "Qwen2-7B-Instruct": _gt(0.680, 0.756),
    "Qwen2-57B-A14B-Instruct": _gt(0.736, 0.800),
    "Qwen2-72B-Instruct": _gt(0.828, 0.856),
    "Phi-3-medium-4k-instruct": _gt(0.840, 0.852),
    "gemma-7b-it": _gt(0.284, 0.324),
}

MODEL_DIR = os.environ.get("NMVLLM_LM_EVAL_MODEL", "")
MODEL_KEY = os.environ.get("NMVLLM_LM_EVAL_KEY",
                           "Meta-Llama-3-8B-Instruct")


def _have_lm_eval() -> bool:
    try:
        import lm_eval  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not (MODEL_DIR and _have_lm_eval()),
    reason="needs NMVLLM_LM_EVAL_MODEL checkpoint dir + lm_eval package")
def test_lm_eval_gsm8k_matches_certified():
    port = 18200
    server = subprocess.Popen([
        sys.executable, "-m", "nmvllm_tpu.entrypoints.api_server",
        "--model", MODEL_DIR, "--port", str(port), "--max-num-seqs", "32",
    ])
    try:
        import urllib.request
        for _ in range(600):
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=1)
                break
            except Exception:
                time.sleep(1)
        import lm_eval
        results = lm_eval.simple_evaluate(
            model="local-completions",
            model_args=(f"base_url=http://127.0.0.1:{port}/v1/completions,"
                        f"model={MODEL_DIR},tokenizer_backend=huggingface"),
            tasks=["gsm8k"], limit=250, num_fewshot=5, batch_size=32)
        truth = GROUND_TRUTHS[MODEL_KEY]
        measured = results["results"]["gsm8k"]
        for metric, expected in truth.items():
            got = measured[metric]
            assert got == pytest.approx(expected, rel=RTOL), (
                metric, got, expected)
    finally:
        server.terminate()
        server.wait(timeout=30)
