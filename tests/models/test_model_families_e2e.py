"""Engine generation smoke for every debug model family, run in a CPU
subprocess with jnp fallbacks (fast + free of TPU compile costs; the
TPU-compiled path is covered by tests/engine e2e modules)."""
import os
import subprocess
import sys

import pytest

FAMILIES = ["debug-qwen2", "debug-gemma", "debug-mistral", "debug-phi3",
            "debug-gemma2", "debug-starcoder2", "debug-stablelm",
            "debug-olmo", "debug-internlm2", "debug-baichuan",
            "debug-cohere", "debug-gpt2", "debug-opt", "debug-bigcode",
            "debug-gptneox", "debug-phi", "debug-falcon", "debug-bloom",
            "debug-mpt", "debug-qwen2moe", "debug-deepseek",
            "debug-chatglm", "debug-dbrx", "debug-gptj", "debug-orion",
            "debug-decilm", "debug-qwen", "debug-jais", "debug-minicpm",
            "debug-deepseek-v2", "debug-arctic"]

_SCRIPT = """
from nmvllm_tpu import LLM, SamplingParams
llm = LLM(model={model!r}, num_gpu_blocks_override=64, max_num_seqs=8,
          max_model_len=256)
out = llm.generate(["Family probe"],
                   SamplingParams(temperature=0.0, max_tokens=4))
tok = out[0].outputs[0].token_ids
assert len(tok) == 4, tok
print("OK", {model!r}, tok)
"""


@pytest.mark.parametrize("model", FAMILIES)
def test_family_generates(model):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["NMVLLM_DISABLE_PALLAS"] = "1"
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    result = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(model=model)], env=env,
        cwd=repo, capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "OK" in result.stdout
