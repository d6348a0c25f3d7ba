"""Post-load projection fusion (layers/fused.py): fused q/k/v + gate/up
must reproduce the unfused model exactly, incl. under TP sharding."""
import numpy as np
import pytest

import jax

from nmvllm_tpu import LLM, SamplingParams

SP = SamplingParams(temperature=0.0, max_tokens=6, logprobs=3)


def _gen(**kw):
    llm = LLM(model="debug-llama-tp", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256, seed=0, dtype="float32",
              **kw)
    out = llm.generate(["Fusion probe"], SP)[0].outputs[0]
    lp = out.logprobs[0][out.token_ids[0]].logprob
    fused = llm.llm_engine.executor.runner.model.layers[0].self_attn.\
        _qkv_fused is not None
    return list(out.token_ids), lp, fused


def test_fused_matches_unfused(monkeypatch):
    toks_f, lp_f, was_fused = _gen()
    assert was_fused, "fusion should be active by default"
    monkeypatch.setenv("NMVLLM_DISABLE_FUSION", "1")
    toks_u, lp_u, was_fused_u = _gen()
    assert not was_fused_u
    assert toks_f == toks_u
    assert abs(lp_f - lp_u) < 1e-3


def test_fused_matches_unfused_tp2(monkeypatch):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    toks_f, lp_f, was_fused = _gen(tensor_parallel_size=2)
    assert was_fused
    monkeypatch.setenv("NMVLLM_DISABLE_FUSION", "1")
    toks_u, lp_u, _ = _gen(tensor_parallel_size=2)
    assert toks_f == toks_u
    assert abs(lp_f - lp_u) < 1e-3


def test_quantized_fusion():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256, quantization="gptq",
              seed=0)
    sa = llm.llm_engine.executor.runner.model.layers[0].self_attn
    assert sa._qkv_fused is not None
    out = llm.generate(["Quantized fusion"], SP)[0].outputs[0]
    assert len(out.token_ids) == 6


def test_quantized_norm_act_fusion_close(monkeypatch):
    """GPTQ path with RMSNorm/act prologues fused into the kernels is
    logprob-close to the unfused composition (numerics differ by one
    bf16 rounding of the norm input)."""
    def probs(**env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
                  max_num_seqs=8, max_model_len=256,
                  quantization="gptq", seed=0)
        out = llm.generate(["Norm fusion probe"], SP)[0].outputs[0]
        lp = out.logprobs[0][out.token_ids[0]].logprob
        layer = llm.llm_engine.executor.runner.model.layers[0]
        fused = layer._fuse_norms()
        for k in env:
            monkeypatch.delenv(k, raising=False)
        return out.token_ids, lp, fused

    toks_f, lp_f, fused_on = probs()
    assert fused_on
    toks_u, lp_u, fused_off = probs(NMVLLM_DISABLE_FUSION="1")
    assert not fused_off
    assert abs(lp_f - lp_u) < 0.15, (lp_f, lp_u)


def test_epilogue_residual_fusion_close(monkeypatch):
    """Residual adds fused into o_proj/down_proj kernel epilogues match
    the unfused composition (same f32 accumulator math)."""
    def probs(**env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
                  max_num_seqs=8, max_model_len=256,
                  quantization="gptq", seed=0)
        out = llm.generate(["Epilogue probe"], SP)[0].outputs[0]
        lp = out.logprobs[0][out.token_ids[0]].logprob
        for k in env:
            monkeypatch.delenv(k, raising=False)
        return out.token_ids, lp

    toks_f, lp_f = probs()
    toks_u, lp_u = probs(NMVLLM_DISABLE_FUSION="1")
    assert abs(lp_f - lp_u) < 0.15, (lp_f, lp_u)
