"""Dequantize-at-load formats (SqueezeLLM LUT, AQLM codebooks) —
decode math vs naive references, and end-to-end checkpoint loading."""
import json

import numpy as np
import pytest

from nmvllm_tpu.quantization.extra_formats import (aqlm_decode,
                                                   squeezellm_decode)


def test_squeezellm_decode_matches_naive():
    rng = np.random.default_rng(0)
    k, n = 64, 16
    idx = rng.integers(0, 16, (k, n))
    lut = rng.normal(size=(n, 16)).astype(np.float32)
    packed = np.zeros((k // 8, n), np.uint32)
    for i in range(8):
        packed |= idx[i::8].astype(np.uint32) << (4 * i)
    out = squeezellm_decode(packed.view(np.int32), lut)
    expect = np.empty((k, n), np.float32)
    for kk in range(k):
        for nn in range(n):
            expect[kk, nn] = lut[nn, idx[kk, nn]]
    np.testing.assert_allclose(out, expect)


def test_aqlm_decode_matches_naive():
    rng = np.random.default_rng(1)
    nog, nig, ncb = 4, 8, 2
    csize, ogs, igs = 32, 2, 8
    codes = rng.integers(0, csize, (nog, nig, ncb)).astype(np.int16)
    codebooks = rng.normal(size=(ncb, csize, ogs, igs)).astype(np.float32)
    scales = rng.normal(size=(nog, 1, 1, 1)).astype(np.float32)
    out = aqlm_decode(codes, codebooks, scales)       # (K, N) K-major
    n_, k_ = nog * ogs, nig * igs
    assert out.shape == (k_, n_)
    for og in range(nog):
        for ig in range(nig):
            vec = sum(codebooks[cb, codes[og, ig, cb]]
                      for cb in range(ncb)) * scales[og, 0, 0, 0]
            for o in range(ogs):
                for i in range(igs):
                    assert np.isclose(out[ig * igs + i, og * ogs + o],
                                      vec[o, i], atol=1e-5)


def test_squeezellm_checkpoint_e2e(tmp_path):
    """Fabricated SqueezeLLM checkpoint loads and generates."""
    from safetensors.numpy import save_file

    from nmvllm_tpu import LLM, SamplingParams
    from nmvllm_tpu.transformers_utils.config import get_hf_config
    cfg = get_hf_config("debug-llama")
    h, inter, kvd = 256, 512, 128
    rng = np.random.default_rng(2)
    tensors = {}
    tensors["model.embed_tokens.weight"] = rng.normal(
        size=(cfg.vocab_size, h)).astype(np.float32) * 0.05
    tensors["model.norm.weight"] = np.ones((h,), np.float32)
    tensors["lm_head.weight"] = rng.normal(
        size=(cfg.vocab_size, h)).astype(np.float32) * 0.05

    def sq_pack(kdim, ndim):
        idx = rng.integers(0, 16, (kdim, ndim))
        lut = (rng.normal(size=(ndim, 16)) * 0.02).astype(np.float32)
        packed = np.zeros((kdim // 8, ndim), np.uint32)
        for i in range(8):
            packed |= idx[i::8].astype(np.uint32) << (4 * i)
        return packed.view(np.int32), lut

    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}."
        for name, (kd, nd) in (
                ("self_attn.q_proj", (h, kvd * 2)),
                ("self_attn.k_proj", (h, kvd)),
                ("self_attn.v_proj", (h, kvd)),
                ("self_attn.o_proj", (kvd * 2, h)),
                ("mlp.gate_proj", (h, inter)),
                ("mlp.up_proj", (h, inter)),
                ("mlp.down_proj", (inter, h))):
            qw, lut = sq_pack(kd, nd)
            tensors[pre + name + ".qweight"] = qw
            tensors[pre + name + ".lookup_table"] = lut
        tensors[pre + "input_layernorm.weight"] = np.ones((h,), np.float32)
        tensors[pre + "post_attention_layernorm.weight"] = \
            np.ones((h,), np.float32)

    cfg_dict = {
        "architectures": ["LlamaForCausalLM"], "model_type": "llama",
        "hidden_size": h, "intermediate_size": inter,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": 2, "num_key_value_heads": 1,
        "head_dim": 128, "vocab_size": cfg.vocab_size,
        "max_position_embeddings": 2048,
        "quantization_config": {"quant_method": "squeezellm"},
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    save_file(tensors, str(tmp_path / "model.safetensors"))

    llm = LLM(model=str(tmp_path), tokenizer="debug-llama",
              num_gpu_blocks_override=64, max_num_seqs=4,
              max_model_len=128)
    out = llm.generate(prompt_token_ids=[[1, 2, 3]],
                       sampling_params=SamplingParams(temperature=0.0,
                                                      max_tokens=4))
    assert len(out[0].outputs[0].token_ids) == 4


def test_compressed_tensors_wNa16_wire_roundtrip():
    """compressed-tensors wNa16 wire format (the reference's certified
    W4A16 schema: weight_packed (N, K/8) biased-unsigned LSB-first +
    weight_scale (N, K/g)) must dequantize exactly through
    wNa16_wire_to_canonical + the canonical kernel reference."""
    import numpy as np
    import jax.numpy as jnp
    from nmvllm_tpu.ops.quant_matmul import quant_matmul_reference
    from nmvllm_tpu.quantization.compressed_tensors import (
        wNa16_wire_to_canonical)

    rng = np.random.default_rng(0)
    k, n, g = 256, 128, 128
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    grp = w.reshape(k // g, g, n)
    scale = np.maximum(np.abs(grp).max(axis=1) * 2.0 / 15.0, 1e-8)
    q = np.clip(np.round(grp / scale[:, None, :]) + 8, 0, 15).astype(
        np.int32)
    deq = ((q - 8) * scale[:, None, :]).reshape(k, n)
    q = q.reshape(k, n).T                     # (N, K)
    wp = np.zeros((n, k // 8), np.uint32)
    for i in range(8):
        wp |= (q[:, i::8] & 0xF).astype(np.uint32) << (4 * i)
    ws = np.ascontiguousarray(scale.T.astype(np.float16))  # (N, K/g)

    qw, s, z = wNa16_wire_to_canonical(wp.view(np.int32), ws, None, 4, g)
    eff = np.asarray(quant_matmul_reference(
        jnp.eye(k, dtype=jnp.float32), qw, s, z, bits=4, group_size=g))
    assert np.abs(eff - deq).max() < 1e-4
