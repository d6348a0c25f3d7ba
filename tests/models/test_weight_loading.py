"""Checkpoint ingestion tests: dense HF safetensors and GPTQ quantized
tensors land correctly in the params tree
(reference tests for model_loader / weight_utils)."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _no_fusion(monkeypatch):
    # These tests inspect per-projection params post-load; disable the
    # serving-time q/k/v / gate/up fusion (layers/fused.py).
    monkeypatch.setenv("NMVLLM_DISABLE_FUSION", "1")

from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                               LoadConfig, ModelConfig, ParallelConfig,
                               SchedulerConfig)
from nmvllm_tpu.model_loader import get_model
from nmvllm_tpu.transformers_utils.config import get_hf_config


def _write_config(tmp_path, quant=None):
    cfg = get_hf_config("debug-llama")
    d = cfg.to_dict()
    d["architectures"] = ["LlamaForCausalLM"]
    if quant:
        d["quantization_config"] = quant
    with open(tmp_path / "config.json", "w") as f:
        json.dump(d, f)
    return cfg


def _engine_config(model_dir, quantization=None):
    model_config = ModelConfig(model=str(model_dir),
                               quantization=quantization)
    return EngineConfig(
        model_config=model_config, cache_config=CacheConfig(),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_model_len=256),
        device_config=DeviceConfig(device="cpu"),
        load_config=LoadConfig())


def test_dense_checkpoint_roundtrip(tmp_path):
    from safetensors.numpy import save_file
    cfg = _write_config(tmp_path)
    rng = np.random.default_rng(0)
    h, inter, vocab = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    head = 128
    tensors = {
        "model.embed_tokens.weight":
            rng.normal(size=(vocab, h)).astype(np.float32),
        "model.norm.weight": np.ones((h,), np.float32),
        "lm_head.weight": rng.normal(size=(vocab, h)).astype(np.float32),
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}."
        qd = cfg.num_attention_heads * head
        kvd = cfg.num_key_value_heads * head
        tensors.update({
            pre + "self_attn.q_proj.weight":
                rng.normal(size=(qd, h)).astype(np.float32),
            pre + "self_attn.k_proj.weight":
                rng.normal(size=(kvd, h)).astype(np.float32),
            pre + "self_attn.v_proj.weight":
                rng.normal(size=(kvd, h)).astype(np.float32),
            pre + "self_attn.o_proj.weight":
                rng.normal(size=(h, qd)).astype(np.float32),
            pre + "mlp.gate_proj.weight":
                rng.normal(size=(inter, h)).astype(np.float32),
            pre + "mlp.up_proj.weight":
                rng.normal(size=(inter, h)).astype(np.float32),
            pre + "mlp.down_proj.weight":
                rng.normal(size=(h, inter)).astype(np.float32),
            pre + "input_layernorm.weight": np.ones((h,), np.float32),
            pre + "post_attention_layernorm.weight":
                np.ones((h,), np.float32),
        })
    save_file(tensors, str(tmp_path / "model.safetensors"))

    from nmvllm_tpu.parallel.mesh import build_mesh
    model, params = get_model(_engine_config(tmp_path), build_mesh(1, 1))
    got = np.asarray(params["layers"][0]["mlp"]["gate_proj"]["weight"],
                     dtype=np.float32)
    want = tensors["model.layers.0.mlp.gate_proj.weight"].T
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    # Vocab padding applied on embeddings.
    assert params["embed_tokens"]["weight"].shape[0] >= vocab


def test_gptq_checkpoint_ingestion(tmp_path):
    from safetensors.numpy import save_file
    from nmvllm_tpu.ops.quant_matmul import (quant_matmul_reference,
                                             quantize_weights_to_packed,
                                             unpack_weights)
    quant_cfg = {"quant_method": "gptq", "bits": 4, "group_size": 128,
                 "desc_act": False, "sym": True}
    cfg = _write_config(tmp_path, quant=quant_cfg)
    h = cfg.hidden_size
    rng = np.random.default_rng(1)

    # Build GPTQ-format tensors for one layer shape (h -> h) and fill all
    # linears with the same pattern for simplicity.
    def make_gptq(k, n):
        w_int = rng.integers(0, 16, (k, n)).astype(np.int32)
        # GPTQ qweight packs 8 sequential k per int32.
        qweight = np.zeros((k // 8, n), np.uint32)
        for i in range(8):
            qweight |= w_int[i::8].astype(np.uint32) << (4 * i)
        g = 128
        zeros_val = 8
        qzeros = np.full((k // g, n // 8), 0, np.uint32)
        for i in range(8):
            qzeros |= np.uint32(zeros_val - 1) << (4 * i)
        scales = rng.uniform(0.01, 0.02, (k // g, n)).astype(np.float16)
        return (qweight.astype(np.int32).view(np.int32),
                qzeros.view(np.int32), scales, w_int)

    tensors = {
        "model.embed_tokens.weight":
            rng.normal(size=(cfg.vocab_size, h)).astype(np.float32),
        "model.norm.weight": np.ones((h,), np.float32),
        "lm_head.weight":
            rng.normal(size=(cfg.vocab_size, h)).astype(np.float32),
    }
    expected = {}
    head = 128
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}."
        qd = cfg.num_attention_heads * head
        kvd = cfg.num_key_value_heads * head
        inter = cfg.intermediate_size
        for name, (k, n) in {
                "self_attn.q_proj": (h, qd), "self_attn.k_proj": (h, kvd),
                "self_attn.v_proj": (h, kvd), "self_attn.o_proj": (qd, h),
                "mlp.gate_proj": (h, inter), "mlp.up_proj": (h, inter),
                "mlp.down_proj": (inter, h)}.items():
            qw, qz, sc, w_int = make_gptq(k, n)
            tensors[pre + name + ".qweight"] = qw
            tensors[pre + name + ".qzeros"] = qz
            tensors[pre + name + ".scales"] = sc
            if i == 0 and name == "mlp.gate_proj":
                expected["w_int"] = w_int
        tensors[pre + "input_layernorm.weight"] = np.ones((h,), np.float32)
        tensors[pre + "post_attention_layernorm.weight"] = \
            np.ones((h,), np.float32)
    save_file(tensors, str(tmp_path / "model.safetensors"))

    from nmvllm_tpu.parallel.mesh import build_mesh
    model, params = get_model(_engine_config(tmp_path, quantization="gptq"),
                              build_mesh(1, 1))
    layer = params["layers"][0]["mlp"]["gate_proj"]
    assert "qweight" in layer
    got_int = np.asarray(unpack_weights(layer["qweight"], 4, 128, h))
    np.testing.assert_array_equal(got_int, expected["w_int"])


def test_internlm2_interleaved_wqkv_split(tmp_path):
    """InternLM2 fused wqkv rows are grouped [q_0..q_{g-1}, k, v] per kv
    head; the loader must land each slice on the right projection."""
    from safetensors.numpy import save_file
    cfg = get_hf_config("debug-internlm2")
    d = cfg.to_dict()
    d["architectures"] = ["InternLM2ForCausalLM"]
    with open(tmp_path / "config.json", "w") as f:
        json.dump(d, f)
    rng = np.random.default_rng(1)
    h = cfg.hidden_size
    heads, kv_heads = cfg.num_attention_heads, cfg.num_key_value_heads
    hd = h // heads
    group = heads // kv_heads
    tensors = {
        "model.tok_embeddings.weight":
            rng.normal(size=(cfg.vocab_size, h)).astype(np.float32),
        "model.norm.weight": np.ones((h,), np.float32),
        "output.weight":
            rng.normal(size=(cfg.vocab_size, h)).astype(np.float32),
    }
    wqkvs = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}."
        wqkv = rng.normal(size=(kv_heads * (group + 2) * hd, h)).astype(
            np.float32)
        wqkvs.append(wqkv)
        tensors.update({
            pre + "attention.wqkv.weight": wqkv,
            pre + "attention.wo.weight":
                rng.normal(size=(h, heads * hd)).astype(np.float32),
            pre + "feed_forward.w1.weight":
                rng.normal(size=(cfg.intermediate_size, h)).astype(
                    np.float32),
            pre + "feed_forward.w3.weight":
                rng.normal(size=(cfg.intermediate_size, h)).astype(
                    np.float32),
            pre + "feed_forward.w2.weight":
                rng.normal(size=(h, cfg.intermediate_size)).astype(
                    np.float32),
            pre + "attention_norm.weight": np.ones((h,), np.float32),
            pre + "ffn_norm.weight": np.ones((h,), np.float32),
        })
    save_file(tensors, str(tmp_path / "model.safetensors"))
    from nmvllm_tpu.parallel.mesh import build_mesh
    model, params = get_model(_engine_config(tmp_path), build_mesh(1, 1))
    w = wqkvs[0].reshape(kv_heads, group + 2, hd, h)
    expect_q = w[:, :group].reshape(kv_heads * group * hd, h).T
    expect_k = w[:, group].reshape(kv_heads * hd, h).T
    expect_v = w[:, group + 1].reshape(kv_heads * hd, h).T
    got = params["layers"][0]["self_attn"]
    np.testing.assert_allclose(
        np.asarray(got["q_proj"]["weight"], np.float32), expect_q,
        rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(got["k_proj"]["weight"], np.float32), expect_k,
        rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(got["v_proj"]["weight"], np.float32), expect_v,
        rtol=1e-2, atol=1e-2)


def test_gptq_checkpoint_a8_expansion(tmp_path, monkeypatch):
    """With NMVLLM_INT4_A8, the same GPTQ checkpoint loads as signed int8
    (K, N) with identical values to the packed-int4 canonical form."""
    from safetensors.numpy import save_file
    quant_cfg = {"quant_method": "gptq", "bits": 4, "group_size": 128,
                 "desc_act": False, "sym": True}
    cfg = _write_config(tmp_path, quant=quant_cfg)
    h = cfg.hidden_size
    rng = np.random.default_rng(3)

    def make_gptq(k, n):
        w_int = rng.integers(0, 16, (k, n)).astype(np.int32)
        qweight = np.zeros((k // 8, n), np.uint32)
        for i in range(8):
            qweight |= w_int[i::8].astype(np.uint32) << (4 * i)
        qzeros = np.zeros((k // 128, n // 8), np.uint32)
        for i in range(8):
            qzeros |= np.uint32(7) << (4 * i)
        scales = rng.uniform(0.01, 0.02, (k // 128, n)).astype(np.float16)
        return qweight.view(np.int32), qzeros.view(np.int32), scales, w_int

    tensors = {
        "model.embed_tokens.weight":
            rng.normal(size=(cfg.vocab_size, h)).astype(np.float32),
        "model.norm.weight": np.ones((h,), np.float32),
        "lm_head.weight":
            rng.normal(size=(cfg.vocab_size, h)).astype(np.float32),
    }
    expected = {}
    head = 128
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}."
        qd = cfg.num_attention_heads * head
        kvd = cfg.num_key_value_heads * head
        inter = cfg.intermediate_size
        for name, (k, n) in {
                "self_attn.q_proj": (h, qd), "self_attn.k_proj": (h, kvd),
                "self_attn.v_proj": (h, kvd), "self_attn.o_proj": (qd, h),
                "mlp.gate_proj": (h, inter), "mlp.up_proj": (h, inter),
                "mlp.down_proj": (inter, h)}.items():
            qw, qz, sc, w_int = make_gptq(k, n)
            tensors[pre + name + ".qweight"] = qw
            tensors[pre + name + ".qzeros"] = qz
            tensors[pre + name + ".scales"] = sc
            if i == 0 and name == "mlp.gate_proj":
                expected["w_int"] = w_int
        tensors[pre + "input_layernorm.weight"] = np.ones((h,), np.float32)
        tensors[pre + "post_attention_layernorm.weight"] = \
            np.ones((h,), np.float32)
    save_file(tensors, str(tmp_path / "model.safetensors"))

    # NMVLLM_INT4_A8=1 now selects the round-5 "packed" mode: qweight
    # stays (K/8, N) int32 in the A8P byte-lane layout with mult/
    # channel-scale/zms sidecars; dequant must track the checkpoint
    # values to requantization-grid error.
    monkeypatch.setenv("NMVLLM_INT4_A8", "1")
    from nmvllm_tpu.parallel.mesh import build_mesh
    model, params = get_model(_engine_config(tmp_path, quantization="gptq"),
                              build_mesh(1, 1))
    layer = params["layers"][0]["mlp"]["gate_proj"]
    qw = np.asarray(layer["qweight"])
    assert qw.dtype == np.int32 and qw.shape == (h // 8,
                                                 cfg.intermediate_size)
    assert set(layer) >= {"qweight", "mult", "scales", "zeros"}
    from nmvllm_tpu.ops.quant_matmul import unpack_weights_a8p
    import jax.numpy as jnp
    v2 = np.asarray(unpack_weights_a8p(jnp.asarray(qw), 128, h))
    mult = np.asarray(layer["mult"], np.float32)
    s_chan = np.asarray(layer["scales"], np.float32)
    zms = np.asarray(layer["zeros"], np.float32)
    deq = ((v2 - 8.0) * np.repeat(mult, 128, 0) -
           np.repeat(zms, 128, 0)) * s_chan
    # Ground truth: the checkpoint's own dequant (z = 8, group scales).
    # make_gptq writes qzeros = 7 (stored zero - 1 convention -> z = 8).
    scales_full = None
    for name, arr in tensors.items():
        if name.endswith("mlp.gate_proj.scales") and ".0." in name:
            scales_full = arr.astype(np.float32)
    truth = (expected["w_int"] - 8.0) * np.repeat(scales_full, 128, 0)
    err = np.abs(deq - truth).max()
    step = np.repeat(scales_full, 128, 0).max()
    assert err <= step, (err, step)  # within one original grid step
