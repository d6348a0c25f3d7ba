"""NMVLLM_QUANT_LM_HEAD: weight-only quantized LM head (opt-in).

The head weight is the largest decode-step HBM read after the KV cache
(Llama-3-8B: 1.05 GB bf16). The flag quantizes an UNTIED head to INT4/8
at load; tied heads keep the dense embedding table.
"""
import jax
import jax.numpy as jnp
import pytest


def _mk_head(monkeypatch, bits, tied=False, vocab=1000, hidden=256):
    from nmvllm_tpu.layers.embedding import ParallelLMHead
    monkeypatch.setenv("NMVLLM_QUANT_LM_HEAD", bits)
    return ParallelLMHead(vocab, hidden, tied=tied)


@pytest.mark.parametrize("bits", ["4", "8"])
def test_quantized_head_matches_dense_argmax(monkeypatch, bits):
    from nmvllm_tpu.layers.embedding import ParallelLMHead
    monkeypatch.delenv("NMVLLM_QUANT_LM_HEAD", raising=False)
    dense = ParallelLMHead(1000, 256, tied=False)
    pd = dense.init(jax.random.PRNGKey(0))

    qhead = _mk_head(monkeypatch, bits)
    assert qhead.quant_method is not None
    pq = qhead.quantize_loaded(dict(pd))
    assert "qweight" in pq and "weight" not in pq

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256), jnp.bfloat16)
    lg_d = dense(pd, x, inside_shard_map=False)
    lg_q = qhead(pq, x, inside_shard_map=False)
    assert lg_q.shape == lg_d.shape
    # Group-128 symmetric quantization keeps the argmax on random
    # gaussian logits; 8-bit additionally keeps values close.
    agree = (jnp.argmax(lg_d, -1) == jnp.argmax(lg_q, -1)).mean()
    assert float(agree) == 1.0
    if bits == "8":
        rel = jnp.mean(jnp.abs(lg_d - lg_q)) / jnp.mean(jnp.abs(lg_d))
        assert float(rel) < 0.05


def test_tied_head_stays_dense(monkeypatch):
    h = _mk_head(monkeypatch, "4", tied=True)
    assert h.quant_method is None


def test_fabricated_init_has_quant_params(monkeypatch):
    h = _mk_head(monkeypatch, "4")
    p = h.init(jax.random.PRNGKey(0))
    assert set(p) == {"qweight", "scales", "zeros"}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256), jnp.bfloat16)
    lg = h(p, x, inside_shard_map=False)
    assert lg.shape == (2, h.padded_vocab) and lg.dtype == jnp.float32


def test_quantize_loaded_noop_without_flag(monkeypatch):
    monkeypatch.delenv("NMVLLM_QUANT_LM_HEAD", raising=False)
    from nmvllm_tpu.layers.embedding import ParallelLMHead
    h = ParallelLMHead(1000, 256, tied=False)
    p = h.init(jax.random.PRNGKey(0))
    assert h.quantize_loaded(dict(p)).keys() == p.keys()


def test_quantized_head_loads_from_safetensors(monkeypatch, tmp_path):
    """A REAL checkpoint's lm_head.weight must land into the quantized
    head layout (the init tree has qweight/scales/zeros, no dense
    weight): the loader pads the vocab and quantizes on the way in.
    Regression: this path raised KeyError('weight') before round 3."""
    import numpy as np
    from safetensors.numpy import save_file

    from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
    from nmvllm_tpu.model_loader import get_model
    from nmvllm_tpu.parallel.mesh import build_mesh
    from nmvllm_tpu.transformers_utils.config import get_hf_config

    monkeypatch.setenv("NMVLLM_QUANT_LM_HEAD", "8")
    cfg = get_hf_config("debug-llama")
    rng = np.random.default_rng(0)
    tensors = {}
    # Minimal full checkpoint for debug-llama.
    tensors["model.embed_tokens.weight"] = rng.normal(
        size=(cfg.vocab_size, cfg.hidden_size)).astype(np.float32) * 0.02
    tensors["lm_head.weight"] = rng.normal(
        size=(cfg.vocab_size, cfg.hidden_size)).astype(np.float32) * 0.02
    tensors["model.norm.weight"] = np.ones(cfg.hidden_size, np.float32)
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        hd = cfg.head_dim
        qd, kvd = cfg.num_attention_heads * hd, cfg.num_key_value_heads * hd
        for nm, shape in (("self_attn.q_proj", (qd, cfg.hidden_size)),
                          ("self_attn.k_proj", (kvd, cfg.hidden_size)),
                          ("self_attn.v_proj", (kvd, cfg.hidden_size)),
                          ("self_attn.o_proj", (cfg.hidden_size, qd)),
                          ("mlp.gate_proj",
                           (cfg.intermediate_size, cfg.hidden_size)),
                          ("mlp.up_proj",
                           (cfg.intermediate_size, cfg.hidden_size)),
                          ("mlp.down_proj",
                           (cfg.hidden_size, cfg.intermediate_size))):
            tensors[p + nm + ".weight"] = rng.normal(
                size=shape).astype(np.float32) * 0.02
        tensors[p + "input_layernorm.weight"] = np.ones(
            cfg.hidden_size, np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            cfg.hidden_size, np.float32)
    save_file(tensors, str(tmp_path / "model.safetensors"))
    import json as _json
    d = cfg.to_dict()
    d["architectures"] = ["LlamaForCausalLM"]
    (tmp_path / "config.json").write_text(_json.dumps(d))

    ec = EngineConfig(
        model_config=ModelConfig(model=str(tmp_path), dtype="float32"),
        cache_config=CacheConfig(block_size=16),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_model_len=64),
        device_config=DeviceConfig())
    model, params = get_model(ec, build_mesh(1, 1))
    head = params["lm_head"]
    assert "qweight" in head and "weight" not in head
    # Logits through the quantized head match the dense reference.
    x = jnp.asarray(rng.normal(size=(2, cfg.hidden_size)), jnp.float32)
    lg = model.lm_head(head, x.astype(jnp.bfloat16),
                       inside_shard_map=False)
    wd = tensors["lm_head.weight"]  # (V, H)
    ref = x @ wd.T
    top_q = np.asarray(jnp.argmax(lg[:, :cfg.vocab_size], -1))
    top_d = np.argmax(np.asarray(ref), -1)
    assert (top_q == top_d).all()
