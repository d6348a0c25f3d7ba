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
