"""Gemma-2 (reference: vllm/model_executor/models/gemma2.py).

Differences from the Llama stack: pre+post norms around BOTH attention and
MLP (4 zero-centered RMSNorms per layer), sliding-window attention on
alternating layers, in-attention logit soft-capping, final-logit
soft-capping, query_pre_attn_scalar attention scale, sqrt(hidden) embedding
multiplier, always-tied embeddings, GELU-tanh gated MLP.
"""
import jax

from nmvllm_tpu.layers.layernorm import RMSNorm
from nmvllm_tpu.models.llama import (Attention, LlamaDecoderLayer,
                                     LlamaForCausalLM, LlamaMLP)


class Gemma2DecoderLayer:
    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype,
                 kv_cache_dtype="auto", kv_scales=(1.0, 1.0)):
        self.self_attn = Attention(cfg, layer_idx, tp_size, method_factory,
                                   dtype, kv_cache_dtype, *kv_scales)
        # Sliding window on even-indexed layers only (vllm gemma2.py:
        # use_sliding_window = layer_idx % 2 == 0 and sliding_window set).
        if layer_idx % 2 != 0:
            self.self_attn.sliding_window = 0
        self.mlp = LlamaMLP(cfg, layer_idx, method_factory, dtype)
        eps = getattr(cfg, "rms_norm_eps", 1e-6)

        def norm():
            return RMSNorm(cfg.hidden_size, eps, dtype, zero_centered=True)
        self.input_layernorm = norm()
        self.post_attention_layernorm = norm()
        self.pre_feedforward_layernorm = norm()
        self.post_feedforward_layernorm = norm()

    def init(self, rng):
        ks = jax.random.split(rng, 6)
        return {
            "self_attn": self.self_attn.init(ks[0]),
            "mlp": self.mlp.init(ks[1]),
            "input_layernorm": self.input_layernorm.init(ks[2]),
            "post_attention_layernorm":
                self.post_attention_layernorm.init(ks[3]),
            "pre_feedforward_layernorm":
                self.pre_feedforward_layernorm.init(ks[4]),
            "post_feedforward_layernorm":
                self.post_feedforward_layernorm.init(ks[5]),
        }

    def specs(self):
        return {
            "self_attn": self.self_attn.specs(),
            "mlp": self.mlp.specs(),
            "input_layernorm": self.input_layernorm.specs(),
            "post_attention_layernorm":
                self.post_attention_layernorm.specs(),
            "pre_feedforward_layernorm":
                self.pre_feedforward_layernorm.specs(),
            "post_feedforward_layernorm":
                self.post_feedforward_layernorm.specs(),
        }

    def __call__(self, params, rotary, rotary_params, x, positions,
                 kv_cache, meta, residual, *, is_prefill, has_prefix):
        # Sandwich norms; plain (unfused) residual adds.
        h = self.input_layernorm(params["input_layernorm"], x)
        h, kv_cache = self.self_attn(params["self_attn"], rotary,
                                     rotary_params, h, positions, kv_cache,
                                     meta, is_prefill=is_prefill,
                                     has_prefix=has_prefix)
        h = self.post_attention_layernorm(
            params["post_attention_layernorm"], h)
        x = x + h
        h = self.pre_feedforward_layernorm(
            params["pre_feedforward_layernorm"], x)
        h = self.mlp(params["mlp"], h)
        h = self.post_feedforward_layernorm(
            params["post_feedforward_layernorm"], h)
        x = x + h
        return x, None, kv_cache


class Gemma2ForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        cfg.tie_word_embeddings = True
        if getattr(cfg, "hidden_act", None) in (None, "gelu"):
            cfg.hidden_act = "gelu_pytorch_tanh"
        super().__init__(cfg, **kwargs)
        self.embedding_multiplier = float(cfg.hidden_size)**0.5
        self.norm.zero_centered = True
        self.logit_soft_cap = float(
            getattr(cfg, "final_logit_softcapping", None) or 0.0)

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        return Gemma2DecoderLayer(cfg, layer_idx, tp_size, method_factory,
                                  dtype, kv_cache_dtype, kv_scales)

    def forward(self, params, input_ids, positions, kv_caches, meta, *,
                is_prefill, has_prefix=False):
        import jax.numpy as jnp
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        x = x * jnp.asarray(self.embedding_multiplier, x.dtype)
        new_caches = []
        for layer, lp, kv in zip(self.layers, params["layers"], kv_caches):
            x, _, kv = layer(lp, self.rotary, params["rotary"], x,
                             positions, kv, meta, None,
                             is_prefill=is_prefill, has_prefix=has_prefix)
            new_caches.append(kv)
        x = self.norm(params["norm"], x)
        return x, new_caches

    def hf_name_map(self):
        m = super().hf_name_map()
        for i in range(len(self.layers)):
            pre = f"model.layers.{i}."
            path = ("layers", i)
            for norm in ("pre_feedforward_layernorm",
                         "post_feedforward_layernorm"):
                m[pre + f"{norm}.weight"] = (path + (norm, "weight"), None)
        return m
