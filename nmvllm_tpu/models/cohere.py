"""Cohere Command-R (reference: vllm/model_executor/models/commandr.py).

Parallel transformer block: one LayerNorm per layer feeding BOTH attention
and MLP, whose outputs add to the residual together; bias-free LayerNorm;
tied embeddings with a logit_scale multiplier on the LM head.
"""
import jax

from nmvllm_tpu.layers.layernorm import LayerNorm
from nmvllm_tpu.models.llama import (Attention, LlamaForCausalLM, LlamaMLP)


class CohereDecoderLayer:
    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype,
                 kv_cache_dtype="auto", kv_scales=(1.0, 1.0)):
        self.self_attn = Attention(cfg, layer_idx, tp_size, method_factory,
                                   dtype, kv_cache_dtype, *kv_scales)
        self.mlp = LlamaMLP(cfg, layer_idx, method_factory, dtype)
        eps = getattr(cfg, "layer_norm_eps", 1e-5)
        self.input_layernorm = LayerNorm(cfg.hidden_size, eps, dtype,
                                         bias=False)

    def init(self, rng):
        ks = jax.random.split(rng, 3)
        return {"self_attn": self.self_attn.init(ks[0]),
                "mlp": self.mlp.init(ks[1]),
                "input_layernorm": self.input_layernorm.init(ks[2])}

    def specs(self):
        return {"self_attn": self.self_attn.specs(),
                "mlp": self.mlp.specs(),
                "input_layernorm": self.input_layernorm.specs()}

    def __call__(self, params, rotary, rotary_params, x, positions,
                 kv_cache, meta, residual, *, is_prefill, has_prefix):
        h = self.input_layernorm(params["input_layernorm"], x)
        attn_out, kv_cache = self.self_attn(
            params["self_attn"], rotary, rotary_params, h, positions,
            kv_cache, meta, is_prefill=is_prefill, has_prefix=has_prefix)
        mlp_out = self.mlp(params["mlp"], h)
        return x + attn_out + mlp_out, None, kv_cache


class CohereForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        cfg.tie_word_embeddings = True
        super().__init__(cfg, **kwargs)
        self.logit_scale = float(getattr(cfg, "logit_scale", 1.0))

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        return CohereDecoderLayer(cfg, layer_idx, tp_size, method_factory,
                                  dtype, kv_cache_dtype, kv_scales)

    def _make_final_norm(self, cfg, dtype):
        return LayerNorm(cfg.hidden_size,
                         getattr(cfg, "layer_norm_eps", 1e-5), dtype,
                         bias=False)

    def forward(self, params, input_ids, positions, kv_caches, meta, *,
                is_prefill, has_prefix=False):
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        new_caches = []
        for layer, lp, kv in zip(self.layers, params["layers"], kv_caches):
            x, _, kv = layer(lp, self.rotary, params["rotary"], x,
                             positions, kv, meta, None,
                             is_prefill=is_prefill, has_prefix=has_prefix)
            new_caches.append(kv)
        x = self.norm(params["norm"], x)
        return x, new_caches
