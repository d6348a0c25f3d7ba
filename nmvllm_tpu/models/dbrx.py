"""DBRX (reference: vllm/model_executor/models/dbrx.py).

16-expert MoE with fused stacked Wqkv (+clip_qkv), bias-free LayerNorms,
normalized top-k routing, and fused per-layer expert stacks
(ffn.experts.mlp.{w1,v1,w2}) split by the loader's expert-group pass.
"""
from typing import Dict, Tuple

import jax

from nmvllm_tpu.layers.layernorm import LayerNorm
from nmvllm_tpu.models.llama import Attention, LlamaForCausalLM
from nmvllm_tpu.models.mixtral import MixtralMoE


class DbrxDecoderLayer:
    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype,
                 kv_cache_dtype="auto", kv_scales=(1.0, 1.0)):
        self.self_attn = Attention(cfg, layer_idx, tp_size, method_factory,
                                   dtype, kv_cache_dtype, *kv_scales)
        self.ffn = MixtralMoE(cfg, layer_idx, tp_size, method_factory,
                              dtype)
        self.input_layernorm = LayerNorm(cfg.hidden_size, 1e-5, dtype,
                                         bias=False)
        self.post_attention_layernorm = LayerNorm(cfg.hidden_size, 1e-5,
                                                  dtype, bias=False)

    def init(self, rng):
        ks = jax.random.split(rng, 4)
        return {"self_attn": self.self_attn.init(ks[0]),
                "ffn": self.ffn.init(ks[1]),
                "input_layernorm": self.input_layernorm.init(ks[2]),
                "post_attention_layernorm":
                    self.post_attention_layernorm.init(ks[3])}

    def specs(self):
        return {"self_attn": self.self_attn.specs(),
                "ffn": self.ffn.specs(),
                "input_layernorm": self.input_layernorm.specs(),
                "post_attention_layernorm":
                    self.post_attention_layernorm.specs()}

    def __call__(self, params, rotary, rotary_params, x, positions,
                 kv_cache, meta, residual, *, is_prefill, has_prefix):
        if residual is None:
            residual = x
            x = self.input_layernorm(params["input_layernorm"], x)
        else:
            x, residual = self.input_layernorm(params["input_layernorm"],
                                               x, residual)
        x, kv_cache = self.self_attn(params["self_attn"], rotary,
                                     rotary_params, x, positions, kv_cache,
                                     meta, is_prefill=is_prefill,
                                     has_prefix=has_prefix)
        x, residual = self.post_attention_layernorm(
            params["post_attention_layernorm"], x, residual)
        x = self.ffn(params["ffn"], x)
        return x, residual, kv_cache


class DbrxForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        attn_cfg = getattr(cfg, "attn_config", None)
        ffn_cfg = getattr(cfg, "ffn_config", None)

        def sub(obj, key, default=None):
            if obj is None:
                return default
            if isinstance(obj, dict):
                return obj.get(key, default)
            return getattr(obj, key, default)

        cfg.num_key_value_heads = sub(attn_cfg, "kv_n_heads",
                                      cfg.num_attention_heads)
        cfg.clip_qkv = sub(attn_cfg, "clip_qkv")
        cfg.rope_theta = float(sub(attn_cfg, "rope_theta", 10000.0))
        cfg.intermediate_size = sub(ffn_cfg, "ffn_hidden_size",
                                    4 * cfg.hidden_size)
        cfg.num_local_experts = sub(ffn_cfg, "moe_num_experts", 16)
        cfg.num_experts_per_tok = sub(ffn_cfg, "moe_top_k", 4)
        cfg.attention_bias = False
        cfg.attention_out_bias = False
        cfg.tie_word_embeddings = False
        cfg.hidden_act = "silu"
        super().__init__(cfg, **kwargs)

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        return DbrxDecoderLayer(cfg, layer_idx, tp_size, method_factory,
                                dtype, kv_cache_dtype, kv_scales)

    def _make_final_norm(self, cfg, dtype):
        return LayerNorm(cfg.hidden_size, 1e-5, dtype, bias=False)

    def hf_name_map(self) -> Dict[str, Tuple]:
        m = {
            "transformer.wte.weight": (("embed_tokens", "weight"),
                                       "pad_vocab"),
            "transformer.norm_f.weight": (("norm", "weight"), None),
            "lm_head.weight": (("lm_head", "weight"), "pad_vocab"),
        }
        for i in range(len(self.layers)):
            pre = f"transformer.blocks.{i}."
            path = ("layers", i)
            m[pre + "norm_attn_norm.norm_1.weight"] = (
                path + ("input_layernorm", "weight"), None)
            m[pre + "norm_attn_norm.norm_2.weight"] = (
                path + ("post_attention_layernorm", "weight"), None)
            m[pre + "norm_attn_norm.attn.Wqkv.weight"] = (
                path + ("self_attn",), "split_qkv")
            m[pre + "norm_attn_norm.attn.out_proj.weight"] = (
                path + ("self_attn", "o_proj", "weight"), "transpose")
            m[pre + "ffn.router.layer.weight"] = (
                path + ("ffn", "gate", "weight"), "transpose")
            # ffn.experts.mlp.{w1,v1,w2}: handled by the expert-group pass.
        return m
