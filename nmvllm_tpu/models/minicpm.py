"""MiniCPM-2B (reference: vllm/model_executor/models/minicpm.py).

Llama stack with muP-style scaling: embeddings * ``scale_emb``, every
attention/MLP branch output scaled by ``scale_depth / sqrt(num_layers)``
before re-entering the residual stream (minicpm.py:324,331), and logits
divided by ``hidden_size / dim_model_base`` (minicpm.py:454,474). The
MoE variant (num_experts > 0) is not yet supported.
"""
import math

from nmvllm_tpu.models.llama import LlamaDecoderLayer, LlamaForCausalLM


class MiniCPMDecoderLayer(LlamaDecoderLayer):
    """Scales branch outputs by res_scale inside the fused-residual
    threading (the next norm call folds x into the residual stream)."""

    res_scale = 1.0

    def __call__(self, params, rotary, rotary_params, x, positions, kv_cache,
                 meta, residual, *, is_prefill: bool, has_prefix: bool):
        if residual is None:
            residual = x
            x = self.input_layernorm(params["input_layernorm"], x)
        else:
            x, residual = self.input_layernorm(params["input_layernorm"], x,
                                               residual)
        x, kv_cache = self.self_attn(params["self_attn"], rotary,
                                     rotary_params, x, positions, kv_cache,
                                     meta, is_prefill=is_prefill,
                                     has_prefix=has_prefix)
        x = x * self.res_scale
        x, residual = self.post_attention_layernorm(
            params["post_attention_layernorm"], x, residual)
        x = self.mlp(params["mlp"], x) * self.res_scale
        return x, residual, kv_cache


class MiniCPMForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        if getattr(cfg, "num_experts", 0):
            raise NotImplementedError(
                "MiniCPM MoE variant is not yet supported")
        super().__init__(cfg, **kwargs)
        self.embedding_multiplier = float(getattr(cfg, "scale_emb", 1.0))
        dim_base = getattr(cfg, "dim_model_base", None) or cfg.hidden_size
        self.logit_scale = float(dim_base) / float(cfg.hidden_size)

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        layer = MiniCPMDecoderLayer(cfg, layer_idx, tp_size, method_factory,
                                    dtype, kv_cache_dtype, kv_scales)
        layer.res_scale = (float(getattr(cfg, "scale_depth", 1.0)) /
                           math.sqrt(cfg.num_hidden_layers))
        return layer
