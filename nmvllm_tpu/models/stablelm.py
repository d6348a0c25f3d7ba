"""StableLM / StableLM-2 (reference: vllm/model_executor/models/stablelm.py).

Llama stack with LayerNorm, partial rotary (rope_pct /
partial_rotary_factor), optional qkv biases (use_qkv_bias), gated SiLU MLP.
"""
from nmvllm_tpu.layers.layernorm import LayerNorm
from nmvllm_tpu.models.llama import LlamaDecoderLayer, LlamaForCausalLM


class StableLmForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        cfg.attention_bias = bool(getattr(cfg, "use_qkv_bias", False))
        cfg.attention_out_bias = False
        super().__init__(cfg, **kwargs)

    def _norm_eps(self, cfg):
        return getattr(cfg, "layer_norm_eps", 1e-5)

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        eps = self._norm_eps(cfg)
        return LlamaDecoderLayer(
            cfg, layer_idx, tp_size, method_factory, dtype, kv_cache_dtype,
            kv_scales,
            norm_factory=lambda: LayerNorm(cfg.hidden_size, eps, dtype))

    def _make_final_norm(self, cfg, dtype):
        return LayerNorm(cfg.hidden_size, self._norm_eps(cfg), dtype)
