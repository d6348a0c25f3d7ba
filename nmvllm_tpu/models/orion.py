"""Orion-14B (reference: vllm/model_executor/models/orion.py).

Llama stack with biased LayerNorm in place of RMSNorm (eps comes from the
config's ``rms_norm_eps`` despite being a LayerNorm — orion.py:173-176),
full rotary, bias-free attention, gated SiLU MLP.
"""
from nmvllm_tpu.layers.layernorm import LayerNorm
from nmvllm_tpu.models.llama import LlamaDecoderLayer, LlamaForCausalLM


class OrionForCausalLM(LlamaForCausalLM):

    def _norm_eps(self, cfg):
        return getattr(cfg, "rms_norm_eps", 1e-5)

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        eps = self._norm_eps(cfg)
        return LlamaDecoderLayer(
            cfg, layer_idx, tp_size, method_factory, dtype, kv_cache_dtype,
            kv_scales,
            norm_factory=lambda: LayerNorm(cfg.hidden_size, eps, dtype))

    def _make_final_norm(self, cfg, dtype):
        return LayerNorm(cfg.hidden_size, self._norm_eps(cfg), dtype)
