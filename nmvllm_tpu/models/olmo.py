"""OLMo (reference: vllm/model_executor/models/olmo.py).

Llama stack with non-parametric LayerNorm (no weight/bias), optional
clip_qkv clamping (handled in the shared Attention block), gated SiLU MLP,
optionally tied embeddings.
"""
from nmvllm_tpu.layers.layernorm import LayerNorm
from nmvllm_tpu.models.llama import LlamaDecoderLayer, LlamaForCausalLM


class OlmoForCausalLM(LlamaForCausalLM):

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        return LlamaDecoderLayer(
            cfg, layer_idx, tp_size, method_factory, dtype, kv_cache_dtype,
            kv_scales,
            norm_factory=lambda: LayerNorm(
                cfg.hidden_size, 1e-5, dtype, elementwise_affine=False))

    def _make_final_norm(self, cfg, dtype):
        return LayerNorm(cfg.hidden_size, 1e-5, dtype,
                         elementwise_affine=False)
