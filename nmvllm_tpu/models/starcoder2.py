"""Starcoder2 (reference: vllm/model_executor/models/starcoder2.py).

Llama attention stack with: biases on every linear (cfg.use_bias),
LayerNorm instead of RMSNorm, a two-projection GELU MLP (c_fc/c_proj),
full rotary, usually tied embeddings.
"""
from nmvllm_tpu.layers.layernorm import LayerNorm
from nmvllm_tpu.models.llama import LlamaDecoderLayer, LlamaForCausalLM
from nmvllm_tpu.models.variants import TwoProjMLP


class Starcoder2ForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        bias = bool(getattr(cfg, "use_bias", True))
        cfg.attention_bias = bias
        cfg.attention_out_bias = bias
        super().__init__(cfg, **kwargs)

    def _norm_eps(self, cfg):
        return getattr(cfg, "norm_epsilon", None) or \
            getattr(cfg, "layer_norm_eps", 1e-5)

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        eps = self._norm_eps(cfg)
        return LlamaDecoderLayer(
            cfg, layer_idx, tp_size, method_factory, dtype, kv_cache_dtype,
            kv_scales,
            norm_factory=lambda: LayerNorm(cfg.hidden_size, eps, dtype),
            mlp_cls=TwoProjMLP)

    def _make_final_norm(self, cfg, dtype):
        return LayerNorm(cfg.hidden_size, self._norm_eps(cfg), dtype)

    def hf_name_map(self):
        m = super().hf_name_map()
        for i in range(len(self.layers)):
            pre = f"model.layers.{i}.mlp."
            path = ("layers", i, "mlp")
            for name in ("c_fc", "c_proj"):
                m[pre + f"{name}.weight"] = (
                    path + (name, "weight"), "transpose")
                m[pre + f"{name}.bias"] = (path + (name, "bias"), None)
        return m
