"""ChatGLM2/3 / GLM-4 (reference: vllm/model_executor/models/chatglm.py).

Llama block math with: fused query_key_value (+bias, GQA stacked q|k|v),
fused gate/up dense_h_to_4h (SwiGLU), half-dim GPT-J-interleaved rotary
(rotary_dim = head_dim/2, is_neox_style=False, base scaled by rope_ratio),
RMSNorm, transformer.encoder.* checkpoint naming.
"""
from typing import Dict, Tuple

from nmvllm_tpu.models.llama import LlamaForCausalLM


class ChatGLMForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        # Normalize ChatGLM config names onto the shared attribute set.
        if not getattr(cfg, "num_hidden_layers", None):
            cfg.num_hidden_layers = cfg.num_layers
        if getattr(cfg, "multi_query_attention", False):
            cfg.num_key_value_heads = cfg.multi_query_group_num
        else:
            cfg.num_key_value_heads = cfg.num_attention_heads
        cfg.head_dim = getattr(cfg, "kv_channels", None) or (
            cfg.hidden_size // cfg.num_attention_heads)
        cfg.intermediate_size = cfg.ffn_hidden_size
        if not getattr(cfg, "max_position_embeddings", None):
            cfg.max_position_embeddings = getattr(cfg, "seq_length", 8192)
        cfg.rms_norm_eps = getattr(cfg, "layernorm_epsilon", 1e-5)
        cfg.attention_bias = bool(getattr(cfg, "add_qkv_bias", True))
        cfg.attention_out_bias = bool(getattr(cfg, "add_bias_linear",
                                              False))
        cfg.mlp_bias = bool(getattr(cfg, "add_bias_linear", False))
        cfg.hidden_act = "silu"
        cfg.tie_word_embeddings = False
        cfg.rope_theta = 10000.0 * float(getattr(cfg, "rope_ratio", 1.0))
        super().__init__(cfg, **kwargs)
        # Half-dim interleaved rotary (chatglm.py:82-89).
        from nmvllm_tpu.layers.rotary import RotaryEmbedding
        self.rotary = RotaryEmbedding(
            cfg.head_dim, rotary_dim=cfg.head_dim // 2,
            max_position=cfg.max_position_embeddings,
            base=cfg.rope_theta, is_neox_style=False, dtype=self.dtype)

    def hf_name_map(self) -> Dict[str, Tuple]:
        m = {
            "transformer.embedding.word_embeddings.weight":
                (("embed_tokens", "weight"), "pad_vocab"),
            "transformer.encoder.final_layernorm.weight":
                (("norm", "weight"), None),
            "transformer.output_layer.weight":
                (("lm_head", "weight"), "pad_vocab"),
        }
        for i in range(len(self.layers)):
            pre = f"transformer.encoder.layers.{i}."
            path = ("layers", i)
            m[pre + "self_attention.query_key_value.weight"] = (
                path + ("self_attn",), "split_qkv")
            m[pre + "self_attention.query_key_value.bias"] = (
                path + ("self_attn",), "split_qkv_bias")
            m[pre + "self_attention.dense.weight"] = (
                path + ("self_attn", "o_proj", "weight"), "transpose")
            m[pre + "mlp.dense_h_to_4h.weight"] = (
                path + ("mlp",), "split_gate_up")
            m[pre + "mlp.dense_4h_to_h.weight"] = (
                path + ("mlp", "down_proj", "weight"), "transpose")
            m[pre + "input_layernorm.weight"] = (
                path + ("input_layernorm", "weight"), None)
            m[pre + "post_attention_layernorm.weight"] = (
                path + ("post_attention_layernorm", "weight"), None)
        return m
