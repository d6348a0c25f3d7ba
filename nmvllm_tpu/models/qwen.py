"""Qwen v1 (reference: vllm/model_executor/models/qwen.py).

Llama-style stack with RMSNorm (ln_1/ln_2), fused biased c_attn qkv,
bias-free c_proj, and a gated SiLU MLP whose checkpoint tensors are
``w2`` (gate) / ``w1`` (up) / ``c_proj`` (down) — qwen.py:273-274. The
config's ``intermediate_size`` counts both halves of the gate (the MLP
width is intermediate_size // 2, qwen.py reference).
"""
from nmvllm_tpu.models.llama import LlamaForCausalLM


class QWenLMHeadModel(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        cfg.attention_bias = True
        cfg.attention_out_bias = False
        cfg.rope_theta = getattr(cfg, "rotary_emb_base", None) or \
            getattr(cfg, "rope_theta", 10000.0)
        cfg.rms_norm_eps = getattr(cfg, "layer_norm_epsilon", 1e-6)
        cfg.intermediate_size = cfg.intermediate_size // 2
        if not getattr(cfg, "num_key_value_heads", None):
            cfg.num_key_value_heads = cfg.num_attention_heads
        if not getattr(cfg, "max_position_embeddings", None):
            cfg.max_position_embeddings = getattr(cfg, "seq_length", 8192)
        cfg.tie_word_embeddings = False
        super().__init__(cfg, **kwargs)

    def hf_name_map(self):
        m = {
            "transformer.wte.weight": (("embed_tokens", "weight"),
                                       "pad_vocab"),
            "transformer.ln_f.weight": (("norm", "weight"), None),
            "lm_head.weight": (("lm_head", "weight"), "pad_vocab"),
        }
        for i in range(len(self.layers)):
            pre = f"transformer.h.{i}."
            path = ("layers", i)
            m[pre + "ln_1.weight"] = (path + ("input_layernorm", "weight"),
                                      None)
            m[pre + "ln_2.weight"] = (
                path + ("post_attention_layernorm", "weight"), None)
            m[pre + "attn.c_attn.weight"] = (path + ("self_attn",),
                                             "split_qkv")
            m[pre + "attn.c_attn.bias"] = (path + ("self_attn",),
                                           "split_qkv_bias")
            m[pre + "attn.c_proj.weight"] = (
                path + ("self_attn", "o_proj", "weight"), "transpose")
            m[pre + "mlp.w2.weight"] = (
                path + ("mlp", "gate_proj", "weight"), "transpose")
            m[pre + "mlp.w1.weight"] = (
                path + ("mlp", "up_proj", "weight"), "transpose")
            m[pre + "mlp.c_proj.weight"] = (
                path + ("mlp", "down_proj", "weight"), "transpose")
        return m
