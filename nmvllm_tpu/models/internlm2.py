"""InternLM2 (reference: vllm/model_executor/models/internlm2.py).

Llama block math with renamed checkpoint tensors (tok_embeddings,
attention.wqkv/wo, feed_forward.w1/w3/w2, attention_norm/ffn_norm, output)
and a GQA-interleaved fused wqkv tensor split at load.
"""
from typing import Dict, Tuple

from nmvllm_tpu.models.llama import LlamaForCausalLM


class InternLM2ForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        if not hasattr(cfg, "attention_bias"):
            cfg.attention_bias = bool(getattr(cfg, "bias", False))
        super().__init__(cfg, **kwargs)

    def hf_name_map(self) -> Dict[str, Tuple]:
        m = {
            "model.tok_embeddings.weight": (("embed_tokens", "weight"),
                                            "pad_vocab"),
            "model.norm.weight": (("norm", "weight"), None),
        }
        if not self.lm_head.tied:
            m["output.weight"] = (("lm_head", "weight"), "pad_vocab")
        for i in range(len(self.layers)):
            pre = f"model.layers.{i}."
            path = ("layers", i)
            m[pre + "attention.wqkv.weight"] = (
                path + ("self_attn",), "split_wqkv_interleaved")
            m[pre + "attention.wo.weight"] = (
                path + ("self_attn", "o_proj", "weight"), "transpose")
            m[pre + "feed_forward.w1.weight"] = (
                path + ("mlp", "gate_proj", "weight"), "transpose")
            m[pre + "feed_forward.w3.weight"] = (
                path + ("mlp", "up_proj", "weight"), "transpose")
            m[pre + "feed_forward.w2.weight"] = (
                path + ("mlp", "down_proj", "weight"), "transpose")
            m[pre + "attention_norm.weight"] = (
                path + ("input_layernorm", "weight"), None)
            m[pre + "ffn_norm.weight"] = (
                path + ("post_attention_layernorm", "weight"), None)
        return m
