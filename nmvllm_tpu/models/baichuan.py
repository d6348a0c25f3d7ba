"""Baichuan-7B (reference: vllm/model_executor/models/baichuan.py).

Llama block math with a fused W_pack qkv tensor (equal q/k/v split, MHA)
and no attention biases. The 13B alibi variant is not yet wired (needs
alibi slopes + no rotary on this family).
"""
from typing import Dict, Tuple

from nmvllm_tpu.models.llama import LlamaForCausalLM


class BaichuanForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        if getattr(cfg, "position_embedding_type", "rope") == "alibi" or \
                getattr(cfg, "hidden_size", 0) == 5120:
            # Baichuan-13B signals alibi via its 5120 hidden size in the
            # reference (baichuan.py chooses by position embedding).
            raise NotImplementedError(
                "Baichuan-13B (alibi) is not yet supported.")
        super().__init__(cfg, **kwargs)

    def hf_name_map(self) -> Dict[str, Tuple]:
        m = super().hf_name_map()
        for i in range(len(self.layers)):
            pre = f"model.layers.{i}."
            path = ("layers", i)
            # Fused qkv: same layout as Phi-3's qkv_proj (q|k|v stacked).
            m[pre + "self_attn.W_pack.weight"] = (
                path + ("self_attn",), "split_qkv")
        return m
