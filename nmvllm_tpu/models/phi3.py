"""Phi-3 (reference: Phi3ForCausalLM via vllm llama-family support).

Phi-3 stores fused qkv_proj / gate_up_proj in checkpoints; the block math
is Llama. Checkpoint ingestion splits the fused tensors onto the separate
projections (hf_name_map override).
"""
from typing import Dict, Tuple

from nmvllm_tpu.models.llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):

    def hf_name_map(self) -> Dict[str, Tuple]:
        m = super().hf_name_map()
        # Fused checkpoint tensors handled by split transforms.
        for i in range(len(self.layers)):
            pre = f"model.layers.{i}."
            path = ("layers", i)
            m[pre + "self_attn.qkv_proj.weight"] = (
                path + ("self_attn",), "split_qkv")
            m[pre + "mlp.gate_up_proj.weight"] = (
                path + ("mlp",), "split_gate_up")
        return m
