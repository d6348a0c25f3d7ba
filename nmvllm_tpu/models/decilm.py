"""DeciLM-7B (reference: vllm/model_executor/models/decilm.py).

Llama with variable GQA: ``num_key_value_heads_per_layer`` varies by
layer. Like the reference we normalize to uniform GQA at load — the KV
projections of layers with fewer groups are head-repeated up to the max
(reference ``_degroup_weight``), keeping one KV-cache shape for the paged
attention kernel.
"""
from nmvllm_tpu.models.llama import LlamaForCausalLM


class DeciLMForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        per_layer = getattr(cfg, "num_key_value_heads_per_layer", None)
        if per_layer:
            cfg.num_key_value_heads = max(per_layer)
        super().__init__(cfg, **kwargs)

    def hf_name_map(self):
        m = super().hf_name_map()
        for i in range(len(self.layers)):
            pre = f"model.layers.{i}."
            path = ("layers", i)
            for name in ("k_proj", "v_proj"):
                m[pre + f"self_attn.{name}.weight"] = (
                    path + ("self_attn", name, "weight"), "repeat_kv")
        return m
