"""Qwen2 (reference: vllm/model_executor/models/qwen2.py).

Structurally Llama with Q/K/V projection biases and no output-projection
bias; reuses the Llama block stack.
"""
from nmvllm_tpu.models.llama import LlamaForCausalLM


class Qwen2ForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        # Qwen2 uses qkv bias, no o_proj/mlp bias.
        if not hasattr(cfg, "attention_bias"):
            cfg.attention_bias = True
        cfg.attention_out_bias = False
        super().__init__(cfg, **kwargs)
