"""Gemma (reference: vllm/model_executor/models/gemma.py).

Llama block structure with: always-tied embeddings, sqrt(hidden) embedding
multiplier, GELU-tanh activation, and zero-centered RMSNorm weights
((1 + w) at runtime).
"""
from nmvllm_tpu.models.llama import LlamaForCausalLM


class GemmaForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        cfg.tie_word_embeddings = True
        if getattr(cfg, "hidden_act", None) in (None, "gelu"):
            # HF Gemma historically used gelu_pytorch_tanh
            # (vllm gemma.py GeluAndMul(approximate="tanh")).
            cfg.hidden_act = "gelu_pytorch_tanh"
        super().__init__(cfg, **kwargs)
        self.embedding_multiplier = float(cfg.hidden_size)**0.5
        for layer in self.layers:
            layer.input_layernorm.zero_centered = True
            layer.post_attention_layernorm.zero_centered = True
        self.norm.zero_centered = True
