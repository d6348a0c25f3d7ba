"""Llama-backbone embedding model (reference:
vllm/model_executor/models/llama_embedding.py — LlamaEmbeddingModel with
a Pooler instead of the LM head)."""
from typing import Optional

import jax.numpy as jnp

from nmvllm_tpu.layers.pooler import PoolingType, pool_hidden_states
from nmvllm_tpu.models.llama import LlamaForCausalLM


class LlamaEmbeddingModel(LlamaForCausalLM):

    is_embedding_model = True

    def __init__(self, cfg, *, pooling_type: PoolingType = PoolingType.LAST,
                 normalize: bool = True, **kwargs):
        super().__init__(cfg, **kwargs)
        self.pooling_type = pooling_type
        self.normalize = normalize

    def pool(self, hidden, seq_lens):
        return pool_hidden_states(hidden, seq_lens, self.pooling_type,
                                  self.normalize)
