"""Vocab-parallel embedding + LM head.

Reference: vllm/model_executor/layers/vocab_parallel_embedding.py:128
(VocabParallelEmbedding, vocab padded to 64), ParallelLMHead:362, and
LogitsProcessor:14 with its TP gather (:112). TPU-native: the embedding table
is sharded over the ``tp`` mesh axis on the vocab dim; lookup masks
out-of-shard ids and psums (an ICI all-reduce); logits are computed against
the (possibly tied) table and all-gathered so in-graph sampling sees the full
vocab on every shard.
"""
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.module import Module
from nmvllm_tpu.parallel.mesh import TP_AXIS
from nmvllm_tpu.utils import round_up

VOCAB_PAD_MULTIPLE = 128


class VocabParallelEmbedding(Module):
    def __init__(self, num_embeddings: int, embedding_dim: int,
                 params_dtype=jnp.bfloat16, tp_size: int = 1):
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.params_dtype = params_dtype
        self.padded_vocab = round_up(num_embeddings,
                                     VOCAB_PAD_MULTIPLE * tp_size)
        self.tp_size = tp_size

    def init(self, rng):
        w = jax.random.normal(
            rng, (self.padded_vocab, self.embedding_dim),
            jnp.float32) * 0.02
        return {"weight": w.astype(self.params_dtype)}

    def specs(self):
        return {"weight": P(TP_AXIS, None)}

    def __call__(self, params, ids: jax.Array, *,
                 inside_shard_map: bool = True):
        w = params["weight"]  # local shard (V_local, H)
        if not inside_shard_map or self.tp_size == 1:
            return w[ids]
        v_local = self.padded_vocab // self.tp_size
        rank = jax.lax.axis_index(TP_AXIS)
        local_ids = ids - rank * v_local
        valid = (local_ids >= 0) & (local_ids < v_local)
        local_ids = jnp.clip(local_ids, 0, v_local - 1)
        emb = w[local_ids] * valid[..., None].astype(w.dtype)
        return jax.lax.psum(emb, TP_AXIS)


class ParallelLMHead(Module):
    """Projection to (padded) vocab logits; may tie weights with the
    embedding. Output is the full vocab on every shard (all-gather)."""

    def __init__(self, num_embeddings: int, embedding_dim: int,
                 params_dtype=jnp.bfloat16, tp_size: int = 1,
                 tied: bool = False, bias: bool = False):
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.params_dtype = params_dtype
        self.padded_vocab = round_up(num_embeddings,
                                     VOCAB_PAD_MULTIPLE * tp_size)
        self.tp_size = tp_size
        self.tied = tied
        self.bias = bias  # GPT-J / Phi lm_head.bias

    def init(self, rng):
        p = {}
        if not self.tied:
            w = jax.random.normal(
                rng, (self.padded_vocab, self.embedding_dim),
                jnp.float32) * 0.02
            p["weight"] = w.astype(self.params_dtype)
        if self.bias:
            p["bias"] = jnp.zeros((self.padded_vocab,), self.params_dtype)
        return p

    def specs(self):
        p = {} if self.tied else {"weight": P(TP_AXIS, None)}
        if self.bias:
            p["bias"] = P(TP_AXIS)
        return p

    def __call__(self, params, x: jax.Array,
                 embedding_params: Optional[dict] = None, *,
                 inside_shard_map: bool = True,
                 logit_scale: float = 1.0,
                 logit_soft_cap: float = 0.0):
        w = params["weight"] if not self.tied else embedding_params["weight"]
        logits = jnp.dot(x, w.T, preferred_element_type=jnp.float32)
        if self.bias:
            logits = logits + params["bias"].astype(jnp.float32)
        if logit_scale != 1.0:
            logits = logits * logit_scale
        if logit_soft_cap > 0.0:
            logits = logit_soft_cap * jnp.tanh(logits / logit_soft_cap)
        if inside_shard_map and self.tp_size > 1:
            # (..., V_local) -> (..., V_pad): TP gather of logits
            # (reference logits_processor.py:112).
            logits = jax.lax.all_gather(logits, TP_AXIS, axis=-1, tiled=True)
        return logits
