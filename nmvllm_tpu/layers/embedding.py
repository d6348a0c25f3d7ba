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
        # Optional weight-only quantized head (NMVLLM_QUANT_LM_HEAD=4|8):
        # the head weight is the single largest decode-step HBM read
        # after the KV cache (Llama-3: 1.05 GB bf16 -> 0.26 GB INT4).
        # The reference always serves fp16 lm_head, so this is opt-in;
        # untied heads only (tied heads share the embedding lookup table).
        self.quant_method = None
        from nmvllm_tpu import envs
        qbits = str(envs.NMVLLM_QUANT_LM_HEAD)
        if qbits in ("4", "8") and not tied:
            from nmvllm_tpu.quantization.wNa16 import WNA16LinearMethod
            self.quant_method = WNA16LinearMethod(int(qbits), 128,
                                                  symmetric=True)

    def init(self, rng):
        p = {}
        if self.quant_method is not None:
            # K-major (hidden, padded_vocab) quantized storage.
            p = dict(self.quant_method.create_weights(
                rng, self.embedding_dim, self.padded_vocab,
                self.params_dtype))
        elif not self.tied:
            w = jax.random.normal(
                rng, (self.padded_vocab, self.embedding_dim),
                jnp.float32) * 0.02
            p["weight"] = w.astype(self.params_dtype)
        if self.bias:
            p["bias"] = jnp.zeros((self.padded_vocab,), self.params_dtype)
        return p

    def quantize_loaded(self, params: dict) -> dict:
        """Convert a dense loaded head weight (padded_vocab, hidden) into
        the quantized layout (called post-load by finalize_for_serving
        when NMVLLM_QUANT_LM_HEAD is active)."""
        if self.quant_method is None or "qweight" in params or \
                "weight" not in params:
            return params
        from nmvllm_tpu.ops.quant_matmul import (quantize_weights_to_packed,
                                                 unpack_weights)
        w = params.pop("weight")  # (V_pad, H) N-major
        bits = self.quant_method.bits
        qweight, scales, zeros = quantize_weights_to_packed(
            w, bits, self.quant_method.group_size, symmetric=True)
        if bits == 8:
            # The 8-bit method serves plain bias-signed int8 (K, N) via
            # XLA fused dequant (faster than any packed path on this
            # stack, docs/PERF_NOTES.md).
            k = self.embedding_dim
            qweight = (unpack_weights(qweight, 8, self.quant_method.
                                      group_size, k) - 128).astype(jnp.int8)
        out = {"qweight": qweight, "scales": scales, "zeros": zeros}
        if "bias" in params:
            out["bias"] = params["bias"]
        return out

    def specs(self):
        if self.quant_method is not None:
            p = dict(self.quant_method.param_specs("column"))
        elif self.tied:
            p = {}
        else:
            p = {"weight": P(TP_AXIS, None)}
        if self.bias:
            p["bias"] = P(TP_AXIS)
        return p

    def __call__(self, params, x: jax.Array,
                 embedding_params: Optional[dict] = None, *,
                 inside_shard_map: bool = True,
                 logit_scale: float = 1.0,
                 logit_soft_cap: float = 0.0):
        if self.quant_method is not None and "qweight" in params:
            logits = self.quant_method.apply(
                {k: v for k, v in params.items() if k != "bias"},
                x).astype(jnp.float32)
            if self.bias:
                logits = logits + params["bias"].astype(jnp.float32)
            if logit_scale != 1.0:
                logits = logits * logit_scale
            if logit_soft_cap > 0.0:
                logits = logit_soft_cap * jnp.tanh(logits / logit_soft_cap)
            if inside_shard_map and self.tp_size > 1:
                logits = jax.lax.all_gather(logits, TP_AXIS, axis=-1,
                                            tiled=True)
            return logits
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
