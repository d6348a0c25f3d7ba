"""Phi-3-Small (reference: vllm/model_executor/models/phi3_small.py).

Llama-shaped stack with:
  * blocksparse attention (reference phi3_small.py:191 + the Triton
    blocksparse kernels in attention/ops/blocksparse_attention): each
    query block attends ``blocksparse_num_local_blocks`` preceding key
    blocks plus every ``blocksparse_vert_stride``-th key block, with a
    per-head stride offset unless ``blocksparse_homo_head_pattern``;
    every ``dense_attention_every_n_layers``-th layer is dense. On TPU
    the mask rides the existing prefill einsums and the Pallas decode
    kernel (ops/paged_attention.py blocksparse operand).
  * muP scalings (phi3_small.py:149,309,433): embeddings *
    mup_embedding_multiplier, attention scale mup_attn_multiplier /
    head_dim, logits / mup_width_multiplier (folded into logit_scale —
    the reference divides at sampling time only, a cosmetic difference
    for returned logprob magnitudes).
  * gegelu MLP (phi3_small.py:59): up_proj emits interleaved
    (gelu, linear) pairs; out = quick_gelu(min(g, limit)) *
    (clip(l, ±limit) + 1). The loader de-interleaves into contiguous
    gate/up halves at ingest so runtime splits are stride-free.
  * biased LayerNorms, biased projections, head-major query_key_value
    checkpoint layout (phi3_small.py:40 HeadMajorQKVParallelLinear ==
    our split_wqkv_interleaved transform), tied lm_head, and
    dummy_token_indices masked to -inf in the logits
    (phi3_small.py:406).
"""
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from nmvllm_tpu.layers.layernorm import LayerNorm
from nmvllm_tpu.models.llama import (LlamaDecoderLayer, LlamaForCausalLM,
                                     LlamaMLP)


class Phi3SmallMLP(LlamaMLP):
    """gate_proj = gelu half, up_proj = linear half (de-interleaved at
    load); gegelu activation with the 4.7-series clamp."""

    def __init__(self, cfg, layer_idx, method_factory, dtype):
        act = getattr(cfg, "hidden_act", "gegelu")
        cfg.hidden_act = "gelu"  # placeholder; __call__ is overridden
        try:
            super().__init__(cfg, layer_idx, method_factory, dtype)
        finally:
            cfg.hidden_act = act
        self._act_prologue = None  # gegelu has no fused kernel prologue
        self.limit = getattr(cfg, "gegelu_limit", None)

    def _gegelu(self, g, l):
        if self.limit is not None:
            lim = jnp.asarray(self.limit, g.dtype)
            g = jnp.where(jnp.isinf(g), g, jnp.minimum(g, lim))
            l = jnp.where(jnp.isinf(l), l, jnp.clip(l, -lim, lim))
        return g * jax.nn.sigmoid(1.702 * g) * (l + 1.0)

    def __call__(self, params, x, *, norm=None, epilogue_add=None):
        assert norm is None  # LayerNorm model: norm fusion never fires
        if self._gu_fused is not None:
            from nmvllm_tpu.layers.fused import split_fused
            gu = self._gu_fused(params["gate_up_proj"], x)
            g, l = split_fused(gu, self._gu_widths)
        else:
            g = self.gate_proj(params["gate_proj"], x)
            l = self.up_proj(params["up_proj"], x)
        return self.down_proj(params["down_proj"], self._gegelu(g, l),
                              epilogue_add=epilogue_add)


class Phi3SmallForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        # Biased projections everywhere (phi3_small.py:161,165 bias=True).
        cfg.attention_bias = True
        cfg.mlp_bias = True
        if getattr(cfg, "rope_embedding_base", None):
            cfg.rope_theta = cfg.rope_embedding_base
        pos_scale = float(getattr(cfg, "rope_position_scale", 1.0) or 1.0)
        if getattr(cfg, "rope_scaling", None) is None and pos_scale != 1.0:
            cfg.rope_scaling = {"type": "linear", "factor": pos_scale}
        super().__init__(cfg, **kwargs)
        self.embedding_multiplier = float(
            getattr(cfg, "mup_embedding_multiplier", 0.0) or 1.0) or 1.0
        self.logit_scale = 1.0 / float(
            getattr(cfg, "mup_width_multiplier", 1.0) or 1.0)
        self.dummy_token_indices = list(
            getattr(cfg, "dummy_token_indices", None) or [])
        head_dim = cfg.hidden_size // cfg.num_attention_heads
        if getattr(cfg, "mup_use_scaling", False):
            scale = float(cfg.mup_attn_multiplier) / head_dim
        else:
            scale = head_dim**-0.5
        dense_every = getattr(cfg, "dense_attention_every_n_layers", None)
        bs = (int(cfg.blocksparse_block_size),
              int(cfg.blocksparse_num_local_blocks),
              int(cfg.blocksparse_vert_stride),
              bool(getattr(cfg, "blocksparse_homo_head_pattern", False)))
        for i, layer in enumerate(self.layers):
            layer.self_attn.scale = scale
            if not (dense_every and (i + 1) % dense_every == 0):
                layer.self_attn.blocksparse = bs

    def _norm_eps(self, cfg):
        return getattr(cfg, "layer_norm_epsilon", 1e-5)

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        eps = self._norm_eps(cfg)
        return LlamaDecoderLayer(
            cfg, layer_idx, tp_size, method_factory, dtype, kv_cache_dtype,
            kv_scales,
            norm_factory=lambda: LayerNorm(cfg.hidden_size, eps, dtype),
            mlp_cls=Phi3SmallMLP)

    def _make_final_norm(self, cfg, dtype):
        return LayerNorm(cfg.hidden_size, self._norm_eps(cfg), dtype)

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        if self.dummy_token_indices:
            idx = jnp.asarray(self.dummy_token_indices, jnp.int32)
            logits = logits.at[..., idx].set(float("-inf"))
        return logits

    def hf_name_map(self) -> Dict[str, Tuple]:
        m: Dict[str, Tuple] = {
            "model.embed_tokens.weight":
                (("embed_tokens", "weight"), "pad_vocab"),
            "model.final_layernorm.weight": (("norm", "weight"), None),
            "model.final_layernorm.bias": (("norm", "bias"), None),
        }
        if not self.lm_head.tied:
            m["lm_head.weight"] = (("lm_head", "weight"), "pad_vocab")
        for i in range(len(self.layers)):
            pre = f"model.layers.{i}."
            path = ("layers", i)
            m[pre + "self_attn.query_key_value.weight"] = (
                path + ("self_attn",), "split_wqkv_interleaved")
            m[pre + "self_attn.query_key_value.bias"] = (
                path + ("self_attn",), "split_wqkv_interleaved_bias")
            m[pre + "self_attn.dense.weight"] = (
                path + ("self_attn", "o_proj", "weight"), "transpose")
            m[pre + "self_attn.dense.bias"] = (
                path + ("self_attn", "o_proj", "bias"), None)
            m[pre + "mlp.up_proj.weight"] = (
                path + ("mlp",), "split_gegelu")
            m[pre + "mlp.up_proj.bias"] = (
                path + ("mlp",), "split_gegelu_bias")
            m[pre + "mlp.down_proj.weight"] = (
                path + ("mlp", "down_proj", "weight"), "transpose")
            m[pre + "mlp.down_proj.bias"] = (
                path + ("mlp", "down_proj", "bias"), None)
            for norm in ("input_layernorm", "post_attention_layernorm"):
                m[pre + f"{norm}.weight"] = (path + (norm, "weight"), None)
                m[pre + f"{norm}.bias"] = (path + (norm, "bias"), None)
        return m
