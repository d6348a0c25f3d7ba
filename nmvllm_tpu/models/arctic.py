"""Snowflake Arctic (reference: vllm/model_executor/models/arctic.py).

Dense-MoE hybrid: every ``moe_layer_frequency``-th layer is a 128-expert
top-k MoE block, the rest are dense llama MLPs; MoE layers optionally add a
parallel residual MLP branch (``use_residual`` / ``parallel_attn_mlp_res``,
reference arctic.py:318-355) where the MoE input is the *pre-attention*
hidden state normed by post_attention_layernorm and the residual MLP runs on
the post-attention stream.

TPU-native: experts as stacked (E, H, 2I)/(E, I, H) arrays fed to the
ragged grouped-GEMM (ops/moe.py), intermediate dim TP-sharded
(reference fused_moe/layer.py:108-119 pattern), renormalized routing only
when top_k > 1 (reference arctic.py:170-174).
"""
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.layernorm import RMSNorm
from nmvllm_tpu.layers.linear import Linear
from nmvllm_tpu.models.llama import (Attention, LlamaForCausalLM, LlamaMLP,
                                     MethodFactory)
from nmvllm_tpu.ops.moe import fused_moe
from nmvllm_tpu.parallel.mesh import TP_AXIS


class _ResidualMLPCfg:
    """Config view for the residual MLP (ffn dim = hidden size,
    reference arctic.py:52-53)."""

    def __init__(self, cfg):
        self._cfg = cfg
        self.intermediate_size = cfg.hidden_size

    def __getattr__(self, name):
        return getattr(self._cfg, name)


class ArcticMoE:
    """Top-k routed experts (reference arctic.py:76 ArcticMoE); routing
    weights renormalized only for top_k > 1 (arctic.py:170)."""

    def __init__(self, cfg, layer_idx: int, tp_size: int,
                 method_factory: MethodFactory, dtype):
        self.num_experts = cfg.num_local_experts
        self.top_k = cfg.num_experts_per_tok
        self.hidden_size = cfg.hidden_size
        self.intermediate_size = cfg.intermediate_size
        self.tp_size = tp_size
        from nmvllm_tpu.ops.moe import moe_ep_enabled
        self.ep = moe_ep_enabled(self.num_experts, tp_size)
        self.dtype = dtype
        self.gate = Linear(cfg.hidden_size, self.num_experts, bias=False,
                           shard="none", params_dtype=dtype)

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        e, h, i = self.num_experts, self.hidden_size, self.intermediate_size
        w1 = jax.random.normal(k1, (e, h, 2 * i), jnp.float32) * h**-0.5
        w2 = jax.random.normal(k2, (e, i, h), jnp.float32) * i**-0.5
        return {"gate": self.gate.init(k3),
                "w1": w1.astype(self.dtype), "w2": w2.astype(self.dtype)}

    def specs(self):
        from nmvllm_tpu.ops.moe import moe_expert_specs
        w1s, w2s = moe_expert_specs(self.ep)
        return {"gate": self.gate.specs(), "w1": w1s, "w2": w2s}

    def __call__(self, params, x):
        from nmvllm_tpu.ops.moe import moe_apply
        b, t, h = x.shape
        flat = x.reshape(b * t, h)
        gate_logits = self.gate(params["gate"], flat)
        out = moe_apply(flat, params["w1"], params["w2"], gate_logits,
                        self.top_k, ep=self.ep, axis_name=TP_AXIS,
                        renormalize=self.top_k > 1, activation="silu")
        out = jax.lax.psum(out, TP_AXIS)
        return out.reshape(b, t, h)


class ArcticDecoderLayer:
    """reference arctic.py:289 ArcticDecoderLayer."""

    def __init__(self, cfg, layer_idx: int, tp_size: int,
                 method_factory: MethodFactory, dtype,
                 kv_cache_dtype: str = "auto",
                 kv_scales: Tuple[float, float] = (1.0, 1.0)):
        self.is_moe_layer = (layer_idx + 1) % cfg.moe_layer_frequency == 0
        use_res = bool(getattr(cfg, "use_residual",
                               getattr(cfg, "parallel_attn_mlp_res", False)))
        self.use_residual = use_res and self.is_moe_layer
        self.self_attn = Attention(cfg, layer_idx, tp_size, method_factory,
                                   dtype, kv_cache_dtype, *kv_scales)
        if self.is_moe_layer:
            self.block_sparse_moe = ArcticMoE(cfg, layer_idx, tp_size,
                                              method_factory, dtype)
        else:
            self.mlp = LlamaMLP(cfg, layer_idx, method_factory, dtype)
        eps = getattr(cfg, "rms_norm_eps", 1e-5)
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)
        if self.use_residual:
            self.residual_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)
            self.residual_mlp = LlamaMLP(_ResidualMLPCfg(cfg), layer_idx,
                                         method_factory, dtype)

    def init(self, rng):
        ks = jax.random.split(rng, 6)
        p = {"self_attn": self.self_attn.init(ks[0]),
             "input_layernorm": self.input_layernorm.init(ks[2]),
             "post_attention_layernorm":
                 self.post_attention_layernorm.init(ks[3])}
        if self.is_moe_layer:
            p["block_sparse_moe"] = self.block_sparse_moe.init(ks[1])
        else:
            p["mlp"] = self.mlp.init(ks[1])
        if self.use_residual:
            p["residual_layernorm"] = self.residual_layernorm.init(ks[4])
            p["residual_mlp"] = self.residual_mlp.init(ks[5])
        return p

    def specs(self):
        s = {"self_attn": self.self_attn.specs(),
             "input_layernorm": self.input_layernorm.specs(),
             "post_attention_layernorm":
                 self.post_attention_layernorm.specs()}
        if self.is_moe_layer:
            s["block_sparse_moe"] = self.block_sparse_moe.specs()
        else:
            s["mlp"] = self.mlp.specs()
        if self.use_residual:
            s["residual_layernorm"] = self.residual_layernorm.specs()
            s["residual_mlp"] = self.residual_mlp.specs()
        return s

    def __call__(self, params, rotary, rotary_params, x, positions,
                 kv_cache, meta, residual, *, is_prefill, has_prefix):
        residual_input = x
        h = self.input_layernorm(params["input_layernorm"], x)
        attn_out, kv_cache = self.self_attn(
            params["self_attn"], rotary, rotary_params, h, positions,
            kv_cache, meta, is_prefill=is_prefill, has_prefix=has_prefix)
        x = residual_input + attn_out

        residual_attn = x
        if self.use_residual:
            # Parallel branches (reference arctic.py:344-352): residual MLP
            # on the post-attention stream, MoE on the *pre-attention*
            # stream. The reference defers both partial sums to one
            # all-reduce; per-branch psums are numerically identical
            # (psum distributes over +) and XLA fuses them on ICI.
            h = self.residual_layernorm(params["residual_layernorm"], x)
            residual_mlp_out = self.residual_mlp(params["residual_mlp"], h)
            h = self.post_attention_layernorm(
                params["post_attention_layernorm"], residual_input)
            moe_out = self.block_sparse_moe(params["block_sparse_moe"], h)
            x = residual_attn + residual_mlp_out + moe_out
        else:
            h = self.post_attention_layernorm(
                params["post_attention_layernorm"], x)
            if self.is_moe_layer:
                x = residual_attn + self.block_sparse_moe(
                    params["block_sparse_moe"], h)
            else:
                x = residual_attn + self.mlp(params["mlp"], h)
        return x, None, kv_cache


class ArcticForCausalLM(LlamaForCausalLM):

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        return ArcticDecoderLayer(cfg, layer_idx, tp_size, method_factory,
                                  dtype, kv_cache_dtype, kv_scales)

    def forward(self, params, input_ids, positions, kv_caches, meta, *,
                is_prefill, has_prefix=False):
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        new_caches = []
        for layer, lp, kv in zip(self.layers, params["layers"], kv_caches):
            x, _, kv = layer(lp, self.rotary, params["rotary"], x,
                             positions, kv, meta, None,
                             is_prefill=is_prefill, has_prefix=has_prefix)
            new_caches.append(kv)
        x = self.norm(params["norm"], x)
        return x, new_caches

    def hf_name_map(self) -> Dict[str, Tuple]:
        m = super().hf_name_map()
        for i, layer in enumerate(self.layers):
            pre = f"model.layers.{i}."
            path = ("layers", i)
            if layer.is_moe_layer:
                m[pre + "block_sparse_moe.gate.weight"] = (
                    path + ("block_sparse_moe", "gate", "weight"),
                    "transpose")
                # Per-expert w1/w3/w2 tensors are stacked by the loader's
                # expert-group pass (model_loader._load_expert_groups).
            else:
                for hf, ours in (("w1", "gate_proj"), ("w3", "up_proj"),
                                 ("w2", "down_proj")):
                    m[pre + f"block_sparse_moe.mlp.{hf}.weight"] = (
                        path + ("mlp", ours, "weight"), "transpose")
            if layer.use_residual:
                m[pre + "residual_layernorm.weight"] = (
                    path + ("residual_layernorm", "weight"), None)
                for hf, ours in (("w1", "gate_proj"), ("w3", "up_proj"),
                                 ("w2", "down_proj")):
                    m[pre + f"residual_mlp.{hf}.weight"] = (
                        path + ("residual_mlp", ours, "weight"), "transpose")
        return m
