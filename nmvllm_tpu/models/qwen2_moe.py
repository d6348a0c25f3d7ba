"""Qwen2-MoE (reference: vllm/model_executor/models/qwen2_moe.py).

Qwen2 attention (qkv biases) with per-layer sparse MoE blocks: softmax
top-k routed experts PLUS an always-on shared expert blended by a sigmoid
gate. Layers listed in ``mlp_only_layers`` (or off the
``decoder_sparse_step`` grid) stay dense.
"""
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.layernorm import RMSNorm
from nmvllm_tpu.layers.linear import Linear
from nmvllm_tpu.models.llama import (Attention, LlamaDecoderLayer,
                                     LlamaForCausalLM, LlamaMLP)
from nmvllm_tpu.ops.moe import fused_moe
from nmvllm_tpu.parallel.mesh import TP_AXIS


class _SharedExpertCfg:
    """Config view exposing the shared expert's intermediate size."""

    def __init__(self, cfg, inter):
        self._cfg = cfg
        self.intermediate_size = inter

    def __getattr__(self, name):
        return getattr(self._cfg, name)


class Qwen2MoeSparseBlock:
    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype):
        self.num_experts = cfg.num_experts
        self.top_k = cfg.num_experts_per_tok
        self.hidden_size = cfg.hidden_size
        self.intermediate_size = cfg.moe_intermediate_size
        self.renormalize = bool(getattr(cfg, "norm_topk_prob", False))
        self.tp_size = tp_size
        from nmvllm_tpu.ops.moe import moe_ep_enabled
        self.ep = moe_ep_enabled(self.num_experts, tp_size)
        self.dtype = dtype
        self.gate = Linear(cfg.hidden_size, self.num_experts, bias=False,
                           shard="none", params_dtype=dtype)
        shared_inter = getattr(cfg, "shared_expert_intermediate_size",
                               None) or cfg.moe_intermediate_size
        self.shared_expert = LlamaMLP(_SharedExpertCfg(cfg, shared_inter),
                                      layer_idx, method_factory, dtype)
        self.shared_expert_gate = Linear(cfg.hidden_size, 1, bias=False,
                                         shard="none", params_dtype=dtype)

    def init(self, rng):
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        e, h, i = self.num_experts, self.hidden_size, self.intermediate_size
        w1 = jax.random.normal(k1, (e, h, 2 * i), jnp.float32) * h**-0.5
        w2 = jax.random.normal(k2, (e, i, h), jnp.float32) * i**-0.5
        return {"gate": self.gate.init(k3),
                "w1": w1.astype(self.dtype), "w2": w2.astype(self.dtype),
                "shared_expert": self.shared_expert.init(k4),
                "shared_expert_gate": self.shared_expert_gate.init(k5)}

    def specs(self):
        from nmvllm_tpu.ops.moe import moe_expert_specs
        w1s, w2s = moe_expert_specs(self.ep)
        return {"gate": self.gate.specs(),
                "w1": w1s, "w2": w2s,
                "shared_expert": self.shared_expert.specs(),
                "shared_expert_gate": self.shared_expert_gate.specs()}

    def __call__(self, params, x):
        b, t, h = x.shape
        flat = x.reshape(b * t, h)
        gate_logits = self.gate(params["gate"], flat)
        from nmvllm_tpu.ops.moe import moe_apply
        routed = moe_apply(flat, params["w1"], params["w2"], gate_logits,
                           self.top_k, ep=self.ep, axis_name=TP_AXIS,
                           renormalize=self.renormalize,
                           activation="silu")
        routed = jax.lax.psum(routed, TP_AXIS)
        shared = self.shared_expert(params["shared_expert"],
                                    flat[None]).reshape(b * t, h)
        sg = jax.nn.sigmoid(
            self.shared_expert_gate(params["shared_expert_gate"],
                                    flat).astype(jnp.float32))
        out = routed + (shared.astype(jnp.float32) * sg).astype(x.dtype)
        return out.reshape(b, t, h)


class Qwen2MoeDecoderLayer:
    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype,
                 kv_cache_dtype="auto", kv_scales=(1.0, 1.0)):
        self.self_attn = Attention(cfg, layer_idx, tp_size, method_factory,
                                   dtype, kv_cache_dtype, *kv_scales)
        self.mlp = Qwen2MoeSparseBlock(cfg, layer_idx, tp_size,
                                       method_factory, dtype)
        eps = getattr(cfg, "rms_norm_eps", 1e-6)
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)

    def init(self, rng):
        ks = jax.random.split(rng, 4)
        return {"self_attn": self.self_attn.init(ks[0]),
                "mlp": self.mlp.init(ks[1]),
                "input_layernorm": self.input_layernorm.init(ks[2]),
                "post_attention_layernorm":
                    self.post_attention_layernorm.init(ks[3])}

    def specs(self):
        return {"self_attn": self.self_attn.specs(),
                "mlp": self.mlp.specs(),
                "input_layernorm": self.input_layernorm.specs(),
                "post_attention_layernorm":
                    self.post_attention_layernorm.specs()}

    def __call__(self, params, rotary, rotary_params, x, positions,
                 kv_cache, meta, residual, *, is_prefill, has_prefix):
        if residual is None:
            residual = x
            x = self.input_layernorm(params["input_layernorm"], x)
        else:
            x, residual = self.input_layernorm(params["input_layernorm"],
                                               x, residual)
        x, kv_cache = self.self_attn(params["self_attn"], rotary,
                                     rotary_params, x, positions, kv_cache,
                                     meta, is_prefill=is_prefill,
                                     has_prefix=has_prefix)
        x, residual = self.post_attention_layernorm(
            params["post_attention_layernorm"], x, residual)
        x = self.mlp(params["mlp"], x)
        return x, residual, kv_cache


class Qwen2MoeForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, **kwargs):
        if not hasattr(cfg, "attention_bias"):
            cfg.attention_bias = True
        cfg.attention_out_bias = False
        super().__init__(cfg, **kwargs)

    def _is_sparse(self, cfg, i):
        mlp_only = set(getattr(cfg, "mlp_only_layers", []) or [])
        step = getattr(cfg, "decoder_sparse_step", 1) or 1
        return (i not in mlp_only and getattr(cfg, "num_experts", 0) > 0
                and (i + 1) % step == 0)

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        if self._is_sparse(cfg, layer_idx):
            return Qwen2MoeDecoderLayer(cfg, layer_idx, tp_size,
                                        method_factory, dtype,
                                        kv_cache_dtype, kv_scales)
        return LlamaDecoderLayer(cfg, layer_idx, tp_size, method_factory,
                                 dtype, kv_cache_dtype, kv_scales)

    def hf_name_map(self) -> Dict[str, Tuple]:
        m = super().hf_name_map()
        for i, layer in enumerate(self.layers):
            if not isinstance(layer, Qwen2MoeDecoderLayer):
                continue
            pre = f"model.layers.{i}.mlp."
            path = ("layers", i, "mlp")
            # Dense-MLP names from the base map don't exist for sparse
            # layers; harmless. Experts are stacked by the loader's
            # expert-group pass (".experts." tensors).
            m[pre + "gate.weight"] = (path + ("gate", "weight"),
                                      "transpose")
            for name in ("gate_proj", "up_proj", "down_proj"):
                m[pre + f"shared_expert.{name}.weight"] = (
                    path + ("shared_expert", name, "weight"), "transpose")
            m[pre + "shared_expert_gate.weight"] = (
                path + ("shared_expert_gate", "weight"), "transpose")
        return m
