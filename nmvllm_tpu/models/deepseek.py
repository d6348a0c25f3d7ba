"""DeepSeek-MoE v1 (reference: vllm/model_executor/models/deepseek.py).

Llama attention with per-layer MoE: softmax top-k routed experts plus
``n_shared_experts`` always-on shared experts (folded into one dense MLP of
size n_shared * moe_intermediate_size, like the reference). The first
``first_k_dense_replace`` layers and layers off the ``moe_layer_freq`` grid
stay dense.
"""
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.layernorm import RMSNorm
from nmvllm_tpu.layers.linear import Linear
from nmvllm_tpu.models.llama import (Attention, LlamaDecoderLayer,
                                     LlamaForCausalLM, LlamaMLP)
from nmvllm_tpu.models.qwen2_moe import _SharedExpertCfg
from nmvllm_tpu.ops.moe import fused_moe
from nmvllm_tpu.parallel.mesh import TP_AXIS


class DeepseekMoEBlock:
    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype):
        self.num_experts = cfg.n_routed_experts
        self.top_k = cfg.num_experts_per_tok
        self.hidden_size = cfg.hidden_size
        self.intermediate_size = cfg.moe_intermediate_size
        self.renormalize = bool(getattr(cfg, "norm_topk_prob", False))
        self.n_shared = getattr(cfg, "n_shared_experts", None) or 0
        self.tp_size = tp_size
        from nmvllm_tpu.ops.moe import moe_ep_enabled
        self.ep = moe_ep_enabled(self.num_experts, tp_size)
        self.dtype = dtype
        self.gate = Linear(cfg.hidden_size, self.num_experts, bias=False,
                           shard="none", params_dtype=dtype)
        if self.n_shared:
            inter = self.n_shared * cfg.moe_intermediate_size
            self.shared_experts = LlamaMLP(_SharedExpertCfg(cfg, inter),
                                           layer_idx, method_factory,
                                           dtype)

    def init(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        e, h, i = self.num_experts, self.hidden_size, self.intermediate_size
        w1 = jax.random.normal(k1, (e, h, 2 * i), jnp.float32) * h**-0.5
        w2 = jax.random.normal(k2, (e, i, h), jnp.float32) * i**-0.5
        p = {"gate": self.gate.init(k3),
             "w1": w1.astype(self.dtype), "w2": w2.astype(self.dtype)}
        if self.n_shared:
            p["shared_experts"] = self.shared_experts.init(k4)
        return p

    def specs(self):
        from nmvllm_tpu.ops.moe import moe_expert_specs
        w1s, w2s = moe_expert_specs(self.ep)
        p = {"gate": self.gate.specs(), "w1": w1s, "w2": w2s}
        if self.n_shared:
            p["shared_experts"] = self.shared_experts.specs()
        return p

    def __call__(self, params, x):
        b, t, h = x.shape
        flat = x.reshape(b * t, h)
        gate_logits = self.gate(params["gate"], flat)
        from nmvllm_tpu.ops.moe import moe_apply
        out = moe_apply(flat, params["w1"], params["w2"], gate_logits,
                        self.top_k, ep=self.ep, axis_name=TP_AXIS,
                        renormalize=self.renormalize, activation="silu")
        out = jax.lax.psum(out, TP_AXIS)
        if self.n_shared:
            shared = self.shared_experts(params["shared_experts"],
                                         flat[None]).reshape(b * t, h)
            out = out + shared
        return out.reshape(b, t, h)


class DeepseekDecoderLayer:
    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype,
                 kv_cache_dtype="auto", kv_scales=(1.0, 1.0)):
        self.self_attn = Attention(cfg, layer_idx, tp_size, method_factory,
                                   dtype, kv_cache_dtype, *kv_scales)
        self.mlp = DeepseekMoEBlock(cfg, layer_idx, tp_size, method_factory,
                                    dtype)
        eps = getattr(cfg, "rms_norm_eps", 1e-6)
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)


def _moe_layer_methods(cls):
    """Share init/specs/__call__ shape with the Qwen2-MoE layer."""
    from nmvllm_tpu.models.qwen2_moe import Qwen2MoeDecoderLayer as Q
    cls.init = Q.init
    cls.specs = Q.specs
    cls.__call__ = Q.__call__
    return cls


_moe_layer_methods(DeepseekDecoderLayer)


class DeepseekForCausalLM(LlamaForCausalLM):

    def _is_sparse(self, cfg, i):
        if getattr(cfg, "n_routed_experts", None) is None:
            return False
        freq = getattr(cfg, "moe_layer_freq", 1) or 1
        return (i >= getattr(cfg, "first_k_dense_replace", 0)
                and i % freq == 0)

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        if self._is_sparse(cfg, layer_idx):
            return DeepseekDecoderLayer(cfg, layer_idx, tp_size,
                                        method_factory, dtype,
                                        kv_cache_dtype, kv_scales)
        return LlamaDecoderLayer(cfg, layer_idx, tp_size, method_factory,
                                 dtype, kv_cache_dtype, kv_scales)

    def hf_name_map(self) -> Dict[str, Tuple]:
        m = super().hf_name_map()
        for i, layer in enumerate(self.layers):
            if not isinstance(layer, DeepseekDecoderLayer):
                continue
            pre = f"model.layers.{i}.mlp."
            path = ("layers", i, "mlp")
            m[pre + "gate.weight"] = (path + ("gate", "weight"),
                                      "transpose")
            for name in ("gate_proj", "up_proj", "down_proj"):
                m[pre + f"shared_experts.{name}.weight"] = (
                    path + ("shared_experts", name, "weight"), "transpose")
        return m
