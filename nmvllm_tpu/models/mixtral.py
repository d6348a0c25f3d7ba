"""Mixtral MoE decoder (reference: vllm/model_executor/models/mixtral.py +
fused_moe/layer.py:77 FusedMoE).

Llama attention stack with the MLP replaced by a sparse MoE block: softmax
top-k routing + ragged grouped-GEMM experts (ops/moe.py). Parallelism
follows the reference's TP-sharded experts (intermediate dim sharded over
``tp``, fused_moe/layer.py:108-119); EP via mesh axis + all-to-all is the
staged upgrade (SURVEY.md §2.3).
"""
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.layernorm import RMSNorm
from nmvllm_tpu.layers.linear import Linear
from nmvllm_tpu.models.llama import (Attention, LlamaForCausalLM,
                                     MethodFactory, _default_method_factory)
from nmvllm_tpu.ops.moe import fused_moe
from nmvllm_tpu.parallel.mesh import TP_AXIS


class MixtralMoE:
    """Sparse MoE block (reference mixtral.py MixtralMoE + FusedMoE)."""

    def __init__(self, cfg, layer_idx: int, tp_size: int,
                 method_factory: MethodFactory, dtype):
        from nmvllm_tpu.parallel.mesh import expert_parallel_size
        self.num_experts = cfg.num_local_experts
        self.top_k = cfg.num_experts_per_tok
        self.hidden_size = cfg.hidden_size
        self.intermediate_size = cfg.intermediate_size
        self.tp_size = tp_size
        self.ep = expert_parallel_size() > 1 and tp_size > 1
        if self.ep:
            assert self.num_experts % tp_size == 0, (
                "expert_parallel requires num_experts % tp == 0")
        self.dtype = dtype
        self.gate = Linear(cfg.hidden_size, self.num_experts, bias=False,
                           shard="none", params_dtype=dtype)
        # Quantized expert stacks (round 5): W4 quant configs route the
        # experts through packed-INT4 A8P stacks + the grouped W4A8
        # Pallas kernel (ops/moe_quant.py) — bf16 stacks made 12-layer
        # Mixtral "INT4" OOM at 34.6 GB (docs/PERF_NOTES.md round 4).
        # NMVLLM_MOE_INT4=0 opts out (bf16 experts).
        self.quant_experts = False
        from nmvllm_tpu.quantization.wNa16 import WNA16LinearMethod
        m = method_factory(f"model.layers.{layer_idx}.experts")
        if (isinstance(m, WNA16LinearMethod) and m.bits == 4
                and (m.group_size or 0) > 0 and m.group_size % 8 == 0
                and self.hidden_size % m.group_size == 0
                and self.intermediate_size % m.group_size == 0):
            import os
            if os.getenv("NMVLLM_MOE_INT4", "1") not in ("0", "false"):
                self.quant_experts = True
                self.expert_group = m.group_size

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        e, h, i = self.num_experts, self.hidden_size, self.intermediate_size
        if self.quant_experts:
            from nmvllm_tpu.ops.moe_quant import random_a8p_stack
            return {"gate": self.gate.init(k3),
                    "w1": random_a8p_stack(k1, e, h, 2 * i,
                                           self.expert_group),
                    "w2": random_a8p_stack(k2, e, i, h,
                                           self.expert_group)}
        scale = h**-0.5
        w1 = jax.random.normal(k1, (e, h, 2 * i), jnp.float32) * scale
        w2 = jax.random.normal(k2, (e, i, h), jnp.float32) * (i**-0.5)
        return {"gate": self.gate.init(k3),
                "w1": w1.astype(self.dtype), "w2": w2.astype(self.dtype)}

    def specs(self):
        from nmvllm_tpu.ops.moe import moe_expert_specs
        w1s, w2s = moe_expert_specs(self.ep, quant=self.quant_experts)
        return {"gate": self.gate.specs(), "w1": w1s, "w2": w2s}

    def __call__(self, params, x):
        from nmvllm_tpu.ops.moe import moe_apply
        b, t, h = x.shape
        flat = x.reshape(b * t, h)
        gate_logits = self.gate(params["gate"], flat)
        out = moe_apply(flat, params["w1"], params["w2"], gate_logits,
                        self.top_k, ep=self.ep, axis_name=TP_AXIS,
                        renormalize=True, activation="silu")
        out = jax.lax.psum(out, TP_AXIS)
        return out.reshape(b, t, h)


class MixtralDecoderLayer:

    def __init__(self, cfg, layer_idx: int, tp_size: int,
                 method_factory: MethodFactory, dtype,
                 kv_cache_dtype: str = "auto",
                 kv_scales: Tuple[float, float] = (1.0, 1.0)):
        self.self_attn = Attention(cfg, layer_idx, tp_size, method_factory,
                                   dtype, kv_cache_dtype, *kv_scales)
        self.block_sparse_moe = MixtralMoE(cfg, layer_idx, tp_size,
                                           method_factory, dtype)
        eps = getattr(cfg, "rms_norm_eps", 1e-5)
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)

    def init(self, rng):
        ks = jax.random.split(rng, 4)
        return {"self_attn": self.self_attn.init(ks[0]),
                "block_sparse_moe": self.block_sparse_moe.init(ks[1]),
                "input_layernorm": self.input_layernorm.init(ks[2]),
                "post_attention_layernorm":
                    self.post_attention_layernorm.init(ks[3])}

    def specs(self):
        return {"self_attn": self.self_attn.specs(),
                "block_sparse_moe": self.block_sparse_moe.specs(),
                "input_layernorm": self.input_layernorm.specs(),
                "post_attention_layernorm":
                    self.post_attention_layernorm.specs()}

    def __call__(self, params, rotary, rotary_params, x, positions, kv_cache,
                 meta, residual, *, is_prefill: bool, has_prefix: bool):
        if residual is None:
            residual = x
            x = self.input_layernorm(params["input_layernorm"], x)
        else:
            x, residual = self.input_layernorm(params["input_layernorm"], x,
                                               residual)
        x, kv_cache = self.self_attn(params["self_attn"], rotary,
                                     rotary_params, x, positions, kv_cache,
                                     meta, is_prefill=is_prefill,
                                     has_prefix=has_prefix)
        x, residual = self.post_attention_layernorm(
            params["post_attention_layernorm"], x, residual)
        x = self.block_sparse_moe(params["block_sparse_moe"], x)
        return x, residual, kv_cache


class MixtralForCausalLM(LlamaForCausalLM):

    def __init__(self, cfg, *, tp_size: int = 1,
                 method_factory: Optional[MethodFactory] = None,
                 dtype=jnp.bfloat16, kv_cache_dtype: str = "auto",
                 kv_scales=None):
        super().__init__(cfg, tp_size=tp_size,
                         method_factory=method_factory, dtype=dtype,
                         kv_cache_dtype=kv_cache_dtype,
                         kv_scales=kv_scales)
        method_factory = method_factory or _default_method_factory
        kv_scales = kv_scales or [(1.0, 1.0)] * cfg.num_hidden_layers
        # Replace dense MLP layers with MoE blocks.
        self.layers = [
            MixtralDecoderLayer(cfg, i, tp_size, method_factory, dtype,
                                kv_cache_dtype, kv_scales[i])
            for i in range(cfg.num_hidden_layers)
        ]

    def hf_name_map(self) -> Dict[str, Tuple]:
        m: Dict[str, Tuple] = {
            "model.embed_tokens.weight": (("embed_tokens", "weight"),
                                          "pad_vocab"),
            "model.norm.weight": (("norm", "weight"), None),
        }
        if not self.lm_head.tied:
            m["lm_head.weight"] = (("lm_head", "weight"), "pad_vocab")
        for i in range(len(self.layers)):
            pre = f"model.layers.{i}."
            path = ("layers", i)
            for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
                m[pre + f"self_attn.{name}.weight"] = (
                    path + ("self_attn", name, "weight"), "transpose")
            m[pre + "block_sparse_moe.gate.weight"] = (
                path + ("block_sparse_moe", "gate", "weight"), "transpose")
            # Expert tensors w1/w2/w3 handled by a stacking transform at
            # load (w1=gate, w3=up -> stacked w1; w2 -> down).
            m[pre + "input_layernorm.weight"] = (
                path + ("input_layernorm", "weight"), None)
            m[pre + "post_attention_layernorm.weight"] = (
                path + ("post_attention_layernorm", "weight"), None)
        return m
