"""DeepSeek-V2 / V2-Lite (reference: vllm/model_executor/models/deepseek_v2.py).

Multi-head Latent Attention (MLA): queries optionally low-rank
(q_a_proj -> RMSNorm -> q_b_proj), K/V always compressed through a
kv_lora_rank latent with a decoupled rope sub-head
(kv_a_proj_with_mqa -> [latent | k_pe]). Like the reference
(deepseek_v2.py:310-329) we decompress to per-head K/V before the paged
cache and pad the 192-dim qk head to 256 (lane-aligned for the Pallas
kernel); caching the latent instead (true MLA decode) is a planned
optimization. Rope is deepseek_yarn (gptj-interleaved) over the 64-dim
rope sub-head, with the YaRN mscale^2 folded into the attention scale
(deepseek_v2.py:272-276).

MoE: group-limited greedy routing (n_group/topk_group), routed output
scaled by routed_scaling_factor, plus always-on shared experts; the
first ``first_k_dense_replace`` layers stay dense.
"""
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.layernorm import RMSNorm
from nmvllm_tpu.layers.linear import Linear
from nmvllm_tpu.layers.rotary import RotaryEmbedding, yarn_get_mscale
from nmvllm_tpu.models.llama import (LlamaDecoderLayer, LlamaForCausalLM,
                                     LlamaMLP)
from nmvllm_tpu.models.deepseek import DeepseekMoEBlock
from nmvllm_tpu.models.qwen2_moe import Qwen2MoeDecoderLayer
from nmvllm_tpu.ops.cache_ops import write_to_kv_cache
from nmvllm_tpu.ops.moe import fused_moe, grouped_topk
from nmvllm_tpu.ops.paged_attention import paged_attention
from nmvllm_tpu.ops.prefill_attention import (
    prefill_attention, prefill_attention_with_paged_prefix)
from nmvllm_tpu.parallel.mesh import TP_AXIS

_CACHE_HEAD_DIM = 256  # qk_head_dim 192 padded to the TPU lane multiple


class DeepseekV2Attention:
    """MLA block with the Attention-protocol surface the engine expects
    (kv_heads/total_kv_heads/head_dim feed KV-cache sizing)."""

    def __init__(self, cfg, layer_idx: int, tp_size: int, method_factory,
                 dtype, kv_cache_dtype: str = "auto",
                 k_scale: float = 1.0, v_scale: float = 1.0):
        self.hidden_size = cfg.hidden_size
        self.total_heads = cfg.num_attention_heads
        self.total_kv_heads = cfg.num_attention_heads
        assert self.total_heads % tp_size == 0
        self.heads = self.total_heads // tp_size
        self.kv_heads = self.heads
        self.qk_nope_head_dim = cfg.qk_nope_head_dim
        self.qk_rope_head_dim = cfg.qk_rope_head_dim
        self.qk_head_dim = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
        self.v_head_dim = cfg.v_head_dim
        self.q_lora_rank = getattr(cfg, "q_lora_rank", None)
        self.kv_lora_rank = cfg.kv_lora_rank
        self.head_dim = _CACHE_HEAD_DIM
        self.sliding_window = 0
        self.attn_logit_soft_cap = 0.0
        self.alibi_slopes = None
        self.k_scale = k_scale
        self.v_scale = v_scale
        self.scale = self.qk_head_dim**-0.5
        rope_scaling = getattr(cfg, "rope_scaling", None)
        if rope_scaling:
            factor = float(rope_scaling.get("factor", 1.0))
            mscale_all = float(rope_scaling.get("mscale_all_dim", 0.0))
            mscale = yarn_get_mscale(factor, mscale_all)
            self.scale = self.scale * mscale * mscale
        eps = getattr(cfg, "rms_norm_eps", 1e-6)
        prefix = f"model.layers.{layer_idx}.self_attn"
        h = cfg.hidden_size
        if self.q_lora_rank is not None:
            self.q_a_proj = Linear(h, self.q_lora_rank, bias=False,
                                   shard="none",
                                   method=method_factory(
                                       f"{prefix}.q_a_proj"),
                                   params_dtype=dtype,
                                   name=f"{prefix}.q_a_proj")
            self.q_a_layernorm = RMSNorm(self.q_lora_rank, eps, dtype)
            self.q_b_proj = Linear(self.q_lora_rank,
                                   self.total_heads * self.qk_head_dim,
                                   bias=False, shard="column",
                                   method=method_factory(
                                       f"{prefix}.q_b_proj"),
                                   params_dtype=dtype,
                                   name=f"{prefix}.q_b_proj")
        else:
            self.q_proj = Linear(h, self.total_heads * self.qk_head_dim,
                                 bias=False, shard="column",
                                 method=method_factory(f"{prefix}.q_proj"),
                                 params_dtype=dtype,
                                 name=f"{prefix}.q_proj")
        self.kv_a_proj_with_mqa = Linear(
            h, self.kv_lora_rank + self.qk_rope_head_dim, bias=False,
            shard="none",
            method=method_factory(f"{prefix}.kv_a_proj_with_mqa"),
            params_dtype=dtype, name=f"{prefix}.kv_a_proj_with_mqa")
        self.kv_a_layernorm = RMSNorm(self.kv_lora_rank, eps, dtype)
        self.kv_b_proj = Linear(
            self.kv_lora_rank,
            self.total_heads * (self.qk_nope_head_dim + self.v_head_dim),
            bias=False, shard="column",
            method=method_factory(f"{prefix}.kv_b_proj"),
            params_dtype=dtype, name=f"{prefix}.kv_b_proj")
        self.o_proj = Linear(self.total_heads * self.v_head_dim,
                             cfg.hidden_size, bias=False, shard="row",
                             method=method_factory(f"{prefix}.o_proj"),
                             params_dtype=dtype, name=f"{prefix}.o_proj")

    def init(self, rng):
        ks = jax.random.split(rng, 7)
        p = {"kv_a_proj_with_mqa": self.kv_a_proj_with_mqa.init(ks[0]),
             "kv_a_layernorm": self.kv_a_layernorm.init(ks[1]),
             "kv_b_proj": self.kv_b_proj.init(ks[2]),
             "o_proj": self.o_proj.init(ks[3])}
        if self.q_lora_rank is not None:
            p["q_a_proj"] = self.q_a_proj.init(ks[4])
            p["q_a_layernorm"] = self.q_a_layernorm.init(ks[5])
            p["q_b_proj"] = self.q_b_proj.init(ks[6])
        else:
            p["q_proj"] = self.q_proj.init(ks[4])
        return p

    def specs(self):
        p = {"kv_a_proj_with_mqa": self.kv_a_proj_with_mqa.specs(),
             "kv_a_layernorm": self.kv_a_layernorm.specs(),
             "kv_b_proj": self.kv_b_proj.specs(),
             "o_proj": self.o_proj.specs()}
        if self.q_lora_rank is not None:
            p["q_a_proj"] = self.q_a_proj.specs()
            p["q_a_layernorm"] = self.q_a_layernorm.specs()
            p["q_b_proj"] = self.q_b_proj.specs()
        else:
            p["q_proj"] = self.q_proj.specs()
        return p

    def __call__(self, params, rotary, rotary_params, x, positions,
                 kv_cache, meta, *, is_prefill: bool, has_prefix: bool):
        b, t, _ = x.shape
        if self.q_lora_rank is not None:
            q = self.q_a_proj(params["q_a_proj"], x)
            q = self.q_a_layernorm(params["q_a_layernorm"], q)
            q = self.q_b_proj(params["q_b_proj"], q)
        else:
            q = self.q_proj(params["q_proj"], x)
        q = q.reshape(b, t, self.heads, self.qk_head_dim)
        q_nope = q[..., :self.qk_nope_head_dim]
        q_pe = q[..., self.qk_nope_head_dim:]

        latent = self.kv_a_proj_with_mqa(params["kv_a_proj_with_mqa"], x)
        kv_a = latent[..., :self.kv_lora_rank]
        k_pe = latent[..., self.kv_lora_rank:].reshape(
            b, t, 1, self.qk_rope_head_dim)
        kv_a = self.kv_a_layernorm(params["kv_a_layernorm"], kv_a)
        kv = self.kv_b_proj(params["kv_b_proj"], kv_a).reshape(
            b, t, self.heads, self.qk_nope_head_dim + self.v_head_dim)
        k_nope = kv[..., :self.qk_nope_head_dim]
        v = kv[..., self.qk_nope_head_dim:]

        q_pe, k_pe = rotary(rotary_params, positions, q_pe, k_pe)
        k_pe = jnp.broadcast_to(
            k_pe, (b, t, self.heads, self.qk_rope_head_dim))

        pad = _CACHE_HEAD_DIM - self.qk_head_dim
        qf = jnp.concatenate(
            [q_nope, q_pe, jnp.zeros(q_pe.shape[:-1] + (pad,), q.dtype)],
            axis=-1)
        kf = jnp.concatenate(
            [k_nope, k_pe, jnp.zeros(k_pe.shape[:-1] + (pad,), q.dtype)],
            axis=-1)
        vf = jnp.pad(v, ((0, 0), (0, 0), (0, 0),
                         (0, _CACHE_HEAD_DIM - self.v_head_dim)))

        flat_k = kf.reshape(b * t, self.kv_heads, _CACHE_HEAD_DIM)
        flat_v = vf.reshape(b * t, self.kv_heads, _CACHE_HEAD_DIM)
        if is_prefill:
            kv_cache = write_to_kv_cache(
                kv_cache, flat_k, flat_v, meta.slot_mapping.reshape(b * t))

        if is_prefill:
            if has_prefix:
                o = prefill_attention_with_paged_prefix(
                    qf, kf, vf, positions, meta.seq_lens, kv_cache,
                    meta.block_tables, meta.prefix_lens, scale=self.scale)
            else:
                o = prefill_attention(qf, kf, vf, positions, meta.seq_lens,
                                      scale=self.scale)
        else:
            o, kv_cache = paged_attention(
                qf.reshape(b, self.heads, _CACHE_HEAD_DIM), kv_cache,
                meta.block_tables, meta.context_lens,
                scale=self.scale, new_k=flat_k, new_v=flat_v,
                write_slots=meta.slot_mapping.reshape(b * t))
            o = o.reshape(b, 1, self.heads, _CACHE_HEAD_DIM)
        o = o[..., :self.v_head_dim].reshape(
            b, t, self.heads * self.v_head_dim)
        return self.o_proj(params["o_proj"], o), kv_cache


class DeepseekV2MoEBlock(DeepseekMoEBlock):
    """DeepSeek-V2 routing: grouped top-k + routed_scaling_factor
    (reference deepseek_v2.py:150-176)."""

    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype):
        super().__init__(cfg, layer_idx, tp_size, method_factory, dtype)
        self.n_group = getattr(cfg, "n_group", 1) or 1
        self.topk_group = getattr(cfg, "topk_group", 1) or 1
        self.routed_scaling_factor = float(
            getattr(cfg, "routed_scaling_factor", 1.0))

    def __call__(self, params, x):
        b, t, h = x.shape
        flat = x.reshape(b * t, h)
        gate_logits = self.gate(params["gate"], flat)
        weights, ids = grouped_topk(gate_logits, self.top_k, self.n_group,
                                    self.topk_group,
                                    renormalize=self.renormalize)
        from nmvllm_tpu.ops.moe import moe_apply
        out = moe_apply(flat, params["w1"], params["w2"], gate_logits,
                        self.top_k, ep=self.ep, axis_name=TP_AXIS,
                        topk_weights=weights, topk_ids=ids)
        out = jax.lax.psum(out, TP_AXIS) * self.routed_scaling_factor
        if self.n_shared:
            shared = self.shared_experts(params["shared_experts"],
                                         flat[None]).reshape(b * t, h)
            out = out + shared
        return out.astype(x.dtype).reshape(b, t, h)


class DeepseekV2DecoderLayer:
    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype,
                 kv_cache_dtype="auto", kv_scales=(1.0, 1.0),
                 sparse=True):
        self.self_attn = DeepseekV2Attention(cfg, layer_idx, tp_size,
                                             method_factory, dtype,
                                             kv_cache_dtype, *kv_scales)
        if sparse:
            self.mlp = DeepseekV2MoEBlock(cfg, layer_idx, tp_size,
                                          method_factory, dtype)
        else:
            self.mlp = LlamaMLP(cfg, layer_idx, method_factory, dtype)
        eps = getattr(cfg, "rms_norm_eps", 1e-6)
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)

    init = Qwen2MoeDecoderLayer.init
    specs = Qwen2MoeDecoderLayer.specs
    __call__ = Qwen2MoeDecoderLayer.__call__


class DeepseekV2ForCausalLM(LlamaForCausalLM):
    # MLA attention (DeepseekV2Attention) does not implement the
    # sequence-parallel ring-prefill hook LlamaAttention has.
    supports_sequence_parallel = False

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        # Cache geometry: decompressed MHA at the padded cache head dim.
        self.head_dim = _CACHE_HEAD_DIM
        # Rope runs over the decoupled 64-dim sub-head only.
        scaling = dict(getattr(cfg, "rope_scaling", None) or {})
        if scaling:
            scaling["type"] = "deepseek_yarn"
        self.rotary = RotaryEmbedding(
            cfg.qk_rope_head_dim, rotary_dim=cfg.qk_rope_head_dim,
            max_position=cfg.max_position_embeddings,
            base=getattr(cfg, "rope_theta", 10000.0),
            rope_scaling=scaling or None, is_neox_style=False,
            dtype=self.dtype)

    def _is_sparse(self, cfg, i):
        if getattr(cfg, "n_routed_experts", None) is None:
            return False
        freq = getattr(cfg, "moe_layer_freq", 1) or 1
        return (i >= getattr(cfg, "first_k_dense_replace", 0)
                and i % freq == 0)

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        return DeepseekV2DecoderLayer(cfg, layer_idx, tp_size,
                                      method_factory, dtype, kv_cache_dtype,
                                      kv_scales,
                                      sparse=self._is_sparse(cfg, layer_idx))

    def hf_name_map(self) -> Dict[str, Tuple]:
        m: Dict[str, Tuple] = {
            "model.embed_tokens.weight": (("embed_tokens", "weight"),
                                          "pad_vocab"),
            "model.norm.weight": (("norm", "weight"), None),
        }
        if not self.lm_head.tied:
            m["lm_head.weight"] = (("lm_head", "weight"), "pad_vocab")
        for i, layer in enumerate(self.layers):
            pre = f"model.layers.{i}."
            path = ("layers", i)
            attn = layer.self_attn
            attn_names = ["kv_a_proj_with_mqa", "kv_b_proj", "o_proj"]
            attn_names += (["q_a_proj", "q_b_proj"]
                           if attn.q_lora_rank is not None else ["q_proj"])
            for name in attn_names:
                m[pre + f"self_attn.{name}.weight"] = (
                    path + ("self_attn", name, "weight"), "transpose")
            for name in ("q_a_layernorm", "kv_a_layernorm"):
                m[pre + f"self_attn.{name}.weight"] = (
                    path + ("self_attn", name, "weight"), None)
            for norm in ("input_layernorm", "post_attention_layernorm"):
                m[pre + f"{norm}.weight"] = (path + (norm, "weight"), None)
            if isinstance(layer.mlp, DeepseekV2MoEBlock):
                m[pre + "mlp.gate.weight"] = (
                    path + ("mlp", "gate", "weight"), "transpose")
                for name in ("gate_proj", "up_proj", "down_proj"):
                    m[pre + f"mlp.shared_experts.{name}.weight"] = (
                        path + ("mlp", "shared_experts", name, "weight"),
                        "transpose")
            else:
                for name in ("gate_proj", "up_proj", "down_proj"):
                    m[pre + f"mlp.{name}.weight"] = (
                        path + ("mlp", name, "weight"), "transpose")
        return m
