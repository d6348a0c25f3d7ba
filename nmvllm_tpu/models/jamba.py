"""Jamba: hybrid Mamba/attention MoE decoder.

Reference: vllm/model_executor/models/jamba.py (JambaMambaMixer:51,
JambaMambaDecoderLayer:387, JambaAttentionDecoderLayer, layer pattern
:536 — "mamba" unless (i - attn_layer_offset) % attn_layer_period == 0;
MoE ffn unless (i - expert_layer_offset) % expert_layer_period != 0;
Mamba cache slots :664-670).

TPU-native design:
  * Mamba recurrence = lax.scan op (ops/mamba.py) — one code path for
    prefill / chunked prefill / decode, state frozen past each row's
    valid length.
  * Recurrent state lives in per-layer slot pools
    (conv: (slots, W-1, d_inner), ssm: (slots, d_inner, S)), gathered /
    scattered by ``meta.state_slots`` — the paged-KV analogue for
    constant-size state. Slots are assigned by the runner and freed via
    the scheduler's free_seq hook (the reference tracks the same thing
    with mamba_cache_indices_mapping, jamba.py:669).
  * Attention layers have NO positional encoding (rotary=None) — Jamba
    relies on the SSM for position.
  * TP: d_inner sharded (in_proj/conv/dt_proj column, x_proj/out_proj
    row), experts TP- or EP-sharded like the other MoE families.
"""
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.embedding import ParallelLMHead, VocabParallelEmbedding
from nmvllm_tpu.layers.layernorm import RMSNorm
from nmvllm_tpu.layers.linear import Linear
from nmvllm_tpu.models.base import AttentionMetadata
from nmvllm_tpu.models.llama import (Attention, LlamaForCausalLM, LlamaMLP,
                                     MethodFactory, _default_method_factory)
from nmvllm_tpu.ops.mamba import causal_conv1d, selective_scan
from nmvllm_tpu.parallel.mesh import TP_AXIS

_INT32_MAX = 2**31 - 1


class JambaMambaMixer:
    """reference jamba.py:51 JambaMambaMixer."""

    def __init__(self, cfg, layer_idx: int, tp_size: int,
                 method_factory: MethodFactory, dtype):
        self.hidden_size = cfg.hidden_size
        self.d_state = cfg.mamba_d_state
        self.d_conv = cfg.mamba_d_conv
        self.d_inner = cfg.mamba_expand * cfg.hidden_size
        self.dt_rank = cfg.mamba_dt_rank
        self.tp_size = tp_size
        self.dtype = dtype
        self.use_conv_bias = getattr(cfg, "mamba_conv_bias", True)
        self.use_bias = getattr(cfg, "mamba_proj_bias", False)
        self.eps = getattr(cfg, "rms_norm_eps", 1e-6)
        assert self.d_inner % tp_size == 0
        prefix = f"model.layers.{layer_idx}.mamba"
        self.in_proj = Linear(self.hidden_size, 2 * self.d_inner,
                              bias=self.use_bias, shard="column",
                              method=method_factory(f"{prefix}.in_proj"),
                              params_dtype=dtype,
                              name=f"{prefix}.in_proj")
        self.x_proj = Linear(self.d_inner,
                             self.dt_rank + 2 * self.d_state, bias=False,
                             shard="row",
                             method=method_factory(f"{prefix}.x_proj"),
                             params_dtype=dtype, name=f"{prefix}.x_proj")
        self.dt_proj = Linear(self.dt_rank, self.d_inner, bias=True,
                              shard="column",
                              method=method_factory(f"{prefix}.dt_proj"),
                              params_dtype=dtype,
                              name=f"{prefix}.dt_proj")
        self.out_proj = Linear(self.d_inner, self.hidden_size,
                               bias=self.use_bias, shard="row",
                               method=method_factory(f"{prefix}.out_proj"),
                               params_dtype=dtype,
                               name=f"{prefix}.out_proj")
        self.dt_layernorm = RMSNorm(self.dt_rank, self.eps, dtype)
        self.b_layernorm = RMSNorm(self.d_state, self.eps, dtype)
        self.c_layernorm = RMSNorm(self.d_state, self.eps, dtype)

    def init(self, rng):
        ks = jax.random.split(rng, 9)
        d_in = self.d_inner
        # A = -exp(A_log); HF stores A_log. Init like S4D-real.
        a_log = jnp.log(jnp.broadcast_to(
            jnp.arange(1, self.d_state + 1, dtype=jnp.float32)[None, :],
            (d_in, self.d_state)))
        return {
            "in_proj": self.in_proj.init(ks[0]),
            "conv1d": {
                "weight": jax.random.normal(
                    ks[1], (self.d_conv, d_in), jnp.float32) * 0.2,
                "bias": jnp.zeros((d_in,), jnp.float32),
            },
            "x_proj": self.x_proj.init(ks[2]),
            "dt_proj": self.dt_proj.init(ks[3]),
            "out_proj": self.out_proj.init(ks[4]),
            "A_log": a_log,
            "D": jnp.ones((d_in,), jnp.float32),
            "dt_layernorm": self.dt_layernorm.init(ks[5]),
            "b_layernorm": self.b_layernorm.init(ks[6]),
            "c_layernorm": self.c_layernorm.init(ks[7]),
        }

    def specs(self):
        return {
            "in_proj": self.in_proj.specs(),
            "conv1d": {"weight": P(None, TP_AXIS), "bias": P(TP_AXIS)},
            "x_proj": self.x_proj.specs(),
            "dt_proj": self.dt_proj.specs(),
            "out_proj": self.out_proj.specs(),
            "A_log": P(TP_AXIS, None),
            "D": P(TP_AXIS),
            "dt_layernorm": self.dt_layernorm.specs(),
            "b_layernorm": self.b_layernorm.specs(),
            "c_layernorm": self.c_layernorm.specs(),
        }

    def state_shapes(self, num_slots: int):
        """(conv_state, ssm_state) GLOBAL shapes for the slot pool."""
        return ((num_slots, self.d_conv - 1, self.d_inner),
                (num_slots, self.d_inner, self.d_state))

    def state_pspecs(self):
        return (P(None, None, TP_AXIS), P(None, TP_AXIS, None))

    def __call__(self, params, x: jax.Array, meta: AttentionMetadata,
                 state: Tuple[jax.Array, jax.Array], *, is_prefill: bool,
                 has_prefix: bool) -> Tuple[jax.Array, Tuple]:
        b, t, _ = x.shape
        conv_cache, ssm_cache = state
        slots = meta.state_slots
        read_idx = jnp.clip(slots, 0, conv_cache.shape[0] - 1)

        proj = self.in_proj(params["in_proj"], x)       # (B, T, 2*d_in/tp)
        xs, z = jnp.split(proj, 2, axis=-1)

        fresh = is_prefill and not has_prefix
        if fresh:
            conv_in = jnp.zeros((b,) + conv_cache.shape[1:],
                                conv_cache.dtype)
            ssm_in = jnp.zeros((b,) + ssm_cache.shape[1:], ssm_cache.dtype)
        else:
            conv_in = conv_cache[read_idx]
            ssm_in = ssm_cache[read_idx]

        seq_lens = meta.seq_lens
        xs, conv_out = causal_conv1d(
            xs, params["conv1d"]["weight"],
            params["conv1d"]["bias"] if self.use_conv_bias else None,
            conv_in, seq_lens)

        ssm_p = self.x_proj(params["x_proj"], xs)       # (B, T, r+2S)
        dt = ssm_p[..., :self.dt_rank]
        b_in = ssm_p[..., self.dt_rank:self.dt_rank + self.d_state]
        c_in = ssm_p[..., self.dt_rank + self.d_state:]
        dt = self.dt_layernorm(params["dt_layernorm"], dt)
        b_in = self.b_layernorm(params["b_layernorm"], b_in)
        c_in = self.c_layernorm(params["c_layernorm"], c_in)
        dt = self.dt_proj(params["dt_proj"], dt)        # (B, T, d_in/tp)

        a = -jnp.exp(params["A_log"].astype(jnp.float32))
        y, ssm_out = selective_scan(
            xs, dt, a, b_in, c_in, params["D"], z, ssm_in,
            dt_bias=None, seq_lens=seq_lens)

        # Scatter updated state back (padding rows dropped via sentinel).
        wslots = jnp.where(slots < 0, _INT32_MAX, slots)
        conv_cache = conv_cache.at[wslots].set(
            conv_out.astype(conv_cache.dtype), mode="drop")
        ssm_cache = ssm_cache.at[wslots].set(
            ssm_out.astype(ssm_cache.dtype), mode="drop")

        out = self.out_proj(params["out_proj"], y)
        return out, (conv_cache, ssm_cache)


class JambaMoE:
    """Router + experts ffn (reference jamba.py JambaMoE); reuses the
    shared fused/expert-parallel MoE ops."""

    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype):
        from nmvllm_tpu.ops.moe import moe_ep_enabled
        self.num_experts = cfg.num_experts
        self.top_k = cfg.num_experts_per_tok
        self.hidden_size = cfg.hidden_size
        self.intermediate_size = cfg.intermediate_size
        self.tp_size = tp_size
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
        # Jamba routing: plain softmax top-k, no renormalize
        # (reference jamba.py JambaMoE uses fused_moe renormalize=False
        # for top_k>1? transformers uses no renorm; keep renormalize
        # False to match HF JambaSparseMoeBlock).
        out = moe_apply(flat, params["w1"], params["w2"], gate_logits,
                        self.top_k, ep=self.ep, axis_name=TP_AXIS,
                        renormalize=False, activation="silu")
        out = jax.lax.psum(out, TP_AXIS)
        return out.reshape(b, t, h)


class _DenseFFCfg:
    def __init__(self, cfg):
        self.hidden_size = cfg.hidden_size
        self.intermediate_size = cfg.intermediate_size
        self.mlp_bias = False


class JambaLayer:
    """One Jamba layer: mamba-or-attention mixer + dense-or-MoE ffn."""

    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype,
                 kv_cache_dtype, kv_scales, *, is_attn: bool,
                 is_moe: bool):
        self.is_attn = is_attn
        self.is_moe = is_moe
        eps = getattr(cfg, "rms_norm_eps", 1e-6)
        if is_attn:
            self.self_attn = Attention(cfg, layer_idx, tp_size,
                                       method_factory, dtype,
                                       kv_cache_dtype, *kv_scales)
        else:
            self.mamba = JambaMambaMixer(cfg, layer_idx, tp_size,
                                         method_factory, dtype)
        if is_moe:
            self.feed_forward = JambaMoE(cfg, layer_idx, tp_size,
                                         method_factory, dtype)
        else:
            self.feed_forward = LlamaMLP(_DenseFFCfg(cfg), layer_idx,
                                         method_factory, dtype)
            # rename for weight mapping: HF uses feed_forward.{gate,...}
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)
        self.pre_ff_layernorm = RMSNorm(cfg.hidden_size, eps, dtype)

    def init(self, rng):
        ks = jax.random.split(rng, 4)
        mixer = (self.self_attn if self.is_attn else self.mamba)
        key = "self_attn" if self.is_attn else "mamba"
        return {key: mixer.init(ks[0]),
                "feed_forward": self.feed_forward.init(ks[1]),
                "input_layernorm": self.input_layernorm.init(ks[2]),
                "pre_ff_layernorm": self.pre_ff_layernorm.init(ks[3])}

    def specs(self):
        mixer = (self.self_attn if self.is_attn else self.mamba)
        key = "self_attn" if self.is_attn else "mamba"
        return {key: mixer.specs(),
                "feed_forward": self.feed_forward.specs(),
                "input_layernorm": self.input_layernorm.specs(),
                "pre_ff_layernorm": self.pre_ff_layernorm.specs()}

    def __call__(self, params, rotary, rotary_params, x, positions,
                 kv_cache, meta, residual, *, is_prefill, has_prefix):
        if residual is None:
            residual = x
            x = self.input_layernorm(params["input_layernorm"], x)
        else:
            x, residual = self.input_layernorm(params["input_layernorm"],
                                               x, residual)
        if self.is_attn:
            x, kv_cache = self.self_attn(
                params["self_attn"], None, None, x, positions, kv_cache,
                meta, is_prefill=is_prefill, has_prefix=has_prefix)
        else:
            x, kv_cache = self.mamba(params["mamba"], x, meta, kv_cache,
                                     is_prefill=is_prefill,
                                     has_prefix=has_prefix)
        x, residual = self.pre_ff_layernorm(params["pre_ff_layernorm"], x,
                                            residual)
        x = self.feed_forward(params["feed_forward"], x)
        return x, residual, kv_cache


class JambaForCausalLM(LlamaForCausalLM):

    has_state_layers = True

    def __init__(self, cfg, *, tp_size: int = 1,
                 method_factory: Optional[MethodFactory] = None,
                 dtype=jnp.bfloat16, kv_cache_dtype: str = "auto",
                 kv_scales=None):
        self.cfg = cfg
        self.tp_size = tp_size
        self.dtype = dtype
        method_factory = method_factory or _default_method_factory
        self.embed_tokens = VocabParallelEmbedding(
            cfg.vocab_size, cfg.hidden_size, dtype, tp_size)
        self.rotary = None  # Jamba attention has no positional encoding
        kv_scales = kv_scales or [(1.0, 1.0)] * cfg.num_hidden_layers
        self.layer_kinds: List[str] = []
        self.layers = []
        for i in range(cfg.num_hidden_layers):
            is_attn = (i % cfg.attn_layer_period) == cfg.attn_layer_offset
            is_moe = (i % cfg.expert_layer_period) == \
                cfg.expert_layer_offset and cfg.num_experts > 1
            self.layer_kinds.append("attention" if is_attn else "mamba")
            self.layers.append(JambaLayer(
                cfg, i, tp_size, method_factory, dtype, kv_cache_dtype,
                kv_scales[i], is_attn=is_attn, is_moe=is_moe))
        self.norm = RMSNorm(cfg.hidden_size,
                            getattr(cfg, "rms_norm_eps", 1e-6), dtype)
        self.lm_head = ParallelLMHead(
            cfg.vocab_size, cfg.hidden_size, dtype, tp_size,
            tied=getattr(cfg, "tie_word_embeddings", False))
        attn_layers = [l for l in self.layers if l.is_attn]
        ref_attn = attn_layers[0].self_attn
        self.num_kv_heads = ref_attn.kv_heads
        self.total_num_kv_heads = ref_attn.total_kv_heads
        self.head_dim = ref_attn.head_dim
        self.logit_scale = 1.0
        self.logit_soft_cap = 0.0
        self.embedding_multiplier = 1.0

    # ---- heterogeneous cache layout ---------------------------------------
    def state_cache_layout(self, num_slots: int):
        """Per-layer cache descriptors for the CacheEngine: "kv" for paged
        attention layers, (conv_shape, ssm_shape) for mamba layers."""
        out = []
        for layer in self.layers:
            if layer.is_attn:
                out.append("kv")
            else:
                shapes = layer.mamba.state_shapes(num_slots)
                pspecs = layer.mamba.state_pspecs()
                out.append(tuple(zip(shapes, pspecs)))
        return out

    def cache_pspecs(self, kv_spec):
        out = []
        for layer in self.layers:
            if layer.is_attn:
                out.append(kv_spec)
            else:
                out.append(layer.mamba.state_pspecs())
        return out

    def forward(self, params, input_ids, positions, kv_caches, meta, *,
                is_prefill: bool, has_prefix: bool = False):
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        residual = None
        new_caches = []
        for layer, lp, kv in zip(self.layers, params["layers"], kv_caches):
            x, residual, kv = layer(lp, None, None, x, positions, kv, meta,
                                    residual, is_prefill=is_prefill,
                                    has_prefix=has_prefix)
            new_caches.append(kv)
        from nmvllm_tpu.layers.layernorm import finalize_norm
        x = finalize_norm(self.norm, params["norm"], x, residual)
        return x, new_caches

    def init(self, rng):
        keys = jax.random.split(rng, len(self.layers) + 2)
        return {
            "embed_tokens": self.embed_tokens.init(keys[0]),
            "rotary": {},
            "layers": [l.init(k) for l, k in zip(self.layers, keys[1:-1])],
            "norm": self.norm.init(keys[-1]),
            "lm_head": self.lm_head.init(keys[-1]),
        }

    def specs(self):
        return {
            "embed_tokens": self.embed_tokens.specs(),
            "rotary": {},
            "layers": [l.specs() for l in self.layers],
            "norm": self.norm.specs(),
            "lm_head": self.lm_head.specs(),
        }

    def hf_name_map(self) -> Dict[str, Tuple]:
        m: Dict[str, Tuple] = {
            "model.embed_tokens.weight":
                (("embed_tokens", "weight"), "pad_vocab"),
            "model.final_layernorm.weight": (("norm", "weight"), None),
        }
        if not self.lm_head.tied:
            m["lm_head.weight"] = (("lm_head", "weight"), "pad_vocab")
        for i, layer in enumerate(self.layers):
            pre = f"model.layers.{i}."
            path = ("layers", i)
            if layer.is_attn:
                for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
                    m[pre + f"self_attn.{name}.weight"] = (
                        path + ("self_attn", name, "weight"), "transpose")
            else:
                mp = path + ("mamba",)
                for name in ("in_proj", "x_proj", "dt_proj", "out_proj"):
                    m[pre + f"mamba.{name}.weight"] = (
                        mp + (name, "weight"), "transpose")
                m[pre + "mamba.dt_proj.bias"] = (
                    mp + ("dt_proj", "bias"), None)
                m[pre + "mamba.conv1d.weight"] = (
                    mp + ("conv1d", "weight"), "conv1d_dwt")
                m[pre + "mamba.conv1d.bias"] = (
                    mp + ("conv1d", "bias"), None)
                m[pre + "mamba.A_log"] = (mp + ("A_log",), None)
                m[pre + "mamba.D"] = (mp + ("D",), None)
                for norm in ("dt_layernorm", "b_layernorm", "c_layernorm"):
                    m[pre + f"mamba.{norm}.weight"] = (
                        mp + (norm, "weight"), None)
            if not layer.is_moe:
                for name in ("gate_proj", "up_proj", "down_proj"):
                    m[pre + f"feed_forward.{name}.weight"] = (
                        path + ("feed_forward", name, "weight"),
                        "transpose")
            else:
                m[pre + "feed_forward.router.weight"] = (
                    path + ("feed_forward", "gate", "weight"), "transpose")
                # experts.* handled by the expert-group stacker.
            for norm in ("input_layernorm", "pre_ff_layernorm"):
                m[pre + f"{norm}.weight"] = (path + (norm, "weight"), None)
        return m
