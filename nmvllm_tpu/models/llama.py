"""Llama-family decoder (also serves Mistral — same block structure with
sliding window).

Reference: vllm/model_executor/models/llama.py (forward:393→284,
load_weights:433). TPU-native: pure-functional modules over a params pytree,
per-layer paged-KV write + Pallas attention, explicit TP collectives inside
shard_map. The same class covers LlamaForCausalLM / MistralForCausalLM.
"""
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.activation import get_act_fn, silu_and_mul
from nmvllm_tpu.layers.embedding import ParallelLMHead, VocabParallelEmbedding
from nmvllm_tpu.layers.layernorm import RMSNorm
from nmvllm_tpu.layers.linear import Linear, UnquantizedLinearMethod
from nmvllm_tpu.layers.rotary import RotaryEmbedding
from nmvllm_tpu.models.base import AttentionMetadata, KVCache
from nmvllm_tpu.ops.cache_ops import write_to_kv_cache
from nmvllm_tpu.ops.paged_attention import (paged_attention,
                                            paged_attention_reference)
from nmvllm_tpu.ops.prefill_attention import (
    prefill_attention, prefill_attention_with_paged_prefix)

MethodFactory = Callable[[str], Any]


def _default_method_factory(layer_name: str):
    return UnquantizedLinearMethod()


class Attention:
    """Paged attention block: QKV projections + RoPE + cache write + kernel
    (reference attention/layer.py:15 + backends/pallas.py)."""

    def __init__(self, cfg, layer_idx: int, tp_size: int,
                 method_factory: MethodFactory, dtype,
                 kv_cache_dtype: str = "auto",
                 k_scale: float = 1.0, v_scale: float = 1.0):
        self.hidden_size = cfg.hidden_size
        self.total_heads = cfg.num_attention_heads
        self.total_kv_heads = getattr(cfg, "num_key_value_heads",
                                      self.total_heads)
        self.head_dim = getattr(cfg, "head_dim", None) or (
            cfg.hidden_size // cfg.num_attention_heads)
        assert self.total_heads % tp_size == 0
        assert self.total_kv_heads % tp_size == 0 or tp_size == 1, (
            "TP size must divide num_kv_heads (KV replication TBD)")
        self.heads = self.total_heads // tp_size
        self.kv_heads = max(1, self.total_kv_heads // tp_size)
        self.scale = self.head_dim**-0.5
        if getattr(cfg, "query_pre_attn_scalar", None):
            self.scale = float(cfg.query_pre_attn_scalar)**-0.5
        self.sliding_window = getattr(cfg, "sliding_window", None) or 0
        if not getattr(cfg, "use_sliding_window", True):
            self.sliding_window = 0
        # Gemma-2 style in-attention logit soft cap.
        self.attn_logit_soft_cap = float(
            getattr(cfg, "attn_logit_softcapping", None) or 0.0)
        self.alibi_slopes = None  # set by alibi models post-init
        # (block, local_blocks, vert_stride, homo_head) — set post-init by
        # blocksparse models (phi3_small); None = dense attention.
        self.blocksparse = None
        self.clip_qkv = getattr(cfg, "clip_qkv", None)  # OLMo/DBRX
        self.k_scale = k_scale
        self.v_scale = v_scale
        prefix = f"model.layers.{layer_idx}.self_attn"
        attn_bias = getattr(cfg, "attention_bias", False)
        out_bias = getattr(cfg, "attention_out_bias", attn_bias)
        qd = self.total_heads * self.head_dim
        kvd = self.total_kv_heads * self.head_dim
        self.q_proj = Linear(cfg.hidden_size, qd, bias=attn_bias,
                             shard="column",
                             method=method_factory(f"{prefix}.q_proj"),
                             params_dtype=dtype,
                             name=f"{prefix}.q_proj")
        self.k_proj = Linear(cfg.hidden_size, kvd, bias=attn_bias,
                             shard="column",
                             method=method_factory(f"{prefix}.k_proj"),
                             params_dtype=dtype,
                             name=f"{prefix}.k_proj")
        self.v_proj = Linear(cfg.hidden_size, kvd, bias=attn_bias,
                             shard="column",
                             method=method_factory(f"{prefix}.v_proj"),
                             params_dtype=dtype,
                             name=f"{prefix}.v_proj")
        self.o_proj = Linear(qd, cfg.hidden_size, bias=out_bias,
                             shard="row",
                             method=method_factory(f"{prefix}.o_proj"),
                             params_dtype=dtype,
                             name=f"{prefix}.o_proj")
        self._qkv_fused = None   # set by finalize_fusion post-load
        self._qkv_widths = None

    def init(self, rng):
        ks = jax.random.split(rng, 4)
        return {"q_proj": self.q_proj.init(ks[0]),
                "k_proj": self.k_proj.init(ks[1]),
                "v_proj": self.v_proj.init(ks[2]),
                "o_proj": self.o_proj.init(ks[3])}

    def specs(self):
        if self._qkv_fused is not None:
            return {"qkv_proj": self._qkv_fused.specs(),
                    "o_proj": self.o_proj.specs()}
        return {"q_proj": self.q_proj.specs(), "k_proj": self.k_proj.specs(),
                "v_proj": self.v_proj.specs(), "o_proj": self.o_proj.specs()}

    def finalize_fusion(self, params_sa, tp: int):
        """Fuse q/k/v into one projection post-load (layers/fused.py:
        ~0.4 ms fixed latency per serial kernel call on this stack)."""
        from nmvllm_tpu.layers.fused import try_fuse
        res = try_fuse(
            [self.q_proj, self.k_proj, self.v_proj],
            [params_sa["q_proj"], params_sa["k_proj"],
             params_sa["v_proj"]], tp)
        if res is None:
            return params_sa
        self._qkv_fused, fused_params, self._qkv_widths = res
        out = {k: v for k, v in params_sa.items()
               if k not in ("q_proj", "k_proj", "v_proj")}
        out["qkv_proj"] = fused_params
        return out

    def _blocksparse_args(self):
        """(static 3-tuple, per-head vertical offsets) for the attention
        ops; offsets are GLOBAL q-head indices * head_sliding_step
        (reference blocksparse_attention/utils.py:133), so under TP the
        shard rank offsets this shard's contiguous head range."""
        if self.blocksparse is None:
            return None, None
        blk, local, vert, homo = self.blocksparse
        if homo:
            return (blk, local, vert), None
        step = max(1, vert // self.total_heads)
        try:
            from nmvllm_tpu.parallel.mesh import TP_AXIS
            rank = jax.lax.axis_index(TP_AXIS)
        except Exception:
            rank = 0
        gh = rank * self.heads + jnp.arange(self.heads, dtype=jnp.int32)
        return (blk, local, vert), gh * step

    def _alibi_args(self):
        """Per-shard alibi slopes. ``alibi_slopes`` holds ALL q heads'
        slopes; under TP each shard attends a contiguous head range (the
        column-parallel QKV shard order), so slice by mesh rank —
        replaces the reference's host-side per-rank slicing
        (bloom.py/mpt.py `alibi_slopes[head_start:head_end]`)."""
        if self.alibi_slopes is None:
            return None
        slopes = jnp.asarray(self.alibi_slopes, jnp.float32)
        if self.heads == self.total_heads:
            return slopes
        try:
            from nmvllm_tpu.parallel.mesh import TP_AXIS
            rank = jax.lax.axis_index(TP_AXIS)
        except Exception:
            rank = jnp.int32(0)
        return jax.lax.dynamic_slice(slopes, (rank * self.heads,),
                                     (self.heads,))

    def __call__(self, params, rotary: RotaryEmbedding, rotary_params,
                 x: jax.Array, positions: jax.Array, kv_cache: KVCache,
                 meta: AttentionMetadata, *, is_prefill: bool,
                 has_prefix: bool, norm=None,
                 epilogue_add=None) -> Tuple[jax.Array, KVCache]:
        b, t, _ = x.shape
        if self._qkv_fused is not None:
            from nmvllm_tpu.layers.fused import split_fused
            if norm is not None:
                qkv = self._qkv_fused(params["qkv_proj"], x,
                                      prologue="rmsnorm", aux=norm[0],
                                      eps=norm[1])
            else:
                qkv = self._qkv_fused(params["qkv_proj"], x)
            q, k, v = split_fused(qkv, self._qkv_widths)
        else:
            if norm is not None:
                from nmvllm_tpu.ops.quant_matmul import apply_prologue_jnp
                x = apply_prologue_jnp("rmsnorm", x, norm[0], norm[1])
            q = self.q_proj(params["q_proj"], x)
            k = self.k_proj(params["k_proj"], x)
            v = self.v_proj(params["v_proj"], x)
        if self.clip_qkv is not None:
            q = jnp.clip(q, -self.clip_qkv, self.clip_qkv)
            k = jnp.clip(k, -self.clip_qkv, self.clip_qkv)
            v = jnp.clip(v, -self.clip_qkv, self.clip_qkv)
        q = q.reshape(b, t, self.heads, self.head_dim)
        k = k.reshape(b, t, self.kv_heads, self.head_dim)
        v = v.reshape(b, t, self.kv_heads, self.head_dim)
        if rotary is not None:
            q, k = rotary(rotary_params, positions, q, k)

        flat_k = k.reshape(b * t, self.kv_heads, self.head_dim)
        flat_v = v.reshape(b * t, self.kv_heads, self.head_dim)
        if self.k_scale != 1.0:
            flat_k = flat_k.astype(jnp.float32) / self.k_scale
        if self.v_scale != 1.0:
            flat_v = flat_v.astype(jnp.float32) / self.v_scale

        bs3, bs_offs = self._blocksparse_args()
        alibi = self._alibi_args()
        from nmvllm_tpu.parallel.ring_attention import active_sp_axis
        sp_axis = active_sp_axis() if is_prefill else None
        if sp_axis is not None:
            # Sequence-parallel prefill: this device holds the chunk's
            # [idx*t, (idx+1)*t) token slice. Attention runs as a K/V
            # ring over the sp axis (parallel/ring_attention.py); the
            # replicated KV pool takes the FULL chunk's rows on every
            # sp shard (all_gather over sp) so decode sees a consistent
            # cache on all replicas.
            if has_prefix:
                raise NotImplementedError(
                    "sequence-parallel prefill with a paged prefix "
                    "(chunked prefill / prefix cache) is not supported")
            if (self.sliding_window or self.attn_logit_soft_cap or
                    alibi is not None or bs3 is not None):
                raise NotImplementedError(
                    "sequence-parallel prefill supports plain causal "
                    "attention only (no sliding window / soft cap / "
                    "alibi / blocksparse)")
            from nmvllm_tpu.parallel.ring_attention import (
                ring_prefill_attention)
            kf = flat_k.reshape(b, t, self.kv_heads, self.head_dim)
            vf = flat_v.reshape(b, t, self.kv_heads, self.head_dim)
            kg = jax.lax.all_gather(kf, sp_axis, axis=1, tiled=True)
            vg = jax.lax.all_gather(vf, sp_axis, axis=1, tiled=True)
            slots_g = jax.lax.all_gather(meta.slot_mapping, sp_axis,
                                         axis=1, tiled=True)
            kv_cache = write_to_kv_cache(
                kv_cache,
                kg.reshape(-1, self.kv_heads, self.head_dim),
                vg.reshape(-1, self.kv_heads, self.head_dim),
                slots_g.reshape(-1))
            o = ring_prefill_attention(q, k, v, meta.seq_lens,
                                       axis_name=sp_axis, scale=self.scale)
        elif is_prefill:
            kv_cache = write_to_kv_cache(
                kv_cache, flat_k, flat_v, meta.slot_mapping.reshape(b * t))
            if has_prefix:
                o = prefill_attention_with_paged_prefix(
                    q, k, v, positions, meta.seq_lens, kv_cache,
                    meta.block_tables, meta.prefix_lens, scale=self.scale,
                    sliding_window=self.sliding_window,
                    logit_soft_cap=self.attn_logit_soft_cap,
                    k_scale=self.k_scale, v_scale=self.v_scale,
                    alibi_slopes=alibi,
                    blocksparse=bs3, bs_head_offsets=bs_offs)
            else:
                o = prefill_attention(q, k, v, positions, meta.seq_lens,
                                      scale=self.scale,
                                      sliding_window=self.sliding_window,
                                      logit_soft_cap=self.
                                      attn_logit_soft_cap,
                                      alibi_slopes=alibi,
                                      blocksparse=bs3,
                                      bs_head_offsets=bs_offs)
        else:
            # Decode: the cache write happens INSIDE the attention kernel
            # (one kernel call instead of two per layer).
            o, kv_cache = paged_attention(
                q.reshape(b, self.heads, self.head_dim), kv_cache,
                meta.block_tables, meta.context_lens, scale=self.scale,
                k_scale=self.k_scale, v_scale=self.v_scale,
                logit_soft_cap=self.attn_logit_soft_cap,
                sliding_window=self.sliding_window,
                alibi_slopes=alibi,
                blocksparse=bs3, bs_head_offsets=bs_offs,
                new_k=flat_k, new_v=flat_v,
                write_slots=meta.slot_mapping.reshape(b * t))
            o = o.reshape(b, 1, self.heads, self.head_dim)
        o = o.reshape(b, t, self.heads * self.head_dim)
        return self.o_proj(params["o_proj"], o,
                           epilogue_add=epilogue_add), kv_cache


class LlamaMLP:
    def __init__(self, cfg, layer_idx: int, method_factory: MethodFactory,
                 dtype):
        prefix = f"model.layers.{layer_idx}.mlp"
        hidden = cfg.hidden_size
        inter = cfg.intermediate_size
        bias = getattr(cfg, "mlp_bias", False)
        self.gate_proj = Linear(hidden, inter, bias=bias, shard="column",
                                method=method_factory(f"{prefix}.gate_proj"),
                                params_dtype=dtype,
                                name=f"{prefix}.gate_proj")
        self.up_proj = Linear(hidden, inter, bias=bias, shard="column",
                              method=method_factory(f"{prefix}.up_proj"),
                              params_dtype=dtype,
                              name=f"{prefix}.up_proj")
        self.down_proj = Linear(inter, hidden, bias=bias, shard="row",
                                method=method_factory(f"{prefix}.down_proj"),
                                params_dtype=dtype,
                                name=f"{prefix}.down_proj")
        act = getattr(cfg, "hidden_act", "silu")
        self.act_fn = get_act_fn(act)
        self._act_prologue = {"silu": "silu_mul", "gelu": "gelu_mul",
                              "gelu_new": "gelu_mul",
                              "gelu_pytorch_tanh": "gelu_mul"}.get(act)
        self._gu_fused = None
        self._gu_widths = None

    def init(self, rng):
        ks = jax.random.split(rng, 3)
        return {"gate_proj": self.gate_proj.init(ks[0]),
                "up_proj": self.up_proj.init(ks[1]),
                "down_proj": self.down_proj.init(ks[2])}

    def specs(self):
        if self._gu_fused is not None:
            return {"gate_up_proj": self._gu_fused.specs(),
                    "down_proj": self.down_proj.specs()}
        return {"gate_proj": self.gate_proj.specs(),
                "up_proj": self.up_proj.specs(),
                "down_proj": self.down_proj.specs()}

    def finalize_fusion(self, params_mlp, tp: int):
        """Fuse gate/up post-load (layers/fused.py; the reference's
        MergedColumnParallelLinear, linear.py:341)."""
        from nmvllm_tpu.layers.fused import try_fuse
        res = try_fuse(
            [self.gate_proj, self.up_proj],
            [params_mlp["gate_proj"], params_mlp["up_proj"]], tp)
        if res is None:
            return params_mlp
        self._gu_fused, fused_params, self._gu_widths = res
        out = {k: v for k, v in params_mlp.items()
               if k not in ("gate_proj", "up_proj")}
        out["gate_up_proj"] = fused_params
        return out

    def _fusable_methods(self, norm):
        """Shared one-kernel-MLP eligibility: W4 weights on BOTH GEMMs,
        silu/gelu act, rmsnorm available to fold, no bias/LoRA. Returns
        (gate_up_method, down_method) or None."""
        from nmvllm_tpu import envs
        from nmvllm_tpu.quantization.wNa16 import WNA16LinearMethod
        if not envs.NMVLLM_FUSED_MLP or norm is None:
            return None
        if self._gu_fused is None or self._act_prologue is None:
            return None
        m1, m2 = self._gu_fused.method, self.down_proj.method
        for m in (m1, m2):
            if not (isinstance(m, WNA16LinearMethod) and m.bits == 4
                    and m.group_size and m.group_size % 8 == 0):
                return None
        if m1.group_size != m2.group_size:
            return None
        if self._gu_fused.use_bias or self.down_proj.use_bias:
            return None
        from nmvllm_tpu.lora.context import lora_active
        if lora_active():
            return None
        return m1, m2

    def _can_fuse_block(self, norm):
        """One-kernel MLP block on the EXACT paired-W4 path
        (ops/fused_mlp.py::fused_mlp_w4)."""
        ms = self._fusable_methods(norm)
        return ms is not None and not ms[0].a8_mode

    def _can_fuse_block_a8p(self, norm):
        """One-kernel MLP block on the W4A8 'packed' serving path
        (ops/fused_mlp.py::fused_mlp_a8p). Opt-in: at the m=72 decode
        geometry the chunked down dot measured SLOWER than the saved
        Pallas call (docs/PERF_NOTES.md round 5b)."""
        from nmvllm_tpu import envs
        if not envs.NMVLLM_FUSED_MLP_A8:
            return False
        ms = self._fusable_methods(norm)
        return ms is not None and ms[0].a8_mode == "packed"

    def __call__(self, params, x, *, norm=None, epilogue_add=None):
        """``norm=(weight, eps)`` fuses the preceding RMSNorm into the
        gate_up kernel; ``epilogue_add`` fuses the residual add into the
        down_proj kernel (critical-path node removal, layers/fused.py)."""
        # The one-kernel block holds (m, K) activations + accumulator
        # VMEM-resident across all grid steps — decode-sized m only
        # (prefill m would blow the VMEM budget).
        m_rows = 1
        for d in x.shape[:-1]:
            m_rows *= d
        if m_rows <= 256 and self._can_fuse_block_a8p(norm):
            from nmvllm_tpu.ops.fused_mlp import fused_mlp_a8p
            gu, dn = params["gate_up_proj"], params["down_proj"]
            shape = x.shape
            x2 = x.reshape(-1, shape[-1])
            y = fused_mlp_a8p(
                x2, norm[0], gu["qweight"], gu["mult"], gu["scales"],
                gu["zeros"], dn["qweight"], dn["mult"], dn["scales"],
                dn["zeros"],
                group_size=self.down_proj.method.group_size, eps=norm[1],
                act="silu" if self._act_prologue == "silu_mul" else "gelu")
            if y is not None:
                try:
                    from nmvllm_tpu.parallel.mesh import TP_AXIS
                    y = jax.lax.psum(y, TP_AXIS)
                except Exception:
                    pass  # outside shard_map (unit tests): single shard
                y = y.astype(x.dtype)
                if epilogue_add is not None:
                    y = (y.astype(jnp.float32) + epilogue_add.reshape(
                        y.shape).astype(jnp.float32)).astype(x.dtype)
                return y.reshape(*shape[:-1], y.shape[-1])
        if m_rows <= 256 and self._can_fuse_block(norm):
            from nmvllm_tpu.ops.fused_mlp import fused_mlp_w4
            gu, dn = params["gate_up_proj"], params["down_proj"]
            shape = x.shape
            x2 = x.reshape(-1, shape[-1])
            y = fused_mlp_w4(
                x2, norm[0], gu["qweight"], gu["scales"], gu["zeros"],
                dn["qweight"], dn["scales"], dn["zeros"],
                group_size=self.down_proj.method.group_size, eps=norm[1],
                act="silu" if self._act_prologue == "silu_mul" else "gelu")
            # Row-parallel reduction of the down_proj partial sums (the
            # psum Linear would have applied); no-op on a tp=1 mesh axis.
            try:
                from nmvllm_tpu.parallel.mesh import TP_AXIS
                y = jax.lax.psum(y, TP_AXIS)
            except Exception:
                pass  # outside shard_map (unit tests): single shard
            y = y.astype(x.dtype)
            if epilogue_add is not None:
                y = (y.astype(jnp.float32) + epilogue_add.reshape(
                    y.shape).astype(jnp.float32)).astype(x.dtype)
            return y.reshape(*shape[:-1], y.shape[-1])
        if self._gu_fused is not None:
            from nmvllm_tpu.layers.fused import split_fused
            if norm is not None:
                gu = self._gu_fused(params["gate_up_proj"], x,
                                    prologue="rmsnorm", aux=norm[0],
                                    eps=norm[1])
            else:
                gu = self._gu_fused(params["gate_up_proj"], x)
            gate, up = split_fused(gu, self._gu_widths)
            if self._act_prologue is not None:
                return self.down_proj(params["down_proj"], gate,
                                      prologue=self._act_prologue,
                                      aux=up, epilogue_add=epilogue_add)
            return self.down_proj(params["down_proj"],
                                  self.act_fn(gate) * up,
                                  epilogue_add=epilogue_add)
        if norm is not None:
            from nmvllm_tpu.ops.quant_matmul import apply_prologue_jnp
            x = apply_prologue_jnp("rmsnorm", x, norm[0], norm[1])
        gate = self.act_fn(self.gate_proj(params["gate_proj"], x))
        up = self.up_proj(params["up_proj"], x)
        return self.down_proj(params["down_proj"], gate * up,
                              epilogue_add=epilogue_add)


class LlamaDecoderLayer:
    def __init__(self, cfg, layer_idx: int, tp_size: int,
                 method_factory: MethodFactory, dtype,
                 kv_cache_dtype: str = "auto",
                 kv_scales: Tuple[float, float] = (1.0, 1.0),
                 norm_factory: Optional[Callable[[], Any]] = None,
                 mlp_cls: Optional[type] = None):
        self.tp_size = tp_size
        self.self_attn = Attention(cfg, layer_idx, tp_size, method_factory,
                                   dtype, kv_cache_dtype, *kv_scales)
        mlp_cls = mlp_cls or LlamaMLP
        self.mlp = mlp_cls(cfg, layer_idx, method_factory, dtype)
        if norm_factory is None:
            eps = getattr(cfg, "rms_norm_eps", 1e-6)
            norm_factory = lambda: RMSNorm(cfg.hidden_size, eps, dtype)  # noqa: E731
        self.input_layernorm = norm_factory()
        self.post_attention_layernorm = norm_factory()

    def init(self, rng):
        ks = jax.random.split(rng, 4)
        return {
            "self_attn": self.self_attn.init(ks[0]),
            "mlp": self.mlp.init(ks[1]),
            "input_layernorm": self.input_layernorm.init(ks[2]),
            "post_attention_layernorm":
                self.post_attention_layernorm.init(ks[3]),
        }

    def specs(self):
        return {
            "self_attn": self.self_attn.specs(),
            "mlp": self.mlp.specs(),
            "input_layernorm": self.input_layernorm.specs(),
            "post_attention_layernorm":
                self.post_attention_layernorm.specs(),
        }

    def _fuse_norms(self) -> bool:
        """Fold the two RMSNorms into the qkv / gate_up kernel prologues
        (saves two serial reduce nodes per layer; only when the fused
        projections run the prologue-capable quantized kernel — the
        unquantized path keeps exact legacy numerics)."""
        from nmvllm_tpu import envs
        if envs.NMVLLM_DISABLE_NORM_FUSION:
            return False
        sa = self.self_attn
        return (sa._qkv_fused is not None
                and getattr(sa._qkv_fused.method, "supports_prologue",
                            False)
                and getattr(self.mlp, "_gu_fused", None) is not None
                and type(self.input_layernorm) is RMSNorm
                and type(self.post_attention_layernorm) is RMSNorm
                and not self.input_layernorm.zero_centered
                and not self.post_attention_layernorm.zero_centered
                and sa.hidden_size <= 8192)

    def __call__(self, params, rotary, rotary_params, x, positions, kv_cache,
                 meta, residual, *, is_prefill: bool, has_prefix: bool):
        if self._fuse_norms():
            if residual is None:
                residual = x
            else:
                residual = (x.astype(jnp.float32) +
                            residual.astype(jnp.float32)).astype(x.dtype)
            norm1 = (params["input_layernorm"]["weight"],
                     self.input_layernorm.eps)
            norm2 = (params["post_attention_layernorm"]["weight"],
                     self.post_attention_layernorm.eps)
            from nmvllm_tpu import envs
            if self.tp_size == 1 and envs.NMVLLM_EPILOGUE_FUSION:
                # Residual adds ride the o_proj / down_proj kernel
                # epilogues (two fewer serial XLA nodes per layer).
                # OFF by default: measured ~8% SLOWER e2e — inside the
                # compiled step XLA elementwise adds are near-free while
                # an extra Pallas operand costs real per-call time
                # (docs/PERF_NOTES.md "epilogue fusion A/B").
                # Single-shard only: the in-kernel add would be
                # multiplied by the row-parallel psum under TP.
                stream, kv_cache = self.self_attn(
                    params["self_attn"], rotary, rotary_params, residual,
                    positions, kv_cache, meta, is_prefill=is_prefill,
                    has_prefix=has_prefix, norm=norm1,
                    epilogue_add=residual)
                x = self.mlp(params["mlp"], stream, norm=norm2,
                             epilogue_add=stream)
                return x, None, kv_cache
            x, kv_cache = self.self_attn(
                params["self_attn"], rotary, rotary_params, residual,
                positions, kv_cache, meta, is_prefill=is_prefill,
                has_prefix=has_prefix, norm=norm1)
            residual = (x.astype(jnp.float32) +
                        residual.astype(jnp.float32)).astype(x.dtype)
            x = self.mlp(params["mlp"], residual, norm=norm2)
            return x, residual, kv_cache
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
        x = self.mlp(params["mlp"], x)
        return x, residual, kv_cache


class LlamaForCausalLM:
    """Builds from an HF LlamaConfig/MistralConfig.

    forward(params, input_ids, positions, kv_caches, meta, is_prefill)
      -> (last-token hidden states or all hidden states, new kv_caches)
    compute_logits(params, hidden) -> (B, V_padded) f32
    """

    rotary_neox_style = True  # GPT-J-lineage subclasses set False
    # LlamaAttention implements the sequence-parallel ring-prefill hook
    # (active_sp_axis); families with their own attention (MLA,
    # gpt_family, Mamba, blocksparse) do not and must refuse sp>1.
    supports_sequence_parallel = True

    def __init__(self, cfg, *, tp_size: int = 1,
                 method_factory: Optional[MethodFactory] = None,
                 dtype=jnp.bfloat16, kv_cache_dtype: str = "auto",
                 kv_scales: Optional[List[Tuple[float, float]]] = None):
        self.cfg = cfg
        self.tp_size = tp_size
        self.dtype = dtype
        method_factory = method_factory or _default_method_factory
        self.embed_tokens = VocabParallelEmbedding(
            cfg.vocab_size, cfg.hidden_size, dtype, tp_size)
        head_dim = getattr(cfg, "head_dim", None) or (
            cfg.hidden_size // cfg.num_attention_heads)
        # Partial rotary (StableLM/Phi/NeoX style rope_pct), or an explicit
        # rotary_dim (GPT-J).
        partial = getattr(cfg, "partial_rotary_factor", None) or \
            getattr(cfg, "rope_pct", None) or 1.0
        rotary_dim = getattr(cfg, "rotary_dim", None) or \
            int(head_dim * float(partial))
        self.rotary = RotaryEmbedding(
            head_dim, rotary_dim=rotary_dim,
            max_position=cfg.max_position_embeddings,
            base=getattr(cfg, "rope_theta", 10000.0),
            rope_scaling=getattr(cfg, "rope_scaling", None),
            is_neox_style=self.rotary_neox_style,
            dtype=dtype)
        kv_scales = kv_scales or [(1.0, 1.0)] * cfg.num_hidden_layers
        self.layers = [
            self._make_layer(cfg, i, tp_size, method_factory, dtype,
                             kv_cache_dtype, kv_scales[i])
            for i in range(cfg.num_hidden_layers)
        ]
        self.norm = self._make_final_norm(cfg, dtype)
        tied = getattr(cfg, "tie_word_embeddings", False)
        self.lm_head = ParallelLMHead(cfg.vocab_size, cfg.hidden_size, dtype,
                                      tp_size, tied=tied)
        self.num_kv_heads = self.layers[0].self_attn.kv_heads
        self.total_num_kv_heads = self.layers[0].self_attn.total_kv_heads
        self.head_dim = head_dim
        self.logit_scale = 1.0
        self.logit_soft_cap = 0.0
        self.embedding_multiplier = 1.0

    # ---- subclass hooks (family variants override these) ------------------
    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        return LlamaDecoderLayer(cfg, layer_idx, tp_size, method_factory,
                                 dtype, kv_cache_dtype, kv_scales)

    def _make_final_norm(self, cfg, dtype):
        return RMSNorm(cfg.hidden_size,
                       getattr(cfg, "rms_norm_eps", 1e-6), dtype)

    def init(self, rng):
        keys = jax.random.split(rng, len(self.layers) + 3)
        return {
            "embed_tokens": self.embed_tokens.init(keys[0]),
            "rotary": (self.rotary.init(keys[1])
                       if self.rotary is not None else {}),
            "layers": [l.init(k) for l, k in zip(self.layers, keys[2:-1])],
            "norm": self.norm.init(keys[-1]),
            "lm_head": self.lm_head.init(keys[-1]),
        }

    def specs(self):
        return {
            "embed_tokens": self.embed_tokens.specs(),
            "rotary": (self.rotary.specs()
                       if self.rotary is not None else {}),
            "layers": [l.specs() for l in self.layers],
            "norm": self.norm.specs(),
            "lm_head": self.lm_head.specs(),
        }

    def forward(self, params, input_ids: jax.Array, positions: jax.Array,
                kv_caches: List[KVCache], meta: AttentionMetadata, *,
                is_prefill: bool, has_prefix: bool = False):
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        if self.embedding_multiplier != 1.0:
            x = x * jnp.asarray(self.embedding_multiplier, x.dtype)
        residual = None
        new_caches = []
        for layer, lp, kv in zip(self.layers, params["layers"], kv_caches):
            x, residual, kv = layer(lp, self.rotary, params["rotary"], x,
                                    positions, kv, meta, residual,
                                    is_prefill=is_prefill,
                                    has_prefix=has_prefix)
            new_caches.append(kv)
        from nmvllm_tpu.layers.layernorm import finalize_norm
        x = finalize_norm(self.norm, params["norm"], x, residual)
        return x, new_caches

    def select_last_token(self, hidden: jax.Array,
                          seq_lens: jax.Array) -> jax.Array:
        """(B, T, H) -> (B, H) at each row's last valid position."""
        b = hidden.shape[0]
        idx = jnp.maximum(seq_lens - 1, 0)
        return hidden[jnp.arange(b), idx]

    def compute_logits(self, params, hidden: jax.Array) -> jax.Array:
        return self.lm_head(params["lm_head"], hidden,
                            embedding_params=params["embed_tokens"],
                            logit_scale=self.logit_scale,
                            logit_soft_cap=self.logit_soft_cap)

    def finalize_for_serving(self, params):
        """Post-load horizontal fusion of q/k/v and gate/up projections
        (layers/fused.py) — applied by the loader after weights land;
        skipped when multi-LoRA is active."""
        from nmvllm_tpu.layers.fused import fusion_enabled
        if not fusion_enabled():
            return params
        for i, layer in enumerate(self.layers):
            lp = params["layers"][i]
            sa = getattr(layer, "self_attn", None)
            if sa is not None and hasattr(sa, "finalize_fusion") and \
                    "q_proj" in lp.get("self_attn", {}):
                lp["self_attn"] = sa.finalize_fusion(lp["self_attn"],
                                                     self.tp_size)
            mlp = getattr(layer, "mlp", None)
            if mlp is not None and hasattr(mlp, "finalize_fusion") and \
                    "gate_proj" in lp.get("mlp", {}):
                lp["mlp"] = mlp.finalize_fusion(lp["mlp"], self.tp_size)
        return params

    # -- weight loading (HF checkpoint name -> params path) -----------------
    def hf_name_map(self) -> Dict[str, Tuple]:
        """Maps HF tensor names to (path tuple, transform) pairs; transform
        is 'transpose' for linear weights (we store K-major)."""
        m: Dict[str, Tuple] = {
            "model.embed_tokens.weight": (("embed_tokens", "weight"), "pad_vocab"),
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
                m[pre + f"self_attn.{name}.bias"] = (
                    path + ("self_attn", name, "bias"), None)
            for name in ("gate_proj", "up_proj", "down_proj"):
                m[pre + f"mlp.{name}.weight"] = (
                    path + ("mlp", name, "weight"), "transpose")
                m[pre + f"mlp.{name}.bias"] = (
                    path + ("mlp", name, "bias"), None)
            for norm in ("input_layernorm", "post_attention_layernorm"):
                m[pre + f"{norm}.weight"] = (path + (norm, "weight"), None)
                m[pre + f"{norm}.bias"] = (path + (norm, "bias"), None)
        m["model.norm.bias"] = (("norm", "bias"), None)
        return m
