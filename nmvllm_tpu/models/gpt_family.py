"""GPT-lineage decoder families: GPT-2, OPT, GPTBigCode (StarCoder1),
GPT-NeoX, Phi(-1/-2), Falcon, BLOOM, MPT.

Reference models: vllm/model_executor/models/{gpt2,opt,gpt_bigcode,
gpt_neox,phi,falcon,bloom,mpt}.py. Shared TPU-native skeleton: the Llama
stack's Attention block (rotary optional) + LayerNorm + two-projection
MLPs, with learned absolute position embeddings or alibi biases where the
family calls for them. Fused qkv checkpoint layouts are split at load
(stacked / head-interleaved / Conv1D-column layouts).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.embedding import ParallelLMHead
from nmvllm_tpu.layers.layernorm import LayerNorm
from nmvllm_tpu.layers.module import Module
from nmvllm_tpu.models.llama import LlamaDecoderLayer, LlamaForCausalLM, \
    Attention
from nmvllm_tpu.models.variants import TwoProjMLP


def alibi_slopes(num_heads: int) -> np.ndarray:
    """Standard alibi slope schedule (reference bloom.py/mpt.py)."""
    closest = 2**math.floor(math.log2(num_heads))
    base = 2.0**(-(2.0**-(math.log2(closest) - 3)))
    slopes = [base**(i + 1) for i in range(closest)]
    if closest != num_heads:
        extra_base = 2.0**(-(2.0**-(math.log2(2 * closest) - 3)))
        num_extra = num_heads - closest
        slopes.extend(extra_base**(2 * i + 1) for i in range(num_extra))
    return np.asarray(slopes, np.float32)


class LearnedPositionEmbedding(Module):
    """Absolute learned positions (wpe); OPT applies a +2 offset."""

    def __init__(self, max_positions: int, hidden: int, dtype,
                 offset: int = 0):
        self.size = max_positions + offset
        self.hidden = hidden
        self.dtype = dtype
        self.offset = offset

    def init(self, rng):
        w = jax.random.normal(rng, (self.size, self.hidden),
                              jnp.float32) * 0.02
        return {"weight": w.astype(self.dtype)}

    def specs(self):
        return {"weight": P()}

    def __call__(self, params, positions):
        return params["weight"][positions + self.offset]


class ParallelBlock:
    """Parallel-residual layer: x + attn(norm1(x)) + mlp(norm2(x)).
    With ``two_norms=False`` a single norm feeds both branches
    (Phi / Falcon-7B / GPT-J style); GPT-NeoX uses two."""

    def __init__(self, cfg, layer_idx, tp_size, method_factory, dtype,
                 kv_cache_dtype="auto", kv_scales=(1.0, 1.0),
                 norm_factory=None, mlp_cls=None, two_norms=True):
        self.self_attn = Attention(cfg, layer_idx, tp_size, method_factory,
                                   dtype, kv_cache_dtype, *kv_scales)
        self.mlp = (mlp_cls or TwoProjMLP)(cfg, layer_idx, method_factory,
                                           dtype)
        self.two_norms = two_norms
        self.input_layernorm = norm_factory()
        if two_norms:
            self.post_attention_layernorm = norm_factory()

    def init(self, rng):
        ks = jax.random.split(rng, 4)
        p = {"self_attn": self.self_attn.init(ks[0]),
             "mlp": self.mlp.init(ks[1]),
             "input_layernorm": self.input_layernorm.init(ks[2])}
        if self.two_norms:
            p["post_attention_layernorm"] = \
                self.post_attention_layernorm.init(ks[3])
        return p

    def specs(self):
        p = {"self_attn": self.self_attn.specs(),
             "mlp": self.mlp.specs(),
             "input_layernorm": self.input_layernorm.specs()}
        if self.two_norms:
            p["post_attention_layernorm"] = \
                self.post_attention_layernorm.specs()
        return p

    def __call__(self, params, rotary, rotary_params, x, positions,
                 kv_cache, meta, residual, *, is_prefill, has_prefix):
        h1 = self.input_layernorm(params["input_layernorm"], x)
        attn_out, kv_cache = self.self_attn(
            params["self_attn"], rotary, rotary_params, h1, positions,
            kv_cache, meta, is_prefill=is_prefill, has_prefix=has_prefix)
        h2 = (self.post_attention_layernorm(
            params["post_attention_layernorm"], x) if self.two_norms
            else h1)
        mlp_out = self.mlp(params["mlp"], h2)
        return x + attn_out + mlp_out, None, kv_cache


class GPTStyleForCausalLM(LlamaForCausalLM):
    """Base for the GPT lineage. Subclasses set class attrs:
    ``use_rotary`` / ``use_positions`` / ``position_offset`` /
    ``use_alibi`` / ``parallel_block`` / ``two_norms``."""

    use_rotary = False
    use_positions = True
    position_offset = 0
    use_alibi = False
    parallel_block = False
    two_norms = True

    def __init__(self, cfg, **kwargs):
        self._pre_config(cfg)
        super().__init__(cfg, **kwargs)
        if not self.use_rotary:
            self.rotary = None
        if self.use_positions:
            self.wpe = LearnedPositionEmbedding(
                cfg.max_position_embeddings, cfg.hidden_size, self.dtype,
                offset=self.position_offset)
        else:
            self.wpe = None
        if self.use_alibi:
            # Full-head slope table on every layer; the attention layer
            # slices its shard's contiguous head range by mesh rank at
            # trace time (models/llama.py:_alibi_args).
            slopes = alibi_slopes(cfg.num_attention_heads)
            for layer in self.layers:
                layer.self_attn.alibi_slopes = slopes
        self._post_config(cfg)

    def _pre_config(self, cfg):
        pass

    def _post_config(self, cfg):
        pass

    # norm/MLP hooks --------------------------------------------------------
    def _norm_eps(self, cfg):
        return (getattr(cfg, "layer_norm_epsilon", None)
                or getattr(cfg, "layer_norm_eps", None) or 1e-5)

    def _norm_factory(self, cfg, dtype):
        eps = self._norm_eps(cfg)
        return lambda: LayerNorm(cfg.hidden_size, eps, dtype)

    def _mlp_cls(self):
        return TwoProjMLP

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        cls = ParallelBlock if self.parallel_block else LlamaDecoderLayer
        kw = dict(norm_factory=self._norm_factory(cfg, dtype),
                  mlp_cls=self._mlp_cls())
        if self.parallel_block:
            kw["two_norms"] = self.two_norms
        return cls(cfg, layer_idx, tp_size, method_factory, dtype,
                   kv_cache_dtype, kv_scales, **kw)

    def _make_final_norm(self, cfg, dtype):
        return LayerNorm(cfg.hidden_size, self._norm_eps(cfg), dtype)

    # forward ---------------------------------------------------------------
    def init(self, rng):
        p = super().init(rng)
        if self.wpe is not None:
            p["wpe"] = self.wpe.init(rng)
        return p

    def specs(self):
        s = super().specs()
        if self.wpe is not None:
            s["wpe"] = self.wpe.specs()
        return s

    def forward(self, params, input_ids, positions, kv_caches, meta, *,
                is_prefill, has_prefix=False):
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        if self.embedding_multiplier != 1.0:
            x = x * jnp.asarray(self.embedding_multiplier, x.dtype)
        if self.wpe is not None:
            x = x + self.wpe(params["wpe"], positions).astype(x.dtype)
        x = self._embed_post(params, x)
        new_caches = []
        rp = params["rotary"] if self.rotary is not None else None
        # Sequential layers (LlamaDecoderLayer) thread a fused residual;
        # ParallelBlocks return residual=None and fold it themselves.
        residual = None
        for layer, lp, kv in zip(self.layers, params["layers"], kv_caches):
            x, residual, kv = layer(lp, self.rotary, rp, x, positions, kv,
                                    meta, residual,
                                    is_prefill=is_prefill,
                                    has_prefix=has_prefix)
            new_caches.append(kv)
        if residual is not None:
            from nmvllm_tpu.layers.layernorm import finalize_norm
            x = finalize_norm(self.norm, params["norm"], x, residual)
        else:
            x = self.norm(params["norm"], x)
        return x, new_caches

    def _embed_post(self, params, x):
        return x


class GPT2LMHeadModel(GPTStyleForCausalLM):
    """GPT-2. Conv1D checkpoint tensors are (in, out): loaded untransposed;
    fused c_attn split by columns (reference gpt2.py)."""

    use_positions = True

    def _pre_config(self, cfg):
        cfg.attention_bias = True
        cfg.attention_out_bias = True
        cfg.tie_word_embeddings = True
        if not getattr(cfg, "hidden_act", None) or \
                cfg.hidden_act in ("gelu_new",):
            cfg.hidden_act = "gelu_pytorch_tanh"
        cfg.intermediate_size = getattr(cfg, "n_inner", None) or \
            4 * cfg.hidden_size
        cfg.use_bias = True
        if not hasattr(cfg, "num_key_value_heads") or \
                cfg.num_key_value_heads is None:
            cfg.num_key_value_heads = cfg.num_attention_heads

    def hf_name_map(self):
        m = {
            "transformer.wte.weight": (("embed_tokens", "weight"),
                                       "pad_vocab"),
            "transformer.wpe.weight": (("wpe", "weight"), None),
            "transformer.ln_f.weight": (("norm", "weight"), None),
            "transformer.ln_f.bias": (("norm", "bias"), None),
        }
        for i in range(len(self.layers)):
            pre = f"transformer.h.{i}."
            path = ("layers", i)
            m[pre + "ln_1.weight"] = (path + ("input_layernorm", "weight"),
                                      None)
            m[pre + "ln_1.bias"] = (path + ("input_layernorm", "bias"),
                                    None)
            m[pre + "ln_2.weight"] = (
                path + ("post_attention_layernorm", "weight"), None)
            m[pre + "ln_2.bias"] = (
                path + ("post_attention_layernorm", "bias"), None)
            m[pre + "attn.c_attn.weight"] = (
                path + ("self_attn",), "split_qkv_conv1d")
            m[pre + "attn.c_attn.bias"] = (
                path + ("self_attn",), "split_qkv_bias")
            m[pre + "attn.c_proj.weight"] = (
                path + ("self_attn", "o_proj", "weight"), None)
            m[pre + "attn.c_proj.bias"] = (
                path + ("self_attn", "o_proj", "bias"), None)
            m[pre + "mlp.c_fc.weight"] = (
                path + ("mlp", "c_fc", "weight"), None)
            m[pre + "mlp.c_fc.bias"] = (path + ("mlp", "c_fc", "bias"),
                                        None)
            m[pre + "mlp.c_proj.weight"] = (
                path + ("mlp", "c_proj", "weight"), None)
            m[pre + "mlp.c_proj.bias"] = (path + ("mlp", "c_proj", "bias"),
                                          None)
        return m


class OPTForCausalLM(GPTStyleForCausalLM):
    use_positions = True
    position_offset = 2

    def _pre_config(self, cfg):
        bias = bool(getattr(cfg, "enable_bias", True))
        cfg.attention_bias = bias
        cfg.attention_out_bias = bias
        cfg.use_bias = bias
        cfg.tie_word_embeddings = bool(
            getattr(cfg, "tie_word_embeddings", True))
        cfg.hidden_act = getattr(cfg, "activation_function", None) or "relu"
        cfg.intermediate_size = getattr(cfg, "ffn_dim", None) or \
            4 * cfg.hidden_size
        if not getattr(cfg, "num_key_value_heads", None):
            cfg.num_key_value_heads = cfg.num_attention_heads

    def hf_name_map(self):
        m = {
            "model.decoder.embed_tokens.weight":
                (("embed_tokens", "weight"), "pad_vocab"),
            "model.decoder.embed_positions.weight": (("wpe", "weight"),
                                                     None),
            "model.decoder.final_layer_norm.weight": (("norm", "weight"),
                                                      None),
            "model.decoder.final_layer_norm.bias": (("norm", "bias"),
                                                    None),
            "lm_head.weight": (("lm_head", "weight"), "pad_vocab"),
        }
        for i in range(len(self.layers)):
            pre = f"model.decoder.layers.{i}."
            path = ("layers", i)
            for src, dst in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                             ("v_proj", "v_proj"), ("out_proj", "o_proj")):
                m[pre + f"self_attn.{src}.weight"] = (
                    path + ("self_attn", dst, "weight"), "transpose")
                m[pre + f"self_attn.{src}.bias"] = (
                    path + ("self_attn", dst, "bias"), None)
            m[pre + "self_attn_layer_norm.weight"] = (
                path + ("input_layernorm", "weight"), None)
            m[pre + "self_attn_layer_norm.bias"] = (
                path + ("input_layernorm", "bias"), None)
            m[pre + "final_layer_norm.weight"] = (
                path + ("post_attention_layernorm", "weight"), None)
            m[pre + "final_layer_norm.bias"] = (
                path + ("post_attention_layernorm", "bias"), None)
            m[pre + "fc1.weight"] = (path + ("mlp", "c_fc", "weight"),
                                     "transpose")
            m[pre + "fc1.bias"] = (path + ("mlp", "c_fc", "bias"), None)
            m[pre + "fc2.weight"] = (path + ("mlp", "c_proj", "weight"),
                                     "transpose")
            m[pre + "fc2.bias"] = (path + ("mlp", "c_proj", "bias"), None)
        return m


class GPTBigCodeForCausalLM(GPTStyleForCausalLM):
    """StarCoder-1 (multi-query attention)."""
    use_positions = True

    def _pre_config(self, cfg):
        cfg.attention_bias = True
        cfg.attention_out_bias = True
        cfg.use_bias = True
        cfg.tie_word_embeddings = True
        cfg.hidden_act = "gelu_pytorch_tanh"
        cfg.intermediate_size = getattr(cfg, "n_inner", None) or \
            4 * cfg.hidden_size
        cfg.num_key_value_heads = (1 if getattr(cfg, "multi_query", True)
                                   else cfg.num_attention_heads)

    def hf_name_map(self):
        m = {
            "transformer.wte.weight": (("embed_tokens", "weight"),
                                       "pad_vocab"),
            "transformer.wpe.weight": (("wpe", "weight"), None),
            "transformer.ln_f.weight": (("norm", "weight"), None),
            "transformer.ln_f.bias": (("norm", "bias"), None),
        }
        for i in range(len(self.layers)):
            pre = f"transformer.h.{i}."
            path = ("layers", i)
            m[pre + "ln_1.weight"] = (path + ("input_layernorm", "weight"),
                                      None)
            m[pre + "ln_1.bias"] = (path + ("input_layernorm", "bias"),
                                    None)
            m[pre + "ln_2.weight"] = (
                path + ("post_attention_layernorm", "weight"), None)
            m[pre + "ln_2.bias"] = (
                path + ("post_attention_layernorm", "bias"), None)
            # c_attn is a stacked Linear (q | k | v rows).
            m[pre + "attn.c_attn.weight"] = (
                path + ("self_attn",), "split_qkv")
            m[pre + "attn.c_attn.bias"] = (
                path + ("self_attn",), "split_qkv_bias")
            m[pre + "attn.c_proj.weight"] = (
                path + ("self_attn", "o_proj", "weight"), "transpose")
            m[pre + "attn.c_proj.bias"] = (
                path + ("self_attn", "o_proj", "bias"), None)
            m[pre + "mlp.c_fc.weight"] = (
                path + ("mlp", "c_fc", "weight"), "transpose")
            m[pre + "mlp.c_fc.bias"] = (path + ("mlp", "c_fc", "bias"),
                                        None)
            m[pre + "mlp.c_proj.weight"] = (
                path + ("mlp", "c_proj", "weight"), "transpose")
            m[pre + "mlp.c_proj.bias"] = (path + ("mlp", "c_proj", "bias"),
                                          None)
        return m


class GPTNeoXForCausalLM(GPTStyleForCausalLM):
    use_rotary = True
    use_positions = False
    parallel_block = True
    two_norms = True

    def _pre_config(self, cfg):
        cfg.attention_bias = True
        cfg.attention_out_bias = True
        cfg.use_bias = True
        cfg.tie_word_embeddings = False
        cfg.hidden_act = getattr(cfg, "hidden_act", None) or "gelu"
        cfg.partial_rotary_factor = getattr(cfg, "rotary_pct", 1.0)
        cfg.rope_theta = getattr(cfg, "rotary_emb_base", 10000.0)
        if not getattr(cfg, "num_key_value_heads", None):
            cfg.num_key_value_heads = cfg.num_attention_heads
        self._parallel_residual = bool(
            getattr(cfg, "use_parallel_residual", True))

    def _make_layer(self, cfg, layer_idx, tp_size, method_factory, dtype,
                    kv_cache_dtype, kv_scales):
        if not self._parallel_residual:
            return LlamaDecoderLayer(
                cfg, layer_idx, tp_size, method_factory, dtype,
                kv_cache_dtype, kv_scales,
                norm_factory=self._norm_factory(cfg, dtype),
                mlp_cls=TwoProjMLP)
        return super()._make_layer(cfg, layer_idx, tp_size, method_factory,
                                   dtype, kv_cache_dtype, kv_scales)

    def hf_name_map(self):
        m = {
            "gpt_neox.embed_in.weight": (("embed_tokens", "weight"),
                                         "pad_vocab"),
            "gpt_neox.final_layer_norm.weight": (("norm", "weight"), None),
            "gpt_neox.final_layer_norm.bias": (("norm", "bias"), None),
            "embed_out.weight": (("lm_head", "weight"), "pad_vocab"),
        }
        for i in range(len(self.layers)):
            pre = f"gpt_neox.layers.{i}."
            path = ("layers", i)
            m[pre + "input_layernorm.weight"] = (
                path + ("input_layernorm", "weight"), None)
            m[pre + "input_layernorm.bias"] = (
                path + ("input_layernorm", "bias"), None)
            m[pre + "post_attention_layernorm.weight"] = (
                path + ("post_attention_layernorm", "weight"), None)
            m[pre + "post_attention_layernorm.bias"] = (
                path + ("post_attention_layernorm", "bias"), None)
            m[pre + "attention.query_key_value.weight"] = (
                path + ("self_attn",), "split_wqkv_interleaved")
            m[pre + "attention.query_key_value.bias"] = (
                path + ("self_attn",), "split_wqkv_interleaved_bias")
            m[pre + "attention.dense.weight"] = (
                path + ("self_attn", "o_proj", "weight"), "transpose")
            m[pre + "attention.dense.bias"] = (
                path + ("self_attn", "o_proj", "bias"), None)
            m[pre + "mlp.dense_h_to_4h.weight"] = (
                path + ("mlp", "c_fc", "weight"), "transpose")
            m[pre + "mlp.dense_h_to_4h.bias"] = (
                path + ("mlp", "c_fc", "bias"), None)
            m[pre + "mlp.dense_4h_to_h.weight"] = (
                path + ("mlp", "c_proj", "weight"), "transpose")
            m[pre + "mlp.dense_4h_to_h.bias"] = (
                path + ("mlp", "c_proj", "bias"), None)
        return m


class PhiForCausalLM(GPTStyleForCausalLM):
    """Phi-1/Phi-2: single-norm parallel block, partial rotary, biased
    linears, lm_head with bias."""
    use_rotary = True
    use_positions = False
    parallel_block = True
    two_norms = False

    def _pre_config(self, cfg):
        cfg.attention_bias = True
        cfg.attention_out_bias = True
        cfg.use_bias = True
        cfg.tie_word_embeddings = False
        cfg.hidden_act = getattr(cfg, "hidden_act", None) or "gelu_new"
        if cfg.hidden_act == "gelu_new":
            cfg.hidden_act = "gelu_pytorch_tanh"
        if not getattr(cfg, "num_key_value_heads", None):
            cfg.num_key_value_heads = cfg.num_attention_heads

    def _post_config(self, cfg):
        self.lm_head = ParallelLMHead(cfg.vocab_size, cfg.hidden_size,
                                      self.dtype, self.tp_size, tied=False,
                                      bias=True)

    def hf_name_map(self):
        m = {
            "model.embed_tokens.weight": (("embed_tokens", "weight"),
                                          "pad_vocab"),
            "model.final_layernorm.weight": (("norm", "weight"), None),
            "model.final_layernorm.bias": (("norm", "bias"), None),
            "lm_head.weight": (("lm_head", "weight"), "pad_vocab"),
            "lm_head.bias": (("lm_head", "bias"), "pad_vocab_1d"),
        }
        for i in range(len(self.layers)):
            pre = f"model.layers.{i}."
            path = ("layers", i)
            m[pre + "input_layernorm.weight"] = (
                path + ("input_layernorm", "weight"), None)
            m[pre + "input_layernorm.bias"] = (
                path + ("input_layernorm", "bias"), None)
            for src, dst in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                             ("v_proj", "v_proj"), ("dense", "o_proj")):
                m[pre + f"self_attn.{src}.weight"] = (
                    path + ("self_attn", dst, "weight"), "transpose")
                m[pre + f"self_attn.{src}.bias"] = (
                    path + ("self_attn", dst, "bias"), None)
            m[pre + "mlp.fc1.weight"] = (path + ("mlp", "c_fc", "weight"),
                                         "transpose")
            m[pre + "mlp.fc1.bias"] = (path + ("mlp", "c_fc", "bias"),
                                       None)
            m[pre + "mlp.fc2.weight"] = (path + ("mlp", "c_proj", "weight"),
                                         "transpose")
            m[pre + "mlp.fc2.bias"] = (path + ("mlp", "c_proj", "bias"),
                                       None)
        return m


class GPTJForCausalLM(GPTStyleForCausalLM):
    """GPT-J 6B (reference: vllm/model_executor/models/gpt_j.py).

    Single-norm parallel block, GPT-J-style (interleaved) rotary over
    ``rotary_dim`` dims, bias-free attention, biased fc_in/fc_out MLP,
    untied lm_head with bias."""
    use_rotary = True
    use_positions = False
    parallel_block = True
    two_norms = False
    rotary_neox_style = False

    def _pre_config(self, cfg):
        cfg.attention_bias = False
        cfg.attention_out_bias = False
        cfg.use_bias = True
        cfg.tie_word_embeddings = False
        act = getattr(cfg, "activation_function", None) or "gelu_new"
        cfg.hidden_act = ("gelu_pytorch_tanh" if act in ("gelu_new",)
                          else act)
        cfg.intermediate_size = getattr(cfg, "n_inner", None) or \
            4 * cfg.hidden_size
        if not getattr(cfg, "num_key_value_heads", None):
            cfg.num_key_value_heads = cfg.num_attention_heads
        if not getattr(cfg, "max_position_embeddings", None):
            cfg.max_position_embeddings = getattr(cfg, "n_positions", 2048)

    def _post_config(self, cfg):
        self.lm_head = ParallelLMHead(cfg.vocab_size, cfg.hidden_size,
                                      self.dtype, self.tp_size, tied=False,
                                      bias=True)

    def hf_name_map(self):
        m = {
            "transformer.wte.weight": (("embed_tokens", "weight"),
                                       "pad_vocab"),
            "transformer.ln_f.weight": (("norm", "weight"), None),
            "transformer.ln_f.bias": (("norm", "bias"), None),
            "lm_head.weight": (("lm_head", "weight"), "pad_vocab"),
            "lm_head.bias": (("lm_head", "bias"), "pad_vocab_1d"),
        }
        for i in range(len(self.layers)):
            pre = f"transformer.h.{i}."
            path = ("layers", i)
            m[pre + "ln_1.weight"] = (path + ("input_layernorm", "weight"),
                                      None)
            m[pre + "ln_1.bias"] = (path + ("input_layernorm", "bias"),
                                    None)
            for src, dst in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                             ("v_proj", "v_proj"), ("out_proj", "o_proj")):
                m[pre + f"attn.{src}.weight"] = (
                    path + ("self_attn", dst, "weight"), "transpose")
            m[pre + "mlp.fc_in.weight"] = (
                path + ("mlp", "c_fc", "weight"), "transpose")
            m[pre + "mlp.fc_in.bias"] = (path + ("mlp", "c_fc", "bias"),
                                         None)
            m[pre + "mlp.fc_out.weight"] = (
                path + ("mlp", "c_proj", "weight"), "transpose")
            m[pre + "mlp.fc_out.bias"] = (path + ("mlp", "c_proj", "bias"),
                                          None)
        return m


class FalconForCausalLM(GPTStyleForCausalLM):
    """Falcon 7B/40B (parallel attention, MQA/GQA fused qkv)."""
    use_rotary = True
    use_positions = False
    parallel_block = True

    def _pre_config(self, cfg):
        bias = bool(getattr(cfg, "bias", False))
        cfg.attention_bias = bias
        cfg.attention_out_bias = bias
        cfg.use_bias = bias
        cfg.tie_word_embeddings = True
        cfg.hidden_act = "gelu"
        cfg.intermediate_size = getattr(cfg, "ffn_hidden_size", None) or \
            4 * cfg.hidden_size
        new_arch = bool(getattr(cfg, "new_decoder_architecture", False))
        if new_arch:
            cfg.num_key_value_heads = getattr(cfg, "num_kv_heads", None) \
                or cfg.num_attention_heads
        elif bool(getattr(cfg, "multi_query", True)):
            cfg.num_key_value_heads = 1
        else:
            cfg.num_key_value_heads = cfg.num_attention_heads
        # 7B: one shared input_layernorm; 40B new arch: ln_attn + ln_mlp.
        self.two_norms = new_arch
        self._new_arch = new_arch

    def hf_name_map(self):
        m = {
            "transformer.word_embeddings.weight":
                (("embed_tokens", "weight"), "pad_vocab"),
            "transformer.ln_f.weight": (("norm", "weight"), None),
            "transformer.ln_f.bias": (("norm", "bias"), None),
        }
        for i in range(len(self.layers)):
            pre = f"transformer.h.{i}."
            path = ("layers", i)
            if self._new_arch:
                m[pre + "ln_attn.weight"] = (
                    path + ("input_layernorm", "weight"), None)
                m[pre + "ln_attn.bias"] = (
                    path + ("input_layernorm", "bias"), None)
                m[pre + "ln_mlp.weight"] = (
                    path + ("post_attention_layernorm", "weight"), None)
                m[pre + "ln_mlp.bias"] = (
                    path + ("post_attention_layernorm", "bias"), None)
            else:
                m[pre + "input_layernorm.weight"] = (
                    path + ("input_layernorm", "weight"), None)
                m[pre + "input_layernorm.bias"] = (
                    path + ("input_layernorm", "bias"), None)
            m[pre + "self_attention.query_key_value.weight"] = (
                path + ("self_attn",), "split_wqkv_interleaved")
            m[pre + "self_attention.query_key_value.bias"] = (
                path + ("self_attn",), "split_wqkv_interleaved_bias")
            m[pre + "self_attention.dense.weight"] = (
                path + ("self_attn", "o_proj", "weight"), "transpose")
            m[pre + "mlp.dense_h_to_4h.weight"] = (
                path + ("mlp", "c_fc", "weight"), "transpose")
            m[pre + "mlp.dense_4h_to_h.weight"] = (
                path + ("mlp", "c_proj", "weight"), "transpose")
        return m


class BloomForCausalLM(GPTStyleForCausalLM):
    """BLOOM: alibi attention, post-embedding LayerNorm, tied head."""
    use_positions = False
    use_alibi = True

    def _pre_config(self, cfg):
        cfg.attention_bias = True
        cfg.attention_out_bias = True
        cfg.use_bias = True
        cfg.tie_word_embeddings = True
        cfg.hidden_act = "gelu_pytorch_tanh"
        cfg.intermediate_size = 4 * cfg.hidden_size
        if not getattr(cfg, "num_key_value_heads", None):
            cfg.num_key_value_heads = cfg.num_attention_heads
        if not getattr(cfg, "max_position_embeddings", None):
            cfg.max_position_embeddings = 2048

    def _post_config(self, cfg):
        self.emb_ln = LayerNorm(cfg.hidden_size, self._norm_eps(cfg),
                                self.dtype)

    def init(self, rng):
        p = super().init(rng)
        p["emb_ln"] = self.emb_ln.init(rng)
        return p

    def specs(self):
        s = super().specs()
        s["emb_ln"] = self.emb_ln.specs()
        return s

    def _embed_post(self, params, x):
        return self.emb_ln(params["emb_ln"], x)

    def hf_name_map(self):
        m = {
            "transformer.word_embeddings.weight":
                (("embed_tokens", "weight"), "pad_vocab"),
            "transformer.word_embeddings_layernorm.weight":
                (("emb_ln", "weight"), None),
            "transformer.word_embeddings_layernorm.bias":
                (("emb_ln", "bias"), None),
            "transformer.ln_f.weight": (("norm", "weight"), None),
            "transformer.ln_f.bias": (("norm", "bias"), None),
        }
        for i in range(len(self.layers)):
            pre = f"transformer.h.{i}."
            path = ("layers", i)
            m[pre + "input_layernorm.weight"] = (
                path + ("input_layernorm", "weight"), None)
            m[pre + "input_layernorm.bias"] = (
                path + ("input_layernorm", "bias"), None)
            m[pre + "post_attention_layernorm.weight"] = (
                path + ("post_attention_layernorm", "weight"), None)
            m[pre + "post_attention_layernorm.bias"] = (
                path + ("post_attention_layernorm", "bias"), None)
            m[pre + "self_attention.query_key_value.weight"] = (
                path + ("self_attn",), "split_wqkv_interleaved")
            m[pre + "self_attention.query_key_value.bias"] = (
                path + ("self_attn",), "split_wqkv_interleaved_bias")
            m[pre + "self_attention.dense.weight"] = (
                path + ("self_attn", "o_proj", "weight"), "transpose")
            m[pre + "self_attention.dense.bias"] = (
                path + ("self_attn", "o_proj", "bias"), None)
            m[pre + "mlp.dense_h_to_4h.weight"] = (
                path + ("mlp", "c_fc", "weight"), "transpose")
            m[pre + "mlp.dense_h_to_4h.bias"] = (
                path + ("mlp", "c_fc", "bias"), None)
            m[pre + "mlp.dense_4h_to_h.weight"] = (
                path + ("mlp", "c_proj", "weight"), "transpose")
            m[pre + "mlp.dense_4h_to_h.bias"] = (
                path + ("mlp", "c_proj", "bias"), None)
        return m


class MPTForCausalLM(GPTStyleForCausalLM):
    """MPT: alibi, bias-free LayerNorm, fused stacked Wqkv, clip_qkv."""
    use_positions = False
    use_alibi = True

    def _pre_config(self, cfg):
        no_bias = bool(getattr(cfg, "no_bias", True))
        cfg.attention_bias = not no_bias
        cfg.attention_out_bias = not no_bias
        cfg.use_bias = not no_bias
        cfg.tie_word_embeddings = True
        cfg.hidden_act = "gelu_pytorch_tanh"
        ratio = getattr(cfg, "expansion_ratio", 4)
        cfg.intermediate_size = int(ratio * cfg.hidden_size)
        attn_cfg = getattr(cfg, "attn_config", None) or {}
        if isinstance(attn_cfg, dict):
            cfg.clip_qkv = attn_cfg.get("clip_qkv")
            kv = attn_cfg.get("kv_n_heads")
        else:
            cfg.clip_qkv = getattr(attn_cfg, "clip_qkv", None)
            kv = getattr(attn_cfg, "kv_n_heads", None)
        cfg.num_key_value_heads = kv or cfg.num_attention_heads
        if not getattr(cfg, "max_position_embeddings", None):
            cfg.max_position_embeddings = getattr(cfg, "max_seq_len", 2048)

    def _norm_factory(self, cfg, dtype):
        eps = 1e-5
        return lambda: LayerNorm(cfg.hidden_size, eps, dtype, bias=False)

    def _make_final_norm(self, cfg, dtype):
        return LayerNorm(cfg.hidden_size, 1e-5, dtype, bias=False)

    def hf_name_map(self):
        m = {
            "transformer.wte.weight": (("embed_tokens", "weight"),
                                       "pad_vocab"),
            "transformer.norm_f.weight": (("norm", "weight"), None),
        }
        for i in range(len(self.layers)):
            pre = f"transformer.blocks.{i}."
            path = ("layers", i)
            m[pre + "norm_1.weight"] = (
                path + ("input_layernorm", "weight"), None)
            m[pre + "norm_2.weight"] = (
                path + ("post_attention_layernorm", "weight"), None)
            m[pre + "attn.Wqkv.weight"] = (
                path + ("self_attn",), "split_qkv")
            m[pre + "attn.out_proj.weight"] = (
                path + ("self_attn", "o_proj", "weight"), "transpose")
            m[pre + "ffn.up_proj.weight"] = (
                path + ("mlp", "c_fc", "weight"), "transpose")
            m[pre + "ffn.down_proj.weight"] = (
                path + ("mlp", "c_proj", "weight"), "transpose")
        return m
