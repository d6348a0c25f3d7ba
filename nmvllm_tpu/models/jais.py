"""JAIS 13B/30B (reference: vllm/model_executor/models/jais.py).

GPT-2-lineage (Conv1D checkpoint layout) with muP scaling: embeddings
multiplied by ``embeddings_scale``, logits by ``width_scale`` (or
``mup_output_alpha * mup_width_scale``), attention scores scaled by 1/d
instead of 1/sqrt(d) when ``scale_qk_dot_by_d`` — jais.py:84-87. Alibi
positions (no wpe) in the released configs, SwiGLU MLP with a second
c_fc2 gate projection.
"""
import jax

from nmvllm_tpu.layers.activation import get_act_fn
from nmvllm_tpu.layers.linear import Linear
from nmvllm_tpu.models.gpt_family import GPTStyleForCausalLM


class SwiGLUMLP:
    """c_fc(x) * silu(c_fc2(x)) -> c_proj (reference jais.py:128-167)."""

    def __init__(self, cfg, layer_idx, method_factory, dtype):
        prefix = f"model.layers.{layer_idx}.mlp"
        hidden = cfg.hidden_size
        inter = cfg.intermediate_size
        self.c_fc = Linear(hidden, inter, bias=True, shard="column",
                           method=method_factory(f"{prefix}.c_fc"),
                           params_dtype=dtype, name=f"{prefix}.c_fc")
        self.c_fc2 = Linear(hidden, inter, bias=True, shard="column",
                            method=method_factory(f"{prefix}.c_fc2"),
                            params_dtype=dtype, name=f"{prefix}.c_fc2")
        self.c_proj = Linear(inter, hidden, bias=True, shard="row",
                             method=method_factory(f"{prefix}.c_proj"),
                             params_dtype=dtype, name=f"{prefix}.c_proj")
        self.silu = get_act_fn("silu")

    def init(self, rng):
        ks = jax.random.split(rng, 3)
        return {"c_fc": self.c_fc.init(ks[0]),
                "c_fc2": self.c_fc2.init(ks[1]),
                "c_proj": self.c_proj.init(ks[2])}

    def specs(self):
        return {"c_fc": self.c_fc.specs(), "c_fc2": self.c_fc2.specs(),
                "c_proj": self.c_proj.specs()}

    def __call__(self, params, x):
        h = self.c_fc(params["c_fc"], x) * \
            self.silu(self.c_fc2(params["c_fc2"], x))
        return self.c_proj(params["c_proj"], h)


class JAISLMHeadModel(GPTStyleForCausalLM):

    def _pre_config(self, cfg):
        cfg.attention_bias = True
        cfg.attention_out_bias = True
        cfg.use_bias = True
        cfg.tie_word_embeddings = True
        act = getattr(cfg, "activation_function", "gelu")
        self._swiglu = act == "swiglu"
        cfg.hidden_act = "gelu" if self._swiglu else act
        cfg.intermediate_size = getattr(cfg, "n_inner", None) or \
            4 * cfg.hidden_size
        if not getattr(cfg, "num_key_value_heads", None):
            cfg.num_key_value_heads = cfg.num_attention_heads
        if not getattr(cfg, "max_position_embeddings", None):
            cfg.max_position_embeddings = getattr(cfg, "n_positions", 2048)
        self.use_alibi = getattr(cfg, "position_embedding_type",
                                 "alibi") == "alibi"
        self.use_positions = not self.use_alibi
        # muP 1/d attention scaling: our Attention computes
        # scale = query_pre_attn_scalar ** -0.5, so pass head_dim**2.
        scale_by_d = getattr(cfg, "scale_qk_dot_by_d", None)
        if scale_by_d is None:
            scale_by_d = getattr(cfg, "mup_scale_qk_dot_by_d", False)
        if scale_by_d:
            head_dim = cfg.hidden_size // cfg.num_attention_heads
            cfg.query_pre_attn_scalar = head_dim * head_dim

    def _mlp_cls(self):
        return SwiGLUMLP if self._swiglu else super()._mlp_cls()

    def _post_config(self, cfg):
        self.embedding_multiplier = float(
            getattr(cfg, "embeddings_scale", None) or
            getattr(cfg, "mup_embeddings_scale", 1.0))
        width_scale = getattr(cfg, "width_scale", None)
        if width_scale is None:
            width_scale = (getattr(cfg, "mup_output_alpha", 1.0) *
                           getattr(cfg, "mup_width_scale", 1.0))
        self.logit_scale = float(width_scale)

    def hf_name_map(self):
        m = {
            "transformer.wte.weight": (("embed_tokens", "weight"),
                                       "pad_vocab"),
            "transformer.ln_f.weight": (("norm", "weight"), None),
            "transformer.ln_f.bias": (("norm", "bias"), None),
        }
        if self.wpe is not None:
            m["transformer.wpe.weight"] = (("wpe", "weight"), None)
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
            # Conv1D tensors are stored (in, out) = our K-major layout.
            m[pre + "attn.c_attn.weight"] = (
                path + ("self_attn",), "split_qkv_conv1d")
            m[pre + "attn.c_attn.bias"] = (
                path + ("self_attn",), "split_qkv_bias")
            m[pre + "attn.c_proj.weight"] = (
                path + ("self_attn", "o_proj", "weight"), None)
            m[pre + "attn.c_proj.bias"] = (
                path + ("self_attn", "o_proj", "bias"), None)
            mlp_names = (("c_fc", "c_fc"), ("c_fc2", "c_fc2"),
                         ("c_proj", "c_proj")) if self._swiglu else \
                (("c_fc", "c_fc"), ("c_proj", "c_proj"))
            for src, dst in mlp_names:
                m[pre + f"mlp.{src}.weight"] = (
                    path + ("mlp", dst, "weight"), None)
                m[pre + f"mlp.{src}.bias"] = (
                    path + ("mlp", dst, "bias"), None)
        return m
