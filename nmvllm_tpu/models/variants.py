"""Shared building blocks for Llama-stack family variants.

Reference models covered by these pieces: starcoder2.py, stablelm.py,
olmo.py, commandr.py, internlm2.py, baichuan.py in
vllm/model_executor/models/.
"""
import jax

from nmvllm_tpu.layers.activation import get_act_fn
from nmvllm_tpu.layers.linear import Linear


class TwoProjMLP:
    """fc -> act -> proj MLP (Starcoder2/GPT-style), HF names c_fc/c_proj."""

    def __init__(self, cfg, layer_idx, method_factory, dtype,
                 fc_name: str = "c_fc", proj_name: str = "c_proj",
                 inter_attr: str = "intermediate_size",
                 bias_attr: str = "use_bias"):
        prefix = f"model.layers.{layer_idx}.mlp"
        hidden = cfg.hidden_size
        inter = getattr(cfg, inter_attr, None) or 4 * hidden
        bias = bool(getattr(cfg, bias_attr, True))
        self.fc_name = fc_name
        self.proj_name = proj_name
        self.c_fc = Linear(hidden, inter, bias=bias, shard="column",
                           method=method_factory(f"{prefix}.{fc_name}"),
                           params_dtype=dtype, name=f"{prefix}.{fc_name}")
        self.c_proj = Linear(inter, hidden, bias=bias, shard="row",
                             method=method_factory(f"{prefix}.{proj_name}"),
                             params_dtype=dtype,
                             name=f"{prefix}.{proj_name}")
        self.act_fn = get_act_fn(getattr(cfg, "hidden_act", None) or
                                 "gelu_pytorch_tanh")

    def init(self, rng):
        ks = jax.random.split(rng, 2)
        return {"c_fc": self.c_fc.init(ks[0]),
                "c_proj": self.c_proj.init(ks[1])}

    def specs(self):
        return {"c_fc": self.c_fc.specs(), "c_proj": self.c_proj.specs()}

    def __call__(self, params, x):
        return self.c_proj(params["c_proj"],
                           self.act_fn(self.c_fc(params["c_fc"], x)))
