"""CLIP vision tower, from scratch in jnp (reference behavior:
vllm/model_executor/models/clip.py CLIPVisionModel as used by llava.py).

Pre-LayerNorm ViT: patch embedding (expressed as a Linear over flattened
patches — a stride=patch conv is exactly that), learned class+position
embeddings, bidirectional attention blocks, feature selection from a
configurable hidden layer (llava uses -2 and drops the CLS token).
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.layernorm import LayerNorm
from nmvllm_tpu.layers.linear import Linear
from nmvllm_tpu.layers.module import Module


class CLIPVisionBlock:
    def __init__(self, cfg, dtype):
        h = cfg.hidden_size
        self.heads = cfg.num_attention_heads
        self.head_dim = h // self.heads
        self.q_proj = Linear(h, h, bias=True, shard="none",
                             params_dtype=dtype)
        self.k_proj = Linear(h, h, bias=True, shard="none",
                             params_dtype=dtype)
        self.v_proj = Linear(h, h, bias=True, shard="none",
                             params_dtype=dtype)
        self.out_proj = Linear(h, h, bias=True, shard="none",
                               params_dtype=dtype)
        inter = cfg.intermediate_size
        self.fc1 = Linear(h, inter, bias=True, shard="none",
                          params_dtype=dtype)
        self.fc2 = Linear(inter, h, bias=True, shard="none",
                          params_dtype=dtype)
        eps = getattr(cfg, "layer_norm_eps", 1e-5)
        self.layer_norm1 = LayerNorm(h, eps, dtype)
        self.layer_norm2 = LayerNorm(h, eps, dtype)

    def init(self, rng):
        ks = jax.random.split(rng, 8)
        return {"q_proj": self.q_proj.init(ks[0]),
                "k_proj": self.k_proj.init(ks[1]),
                "v_proj": self.v_proj.init(ks[2]),
                "out_proj": self.out_proj.init(ks[3]),
                "fc1": self.fc1.init(ks[4]), "fc2": self.fc2.init(ks[5]),
                "layer_norm1": self.layer_norm1.init(ks[6]),
                "layer_norm2": self.layer_norm2.init(ks[7])}

    def specs(self):
        return {n: getattr(self, n).specs() for n in
                ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2",
                 "layer_norm1", "layer_norm2")}

    def __call__(self, params, x):
        b, t, h = x.shape
        res = x
        x = self.layer_norm1(params["layer_norm1"], x)
        q = self.q_proj(params["q_proj"], x).reshape(
            b, t, self.heads, self.head_dim)
        k = self.k_proj(params["k_proj"], x).reshape(
            b, t, self.heads, self.head_dim)
        v = self.v_proj(params["v_proj"], x).reshape(
            b, t, self.heads, self.head_dim)
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * self.head_dim**-0.5
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p,
                       v.astype(jnp.float32)).astype(x.dtype)
        x = self.out_proj(params["out_proj"], o.reshape(b, t, h))
        x = res + x
        res = x
        x = self.layer_norm2(params["layer_norm2"], x)
        x = self.fc2(params["fc2"],
                     jax.nn.gelu(self.fc1(params["fc1"], x),
                                 approximate=True))
        return res + x


class CLIPVisionTower(Module):
    def __init__(self, cfg, dtype, feature_layer: int = -2):
        self.cfg = cfg
        self.dtype = dtype
        self.patch = cfg.patch_size
        self.image_size = cfg.image_size
        self.grid = cfg.image_size // cfg.patch_size
        self.num_patches = self.grid**2
        h = cfg.hidden_size
        self.patch_dim = 3 * self.patch * self.patch
        self.patch_embed = Linear(self.patch_dim, h, bias=False,
                                  shard="none", params_dtype=dtype)
        self.pre_layrnorm = LayerNorm(h, 1e-5, dtype)
        self.blocks = [CLIPVisionBlock(cfg, dtype)
                       for _ in range(cfg.num_hidden_layers)]
        # Feature layer -2 => run all but the last block (llava default).
        self.feature_layer = feature_layer

    def init(self, rng):
        ks = jax.random.split(rng, len(self.blocks) + 4)
        h = self.cfg.hidden_size
        return {
            "patch_embed": self.patch_embed.init(ks[0]),
            "class_embedding":
                jax.random.normal(ks[1], (h,), jnp.float32).astype(
                    self.dtype) * 0.02,
            "position_embedding":
                jax.random.normal(ks[2], (self.num_patches + 1, h),
                                  jnp.float32).astype(self.dtype) * 0.02,
            "pre_layrnorm": self.pre_layrnorm.init(ks[3]),
            "blocks": [blk.init(k) for blk, k in
                       zip(self.blocks, ks[4:])],
        }

    def specs(self):
        return {"patch_embed": self.patch_embed.specs(),
                "class_embedding": P(),
                "position_embedding": P(),
                "pre_layrnorm": self.pre_layrnorm.specs(),
                "blocks": [blk.specs() for blk in self.blocks]}

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        """(B, 3, H, W) -> (B, num_patches, hidden) patch features."""
        b = pixel_values.shape[0]
        g, p = self.grid, self.patch
        x = pixel_values.reshape(b, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, self.patch_dim)
        x = self.patch_embed(params["patch_embed"],
                             x.astype(self.dtype))
        cls = jnp.broadcast_to(params["class_embedding"],
                               (b, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["position_embedding"][None]
        x = self.pre_layrnorm(params["pre_layrnorm"], x)
        n_run = len(self.blocks) + 1 + self.feature_layer \
            if self.feature_layer < 0 else self.feature_layer
        for blk, bp in list(zip(self.blocks, params["blocks"]))[:n_run]:
            x = blk(bp, x)
        return x[:, 1:]  # drop CLS (llava 'default' feature select)
