"""LLaVA-1.5 (reference: vllm/model_executor/models/llava.py).

CLIP vision tower -> 2-layer GELU projector -> image features spliced into
the text embedding stream at the positions of the (pre-expanded)
image-token placeholders. The engine expands one ``<image>`` token in the
prompt to ``num_patches`` repeats at admission (the reference's input
processor does the same with image_feature_size), so every shape stays
static under jit.
"""
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from nmvllm_tpu.layers.linear import Linear
from nmvllm_tpu.models.clip_vision import CLIPVisionTower
from nmvllm_tpu.models.llama import LlamaForCausalLM


class LlavaForConditionalGeneration(LlamaForCausalLM):

    is_vision_model = True

    def __init__(self, cfg, **kwargs):
        text_cfg = cfg.text_config
        vision_cfg = cfg.vision_config
        # Build the language stack from the text config.
        for attr in ("architectures",):
            if not getattr(text_cfg, attr, None):
                text_cfg.architectures = ["LlamaForCausalLM"]
        super().__init__(text_cfg, **kwargs)
        self.full_cfg = cfg
        self.image_token_index = cfg.image_token_index
        self.vision_tower = CLIPVisionTower(
            vision_cfg, self.dtype,
            feature_layer=getattr(cfg, "vision_feature_layer", -2))
        self.num_image_tokens = self.vision_tower.num_patches
        h_v = vision_cfg.hidden_size
        h_t = text_cfg.hidden_size
        self.mm_linear_1 = Linear(h_v, h_t, bias=True, shard="none",
                                  params_dtype=self.dtype)
        self.mm_linear_2 = Linear(h_t, h_t, bias=True, shard="none",
                                  params_dtype=self.dtype)

    def init(self, rng):
        p = super().init(rng)
        k1, k2, k3 = jax.random.split(rng, 3)
        p["vision_tower"] = self.vision_tower.init(k1)
        p["mm_linear_1"] = self.mm_linear_1.init(k2)
        p["mm_linear_2"] = self.mm_linear_2.init(k3)
        return p

    def specs(self):
        s = super().specs()
        s["vision_tower"] = self.vision_tower.specs()
        s["mm_linear_1"] = self.mm_linear_1.specs()
        s["mm_linear_2"] = self.mm_linear_2.specs()
        return s

    def image_features(self, params, pixel_values: jax.Array) -> jax.Array:
        """(B_img, 3, H, W) -> (B_img * num_patches, hidden_text)."""
        feats = self.vision_tower(params["vision_tower"], pixel_values)
        x = self.mm_linear_1(params["mm_linear_1"], feats)
        x = jax.nn.gelu(x, approximate=True)
        x = self.mm_linear_2(params["mm_linear_2"], x)
        return x.reshape(-1, x.shape[-1])

    def forward(self, params, input_ids, positions, kv_caches, meta, *,
                is_prefill, has_prefix=False, pixel_values=None):
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        if pixel_values is not None:
            # Splice image features at image-token placeholder positions
            # (order-preserving; static shapes via cumsum gather).
            feats = self.image_features(params, pixel_values)
            mask = input_ids == self.image_token_index       # (B, T)
            idx = jnp.cumsum(mask.reshape(-1)) - 1
            gathered = feats[jnp.clip(idx, 0, feats.shape[0] - 1)]
            gathered = gathered.reshape(x.shape).astype(x.dtype)
            x = jnp.where(mask[..., None], gathered, x)
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

    def hf_name_map(self) -> Dict[str, Tuple]:
        m = {}
        # Language model under the language_model.* prefix.
        for name, entry in super().hf_name_map().items():
            if name.startswith("model.") or name == "lm_head.weight":
                m["language_model." + name] = entry
        m["multi_modal_projector.linear_1.weight"] = (
            ("mm_linear_1", "weight"), "transpose")
        m["multi_modal_projector.linear_1.bias"] = (
            ("mm_linear_1", "bias"), None)
        m["multi_modal_projector.linear_2.weight"] = (
            ("mm_linear_2", "weight"), "transpose")
        m["multi_modal_projector.linear_2.bias"] = (
            ("mm_linear_2", "bias"), None)
        vt = "vision_tower.vision_model."
        m[vt + "embeddings.class_embedding"] = (
            ("vision_tower", "class_embedding"), None)
        m[vt + "embeddings.position_embedding.weight"] = (
            ("vision_tower", "position_embedding"), None)
        m[vt + "embeddings.patch_embedding.weight"] = (
            ("vision_tower", "patch_embed", "weight"), "conv_patch")
        m[vt + "pre_layrnorm.weight"] = (
            ("vision_tower", "pre_layrnorm", "weight"), None)
        m[vt + "pre_layrnorm.bias"] = (
            ("vision_tower", "pre_layrnorm", "bias"), None)
        for i in range(len(self.vision_tower.blocks)):
            pre = vt + f"encoder.layers.{i}."
            path = ("vision_tower", "blocks", i)
            for src, dst in (("self_attn.q_proj", "q_proj"),
                             ("self_attn.k_proj", "k_proj"),
                             ("self_attn.v_proj", "v_proj"),
                             ("self_attn.out_proj", "out_proj"),
                             ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2")):
                m[pre + f"{src}.weight"] = (path + (dst, "weight"),
                                            "transpose")
                m[pre + f"{src}.bias"] = (path + (dst, "bias"), None)
            for ln in ("layer_norm1", "layer_norm2"):
                m[pre + f"{ln}.weight"] = (path + (ln, "weight"), None)
                m[pre + f"{ln}.bias"] = (path + (ln, "bias"), None)
        return m
