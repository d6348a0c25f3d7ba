"""Phi-3-Vision (reference: vllm/model_executor/models/phi3v.py).

Phi-3 language stack + CLIP ViT tower + the HD transform image embedding
(Phi3HDImageEmbedding, phi3v.py:102): the preprocessed image arrives as a
global 336x336 crop plus an (hc x wc) grid of 336x336 sub-crops; per-crop
CLIP patch features are 2x2-concatenated (24x24 -> 12x12 with 4x channel),
learnable separators (``sub_GN`` per row, ``glb_GN`` between global and
sub images) are inserted, and a 2-layer GELU projector maps into the text
embedding space.

TPU-native notes: the crop grid (hc, wc) is a STATIC trace parameter
(each distinct grid is its own compiled prefill variant — pixel_values'
shape varies with it anyway), so all reshapes stay static under jit. The
engine expands the image placeholder to the mapper-computed token count
at admission (the reference's input_processor_for_phi3v:376 does the
same rewrite).
"""
import math
from types import SimpleNamespace
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nmvllm_tpu.layers.linear import Linear
from nmvllm_tpu.models.clip_vision import CLIPVisionTower
from nmvllm_tpu.models.phi3 import Phi3ForCausalLM
from nmvllm_tpu.multimodal import MULTIMODAL_REGISTRY


def _clip_vit_large_336():
    """CLIP-ViT-L/14-336 geometry (reference phi3v.py:57
    CLIP_VIT_LARGE_PATCH14_336_CONFIG)."""
    return SimpleNamespace(
        hidden_size=1024, intermediate_size=4096, num_attention_heads=16,
        num_hidden_layers=24, image_size=336, patch_size=14,
        layer_norm_eps=1e-5, projection_dim=768)


def _calc_hd_transform_size(width: int, height: int, hd_num: int = 16):
    """reference phi3v.py:289 (_calc_hd_transform_size + padding)."""
    transposed = False
    if width < height:
        width, height = height, width
        transposed = True
    ratio = width / height
    scale = 1
    while scale * math.ceil(scale / ratio) <= hd_num:
        scale += 1
    scale -= 1
    new_width = int(scale * 336)
    new_height = int(new_width / ratio)
    padded_height = int(math.ceil(new_height / 336) * 336)
    if transposed:
        return padded_height, new_width, new_height, new_width  # w,h swap
    return new_width, padded_height, new_width, new_height


def phi3v_feature_size(ps_half: int, hc: int, wc: int) -> int:
    """Token count of the HD-transformed image (reference
    get_phi3v_image_feature_size:314, generalized from 12 to ps_half)."""
    glb = ps_half * (ps_half + 1)
    sub = (hc * ps_half) * (wc * ps_half + 1)
    return glb + 1 + sub


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Minimal bilinear resize, HWC float."""
    h, w, c = img.shape
    ys = np.linspace(0, h - 1, out_h)
    xs = np.linspace(0, w - 1, out_w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


_CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def phi3v_image_mapper(model_config, data):
    """HD-transform preprocessing (reference: the HF Phi3VImageProcessor
    behavior mirrored by phi3v.py:376 input_processor_for_phi3v):
    resize to <= num_crops 336-tiles preserving aspect, pad with white,
    emit [global 336x336 crop | row-major 336x336 tiles], the crop grid
    and the placeholder token count."""
    from nmvllm_tpu.multimodal.image import _to_numpy_image
    hf_cfg = model_config.hf_config
    crop = 336
    ps_half = 12
    vis = getattr(hf_cfg, "vision_config", None)
    if vis is not None:  # debug-scale towers
        crop = int(vis.image_size)
        ps_half = max(1, (crop // vis.patch_size) // 2)
    num_crops = getattr(hf_cfg, "num_crops", 16)

    img = _to_numpy_image(data).astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    h, w = img.shape[:2]
    # Transform size in 336-units (computed at 336 then rescaled to the
    # tower's crop size for debug models).
    t_w, t_h, r_w, r_h = _calc_hd_transform_size(w, h, num_crops)
    hc, wc = t_h // 336, t_w // 336
    r_h336, r_w336 = r_h, r_w
    # Resize to (r_h, r_w) scaled to crop units, pad to (hc, wc) tiles.
    rs_h = max(1, int(round(r_h336 * crop / 336)))
    rs_w = max(1, int(round(r_w336 * crop / 336)))
    resized = _resize_bilinear(img, rs_h, rs_w)
    padded = np.ones((hc * crop, wc * crop, 3), np.float32)  # white pad
    padded[:rs_h, :rs_w] = resized
    norm = (padded - _CLIP_MEAN) / _CLIP_STD
    glb = (_resize_bilinear(padded, crop, crop) - _CLIP_MEAN) / _CLIP_STD

    tiles = [np.moveaxis(glb, -1, 0)]
    for i in range(hc):
        for j in range(wc):
            tile = norm[i * crop:(i + 1) * crop, j * crop:(j + 1) * crop]
            tiles.append(np.moveaxis(tile, -1, 0))
    pixel_values = np.stack(tiles)          # (1 + hc*wc, 3, crop, crop)
    return {
        "pixel_values": pixel_values,
        "image_sizes": np.asarray([hc, wc], np.int32),
        "num_image_tokens": phi3v_feature_size(ps_half, hc, wc),
    }


@MULTIMODAL_REGISTRY.register_image_input_mapper(phi3v_image_mapper)
class Phi3VForCausalLM(Phi3ForCausalLM):

    is_vision_model = True
    num_image_tokens = None  # dynamic: the mapper reports per-image counts

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self.full_cfg = cfg
        self.image_token_index = int(
            getattr(cfg, "image_token_id", 32044) or 32044)
        vision_cfg = getattr(cfg, "vision_config", None) or \
            _clip_vit_large_336()
        self.vision_tower = CLIPVisionTower(vision_cfg, self.dtype,
                                            feature_layer=-2)
        ps = vision_cfg.image_size // vision_cfg.patch_size
        assert ps % 2 == 0, "HD transform needs an even patch grid"
        self.ps = ps
        self.ps_half = ps // 2
        c = vision_cfg.hidden_size
        self.image_dim_out = c
        h_t = cfg.hidden_size
        self.img_proj_1 = Linear(4 * c, h_t, bias=True, shard="none",
                                 params_dtype=self.dtype)
        self.img_proj_2 = Linear(h_t, h_t, bias=True, shard="none",
                                 params_dtype=self.dtype)

    def init(self, rng):
        p = super().init(rng)
        ks = jax.random.split(rng, 4)
        c4 = 4 * self.image_dim_out
        p["vision_tower"] = self.vision_tower.init(ks[0])
        p["img_proj_1"] = self.img_proj_1.init(ks[1])
        p["img_proj_2"] = self.img_proj_2.init(ks[2])
        p["glb_GN"] = jnp.zeros((1, c4), jnp.float32)
        p["sub_GN"] = jnp.zeros((1, 1, c4), jnp.float32)
        return p

    def specs(self):
        from jax.sharding import PartitionSpec as P
        s = super().specs()
        s["vision_tower"] = self.vision_tower.specs()
        s["img_proj_1"] = self.img_proj_1.specs()
        s["img_proj_2"] = self.img_proj_2.specs()
        s["glb_GN"] = P()
        s["sub_GN"] = P()
        return s

    def _hd_reshape(self, f: jax.Array, h: int, w: int) -> jax.Array:
        """(h*w, ps*ps, C) crops -> (h*ph, w*ph, 4C) feature grid with the
        2x2 spatial-to-channel concat (reference phi3v.py:180-210)."""
        ph = self.ps_half
        c = f.shape[-1]
        f = f.reshape(h, w, ph, 2, ph, 2, c)
        f = f.transpose(0, 1, 2, 4, 3, 5, 6).reshape(h, w, ph, ph, 4 * c)
        f = f.transpose(0, 2, 1, 3, 4).reshape(h * ph, w * ph, 4 * c)
        return f

    def image_features(self, params, pixel_values: jax.Array,
                       image_sizes: Tuple[int, int]) -> jax.Array:
        hc, wc = image_sizes
        ph = self.ps_half
        c4 = 4 * self.image_dim_out
        feats = self.vision_tower(params["vision_tower"], pixel_values)
        feats = feats.astype(jnp.float32)      # (1+hc*wc, ps*ps, C)
        sub_gn = params["sub_GN"].astype(jnp.float32)        # (1, 1, 4C)
        glb_gn = params["glb_GN"].astype(jnp.float32)        # (1, 4C)

        glb = self._hd_reshape(feats[0:1], 1, 1)             # (ph, ph, 4C)
        glb = jnp.concatenate(
            [glb, jnp.broadcast_to(sub_gn, (ph, 1, c4))], axis=1)
        glb = glb.reshape(ph * (ph + 1), c4)

        sub = self._hd_reshape(feats[1:1 + hc * wc], hc, wc)
        sub = jnp.concatenate(
            [sub, jnp.broadcast_to(sub_gn, (hc * ph, 1, c4))], axis=1)
        sub = sub.reshape(hc * ph * (wc * ph + 1), c4)

        out = jnp.concatenate([glb, glb_gn, sub], axis=0)    # glb_sub order
        x = self.img_proj_1(params["img_proj_1"], out.astype(self.dtype))
        x = jax.nn.gelu(x, approximate=True)
        x = self.img_proj_2(params["img_proj_2"], x)
        return x

    def forward(self, params, input_ids, positions, kv_caches, meta, *,
                is_prefill, has_prefix=False, pixel_values=None,
                image_sizes=None):
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        if pixel_values is not None:
            feats = self.image_features(params, pixel_values,
                                        image_sizes or (1, 1))
            mask = input_ids == self.image_token_index
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
        m = super().hf_name_map()
        vp = "model.vision_embed_tokens."
        m[vp + "glb_GN"] = (("glb_GN",), "squeeze0")
        m[vp + "sub_GN"] = (("sub_GN",), "squeeze0")
        m[vp + "img_projection.0.weight"] = (
            ("img_proj_1", "weight"), "transpose")
        m[vp + "img_projection.0.bias"] = (("img_proj_1", "bias"), None)
        m[vp + "img_projection.2.weight"] = (
            ("img_proj_2", "weight"), "transpose")
        m[vp + "img_projection.2.bias"] = (("img_proj_2", "bias"), None)
        vt = vp + "img_processor.vision_model."
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
