"""LLaVA-NeXT / LLaVA-1.6 (reference: vllm/model_executor/models/llava_next.py).

LLaVA-1.5 plus "anyres" image handling: the preprocessor picks the best
grid resolution from ``image_grid_pinpoints`` (select_best_resolution),
emits a base 336x336 crop plus an (hc x wc) grid of 336x336 tiles; the
model merges per-tile CLIP features into one spatial grid, UNPADS it back
to the original aspect ratio (unpad_image), and appends a learnable
``image_newline`` embedding at the end of every feature row
(llava_next.py:322 _merge_image_patch_embeddings, strategy
"spatial_unpad"; final order [base | unpadded grid+newlines]).

TPU-native notes: the crop grid and the unpad crop amounts are STATIC
trace parameters threaded as the prefill ``image_key`` (same mechanism as
phi3v's HD grid), so every reshape/slice is static under jit. The mapper
computes them host-side and reports the exact placeholder token count
(reference get_llava_next_image_feature_size:96). The HF/reference code
keeps a known width/height ordering bug for non-square grids
(transformers#31588, llava_next.py:342); our mapper+model pair uses
consistent row-major (rows=hc, cols=wc) semantics instead — internally
consistent and spatially correct.
"""
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nmvllm_tpu.models.llava import LlavaForConditionalGeneration
from nmvllm_tpu.models.phi3v import (_CLIP_MEAN, _CLIP_STD,
                                     _resize_bilinear)
from nmvllm_tpu.multimodal import MULTIMODAL_REGISTRY


def select_best_resolution(orig_hw, possible_resolutions):
    """Best pinpoint: max effective resolution, then min waste
    (reference clip/llava_next anyres helper semantics)."""
    oh, ow = orig_hw
    best, best_eff, best_waste = None, 0, float("inf")
    for h, w in possible_resolutions:
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = h * w - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best_eff, best_waste, best = eff, waste, (h, w)
    return best


def _unpad_amounts(orig_h: int, orig_w: int, cur_h: int,
                   cur_w: int) -> Tuple[int, int]:
    """Symmetric crop (in feature cells) that undoes the aspect-preserving
    pad — mirror of unpad_image (llava_next.py:8 import)."""
    if orig_w / orig_h > cur_w / cur_h:
        new_h = int(round(orig_h * (cur_w / orig_w), 7))
        return (cur_h - new_h) // 2, 0
    new_w = int(round(orig_w * (cur_h / orig_h), 7))
    return 0, (cur_w - new_w) // 2


def llava_next_feature_size(ps: int, hc: int, wc: int, pad_h: int,
                            pad_w: int) -> int:
    """base (ps*ps) + unpadded grid with one newline token per row
    (reference get_llava_next_image_feature_size:96)."""
    hh = hc * ps - 2 * pad_h
    ww = wc * ps - 2 * pad_w
    return ps * ps + hh * (ww + 1)


def llava_next_image_mapper(model_config, data):
    """anyres preprocessing (mirrors HF LlavaNextImageProcessor as used by
    the reference): pick best pinpoint, resize preserving aspect, pad
    centered (black), tile row-major; base = whole image resized to the
    crop size. Emits the static grid/unpad key and the placeholder token
    count."""
    from nmvllm_tpu.multimodal.image import _to_numpy_image
    hf_cfg = model_config.hf_config
    vis = hf_cfg.vision_config
    crop = int(vis.image_size)
    ps = crop // int(vis.patch_size)
    pinpoints = [tuple(p) for p in
                 getattr(hf_cfg, "image_grid_pinpoints", None) or
                 [(crop, 2 * crop), (2 * crop, crop), (2 * crop, 2 * crop)]]

    img = _to_numpy_image(data).astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    h, w = img.shape[:2]
    best_h, best_w = select_best_resolution((h, w), pinpoints)
    hc, wc = best_h // crop, best_w // crop

    # Aspect-preserving resize into the best grid, centered black pad.
    scale = min(best_w / w, best_h / h)
    rs_h = max(1, min(best_h, math.ceil(h * scale)))
    rs_w = max(1, min(best_w, math.ceil(w * scale)))
    resized = _resize_bilinear(img, rs_h, rs_w)
    padded = np.zeros((best_h, best_w, 3), np.float32)
    y0 = (best_h - rs_h) // 2
    x0 = (best_w - rs_w) // 2
    padded[y0:y0 + rs_h, x0:x0 + rs_w] = resized
    norm = (padded - _CLIP_MEAN) / _CLIP_STD
    base = (_resize_bilinear(img, crop, crop) - _CLIP_MEAN) / _CLIP_STD

    tiles = [np.moveaxis(base, -1, 0)]
    for i in range(hc):
        for j in range(wc):
            t = norm[i * crop:(i + 1) * crop, j * crop:(j + 1) * crop]
            tiles.append(np.moveaxis(t, -1, 0))
    pad_h, pad_w = _unpad_amounts(h, w, hc * ps, wc * ps)
    return {
        "pixel_values": np.stack(tiles),   # (1 + hc*wc, 3, crop, crop)
        "image_sizes": np.asarray([hc, wc, pad_h, pad_w], np.int32),
        "num_image_tokens": llava_next_feature_size(ps, hc, wc, pad_h,
                                                    pad_w),
    }


@MULTIMODAL_REGISTRY.register_image_input_mapper(llava_next_image_mapper)
class LlavaNextForConditionalGeneration(LlavaForConditionalGeneration):

    num_image_tokens = None  # dynamic: the mapper reports per-image counts

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        vis = cfg.vision_config
        self.ps = vis.image_size // vis.patch_size

    def init(self, rng):
        p = super().init(rng)
        p["image_newline"] = jnp.zeros((self.cfg.hidden_size,),
                                       jnp.float32)
        return p

    def specs(self):
        from jax.sharding import PartitionSpec as P
        s = super().specs()
        s["image_newline"] = P()
        return s

    def image_features(self, params, pixel_values: jax.Array,
                       image_sizes=None) -> jax.Array:
        """(1+hc*wc, 3, H, W) -> (feature_size, hidden_text) with the
        spatial_unpad merge (llava_next.py:322)."""
        hc, wc, pad_h, pad_w = image_sizes or (1, 1, 0, 0)
        ps = self.ps
        feats = self.vision_tower(params["vision_tower"], pixel_values)
        x = self.mm_linear_1(params["mm_linear_1"], feats)
        x = jax.nn.gelu(x, approximate=True)
        x = self.mm_linear_2(params["mm_linear_2"], x)
        c = x.shape[-1]

        base = x[0]                                       # (ps*ps, C)
        other = x[1:1 + hc * wc].reshape(hc, wc, ps, ps, c)
        other = other.transpose(0, 2, 1, 3, 4).reshape(hc * ps, wc * ps, c)
        other = other[pad_h:hc * ps - pad_h, pad_w:wc * ps - pad_w]
        newline = params["image_newline"].astype(x.dtype)
        nl = jnp.broadcast_to(newline[None, None, :],
                              (other.shape[0], 1, c))
        other = jnp.concatenate([other, nl], axis=1).reshape(-1, c)
        return jnp.concatenate([base, other], axis=0)

    def forward(self, params, input_ids, positions, kv_caches, meta, *,
                is_prefill, has_prefix=False, pixel_values=None,
                image_sizes=None):
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        if pixel_values is not None:
            feats = self.image_features(params, pixel_values,
                                        image_sizes)
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
        m["image_newline"] = (("image_newline",), None)
        return m
