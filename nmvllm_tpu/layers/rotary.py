"""Rotary position embeddings with the reference's scaling family.

Reference: vllm/model_executor/layers/rotary_embedding.py:60-726 —
base RoPE, linear scaling (:265), dynamic-NTK (:351), YaRN (:432),
Llama-3 rope, and csrc/pos_encoding_kernels.cu. On TPU the cos/sin cache is
a precomputed replicated array and application is a fused jnp expression
(gathers + elementwise — XLA fuses into the attention prologue).
"""
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.module import Module


def _compute_inv_freq(base: float, rotary_dim: int) -> jax.Array:
    return 1.0 / (base**(jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) /
                         rotary_dim))


def _yarn_find_correction_dim(num_rotations, dim, base, max_pos):
    return (dim * math.log(max_pos / (num_rotations * 2 * math.pi))) / (
        2 * math.log(base))


def _yarn_find_correction_range(low_rot, high_rot, dim, base, max_pos):
    low = math.floor(_yarn_find_correction_dim(low_rot, dim, base, max_pos))
    high = math.ceil(_yarn_find_correction_dim(high_rot, dim, base, max_pos))
    return max(low, 0), min(high, dim - 1)


def _yarn_linear_ramp(low, high, dim):
    if low == high:
        high += 0.001
    ramp = (jnp.arange(dim, dtype=jnp.float32) - low) / (high - low)
    return jnp.clip(ramp, 0, 1)


def yarn_get_mscale(scale: float = 1.0, mscale: float = 1.0) -> float:
    """Reference deepseek_v2.py:179 / rotary_embedding.py:613."""
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


class RotaryEmbedding(Module):
    """Precomputed cos/sin cache; neox-style (rotate halves) or gptj-style
    (rotate pairs) application."""

    def __init__(self, head_dim: int, rotary_dim: int, max_position: int,
                 base: float = 10000.0, is_neox_style: bool = True,
                 rope_scaling: Optional[Dict[str, Any]] = None,
                 dtype=jnp.bfloat16):
        self.head_dim = head_dim
        self.rotary_dim = rotary_dim
        self.max_position = max_position
        self.base = base
        self.is_neox_style = is_neox_style
        self.rope_scaling = rope_scaling or {}
        self.dtype = dtype
        self.attn_scale = 1.0  # extra output scale (YaRN mscale)
        self.cos_sin_scale = 1.0  # folded into the cache (deepseek_yarn)

    # -- cache construction -------------------------------------------------
    def _inv_freq_and_len(self) -> Tuple[jax.Array, int]:
        scaling = self.rope_scaling
        rtype = scaling.get("rope_type", scaling.get("type", None))
        inv_freq = _compute_inv_freq(self.base, self.rotary_dim)
        max_len = self.max_position
        if rtype is None or rtype == "default":
            return inv_freq, max_len
        factor = float(scaling.get("factor", 1.0))
        if rtype == "linear":
            # positions are divided by factor (rotary_embedding.py:265).
            return inv_freq, int(max_len * factor)
        if rtype == "dynamic":
            # Dynamic NTK: rescale base for the extended window (:351).
            max_len = int(max_len * factor)
            base = self.base * ((factor * max_len / self.max_position) -
                                (factor - 1))**(self.rotary_dim /
                                                (self.rotary_dim - 2))
            return _compute_inv_freq(base, self.rotary_dim), max_len
        if rtype == "yarn":
            orig_max = int(scaling.get(
                "original_max_position_embeddings", max_len))
            beta_fast = float(scaling.get("beta_fast", 32))
            beta_slow = float(scaling.get("beta_slow", 1))
            extrap = _compute_inv_freq(self.base, self.rotary_dim)
            interp = extrap / factor
            low, high = _yarn_find_correction_range(
                beta_fast, beta_slow, self.rotary_dim, self.base, orig_max)
            mask = 1.0 - _yarn_linear_ramp(low, high, self.rotary_dim // 2)
            inv_freq = interp * (1 - mask) + extrap * mask
            mscale = float(scaling.get("attn_factor", 1.0))
            self.attn_scale = (0.1 * math.log(factor) + 1.0) * mscale
            return inv_freq, int(orig_max * factor)
        if rtype == "deepseek_yarn":
            # DeepseekScalingRotaryEmbedding (rotary_embedding.py:619):
            # YaRN frequencies with the magnitude correction folded into
            # the cos/sin cache; the attention module applies mscale^2 to
            # its score scale separately.
            orig_max = int(scaling.get(
                "original_max_position_embeddings", max_len))
            beta_fast = float(scaling.get("beta_fast", 32))
            beta_slow = float(scaling.get("beta_slow", 1))
            extrap = _compute_inv_freq(self.base, self.rotary_dim)
            interp = extrap / factor
            low, high = _yarn_find_correction_range(
                beta_fast, beta_slow, self.rotary_dim, self.base, orig_max)
            mask = 1.0 - _yarn_linear_ramp(low, high, self.rotary_dim // 2)
            inv_freq = interp * (1 - mask) + extrap * mask
            mscale = float(scaling.get("mscale", 1.0))
            mscale_all = float(scaling.get("mscale_all_dim", 0.0))
            attn_factor = float(scaling.get("attn_factor", 1.0))
            self.cos_sin_scale = (yarn_get_mscale(factor, mscale) /
                                  yarn_get_mscale(factor, mscale_all) *
                                  attn_factor)
            return inv_freq, int(orig_max * factor)
        if rtype == "llama3":
            low_factor = float(scaling.get("low_freq_factor", 1.0))
            high_factor = float(scaling.get("high_freq_factor", 4.0))
            orig_max = int(scaling.get(
                "original_max_position_embeddings", 8192))
            wavelen = 2 * math.pi / inv_freq
            low_wl = orig_max / low_factor
            high_wl = orig_max / high_factor
            smooth = (orig_max / wavelen - low_factor) / (high_factor -
                                                          low_factor)
            new_freq = jnp.where(
                wavelen < high_wl, inv_freq,
                jnp.where(wavelen > low_wl, inv_freq / factor,
                          (1 - smooth) * inv_freq / factor +
                          smooth * inv_freq))
            return new_freq, max_len
        raise ValueError(f"Unknown rope scaling type: {rtype}")

    def init(self, rng=None):
        inv_freq, max_len = self._inv_freq_and_len()
        t = jnp.arange(max_len, dtype=jnp.float32)
        scaling = self.rope_scaling
        rtype = scaling.get("rope_type", scaling.get("type", None))
        if rtype == "linear":
            t = t / float(scaling.get("factor", 1.0))
        freqs = jnp.outer(t, inv_freq)  # (max_len, rot/2)
        return {"cos": (jnp.cos(freqs) * self.cos_sin_scale
                        ).astype(self.dtype),
                "sin": (jnp.sin(freqs) * self.cos_sin_scale
                        ).astype(self.dtype)}

    def specs(self):
        return {"cos": P(), "sin": P()}

    def __call__(self, params, positions: jax.Array, q: jax.Array,
                 k: jax.Array):
        """positions: (...,); q/k: (..., num_heads, head_dim)."""
        cos = params["cos"][positions]  # (..., rot/2)
        sin = params["sin"][positions]
        cos = cos[..., None, :].astype(jnp.float32)
        sin = sin[..., None, :].astype(jnp.float32)

        def rotate(x):
            xf = x.astype(jnp.float32)
            rot, rest = xf[..., :self.rotary_dim], xf[..., self.rotary_dim:]
            if self.is_neox_style:
                x1 = rot[..., :self.rotary_dim // 2]
                x2 = rot[..., self.rotary_dim // 2:]
                o1 = x1 * cos - x2 * sin
                o2 = x2 * cos + x1 * sin
                out = jnp.concatenate([o1, o2], axis=-1)
            else:
                x1 = rot[..., 0::2]
                x2 = rot[..., 1::2]
                o1 = x1 * cos - x2 * sin
                o2 = x2 * cos + x1 * sin
                out = jnp.stack([o1, o2], axis=-1).reshape(rot.shape)
            if rest.shape[-1]:
                out = jnp.concatenate([out, rest], axis=-1)
            return out.astype(x.dtype)

        return rotate(q), rotate(k)
