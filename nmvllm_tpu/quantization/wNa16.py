"""Shared weight-only INT4/INT8 linear method (the Marlin-class path).

All weight-only checkpoint formats (GPTQ, AWQ, compressed-tensors WNA16,
Marlin) are repacked at load into ops/quant_matmul.py's canonical layout and
served by the same fused dequant-GEMM Pallas kernel — the TPU analogue of
the reference funnelling gptq/awq checkpoints into Marlin tiles
(gptq_marlin.py:374 repack, SURVEY.md §7 decision 5).
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.parallel.mesh import TP_AXIS
from nmvllm_tpu.quantization.base import LinearMethodBase
from nmvllm_tpu.ops.quant_matmul import quant_matmul


class WNA16LinearMethod(LinearMethodBase):

    def __init__(self, bits: int, group_size: int, symmetric: bool = True):
        assert bits in (4, 8), f"Unsupported weight bits: {bits}"
        self.bits = bits
        self.group_size = group_size
        self.symmetric = symmetric

    @property
    def a8_mode(self) -> str:
        """W4A8 serving mode for INT4 checkpoints:
        "" (exact dequant-GEMM), "packed" (INT4-packed weights, in-kernel
        unpack to int8 with group multipliers, ONE full-depth int8 dot —
        the round-5 fast path: 0.43x the exact kernel's time at decode
        shapes, docs/PERF_NOTES.md; works for asymmetric zeros too),
        "grouped" (int8-stored weights, exact per-group int8 dots), or
        "channel" (per-channel int8 requantize, single full-depth dot).
        NMVLLM_INT4_A8 = packed | grouped | channel (or 1 = packed)."""
        from nmvllm_tpu import envs
        if self.bits != 4:
            return ""
        v = str(envs.NMVLLM_INT4_A8).lower()
        if not v or v in ("0", "false"):
            return ""
        if v.startswith("p") or v in ("1", "true"):
            return "packed"
        if not self.symmetric:
            return ""          # grouped/channel require symmetric zeros
        return "channel" if v.startswith("c") else "grouped"

    @property
    def a8_int8_store(self) -> bool:
        """Whether qweight is stored as (K, N) int8 instead of packed."""
        return self.a8_mode in ("grouped", "channel")

    def _resolve_group(self, in_features: int) -> int:
        g = self.group_size
        if g in (-1, None):
            g = in_features  # per-channel
        return g

    def create_weights(self, rng, in_features: int, out_features: int,
                       params_dtype) -> Dict[str, Any]:
        g = self._resolve_group(in_features)
        assert in_features % g == 0, (in_features, g)
        k1, _ = jax.random.split(rng)
        qmax_half = 2**(self.bits - 1)
        # Scale so dequantized variance ≈ 1/in_features (matches the
        # unquantized random init statistics).
        scale_val = (in_features**-0.5) / (qmax_half * 0.58)
        scales = jnp.full((in_features // g, out_features), scale_val,
                          jnp.float32)
        zeros = jnp.full((in_features // g, out_features), qmax_half,
                         jnp.int32)
        if self.a8_mode == "packed":
            # A8P arrays: qweight group-half byte-lane packed, mult = 16
            # (scale step 16 * s_chan == the exact path's scale_val),
            # scales = s_chan (1, N), zeros = zms = (z - 8) * m == 0.
            qweight = jax.random.randint(
                k1, (in_features // 8, out_features),
                jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max,
                jnp.int32)
            return {"qweight": qweight,
                    "mult": jnp.full((in_features // g, out_features), 16,
                                     jnp.int32),
                    "scales": jnp.full((1, out_features), scale_val / 16.0,
                                       jnp.float32),
                    "zeros": jnp.zeros((in_features // g, out_features),
                                       jnp.float32)}
        if self.a8_mode == "channel":
            w8 = jax.random.randint(k1, (in_features, out_features),
                                    -127, 128, jnp.int32).astype(jnp.int8)
            ch = jnp.full((1, out_features),
                          (in_features**-0.5) / (127 * 0.58), jnp.float32)
            return {"qweight": w8, "scales": ch, "zeros": zeros}
        if self.bits == 8 or self.a8_int8_store:
            # 8-bit weights stay as plain bias-signed int8 (K, N); the
            # W4A8 mode stores int4 VALUES in int8 (docs/PERF_NOTES.md:
            # raw int8 dots beat every packed-dequant path).
            lo, hi = (-128, 128) if self.bits == 8 else (-8, 8)
            w8 = jax.random.randint(k1, (in_features, out_features),
                                    lo, hi, jnp.int32).astype(jnp.int8)
            return {"qweight": w8, "scales": scales, "zeros": zeros}
        vpw = 32 // self.bits
        qweight = jax.random.randint(
            k1, (in_features // vpw, out_features),
            jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max, jnp.int32)
        return {"qweight": qweight, "scales": scales, "zeros": zeros}

    @property
    def supports_prologue(self) -> bool:
        """Fused activation/norm prologues: in-kernel on the paired
        4-bit kernel; XLA-side (but inside the same jit) on the A8P
        path — either way the method consumes the prologue itself."""
        return self.bits == 4 and not self.a8_int8_store

    def apply(self, params: Dict[str, Any], x, bias=None, *,
              prologue=None, aux=None, eps: float = 1e-6,
              epilogue_add=None):
        orig_shape = x.shape
        x2 = x.reshape(-1, orig_shape[-1])
        if aux is not None and aux.ndim == x.ndim:
            aux = aux.reshape(-1, orig_shape[-1])
        if epilogue_add is not None:
            epilogue_add = epilogue_add.reshape(
                -1, epilogue_add.shape[-1])
        g = self._resolve_group(orig_shape[-1])
        if prologue is not None and not self.supports_prologue:
            from nmvllm_tpu.ops.quant_matmul import apply_prologue_jnp
            x2 = apply_prologue_jnp(prologue, x2, aux, eps)
            prologue, aux = None, None
        if self.bits == 8:
            w8 = params["qweight"]            # (K, N) bias-signed int8
            s = jnp.repeat(params["scales"].astype(jnp.float32), g, axis=0)
            w = w8.astype(jnp.float32) * s
            if not self.symmetric:
                z = jnp.repeat(params["zeros"], g, axis=0)
                w = w + (128 - z).astype(jnp.float32) * s
            y = jnp.dot(x2, w.astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        elif self.a8_mode == "packed":
            from nmvllm_tpu.ops.quant_matmul import quant_matmul_a8p
            y = quant_matmul_a8p(x2, params["qweight"], params["mult"],
                                 params["scales"], params["zeros"],
                                 group_size=g, prologue=prologue,
                                 aux=aux, eps=eps,
                                 epilogue_add=epilogue_add)
            epilogue_add = None
        elif self.a8_mode == "channel":
            from nmvllm_tpu.ops.quant_matmul import int8_channel_matmul
            y = int8_channel_matmul(x2, params["qweight"],
                                    params["scales"])
        elif self.a8_int8_store:
            from nmvllm_tpu.ops.quant_matmul import int8_grouped_matmul
            y = int8_grouped_matmul(x2, params["qweight"],
                                    params["scales"], group_size=g)
        else:
            y = quant_matmul(x2, params["qweight"], params["scales"],
                             params["zeros"], bits=self.bits,
                             group_size=g, symmetric=self.symmetric,
                             prologue=prologue, aux=aux, eps=eps,
                             epilogue_add=epilogue_add)
            epilogue_add = None
        if epilogue_add is not None:
            import jax.numpy as _jnp
            y = (y.astype(_jnp.float32) +
                 epilogue_add.astype(_jnp.float32)).astype(y.dtype)
        y = y.reshape(*orig_shape[:-1], y.shape[-1])
        if bias is not None:
            y = y + bias
        return y

    def param_specs(self, shard: str) -> Dict[str, P]:
        if shard == "column":
            spec = P(None, TP_AXIS)
        elif shard == "row":
            spec = P(TP_AXIS, None)
        else:
            spec = P()
        out = {"qweight": spec, "scales": spec, "zeros": spec}
        if self.a8_mode == "packed":
            out["mult"] = spec
        if self.a8_mode in ("channel", "packed"):
            # Channel scales are (1, N): shard on N for column-parallel,
            # replicate for row-parallel (partial sums carry full scales).
            out["scales"] = P(None, TP_AXIS) if shard == "column" else P()
        return out

    def load_weight_shapes(self, in_features, out_features):
        g = self._resolve_group(in_features)
        if self.a8_mode == "packed":
            return {"qweight": (in_features // 8, out_features),
                    "mult": (in_features // g, out_features),
                    "scales": (1, out_features),
                    "zeros": (in_features // g, out_features)}
        if self.a8_mode == "channel":
            return {"qweight": (in_features, out_features),
                    "scales": (1, out_features),
                    "zeros": (in_features // g, out_features)}
        if self.bits == 8 or self.a8_int8_store:
            return {"qweight": (in_features, out_features),
                    "scales": (in_features // g, out_features),
                    "zeros": (in_features // g, out_features)}
        vpw = 32 // self.bits
        return {"qweight": (in_features // vpw, out_features),
                "scales": (in_features // g, out_features),
                "zeros": (in_features // g, out_features)}
