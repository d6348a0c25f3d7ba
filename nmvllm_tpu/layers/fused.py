"""Post-load horizontal fusion of column-parallel projections.

Reference parity: QKVParallelLinear / MergedColumnParallelLinear
(vllm/model_executor/layers/linear.py:490/341) — the reference stores
q/k/v (and gate/up) in ONE merged weight and splits checkpoint tensors
into it at load. This rebuild keeps SEPARATE Linear modules through
construction and weight loading (trivial ingestion and sharding), then
fuses the loaded parameters device-side: on this stack every kernel
call in the serial decode chain costs ~0.4-0.5 ms of fixed latency
(docs/PERF_NOTES.md "per-op fixed costs"), so 3 QKV dots -> 1 and
2 gate/up dots -> 1 remove ~96 serial calls per Llama-step.

TP layout: the fused output dim is SHARD-INTERLEAVED
[q_0|k_0|v_0|q_1|k_1|v_1|...] so each tp rank's contiguous slice is
exactly [q_r|k_r|v_r] (same trick as the MoE gate|up stacking,
ops/moe.py interleave_w1_for_tp).

Fusable methods: unquantized, WNA16 (all packed/int8 storages — the
paired 4-bit layout is column-independent so N-concat is exact), and
dynamic INT8 W8A8 (per-channel scales concat). Per-tensor-scale methods
(FP8) and sparse layers stay unfused.
"""
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nmvllm_tpu.layers.linear import Linear, UnquantizedLinearMethod
from nmvllm_tpu.logger import init_logger

logger = init_logger(__name__)

_FUSION_ENABLED = True


def set_fusion_enabled(on: bool) -> None:
    """Disabled when multi-LoRA is active (adapter stacks key on the
    individual projection names) or via NMVLLM_DISABLE_FUSION."""
    global _FUSION_ENABLED
    _FUSION_ENABLED = bool(on)


def fusion_enabled() -> bool:
    from nmvllm_tpu import envs
    return _FUSION_ENABLED and not getattr(envs, "NMVLLM_DISABLE_FUSION",
                                           False)


def interleave_concat(parts: Sequence[jax.Array], tp: int,
                      axis: int) -> jax.Array:
    """Concat along ``axis`` in shard-interleaved order: rank r's slice
    of the result is the concat of every part's rank-r slice."""
    if tp <= 1:
        return jnp.concatenate(parts, axis=axis)
    chunks = []
    for r in range(tp):
        for p in parts:
            n = p.shape[axis]
            assert n % tp == 0, (n, tp)
            sl = [slice(None)] * p.ndim
            sl[axis] = slice(r * n // tp, (r + 1) * n // tp)
            chunks.append(p[tuple(sl)])
    return jnp.concatenate(chunks, axis=axis)


def _method_kind(linear: Linear) -> Optional[Tuple]:
    m = linear.method
    if isinstance(m, UnquantizedLinearMethod):
        return ("dense",)
    from nmvllm_tpu.quantization.int8_w8a8 import Int8W8A8LinearMethod
    from nmvllm_tpu.quantization.wNa16 import WNA16LinearMethod
    if isinstance(m, WNA16LinearMethod):
        return ("wna16", m.bits, m.group_size, m.symmetric, m.a8_mode)
    if isinstance(m, Int8W8A8LinearMethod):
        return ("int8", m.static_input_scale) if not m.static_input_scale \
            else None
    return None


# param name -> concat axis (the output-dim axis of that tensor)
_CONCAT_AXIS = {"weight": 1, "bias": 0, "qweight": 1, "scales": 1,
                "zeros": 1, "mult": 1, "weight_scale": 0}


def try_fuse(linears: List[Linear], params_list: List[Dict[str, Any]],
             tp: int) -> Optional[Tuple[Linear, Dict[str, Any], List[int]]]:
    """Fuse N column-parallel Linears into one.

    Returns (fused_linear, fused_params, per-rank local output widths)
    or None when the parts aren't fusable."""
    if not fusion_enabled() or len(linears) < 2:
        return None
    kinds = {_method_kind(l) for l in linears}
    if len(kinds) != 1 or None in kinds:
        return None
    if any(l.shard != "column" for l in linears):
        return None
    keysets = {frozenset(p.keys()) for p in params_list}
    if len(keysets) != 1:
        return None  # e.g. bias on some parts only
    if any(l.out_features % max(tp, 1) != 0 for l in linears):
        return None
    fused_params: Dict[str, Any] = {}
    for key in params_list[0]:
        axis = _CONCAT_AXIS.get(key)
        if axis is None:
            return None
        parts = [p[key] for p in params_list]
        if any(p.ndim <= axis for p in parts):
            return None
        fused_params[key] = interleave_concat(parts, tp, axis)
    out_features = sum(l.out_features for l in linears)
    fused = Linear(linears[0].in_features, out_features,
                   bias="bias" in params_list[0], shard="column",
                   method=linears[0].method,
                   params_dtype=linears[0].params_dtype, name="")
    widths = [l.out_features // max(tp, 1) for l in linears]
    return fused, fused_params, widths


def split_fused(y: jax.Array, widths: List[int]) -> List[jax.Array]:
    """Split the fused output back into per-projection LOCAL slices
    (inside shard_map, widths are the per-rank part widths)."""
    outs = []
    off = 0
    for w in widths:
        outs.append(y[..., off:off + w])
        off += w
    return outs
