"""Layerwise profiler.

Reference: the NM layerwise profiler (vllm/profiler/nm_profile.py:66 —
module tree × kineto CUDA events → per-layer time tables). TPU-native
equivalent: jax.profiler traces with jax.named_scope annotations per layer;
summaries are derived from XLA cost analysis of the compiled step (FLOPs /
bytes per fused region) since per-op walltime lives in the trace files
(view with TensorBoard/xprof).
"""
import contextlib
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax

from nmvllm_tpu.logger import init_logger

logger = init_logger(__name__)


@dataclass
class LayerCost:
    name: str
    flops: float = 0.0
    bytes_accessed: float = 0.0

    @property
    def arithmetic_intensity(self) -> float:
        return self.flops / self.bytes_accessed if self.bytes_accessed else 0


@dataclass
class ProfileResult:
    total_flops: float = 0.0
    total_bytes: float = 0.0
    layers: List[LayerCost] = field(default_factory=list)

    def table(self) -> str:
        lines = [f"{'layer':40s} {'GFLOPs':>12s} {'GB':>10s} {'AI':>8s}"]
        for layer in self.layers:
            lines.append(
                f"{layer.name:40s} {layer.flops / 1e9:12.3f} "
                f"{layer.bytes_accessed / 1e9:10.3f} "
                f"{layer.arithmetic_intensity:8.1f}")
        lines.append(
            f"{'TOTAL':40s} {self.total_flops / 1e9:12.3f} "
            f"{self.total_bytes / 1e9:10.3f}")
        return "\n".join(lines)

    def to_json(self) -> str:
        return json.dumps({
            "total_flops": self.total_flops,
            "total_bytes": self.total_bytes,
            "layers": [{
                "name": lc.name, "flops": lc.flops,
                "bytes": lc.bytes_accessed,
            } for lc in self.layers],
        })


def cost_analysis(fn, *args, **kwargs) -> ProfileResult:
    """Static cost analysis of a jitted function via XLA."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    result = ProfileResult(
        total_flops=float(cost.get("flops", 0.0)),
        total_bytes=float(cost.get("bytes accessed", 0.0)))
    return result


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nmvllm_profile"):
    """Capture an xprof trace around a block (view with TensorBoard)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written to %s", log_dir)


@contextlib.contextmanager
def layer_scope(name: str):
    """Annotation helper used inside model code for trace attribution."""
    with jax.named_scope(name):
        yield
