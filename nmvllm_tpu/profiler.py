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


def _timed_chain(fn, state, iters: int) -> float:
    """Median-of-iters walltime (ms) of a chained (output feeds input)
    jitted call — chaining defeats XLA's cross-call hoisting, which
    otherwise reports bogus times on this stack (docs/PERF_NOTES.md)."""
    import time
    state = fn(state)  # compile + warm
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) * 1e3 / iters


def decode_walltime_profile(llm, batch: int = 8, iters: int = 20,
                            ctx: int = 128) -> Dict[str, Any]:
    """Measured per-component decode walltime table (the NM layerwise
    profiler's summary_table, reference vllm/profiler/nm_profile.py:66,
    rebuilt on measured device walltime instead of kineto events).

    Times one decoder layer's full decode path (chained), the embedding +
    LM head, and the complete compiled step; the difference between
    layers*per_layer + head and the step total is reported as
    ``unattributed`` (sampler, dispatch, collectives). Single-chip (tp=1)
    only: components are jitted outside the shard_map step.
    """
    import numpy as np

    import jax.numpy as jnp

    from nmvllm_tpu.models.base import AttentionMetadata
    runner = llm.llm_engine.executor.runner
    model, params = runner.model, runner.params
    kv_caches = llm.llm_engine.executor.cache_engine.kv_caches
    bs = runner.block_size
    nblocks = kv_caches[0].shape[0] if hasattr(kv_caches[0], "shape") \
        else kv_caches[0][0].shape[0]
    max_bpp = min(runner.max_blocks_per_seq, max(1, (ctx + bs) // bs))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 64, (batch, 1)), jnp.int32)
    positions = jnp.full((batch, 1), ctx - 1, jnp.int32)
    ctx_lens = jnp.full((batch,), ctx, jnp.int32)
    block_tables = jnp.asarray(
        rng.integers(0, max(1, nblocks - 1), (batch, max_bpp)), jnp.int32)
    slots = jnp.asarray(
        (np.arange(batch) % max(1, nblocks - 1)) * bs, jnp.int32)
    meta = AttentionMetadata(
        slot_mapping=slots, block_tables=block_tables,
        context_lens=ctx_lens, seq_lens=jnp.ones_like(ctx_lens),
        prefix_lens=jnp.zeros_like(ctx_lens))

    hidden = model.cfg.hidden_size
    layer0 = model.layers[0]
    lp = params["layers"][0]
    kv0 = kv_caches[0]

    # Components run under shard_map (row-parallel psum needs the tp
    # axis bound), mirroring the runner's step construction.
    from jax.sharding import PartitionSpec as P

    from nmvllm_tpu.worker.runner import shard_map_fn
    layer_specs = runner._param_specs["layers"][0]
    rot_specs = (runner._param_specs["rotary"]
                 if model.rotary is not None else {})
    kv_spec = runner._kv_spec

    def layer_fwd(lp_, rp_, x, kv):
        y, res, kv = layer0(lp_, model.rotary, rp_, x, positions, kv,
                            meta, None, is_prefill=False,
                            has_prefix=False)
        # Fold the residual back so the chain stays closed over x.
        return (y + res).astype(x.dtype), kv

    layer_sm = shard_map_fn(
        layer_fwd, runner.mesh,
        in_specs=(layer_specs, rot_specs, P(), kv_spec),
        out_specs=(P(), kv_spec))
    run_layer = jax.jit(
        lambda state: layer_sm(lp, params["rotary"], *state))

    def head_fwd(emb_p, all_p, tok):
        x = model.embed_tokens(emb_p, tok)
        logits = model.compute_logits(all_p, x[:, 0, :])
        return jnp.argmax(logits, -1, keepdims=True).astype(jnp.int32)

    head_sm = shard_map_fn(
        head_fwd, runner.mesh,
        in_specs=(runner._param_specs["embed_tokens"],
                  runner._param_specs, P()),
        out_specs=P())
    run_embed_head = jax.jit(
        lambda tok: head_sm(params["embed_tokens"], params, tok))

    x0 = jnp.zeros((batch, 1, hidden), jnp.bfloat16)
    per_layer_ms = _timed_chain(lambda s: run_layer(s), (x0, kv0), iters)
    head_ms = _timed_chain(lambda t: run_embed_head(t), tokens, iters)

    # Full engine step via the compiled decode path.
    state_slots = jnp.full((batch,), np.iinfo(np.int32).max, jnp.int32)
    tensors, flags = runner.build_sampling_tensors([], batch)
    step = runner._get_decode_fn(tuple(sorted(flags.items())), False)
    lora_idx = jnp.zeros((batch,), jnp.int32)

    def run_step(state):
        tok, kv = state
        res = step(params, kv, tok, positions, slots, block_tables,
                   ctx_lens, state_slots, tensors, lora_idx,
                   runner._lora_stack_template())
        kv2, out = res[0], res[1]
        return out.next_tokens.reshape(batch, 1).astype(jnp.int32), kv2

    step_ms = _timed_chain(run_step, (tokens, kv_caches), max(2, iters // 2))

    n_layers = len(model.layers)
    attributed = per_layer_ms * n_layers + head_ms
    rows = [("decoder layer (x%d)" % n_layers, per_layer_ms * n_layers),
            ("embed + lm_head + argmax", head_ms),
            ("full step (measured)", step_ms),
            ("unattributed (sampler/dispatch)",
             max(0.0, step_ms - attributed))]
    width = max(len(r[0]) for r in rows) + 2
    lines = [f"{'component':{width}s} {'ms/step':>10s}  {'%':>6s}"]
    for name, ms in rows:
        pct = 100.0 * ms / step_ms if step_ms else 0.0
        lines.append(f"{name:{width}s} {ms:10.3f}  {pct:6.1f}")
    return {
        "per_layer_ms": per_layer_ms,
        "num_layers": n_layers,
        "embed_head_ms": head_ms,
        "step_ms": step_ms,
        "unattributed_ms": max(0.0, step_ms - attributed),
        "table": "\n".join(lines),
    }
