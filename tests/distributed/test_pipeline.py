"""Pipeline parallelism (parallel/pipeline.py): GPipe-style stacked-layer
scan + ppermute stage ring must reproduce the plain single-stage decode
step bit-for-bit-close on a virtual (pp, tp) CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                               ModelConfig, ParallelConfig,
                               SchedulerConfig)
from nmvllm_tpu.model_loader import build_model, init_params_on_mesh
from nmvllm_tpu.models.base import AttentionMetadata
from nmvllm_tpu.parallel.mesh import build_mesh, build_pp_mesh
from nmvllm_tpu.parallel.pipeline import (build_pipeline_decode_fn,
                                          pipeline_shard_params)
from nmvllm_tpu.worker.runner import shard_map_fn


def _setup(tp, num_layers=None):
    name = "debug-llama-tp" if tp > 1 else "debug-llama"
    hf_cfg = None
    if num_layers is not None:
        from nmvllm_tpu.transformers_utils.config import get_hf_config
        hf_cfg = get_hf_config(name)
        hf_cfg.num_hidden_layers = num_layers
    cfg = EngineConfig(
        model_config=ModelConfig(model=name, dtype="float32",
                                 seed=0, hf_config=hf_cfg),
        cache_config=CacheConfig(block_size=16),
        parallel_config=ParallelConfig(tensor_parallel_size=tp),
        scheduler_config=SchedulerConfig(max_model_len=128,
                                         max_num_seqs=8),
        device_config=DeviceConfig())
    return build_model(cfg)


def _baseline_logits(model, params, kv_caches, mesh, tokens, positions,
                     slots, bt, ctx):
    kv_specs = [P(None, None, "tp") for _ in model.layers]

    def fwd(params, kv, tokens, positions, slots, bt, ctx):
        meta = AttentionMetadata(slot_mapping=slots, block_tables=bt,
                                 context_lens=ctx,
                                 seq_lens=jnp.ones_like(ctx),
                                 prefix_lens=jnp.zeros_like(ctx))
        x, kv = model.forward(params, tokens, positions, kv, meta,
                              is_prefill=False)
        return model.compute_logits(params, x[:, 0, :]), kv

    fn = shard_map_fn(fwd, mesh,
                      in_specs=(model.specs(), kv_specs, P(), P(), P(),
                                P(), P()),
                      out_specs=(P(), kv_specs))
    return fn(params, kv_caches, tokens, positions, slots, bt, ctx)


@pytest.mark.parametrize("pp,tp,num_micro", [(2, 1, 4), (2, 2, 2),
                                             (4, 1, 2)])
def test_pipeline_matches_single_stage(pp, tp, num_micro):
    if len(jax.devices()) < pp * tp:
        pytest.skip("needs more virtual devices")
    batch, blocks, bs = 8, 24, 16
    # The stacked layer axis shards over pp: need num_layers % pp == 0.
    model = _setup(tp, num_layers=4 if pp == 4 else None)
    base_mesh = build_mesh(1, tp)
    params = init_params_on_mesh(model, base_mesh, 0)

    rng = np.random.default_rng(0)
    nl = len(model.layers)
    kv_shape = (blocks, 2, model.total_num_kv_heads, bs, model.head_dim)
    kv_np = [rng.standard_normal(kv_shape).astype(np.float32) * 0.1
             for _ in range(nl)]
    tokens = jnp.asarray(rng.integers(1, 400, (batch, 1)), jnp.int32)
    ctx_np = rng.integers(2, 30, (batch,)).astype(np.int32)
    positions = jnp.asarray(ctx_np - 1, jnp.int32).reshape(batch, 1)
    # Disjoint per-row block tables (the block manager never aliases
    # live pages across sequences; aliased pages would make cross-row
    # write/read ordering observable and baseline-vs-pipeline diverge).
    bt = jnp.asarray(
        rng.permutation(blocks)[:batch * 2].reshape(batch, 2), jnp.int32)
    slots = jnp.asarray(
        np.asarray(bt)[np.arange(batch), (ctx_np - 1) // bs] * bs +
        (ctx_np - 1) % bs, jnp.int32).reshape(batch, 1)
    ctx = jnp.asarray(ctx_np)

    base_logits, base_kv = _baseline_logits(
        model, params, [jnp.asarray(k) for k in kv_np], base_mesh,
        tokens, positions, slots, bt, ctx)
    base_logits = np.asarray(base_logits)

    pp_mesh = build_pp_mesh(pp, tp)
    pp_params = pipeline_shard_params(model, params, pp_mesh)
    kv_stacked = jnp.asarray(np.stack(kv_np))
    fn = build_pipeline_decode_fn(model, pp_mesh, batch, num_micro)
    pp_logits, pp_kv = fn(pp_params, kv_stacked, tokens, positions,
                          slots, bt, ctx)
    np.testing.assert_allclose(np.asarray(pp_logits), base_logits,
                               atol=2e-3, rtol=2e-3)
    # KV writes (the current token's K/V rows) must match too.
    pp_kv = np.asarray(pp_kv)
    for li in range(nl):
        np.testing.assert_allclose(pp_kv[li], np.asarray(base_kv[li]),
                                   atol=2e-3, rtol=2e-3)


def test_pipeline_periodic_layers_gemma2():
    """Alternating-static-config layers (gemma2: sliding window on even
    layers) must keep their own configs inside the stage scan — the scan
    applies `scan_period` distinct layer programs cyclically instead of
    homogenizing to layer 0 (parallel/pipeline.py scan_period)."""
    pp = 2
    if len(jax.devices()) < pp:
        pytest.skip("needs more virtual devices")
    from nmvllm_tpu.parallel.pipeline import scan_period
    from nmvllm_tpu.transformers_utils.config import get_hf_config
    hf_cfg = get_hf_config("debug-gemma2")
    hf_cfg.num_hidden_layers = 4
    cfg = EngineConfig(
        model_config=ModelConfig(model="debug-gemma2", dtype="float32",
                                 seed=0, hf_config=hf_cfg),
        cache_config=CacheConfig(block_size=16),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_model_len=128,
                                         max_num_seqs=8),
        device_config=DeviceConfig())
    model = build_model(cfg)
    assert scan_period(model) == 2  # sliding window alternates
    base_mesh = build_mesh(1, 1)
    params = init_params_on_mesh(model, base_mesh, 0)

    batch, bs, bpp = 8, 16, 8
    blocks = batch * bpp  # disjoint per-row tables (no page aliasing)
    rng = np.random.default_rng(1)
    kv_shape = (blocks, 2, model.total_num_kv_heads, bs, model.head_dim)
    kv_np = [rng.standard_normal(kv_shape).astype(np.float32) * 0.1
             for _ in range(4)]
    tokens = jnp.asarray(rng.integers(1, 400, (batch, 1)), jnp.int32)
    # Contexts beyond the 64-token sliding window so the alternating
    # window actually changes the result.
    ctx_np = rng.integers(70, 120, (batch,)).astype(np.int32)
    positions = jnp.asarray(ctx_np - 1, jnp.int32).reshape(batch, 1)
    bt = jnp.asarray(
        rng.permutation(blocks).reshape(batch, bpp), jnp.int32)
    slots = jnp.asarray(
        np.asarray(bt)[np.arange(batch), (ctx_np - 1) // bs] * bs +
        (ctx_np - 1) % bs, jnp.int32).reshape(batch, 1)
    ctx = jnp.asarray(ctx_np)

    base_logits, _ = _baseline_logits(
        model, params, [jnp.asarray(k) for k in kv_np], base_mesh,
        tokens, positions, slots, bt, ctx)

    pp_mesh = build_pp_mesh(pp, 1)
    pp_params = pipeline_shard_params(model, params, pp_mesh)
    fn = build_pipeline_decode_fn(model, pp_mesh, batch, num_micro=2)
    pp_logits, _ = fn(pp_params, jnp.asarray(np.stack(kv_np)), tokens,
                      positions, slots, bt, ctx)
    np.testing.assert_allclose(np.asarray(pp_logits),
                               np.asarray(base_logits),
                               atol=2e-3, rtol=2e-3)
