"""NMVLLM_FUSED_MLP_A8 A/B (debug-llama-tp: I=1024 = one bn block): the one-kernel W4A8 MLP block must
reproduce the two-call A8P path through a real quantized model forward.

The fused path quantizes the down-projection activation per CHUNK
(finer scales than the two-call path's whole-row scale), so logits
carry a8-class noise rather than bf16-fusion-boundary noise only.
"""
import jax.numpy as jnp
import numpy as np
import pytest


def _decode_step(fused: bool, monkeypatch):
    monkeypatch.setenv("NMVLLM_INT4_A8", "packed")
    monkeypatch.setenv("NMVLLM_FUSED_MLP_A8", "1" if fused else "0")
    import jax
    from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
    from nmvllm_tpu.model_loader import build_model, init_params_on_mesh
    from nmvllm_tpu.models.base import AttentionMetadata
    from nmvllm_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(1, 1)
    engine_config = EngineConfig(
        model_config=ModelConfig(model="debug-llama-tp",
                                 quantization="gptq", dtype="bfloat16"),
        cache_config=CacheConfig(block_size=16),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_model_len=64, max_num_seqs=4),
        device_config=DeviceConfig())
    model = build_model(engine_config)
    params = init_params_on_mesh(model, mesh, 0)
    params = model.finalize_for_serving(params)

    if fused:
        # The fused path must actually engage for at least one layer
        # (geometry permitting) or this test is vacuous.
        layer = model.layers[0]
        norm = (params["layers"][0]["input_layernorm"]["weight"], 1e-6)
        assert layer.mlp._can_fuse_block_a8p(norm), \
            "fused a8p MLP path did not engage"

    b = 4
    kv_caches = [jnp.zeros((8, 2, model.total_num_kv_heads, 16,
                            model.head_dim), jnp.bfloat16)
                 for _ in model.layers]
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 64, (b, 1)), jnp.int32)
    positions = jnp.full((b, 1), 3, jnp.int32)
    slots = jnp.asarray(np.arange(b) * 32 + 3, jnp.int32).reshape(b, 1)
    block_tables = jnp.asarray(
        np.arange(b * 2).reshape(b, 2), jnp.int32)
    ctx = jnp.full((b,), 4, jnp.int32)
    from jax.sharding import PartitionSpec as P
    from nmvllm_tpu.worker.runner import shard_map_fn
    kv_specs = [P(None, None, "tp") for _ in model.layers]

    def fwd(params, kv_caches, tokens, positions, slots, block_tables,
            ctx):
        meta = AttentionMetadata(
            slot_mapping=slots, block_tables=block_tables,
            context_lens=ctx, seq_lens=jnp.ones_like(ctx),
            prefix_lens=jnp.zeros_like(ctx))
        x, kv_caches = model.forward(params, tokens, positions, kv_caches,
                                     meta, is_prefill=False)
        return model.compute_logits(params, x[:, 0, :])

    sharded = shard_map_fn(
        fwd, mesh,
        in_specs=(model.specs(), kv_specs, P(), P(), P(), P(), P()),
        out_specs=P())
    logits = sharded(params, kv_caches, tokens, positions, slots,
                     block_tables, ctx)
    return np.asarray(logits, np.float32)


def test_fused_mlp_a8p_flag_preserves_logits(monkeypatch):
    base = _decode_step(False, monkeypatch)
    fused = _decode_step(True, monkeypatch)
    assert base.shape == fused.shape
    num = np.linalg.norm(base - fused)
    den = np.linalg.norm(base) + 1e-6
    assert num / den < 0.05, num / den
