"""Embedding-model pooled forward at the runner level (CPU, f32)
(reference tests for llama_embedding / pooler)."""
import numpy as np
import pytest

import jax.numpy as jnp

from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                               ModelConfig, ParallelConfig, SchedulerConfig)
from nmvllm_tpu.models import ModelRegistry
from nmvllm_tpu.parallel.mesh import build_mesh
from nmvllm_tpu.sequence import SequenceData, SequenceGroupMetadata
from nmvllm_tpu.worker.runner import ModelRunner


def test_embedding_pooled_forward():
    cfg = ModelConfig(model="debug-llama", dtype="float32")
    cfg.hf_config.architectures = ["LlamaModel"]  # embedding arch
    engine_config = EngineConfig(
        model_config=cfg, cache_config=CacheConfig(block_size=16),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_model_len=256, max_num_seqs=8),
        device_config=DeviceConfig(device="cpu"))
    runner = ModelRunner(engine_config, build_mesh(1, 1))
    runner.load_model()
    assert getattr(runner.model, "is_embedding_model", False)

    kv = []
    for _ in range(len(runner.model.layers)):
        shape = (8, 2, runner.model.total_num_kv_heads, 16,
                 runner.model.head_dim)
        kv.append(jnp.zeros(shape, jnp.float32))
    meta = SequenceGroupMetadata(
        request_id="e", is_prompt=True,
        seq_data={0: SequenceData(list(range(3, 20)))},
        sampling_params=None, block_tables={0: [0, 1]})
    kv, pooled = runner.execute_embedding(meta, kv)
    assert pooled.shape == (runner.model.cfg.hidden_size,)
    # Normalized embedding.
    assert np.linalg.norm(pooled) == pytest.approx(1.0, abs=1e-3)
    # Deterministic.
    kv, pooled2 = runner.execute_embedding(meta, kv)
    np.testing.assert_allclose(pooled, pooled2, atol=1e-5)
