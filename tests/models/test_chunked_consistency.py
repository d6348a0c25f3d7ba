"""Numerical consistency of chunked prefill vs whole-prompt prefill at the
runner level, float32 on CPU (isolates the paged-prefix attention path from
engine scheduling and bf16 noise)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                               ModelConfig, ParallelConfig, SchedulerConfig)
from nmvllm_tpu.parallel.mesh import build_mesh
from nmvllm_tpu.sampling_params import SamplingParams
from nmvllm_tpu.sequence import SequenceData, SequenceGroupMetadata
from nmvllm_tpu.worker.runner import ModelRunner


def make_runner():
    engine_config = EngineConfig(
        model_config=ModelConfig(model="debug-llama", dtype="float32"),
        cache_config=CacheConfig(block_size=16),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_model_len=256, max_num_seqs=8),
        device_config=DeviceConfig(device="cpu"))
    runner = ModelRunner(engine_config, build_mesh(1, 1))
    runner.load_model()
    return runner


def make_kv(runner, num_blocks=16):
    model = runner.model
    kv = []
    for _ in range(len(model.layers)):
        shape = (num_blocks, 2, model.total_num_kv_heads, 16,
                 model.head_dim)
        kv.append(jnp.zeros(shape, jnp.float32))
    return kv


def test_chunked_prefill_token_matches_full():
    runner = make_runner()
    prompt = list(range(3, 64))  # 61 tokens
    table = [0, 1, 2, 3]
    sp = SamplingParams(temperature=0.0, max_tokens=4)

    # Whole-prompt prefill.
    kv = make_kv(runner)
    data = SequenceData(list(prompt))
    meta = SequenceGroupMetadata(request_id="full", is_prompt=True,
                                 seq_data={0: data}, sampling_params=sp,
                                 block_tables={0: table})
    kv, out_full = runner.execute_prefill(meta, kv)
    tok_full = out_full.outputs[0].samples[0].output_token

    # Chunked: 32 then 29.
    kv2 = make_kv(runner)
    data2 = SequenceData(list(prompt))
    meta1 = SequenceGroupMetadata(request_id="c", is_prompt=True,
                                  seq_data={0: data2}, sampling_params=sp,
                                  block_tables={0: table},
                                  do_sample=False, token_chunk_size=32)
    kv2, none_out = runner.execute_prefill(meta1, kv2)
    assert none_out is None
    data2.update_num_computed_tokens(32)
    meta2 = SequenceGroupMetadata(request_id="c", is_prompt=True,
                                  seq_data={0: data2}, sampling_params=sp,
                                  block_tables={0: table},
                                  do_sample=True, token_chunk_size=29)
    kv2, out_chunked = runner.execute_prefill(meta2, kv2)
    tok_chunked = out_chunked.outputs[0].samples[0].output_token

    assert tok_full == tok_chunked
    # KV caches must match too (the written pages).
    k_full = np.asarray(kv[0][0])
    k_chunk = np.asarray(kv2[0][0])
    np.testing.assert_allclose(k_chunk[:, :4], k_full[:, :4], atol=1e-4,
                               rtol=1e-4)
