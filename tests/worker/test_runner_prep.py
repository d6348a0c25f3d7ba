"""Model-runner input assembly unit tests
(reference tests/worker/test_model_runner.py — prepare-input shapes)."""
import numpy as np
import pytest

from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                               ModelConfig, ParallelConfig, SchedulerConfig)
from nmvllm_tpu.sampling_params import SamplingParams
from nmvllm_tpu.sequence import SequenceData, SequenceGroupMetadata
from nmvllm_tpu.worker.runner import ModelRunner
from nmvllm_tpu.parallel.mesh import build_mesh


@pytest.fixture(scope="module")
def runner():
    engine_config = EngineConfig(
        model_config=ModelConfig(model="debug-llama"),
        cache_config=CacheConfig(block_size=16),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_model_len=256, max_num_seqs=8),
        device_config=DeviceConfig(device="cpu"))
    return ModelRunner(engine_config, build_mesh(1, 1))


def make_meta(request_id, prompt_len, output_len, block_table):
    data = SequenceData(list(range(prompt_len)))
    data.update_num_computed_tokens(prompt_len)
    for t in range(output_len):
        data.append_token_id(100 + t, 0.0)
        if t < output_len - 1:
            data.update_num_computed_tokens(1)
    return SequenceGroupMetadata(
        request_id=request_id, is_prompt=False, seq_data={0: data},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={0: block_table})


def test_prepare_decode_shapes(runner):
    metas = [make_meta("a", 20, 3, [0, 1]),
             make_meta("b", 5, 1, [2])]
    prep = runner.prepare_decode(metas)
    assert prep.tokens.shape == (8, 1)  # padded to bucket
    assert prep.block_tables.shape == (8, runner.max_blocks_per_seq)
    # Row 0: seq len 23, last token 102, position 22.
    assert prep.tokens[0, 0] == 102
    assert prep.positions[0, 0] == 22
    assert prep.context_lens[0] == 23
    # slot: position 22 -> block_table[1]=1, offset 6.
    assert prep.slot_mapping[0, 0] == 1 * 16 + 6
    # Row 1: seq len 6, last token 100.
    assert prep.tokens[1, 0] == 100
    assert prep.context_lens[1] == 6
    assert prep.slot_mapping[1, 0] == 2 * 16 + 5
    # Padding rows inert.
    assert prep.context_lens[2] == 0
    assert prep.slot_mapping[2, 0] == -1


def test_decode_batch_buckets(runner):
    buckets = runner.decode_batch_buckets()
    assert buckets[0] == 8
    assert buckets[-1] == 8  # max_num_seqs=8
    assert runner.pad_decode_batch(3) == 8


def test_prefill_len_buckets(runner):
    assert runner.pad_prefill_len(5) == 16
    assert runner.pad_prefill_len(17) == 32
    assert runner.pad_prefill_len(100) == 128


def test_sampling_tensors_flags(runner):
    metas = [make_meta("a", 4, 1, [0])]
    metas[0].sampling_params = SamplingParams(
        temperature=0.7, top_p=0.9, presence_penalty=0.5, logprobs=5)
    rows = [(metas[0], 0)]
    tensors, flags = runner.build_sampling_tensors(rows, 8)
    assert flags["do_penalties"] and flags["do_top_k_top_p"]
    assert flags["num_logprobs"] > 0
    assert tensors.temperature.shape == (8,)
    assert float(tensors.temperature[0]) == pytest.approx(0.7)
    # History tokens padded with vocab_size sentinel.
    vocab = runner.vocab_size
    assert int(tensors.output_tokens[1, 0]) == vocab
