"""In-engine data parallelism (beyond the reference, whose DP is an
external load balancer — SURVEY §2.3): batch rows and the KV block pool
shard over the `data` mesh axis. dp=2 must match dp=1 token-for-token on
the virtual CPU mesh."""
import numpy as np
import pytest

from nmvllm_tpu.core.block_manager import BlockSpaceManager
from nmvllm_tpu.sequence import Sequence, SequenceGroup, SequenceStatus


def _group(seq_id, n_tokens, block_size=16):
    seq = Sequence(seq_id=seq_id, prompt=None,
                   prompt_token_ids=list(range(n_tokens)),
                   block_size=block_size)
    from nmvllm_tpu.sampling_params import SamplingParams
    group = SequenceGroup(request_id=f"r{seq_id}", seqs=[seq],
                          arrival_time=0.0,
                          sampling_params=SamplingParams())
    return group, seq


def test_block_manager_partitions_pool_across_replicas():
    bm = BlockSpaceManager(block_size=16, num_gpu_blocks=8,
                           num_cpu_blocks=8, watermark=0.0,
                           data_parallel_size=2)
    assert bm.blocks_per_replica == 4
    groups = []
    for sid in range(4):
        g, seq = _group(sid, 20)  # 2 blocks each
        bm.allocate(g)
        seq.status = SequenceStatus.RUNNING
        groups.append((g, seq))
    # Least-loaded placement alternates replicas; every sequence's pages
    # stay inside one replica's id range.
    replicas = set()
    for g, seq in groups:
        table = bm.get_block_table(seq)
        r = table[0] // bm.blocks_per_replica
        assert all(b // bm.blocks_per_replica == r for b in table), table
        assert bm.get_replica(seq.seq_id) == r
        replicas.add(r)
    assert replicas == {0, 1}
    # Each replica is now full (4 blocks used); freeing returns blocks to
    # the right partition.
    assert bm.get_num_free_gpu_blocks() == 0
    bm.free(groups[0][1])
    assert bm.gpu_allocators[bm.get_replica(groups[1][1].seq_id)
                             if False else 0]. \
        get_num_free_blocks() + bm.gpu_allocators[1]. \
        get_num_free_blocks() == 2


def test_block_manager_dp_rejects_prefix_caching():
    with pytest.raises(NotImplementedError):
        BlockSpaceManager(block_size=16, num_gpu_blocks=8,
                          num_cpu_blocks=0, enable_caching=True,
                          data_parallel_size=2)


@pytest.mark.e2e
def test_engine_dp2_matches_dp1():
    from nmvllm_tpu import LLM, SamplingParams
    prompts = ["data parallel decode test " * 3, "hello world",
               "the quick brown fox jumps over the lazy dog",
               "a b c d e f g"]
    sp = SamplingParams(temperature=0.0, max_tokens=16)

    def run(dp):
        llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
                  max_num_seqs=8, max_model_len=128,
                  data_parallel_size=dp)
        out = llm.generate(prompts, sp)
        toks = [tuple(o.outputs[0].token_ids) for o in out]
        del llm
        return toks

    t1 = run(1)
    t2 = run(2)
    assert t1 == t2
