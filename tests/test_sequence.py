"""Sequence data-model unit tests (reference tests/test_sequence.py +
tests/test_cache_block_hashing.py scope)."""
from nmvllm_tpu.sampling_params import SamplingParams
from nmvllm_tpu.sequence import (Sequence, SequenceData, SequenceGroup,
                                 SequenceStatus)


def _seq(seq_id=0, prompt=(1, 2, 3, 4), block_size=4):
    return Sequence(seq_id=seq_id, prompt=None,
                    prompt_token_ids=list(prompt), block_size=block_size)


def test_sequence_data_lengths_and_append():
    data = SequenceData([1, 2, 3])
    assert data.get_len() == 3
    assert data.get_prompt_len() == 3
    assert data.get_output_len() == 0
    data.append_token_id(7, -0.5)
    assert data.get_len() == 4
    assert data.get_output_len() == 1
    assert data.get_last_token_id() == 7
    assert data.get_token_ids() == [1, 2, 3, 7]


def test_sequence_data_computed_tokens():
    data = SequenceData(list(range(10)))
    assert data.get_num_uncomputed_tokens() == 10
    data.update_num_computed_tokens(6)
    assert data.get_num_computed_tokens() == 6
    assert data.get_num_uncomputed_tokens() == 4
    data.reset_state_for_recompute()
    assert data.get_num_computed_tokens() == 0


def test_sequence_fork_independent():
    from nmvllm_tpu.sequence import Logprob
    seq = _seq()
    seq.append_token_id(9, {9: Logprob(-0.1)})
    child = seq.fork(1)
    assert child.seq_id == 1
    assert child.get_token_ids() == seq.get_token_ids()
    child.append_token_id(11, {11: Logprob(-0.2)})
    assert seq.get_len() + 1 == child.get_len()


def test_sequence_status_finished_helpers():
    seq = _seq()
    assert not seq.is_finished()
    seq.status = SequenceStatus.FINISHED_STOPPED
    assert seq.is_finished()
    assert SequenceStatus.get_finished_reason(
        SequenceStatus.FINISHED_STOPPED) == "stop"
    assert SequenceStatus.get_finished_reason(
        SequenceStatus.FINISHED_LENGTH_CAPPED) == "length"
    assert SequenceStatus.get_finished_reason(
        SequenceStatus.FINISHED_ABORTED) == "abort"


def test_sequence_group_accounting():
    seqs = [_seq(0), _seq(1)]
    group = SequenceGroup(request_id="r", seqs=seqs, arrival_time=0.0,
                          sampling_params=SamplingParams(best_of=2))
    assert group.num_seqs() == 2
    assert group.get_max_num_running_seqs() >= 1
    seqs[0].status = SequenceStatus.RUNNING
    assert group.get_seqs(SequenceStatus.RUNNING) == [seqs[0]]
    assert not group.is_finished()
    for s in seqs:
        s.status = SequenceStatus.FINISHED_STOPPED
    assert group.is_finished()


def test_logical_block_count_tracks_block_size():
    from nmvllm_tpu.sequence import Logprob
    seq = _seq(prompt=tuple(range(10)), block_size=4)
    # 10 tokens over block_size 4 -> 3 logical blocks.
    assert seq.n_blocks() == 3
    for t in range(3):
        seq.append_token_id(100 + t, {100 + t: Logprob(0.0)})
    assert seq.n_blocks() == 4


def test_prefix_hash_stable_and_prefix_sensitive():
    s1 = _seq(seq_id=0, prompt=tuple(range(12)), block_size=4)
    s2 = _seq(seq_id=1, prompt=tuple(range(12)), block_size=4)
    h1 = [s1.hash_of_block(i) for i in range(3)]
    h2 = [s2.hash_of_block(i) for i in range(3)]
    assert h1 == h2                       # content-determined, not id
    s3 = _seq(seq_id=2, prompt=tuple([99] + list(range(1, 12))),
              block_size=4)
    # A different FIRST block changes every downstream block hash
    # (chained prefix hashing).
    assert s3.hash_of_block(0) != h1[0]
    assert s3.hash_of_block(2) != h1[2]
