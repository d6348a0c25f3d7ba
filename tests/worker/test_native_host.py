"""Native host-runtime (csrc/host/nm_host.cpp): batch assembly and
prefix-hash chain must match the pure-Python paths exactly."""
import numpy as np
import pytest

from nmvllm_tpu.native import (NativeSeqRegistry, hash_block_chain,
                               native_available)


def test_native_library_builds():
    # g++ is in the image; the library must build and load.
    assert native_available()


def _py_fnv_chain(prev, tokens):
    h = 0xcbf29ce484222325
    h = ((h ^ (prev & 0xFFFFFFFFFFFFFFFF)) * 0x100000001b3) \
        & 0xFFFFFFFFFFFFFFFF
    for t in tokens:
        h = ((h ^ (t & 0xFFFFFFFF)) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


def test_hash_block_chain_matches_python_fnv():
    rng = np.random.default_rng(0)
    prev = 0
    for _ in range(5):
        block = rng.integers(0, 2**31, 16, dtype=np.int32)
        expect = _py_fnv_chain(prev, block.tolist())
        got = hash_block_chain(prev, block)
        assert got == expect
        assert got >= 0
        prev = got


def test_hash_chain_order_sensitivity():
    a = hash_block_chain(0, [1, 2, 3, 4])
    b = hash_block_chain(0, [4, 3, 2, 1])
    assert a != b
    # Chaining: same block after different prefixes differs.
    assert hash_block_chain(a, [7] * 4) != hash_block_chain(b, [7] * 4)


def _py_prepare(states, rows, b_pad, block_size, max_blocks):
    """Reference assembly matching worker/runner.py's Python path."""
    tokens = np.zeros((b_pad, 1), np.int32)
    positions = np.zeros((b_pad, 1), np.int32)
    slots = np.full((b_pad, 1), -1, np.int32)
    block_tables = np.zeros((b_pad, max_blocks), np.int32)
    ctx = np.zeros((b_pad,), np.int32)
    for i, r in enumerate(rows):
        seq_len, last, table = states[r]
        pos = seq_len - 1
        tokens[i, 0] = last
        positions[i, 0] = pos
        block_tables[i, :len(table)] = table
        slots[i, 0] = table[pos // block_size] * block_size + \
            pos % block_size
        ctx[i] = seq_len
    return tokens, positions, slots, block_tables, ctx


@pytest.mark.parametrize("block_size", [16, 32])
def test_registry_prepare_decode_matches_python(block_size):
    rng = np.random.default_rng(1)
    reg = NativeSeqRegistry(64)
    max_blocks = 20
    states = {}
    for slot in range(10):
        n_blocks = int(rng.integers(1, max_blocks))
        seq_len = int(rng.integers((n_blocks - 1) * block_size + 1,
                                   n_blocks * block_size + 1))
        table = rng.integers(0, 1000, n_blocks, dtype=np.int32).tolist()
        last = int(rng.integers(0, 32000))
        states[slot] = (seq_len, last, table)
        reg.set_seq(slot, seq_len, last, table)
    rows = np.asarray([3, 7, 0, 9, 5], np.int32)
    got = reg.prepare_decode(rows, 8, block_size, max_blocks)
    want = _py_prepare(states, rows.tolist(), 8, block_size, max_blocks)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_registry_incremental_append_matches_fresh_set():
    block_size = 16
    reg = NativeSeqRegistry(8)
    table = [5]
    seq_len, last = 10, 42
    reg.set_seq(0, seq_len, last, table)
    # Decode 20 tokens; cross a page boundary at len 16.
    for t in range(20):
        seq_len += 1
        last = 100 + t
        if (seq_len - 1) // block_size >= len(table):
            table.append(77 + t)
            # Version-bump path in the runner does a full resync; here we
            # exercise the in-place append-with-block variant.
            reg.append_token(0, last, new_block=table[-1])
        else:
            reg.append_token(0, last)
    fresh = NativeSeqRegistry(8)
    fresh.set_seq(0, seq_len, last, table)
    rows = np.asarray([0], np.int32)
    got = reg.prepare_decode(rows, 1, block_size, 8)
    want = fresh.prepare_decode(rows, 1, block_size, 8)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert reg.get(0) == (seq_len, last, len(table))


def test_registry_rejects_bad_slot():
    reg = NativeSeqRegistry(4)
    with pytest.raises(RuntimeError):
        reg.append_token(2, 5)  # not live
    reg.set_seq(2, 4, 9, [1])
    reg.clear_seq(2)
    assert reg.get(2) is None


def test_sequence_hash_of_block_memo_and_fork():
    from nmvllm_tpu.sequence import Sequence
    toks = list(range(40))
    seq = Sequence(seq_id=1, prompt=None, prompt_token_ids=toks,
                   block_size=16)
    h0 = seq.hash_of_block(0)
    h1 = seq.hash_of_block(1)
    assert h0 != h1 and h0 >= 0 and h1 >= 0
    # Memoized: repeat calls identical, chain cached.
    assert seq.hash_of_block(1) == h1
    assert seq._hash_chain == [h0, h1]
    child = seq.fork(2)
    assert child.hash_of_block(0) == h0
    # Same tokens on a fresh sequence -> same hashes (content-addressed).
    seq2 = Sequence(seq_id=3, prompt=None, prompt_token_ids=list(toks),
                    block_size=16)
    assert seq2.hash_of_block(1) == h1
    # Different lora id salts the chain.
    class _L:
        lora_int_id = 7
    seq3 = Sequence(seq_id=4, prompt=None, prompt_token_ids=list(toks),
                    block_size=16, lora_request=_L())
    assert seq3.hash_of_block(0) != h0


def _mk_runner(block_size=16, max_num_seqs=8, max_model_len=256):
    from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
    from nmvllm_tpu.parallel.mesh import build_mesh
    from nmvllm_tpu.worker.runner import ModelRunner
    cfg = EngineConfig(
        model_config=ModelConfig(model="debug-llama", dtype="float32"),
        cache_config=CacheConfig(block_size=block_size),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_model_len=max_model_len,
                                         max_num_seqs=max_num_seqs),
        device_config=DeviceConfig())
    return ModelRunner(cfg, build_mesh(1, 1))


def _mk_meta(seq_id, token_ids, table, version):
    from nmvllm_tpu.sampling_params import SamplingParams
    from nmvllm_tpu.sequence import SequenceData, SequenceGroupMetadata
    data = SequenceData(list(token_ids[:1]))
    for t in token_ids[1:]:
        data.append_token_id(int(t), 0.0)
    return SequenceGroupMetadata(
        request_id=f"r{seq_id}", is_prompt=False,
        seq_data={seq_id: data}, sampling_params=SamplingParams(),
        block_tables={seq_id: list(table)},
        table_versions={seq_id: version})


def test_runner_native_path_matches_python_path():
    runner = _mk_runner()
    bs = runner.block_size
    rng = np.random.default_rng(2)

    def build_metas(step):
        metas = []
        for sid in range(3):
            n_tok = 5 + sid * 7 + step
            toks = rng.integers(0, 1000, n_tok).tolist()
            n_blocks = -(-n_tok // bs)
            table = list(range(10 * sid, 10 * sid + n_blocks))
            metas.append(_mk_meta(sid, toks, table, version=1))
        return metas

    # Native path (default).
    assert runner._native_registry() is not None
    outs_native = [runner.prepare_decode(build_metas(s)) for s in range(3)]
    # Python path: fresh runner with native disabled.
    runner_py = _mk_runner()
    runner_py._native_reg = False
    rng = np.random.default_rng(2)  # replay the same metas
    outs_py = [runner_py.prepare_decode(build_metas(s)) for s in range(3)]
    for a, b in zip(outs_native, outs_py):
        np.testing.assert_array_equal(a.tokens, b.tokens)
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.slot_mapping, b.slot_mapping)
        np.testing.assert_array_equal(a.block_tables, b.block_tables)
        np.testing.assert_array_equal(a.context_lens, b.context_lens)


def test_runner_native_resync_on_version_bump():
    runner = _mk_runner()
    bs = runner.block_size
    toks = list(range(bs + 1))
    table = [4, 9]
    m1 = _mk_meta(0, toks, table, version=1)
    p1 = runner.prepare_decode([m1])
    assert p1.slot_mapping[0, 0] == 9 * bs + 0
    # Swap-style table replacement WITHOUT length change: version bump
    # must force a resync (this is what plain length tracking misses).
    new_table = [40, 90]
    m2 = _mk_meta(0, toks, new_table, version=2)
    p2 = runner.prepare_decode([m2])
    assert p2.slot_mapping[0, 0] == 90 * bs + 0
    np.testing.assert_array_equal(p2.block_tables[0, :2], [40, 90])
