"""Host-runtime microbench: native (csrc/host/nm_host.cpp) vs Python
decode batch assembly and prefix-block hashing.

Run anywhere (no device needed): python benchmarks/host/bench_native_prep.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

from nmvllm_tpu.native import (NativeSeqRegistry, hash_block_chain,  # noqa
                               native_available)


def bench_prepare(batch=256, n_blocks=64, block_size=32, iters=200):
    rng = np.random.default_rng(0)
    states = {}
    reg = NativeSeqRegistry(batch)
    for s in range(batch):
        table = rng.integers(0, 10000, n_blocks, dtype=np.int32).tolist()
        seq_len = n_blocks * block_size - int(rng.integers(0, block_size))
        states[s] = (seq_len, int(rng.integers(0, 32000)), table)
        reg.set_seq(s, *states[s])
    rows = np.arange(batch, dtype=np.int32)

    def py_path():
        tokens = np.zeros((batch, 1), np.int32)
        positions = np.zeros((batch, 1), np.int32)
        slots = np.full((batch, 1), -1, np.int32)
        tables = np.zeros((batch, n_blocks), np.int32)
        ctx = np.zeros((batch,), np.int32)
        for i in range(batch):
            seq_len, last, table = states[i]
            pos = seq_len - 1
            tokens[i, 0] = last
            positions[i, 0] = pos
            tables[i, :len(table)] = table
            slots[i, 0] = table[pos // block_size] * block_size + \
                pos % block_size
            ctx[i] = seq_len
        return tokens, positions, slots, tables, ctx

    t0 = time.perf_counter()
    for _ in range(iters):
        py = py_path()
    t_py = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        nat = reg.prepare_decode(rows, batch, block_size, n_blocks)
    t_nat = (time.perf_counter() - t0) / iters
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)
    print({"bench": "prepare_decode", "batch": batch,
           "python_us": round(t_py * 1e6, 1),
           "native_us": round(t_nat * 1e6, 1),
           "speedup": round(t_py / t_nat, 1)})


def bench_hash(prompt_len=8192, block_size=32, iters=20):
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 32000, prompt_len, dtype=np.int32)
    toks_list = tokens.tolist()
    n_blocks = prompt_len // block_size

    def py_whole_prefix():
        # The reference pattern: hash(tuple(prefix)) per block.
        return [hash((tuple(toks_list[:(i + 1) * block_size]), 0))
                for i in range(n_blocks)]

    def native_chain():
        out, h = [], 0
        for i in range(n_blocks):
            h = hash_block_chain(
                h, tokens[i * block_size:(i + 1) * block_size])
            out.append(h)
        return out

    t0 = time.perf_counter()
    for _ in range(iters):
        py_whole_prefix()
    t_py = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        native_chain()
    t_nat = (time.perf_counter() - t0) / iters
    print({"bench": "prefix_hash", "prompt_len": prompt_len,
           "python_whole_prefix_us": round(t_py * 1e6, 1),
           "native_chain_us": round(t_nat * 1e6, 1),
           "speedup": round(t_py / t_nat, 1)})


if __name__ == "__main__":
    assert native_available(), "native library unavailable"
    bench_prepare()
    bench_hash()
