"""Per-component decode-step microbenchmarks (reference:
benchmarks/kernels/benchmark_{marlin,paged_attention}.py).

Times each hot op of the Llama-3-8B INT4 decode step in isolation with
on-device repeat loops (lax.scan / fori) so tunnel dispatch overhead is
amortized, and reports achieved HBM bandwidth vs peak.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), *([".."] * (2))))
import json
import time

import numpy as np


def timed(fn, *args, iters=3):
    out = fn(*args)
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_quant_matmul(m, k, n, reps, bits=4, g=128):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.quant_matmul import quant_matmul
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (m, k), jnp.bfloat16)
    vpw = 32 // bits
    qw = jax.random.randint(rng, (k // vpw, n), -2**31, 2**31 - 1,
                            jnp.int32)
    scales = jnp.full((k // g, n), 1e-3, jnp.float32)
    zeros = jnp.full((k // g, n), 8, jnp.int32)

    @jax.jit
    def many(x):
        def body(i, acc):
            y = quant_matmul(x, qw, scales, zeros, bits=bits, group_size=g)
            return acc + y[0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    dt = timed(many, x) / reps
    bytes_w = k * n * bits // 8 + (k // g) * n * 8
    return dt, bytes_w / dt / 1e9


def bench_paged_attention(batch, kv_heads, q_heads, head, ctx, block_size,
                          reps, num_layers_equiv=1):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.paged_attention import paged_attention
    rng = jax.random.PRNGKey(0)
    bpp = ctx // block_size
    nb = batch * bpp + 1
    q = jax.random.normal(rng, (batch, q_heads, head), jnp.bfloat16)
    kc = jax.random.normal(rng, (kv_heads, nb, block_size, head),
                           jnp.bfloat16)
    vc = jax.random.normal(rng, (kv_heads, nb, block_size, head),
                           jnp.bfloat16)
    bt = jnp.asarray(np.arange(batch * bpp).reshape(batch, bpp), jnp.int32)
    cl = jnp.full((batch,), ctx, jnp.int32)

    @jax.jit
    def many(q):
        def body(i, acc):
            o = paged_attention(q, kc, vc, bt, cl, scale=0.088)
            return acc + o[0, 0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    dt = timed(many, q) / reps
    kv_bytes = 2 * batch * ctx * kv_heads * head * 2
    return dt, kv_bytes / dt / 1e9


def bench_dense_matmul(m, k, n, reps):
    import jax
    import jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (m, k), jnp.bfloat16)
    w = jax.random.normal(rng, (k, n), jnp.bfloat16)

    @jax.jit
    def many(x):
        def body(i, acc):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return acc + y[0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    dt = timed(many, x) / reps
    return dt, (k * n * 2) / dt / 1e9


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--reps", type=int, default=32)
    args = parser.parse_args()
    b, reps = args.batch, args.reps
    results = {}

    for name, (k, n) in {
            "qkv+o (4096->6144)": (4096, 6144),
            "mlp up (4096->28672)": (4096, 28672),
            "mlp down (14336->4096)": (14336, 4096)}.items():
        dt, bw = bench_quant_matmul(b, k, n, reps)
        results[f"quant_matmul {name}"] = {
            "ms": round(dt * 1e3, 3), "GB/s": round(bw, 1)}

    dt, bw = bench_paged_attention(b, 8, 32, 128, 1024, 16, reps)
    results["paged_attention b32 ctx1024 bs16"] = {
        "ms": round(dt * 1e3, 3), "GB/s": round(bw, 1)}
    dt, bw = bench_paged_attention(b, 8, 32, 128, 1024, 32, reps)
    results["paged_attention b32 ctx1024 bs32"] = {
        "ms": round(dt * 1e3, 3), "GB/s": round(bw, 1)}

    dt, bw = bench_dense_matmul(b, 4096, 128256, max(reps // 4, 4))
    results["lm_head dense bf16"] = {
        "ms": round(dt * 1e3, 3), "GB/s": round(bw, 1)}

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
