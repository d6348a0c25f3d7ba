"""In-window decode component microbench (current APIs, fused KV layout).

Measures each hot op of the Llama-3-8B INT4 decode step at the exact
bench.py geometry with chained on-device fori loops, in ONE process, so
the numbers are comparable with each other and with a bench.py /
bench.py --profile run in the same tunnel window (docs/PERF_NOTES.md
measurement discipline: never compare across windows).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def timed(fn, *args, iters=3):
    import jax
    out = fn(*args)
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
        def body(i, carry):
            y = quant_matmul(carry, qw, scales, zeros, bits=bits,
                             group_size=g)
            # Chain: fold a scalar of the output back into the input so
            # XLA cannot hoist or parallelize iterations.
            return carry * (1.0 + y[0, 0].astype(carry.dtype) * 1e-9)
        return jax.lax.fori_loop(0, reps, body, x)

    dt = timed(many, x) / reps
    bytes_w = k * n * bits // 8 + (k // g) * n * 8
    return dt, bytes_w / dt / 1e9


def bench_paged_attention_fused(batch, kv_heads, q_heads, head, ctx,
                                block_size, reps, fused_write=True):
    import jax
    import jax.numpy as jnp

    from nmvllm_tpu.ops.paged_attention import paged_attention
    rng = jax.random.PRNGKey(0)
    bpp = ctx // block_size
    nb = batch * bpp + 1
    q = jax.random.normal(rng, (batch, q_heads, head), jnp.bfloat16)
    kv = jax.random.normal(rng, (nb, 2, kv_heads, block_size, head),
                           jnp.bfloat16)
    bt = jnp.asarray(np.arange(batch * bpp).reshape(batch, bpp), jnp.int32)
    cl = jnp.full((batch,), ctx, jnp.int32)
    nk = jax.random.normal(rng, (batch, kv_heads, head), jnp.bfloat16)
    ws = jnp.asarray((np.arange(batch) * bpp + bpp - 1) * block_size
                     + (ctx - 1) % block_size, jnp.int32)

    if fused_write:
        @jax.jit
        def many(q, kv):
            def body(i, carry):
                q, kv = carry
                o, kv = paged_attention(q, kv, bt, cl, scale=0.088,
                                        new_k=nk, new_v=nk,
                                        write_slots=ws)
                return q + o * 1e-6, kv
            return jax.lax.fori_loop(0, reps, body, (q, kv))
        dt = timed(many, q, kv) / reps
    else:
        @jax.jit
        def many(q):
            def body(i, qq):
                o = paged_attention(qq, kv, bt, cl, scale=0.088)
                return qq + o * 1e-6
            return jax.lax.fori_loop(0, reps, body, q)
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
        def body(i, carry):
            y = jnp.dot(carry, w, preferred_element_type=jnp.float32)
            return carry * (1.0 + y[0, 0].astype(carry.dtype) * 1e-9)
        return jax.lax.fori_loop(0, reps, body, x)

    dt = timed(many, x) / reps
    return dt, (k * n * 2) / dt / 1e9


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=56)
    parser.add_argument("--reps", type=int, default=24)
    args = parser.parse_args()
    b, reps = args.batch, args.reps
    results = {}

    shapes = {
        "qkv (4096->6144)": (4096, 6144),
        "o (4096->4096)": (4096, 4096),
        "gate_up (4096->28672)": (4096, 28672),
        "down (14336->4096)": (14336, 4096)}
    if os.environ.get("NMVLLM_BENCH_QUICK"):
        # Tunnel compiles are minutes each: one representative linear.
        shapes = {"gate_up (4096->28672)": (4096, 28672)}
    def emit(name, dt, bw):
        results[name] = {"ms": round(dt * 1e3, 3), "GB/s": round(bw, 1)}
        print(json.dumps({name: results[name]}), flush=True)

    for name, (k, n) in shapes.items():
        dt, bw = bench_quant_matmul(b, k, n, reps)
        emit(f"quant_matmul {name}", dt, bw)

    dt, bw = bench_paged_attention_fused(b, 8, 32, 128, 1024, 32, reps,
                                         fused_write=True)
    emit(f"paged_attention+write b{b} ctx1024 bs32", dt, bw)
    if not os.environ.get("NMVLLM_BENCH_QUICK"):
        dt, bw = bench_paged_attention_fused(b, 8, 32, 128, 1024, 32,
                                             reps, fused_write=False)
        emit(f"paged_attention(ro) b{b} ctx1024 bs32", dt, bw)

    dt, bw = bench_dense_matmul(b, 4096, 128256, max(reps // 4, 4))
    emit("lm_head dense bf16", dt, bw)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
