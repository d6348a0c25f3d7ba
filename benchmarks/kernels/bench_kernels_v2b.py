"""TPU experiment round 2: superblock scaling + int8 dot isolation.

Findings from round 1 (bench_kernels_v2.py): attention time tracks the
inner-iteration count (~5us/superblock), not DMA count; int8-channel GEMM
mysteriously matches the XLA int8 time (1.23 ms) instead of the raw-dot
roofline. This script isolates both.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def timed(fn, *args, iters=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_attention(batch, kv_heads, q_heads, head, ctx, block_size,
                    ppcb, reps):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.paged_attention import paged_attention
    rng = jax.random.PRNGKey(0)
    bpp = ctx // block_size
    num_blocks = batch * bpp + 1
    q = jax.random.normal(rng, (batch, q_heads, head), jnp.bfloat16)
    kv = jax.random.normal(
        rng, (num_blocks, 2, kv_heads, block_size, head), jnp.bfloat16)
    bt = jnp.arange(batch * bpp, dtype=jnp.int32).reshape(batch, bpp)
    cl = jnp.full((batch,), ctx, jnp.int32)
    scale = head**-0.5

    @jax.jit
    def many(q):
        def body(i, qq):
            o = paged_attention(qq, kv, bt, cl, scale=scale,
                                pages_per_compute_block=ppcb)
            return qq + o * jnp.bfloat16(1e-8)
        return jax.lax.fori_loop(0, reps, body, q)

    dt = timed(many, q) / reps
    kv_bytes = batch * ctx * kv_heads * head * 2 * 2
    iters = batch * max(1, bpp // ppcb)
    print(f"attn  bs={block_size} ppcb={ppcb}: {dt*1e3:.3f} ms/layer  "
          f"{kv_bytes/dt/1e9:.0f} GB/s  ({iters} inner iters)")
    return dt


def bench_int8_variants(reps):
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = jax.random.PRNGKey(1)
    m, k, n = 64, 4096, 28672
    w8 = jax.random.randint(rng, (k, n), -127, 128, jnp.int32).astype(
        jnp.int8)
    xq0 = jax.random.randint(rng, (m, k), -127, 128, jnp.int32).astype(
        jnp.int8)

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def raw_int8(bn):
        f = pl.pallas_call(
            kernel,
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((m, k), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        )
        return f

    for bn in (1024, 2048):
        f = raw_int8(bn)

        @jax.jit
        def many(xq):
            def body(i, xx):
                y = f(xx, w8)
                # chain via int8 xor of a value-dependent zero
                z = (y[:, :k] > jnp.int32(2**30)).astype(jnp.int8)
                return xx ^ z
            return jax.lax.fori_loop(0, reps, body, xq)

        dt = timed(many, xq0) / reps
        print(f"raw-int8 dot bn={bn}: {dt*1e3:.3f} ms  "
              f"{k*n/dt/1e9:.0f} GB/s  {2*m*k*n/dt/1e12:.1f} TFLOP/s")

    # XLA int8 dot for comparison (same chain).
    @jax.jit
    def many_xla(xq):
        def body(i, xx):
            y = jax.lax.dot_general(xx, w8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            z = (y[:, :k] > jnp.int32(2**30)).astype(jnp.int8)
            return xx ^ z
        return jax.lax.fori_loop(0, reps, body, xq)

    dt = timed(many_xla, xq0) / reps
    print(f"xla-int8 dot: {dt*1e3:.3f} ms  {k*n/dt/1e9:.0f} GB/s")

    # Full int8_channel_matmul with bf16 input (quant included), m=64.
    from nmvllm_tpu.ops.quant_matmul import int8_channel_matmul
    x = jax.random.normal(rng, (m, k), jnp.bfloat16)
    ch = jnp.full((n,), 1e-3, jnp.float32)

    @jax.jit
    def many_full(x):
        def body(i, xx):
            y = int8_channel_matmul(xx, w8, ch)
            return xx + y[:, :k].astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
        return jax.lax.fori_loop(0, reps, body, x)

    dt = timed(many_full, x) / reps
    print(f"int8_channel_matmul m={m}: {dt*1e3:.3f} ms  "
          f"{k*n/dt/1e9:.0f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attn", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    import jax
    print("devices:", jax.devices())
    if args.attn:
        for bs, ppcb in ((32, 8), (32, 16), (32, 32)):
            bench_attention(32, 8, 32, 128, 1024, bs, ppcb, args.reps)
    if args.int8:
        bench_int8_variants(args.reps)


if __name__ == "__main__":
    main()
