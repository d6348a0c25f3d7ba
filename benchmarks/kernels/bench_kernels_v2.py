"""TPU microbench: fused-KV paged attention v2 + int8-channel GEMM.

Run ON the TPU tunnel in ONE process (compiles are minutes each; batch all
measurements). Chained on-device loops (output feeds next input) defeat
CSE/hoisting — see docs/PERF_NOTES.md "tunnel measurement traps".

Usage:
  python benchmarks/kernels/bench_kernels_v2.py --attn --int8 [--check]
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
                    ppcb, reps, check=False):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.paged_attention import (paged_attention,
                                                paged_attention_reference)
    rng = jax.random.PRNGKey(0)
    bpp = ctx // block_size
    num_blocks = batch * bpp + 1
    q = jax.random.normal(rng, (batch, q_heads, head), jnp.bfloat16)
    kv = jax.random.normal(
        rng, (num_blocks, 2, kv_heads, block_size, head), jnp.bfloat16)
    # Distinct pages per sequence.
    bt = jnp.arange(batch * bpp, dtype=jnp.int32).reshape(batch, bpp)
    cl = jnp.full((batch,), ctx, jnp.int32)
    scale = head**-0.5

    if check:
        out = paged_attention(q, kv, bt, cl, scale=scale,
                              pages_per_compute_block=ppcb)
        ref = paged_attention_reference(q, kv, bt, cl, scale=scale)
        import numpy as np
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                    ref.astype(jnp.float32))))
        print(f"  check: max abs err vs jnp reference = {err:.4f}")
        assert err < 0.1, err

    @jax.jit
    def many(q):
        def body(i, qq):
            o = paged_attention(qq, kv, bt, cl, scale=scale,
                                pages_per_compute_block=ppcb)
            return qq + o * jnp.bfloat16(1e-8)   # chain: defeat hoisting
        return jax.lax.fori_loop(0, reps, body, q)

    dt = timed(many, q) / reps
    kv_bytes = batch * ctx * kv_heads * head * 2 * 2
    print(f"attn  bs={block_size} ppcb={ppcb} ctx={ctx} B={batch}: "
          f"{dt*1e3:.3f} ms/layer  {kv_bytes/dt/1e9:.0f} GB/s")
    return dt


def bench_int8_channel(m, k, n, reps, check=False):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.quant_matmul import int8_channel_matmul
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (m, k), jnp.bfloat16)
    w8 = jax.random.randint(rng, (k, n), -127, 128, jnp.int32).astype(
        jnp.int8)
    ch = jnp.full((n,), 1e-3, jnp.float32)

    if check:
        out = int8_channel_matmul(x, w8, ch)
        ref = (x.astype(jnp.float32) @
               (w8.astype(jnp.float32) * ch[None, :]))
        rel = float(jnp.linalg.norm(out.astype(jnp.float32) - ref) /
                    jnp.linalg.norm(ref))
        print(f"  check: rel err = {rel:.4f}")
        assert rel < 0.05, rel

    @jax.jit
    def many(x):
        def body(i, xx):
            y = int8_channel_matmul(xx, w8, ch)
            return xx + y[:, :k].astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
        return jax.lax.fori_loop(0, reps, body, x)

    dt = timed(many, x) / reps
    wbytes = k * n
    print(f"int8ch m={m} k={k} n={n}: {dt*1e3:.3f} ms  "
          f"{wbytes/dt/1e9:.0f} GB/s weight-stream  "
          f"{2*m*k*n/dt/1e12:.1f} TFLOP/s")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attn", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    import jax
    print("devices:", jax.devices())

    if args.attn:
        for bs, ppcb in ((32, 4), (64, 2), (16, 8)):
            bench_attention(args.batch, 8, 32, 128, args.ctx, bs, ppcb,
                            args.reps, check=args.check)
    if args.int8:
        bench_int8_channel(32, 4096, 28672, args.reps, check=args.check)
        bench_int8_channel(32, 4096, 6144, args.reps, check=args.check)
        bench_int8_channel(32, 14336, 4096, args.reps, check=args.check)


if __name__ == "__main__":
    main()
