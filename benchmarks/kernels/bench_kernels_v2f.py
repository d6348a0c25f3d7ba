"""TPU round 6: per-component timing of the ACTUAL engine decode ops
(hunting the e2e regression: 250 -> 68 tok/s despite faster ubenches).

Measures, chained, at Llama-3-8B decode geometry (B=32):
  1. write_to_kv_cache on the fused layout (new 5-D two-index scatter)
  2. quant_matmul paired W4 at each layer shape
  3. paged_attention at engine defaults
  4. lm_head bf16 matmul (4096 x 128256)
"""
import argparse
import os
import sys
import time

import numpy as np

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


def bench_cache_write(reps):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.cache_ops import write_to_kv_cache
    B, H, bs, d = 32, 8, 32, 128
    num_blocks = 1100
    kv = jnp.zeros((num_blocks, 2, H, bs, d), jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    k = jax.random.normal(rng, (B, H, d), jnp.bfloat16)
    v = jax.random.normal(rng, (B, H, d), jnp.bfloat16)
    slots = jnp.asarray(np.arange(B) * 997 % (num_blocks * bs), jnp.int32)

    @jax.jit
    def many(kv, k):
        def body(i, carry):
            kv, k = carry
            kv2 = write_to_kv_cache(kv, k, v, slots + i)
            k2 = k + kv2[0, 0, :, 0, :] * jnp.bfloat16(1e-8)
            return (kv2, k2)
        return jax.lax.fori_loop(0, reps, body, (kv, k))

    dt = timed(many, kv, k) / reps
    print(f"write_to_kv_cache B={B}: {dt*1e6:.1f} us "
          f"(x32 layers = {dt*32*1e3:.2f} ms/step)")


def bench_quant_shapes(reps):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.quant_matmul import (pack_weights, quant_matmul)
    M, G = 32, 128
    total = 0.0
    for K, N in ((4096, 6144), (4096, 4096), (4096, 28672),
                 (14336, 4096)):
        rng = np.random.default_rng(0)
        w_int = rng.integers(0, 16, (K, N)).astype(np.int32)
        qw = pack_weights(jnp.asarray(w_int), 4, G)
        s = jnp.full((K // G, N), 1e-3, jnp.float32)
        z = jnp.full((K // G, N), 8, jnp.int32)
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)

        @jax.jit
        def many(x):
            def body(i, xx):
                y = quant_matmul(xx, qw, s, z, bits=4, group_size=G)
                kk2 = min(K, y.shape[1])
                return xx.at[:, :kk2].add(
                    y[:, :kk2].astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            return jax.lax.fori_loop(0, reps, body, x)

        dt = timed(many, x) / reps
        total += dt
        print(f"quant_matmul K={K} N={N}: {dt*1e3:.3f} ms  "
              f"{K*N//2/dt/1e9:.0f} GB/s")
    print(f"linears/layer total: {total*1e3:.3f} ms "
          f"(x32 = {total*32*1e3:.1f} ms/step)")


def bench_attention(reps):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.paged_attention import paged_attention
    B, Hq, Hkv, d, ctx, bs = 32, 32, 8, 128, 1024, 32
    bpp = ctx // bs
    kv = jax.random.normal(jax.random.PRNGKey(0),
                           (B * bpp + 1, 2, Hkv, bs, d), jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, Hq, d), jnp.bfloat16)
    bt = jnp.arange(B * bpp, dtype=jnp.int32).reshape(B, bpp)
    cl = jnp.full((B,), ctx, jnp.int32)

    @jax.jit
    def many(q):
        def body(i, qq):
            o = paged_attention(qq, kv, bt, cl, scale=d**-0.5)
            return qq + o * jnp.bfloat16(1e-8)
        return jax.lax.fori_loop(0, reps, body, q)

    dt = timed(many, q) / reps
    print(f"paged_attention (defaults): {dt*1e3:.3f} ms/layer "
          f"(x32 = {dt*32*1e3:.1f} ms/step)")


def bench_lm_head(reps):
    import jax
    import jax.numpy as jnp
    M, K, V = 32, 4096, 128256
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, V), jnp.bfloat16)

    @jax.jit
    def many(x):
        def body(i, xx):
            y = jnp.dot(xx, w, preferred_element_type=jnp.float32)
            return xx + y[:, :K].astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
        return jax.lax.fori_loop(0, reps, body, x)

    dt = timed(many, x) / reps
    print(f"lm_head bf16: {dt*1e3:.3f} ms  {K*V*2/dt/1e9:.0f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    import jax
    print("devices:", jax.devices())
    for fn in (bench_cache_write, bench_quant_shapes, bench_attention,
               bench_lm_head):
        try:
            fn(args.reps)
        except Exception as e:
            print(f"{fn.__name__} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
