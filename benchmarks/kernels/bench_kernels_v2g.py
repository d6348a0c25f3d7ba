"""TPU round 7: isolate the ~1ms fixed cost in quant_matmul at M=32,
and validate the flat cache-write scatter fix."""
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


def main():
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.quant_matmul import (_quant_matmul_w4_paired,
                                             pack_weights, quant_matmul)
    print("devices:", jax.devices())
    reps = 20
    M, G = 32, 128

    # 1. flat cache-write scatter
    from nmvllm_tpu.ops.cache_ops import write_to_kv_cache
    B, H, bs, d = 32, 8, 32, 128
    kv = jnp.zeros((1100, 2, H, bs, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(0), (B, H, d), jnp.bfloat16)
    v = k + 1
    slots = jnp.asarray(np.arange(B) * 997 % (1100 * bs), jnp.int32)

    @jax.jit
    def many_w(kv, k):
        def body(i, carry):
            kv, k = carry
            kv2 = write_to_kv_cache(kv, k, v, slots + i)
            return (kv2, k + kv2[0, 0, :, 0, :] * jnp.bfloat16(1e-8))
        return jax.lax.fori_loop(0, reps, body, (kv, k))

    dt = timed(many_w, kv, k) / reps
    print(f"write_to_kv_cache(flat): {dt*1e6:.1f} us "
          f"(x32 = {dt*32*1e3:.2f} ms/step)")

    # 2. quant variants at K=4096 N=4096
    for K, N in ((4096, 4096), (4096, 28672)):
        rng = np.random.default_rng(0)
        w_int = rng.integers(0, 16, (K, N)).astype(np.int32)
        qw = pack_weights(jnp.asarray(w_int), 4, G)
        s = jnp.full((K // G, N), 1e-3, jnp.float32)
        z = jnp.full((K // G, N), 8, jnp.int32)
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)

        def chain(xx, y):
            kk = min(K, N)
            return xx.at[:, :kk].add(
                y[:, :kk].astype(jnp.bfloat16) * jnp.bfloat16(1e-8))

        @jax.jit
        def full(x):
            def body(i, xx):
                return chain(xx, quant_matmul(x, qw, s, z, bits=4,
                                              group_size=G))
            return jax.lax.fori_loop(0, reps, body, x)

        dt_full = timed(full, x) / reps

        # correction-only (the host-side XLA part)
        @jax.jit
        def corr_only(x):
            def body(i, xx):
                xf = xx.astype(jnp.float32)
                gsum = jnp.sum(xf.reshape(M, K // G, G), axis=-1)
                corr = jnp.dot(gsum, s * z.astype(jnp.float32),
                               preferred_element_type=jnp.float32)
                return chain(xx, corr)
            return jax.lax.fori_loop(0, reps, body, x)

        dt_corr = timed(corr_only, x) / reps
        print(f"K={K} N={N}: full={dt_full*1e3:.3f} ms  "
              f"corr-only={dt_corr*1e3:.3f} ms  "
              f"kernel-ish={(dt_full-dt_corr)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
