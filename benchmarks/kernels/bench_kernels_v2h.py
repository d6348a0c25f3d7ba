"""TPU round 8: decompose the correction-path cost + Pallas cache write.

v2g: corr-only (gsum + s*z + tiny dot + chain) = 1.7 ms at N=28672 —
find which op; and scatter-based cache write serializes per index (661us)
— try a Pallas per-token DMA writer with input/output aliasing.
"""
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


def corr_pieces(reps):
    import jax
    import jax.numpy as jnp
    M, K, N, G = 32, 4096, 28672, 128
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    s = jnp.full((K // G, N), 1e-3, jnp.float32)
    z = jnp.full((K // G, N), 8, jnp.int32)

    def chain(xx, y):
        kk = min(K, y.shape[1])
        return xx.at[:, :kk].add(y[:, :kk].astype(jnp.bfloat16) *
                                 jnp.bfloat16(1e-8))

    variants = {}

    def v_gsum(xx):
        xf = xx.astype(jnp.float32)
        g = jnp.sum(xf.reshape(M, K // G, G), axis=-1)
        return jnp.pad(g, ((0, 0), (0, K - K // G)))
    variants["gsum"] = v_gsum

    sz = None

    def v_sz(xx):
        return (s * z.astype(jnp.float32))[:, :K] * xx[0, 0]
    variants["s*z (sliced)"] = v_sz

    def v_dot(xx):
        gsum = xx[:, :K // G].astype(jnp.float32)
        return jnp.dot(gsum, s * z.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    variants["dot+s*z (N out)"] = v_dot

    def v_dot_pre(xx):
        gsum = xx[:, :K // G].astype(jnp.float32)
        return jnp.dot(gsum, s, preferred_element_type=jnp.float32)
    variants["dot only (N out)"] = v_dot_pre

    for name, fn in variants.items():
        @jax.jit
        def many(xx, fn=fn):
            def body(i, acc):
                return chain(acc, fn(acc))
            return jax.lax.fori_loop(0, reps, body, xx)
        dt = timed(many, x) / reps
        print(f"corr piece [{name}]: {dt*1e3:.3f} ms")


def pallas_cache_write(reps):
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, bs, d = 32, 8, 32, 128
    nb = 1100
    kv = jnp.zeros((nb, 2, H, bs, d), jnp.bfloat16)
    key = jax.random.normal(jax.random.PRNGKey(0), (B, H, d), jnp.bfloat16)
    val = key + 1
    slots = jnp.asarray(np.arange(B) * 997 % (nb * bs), jnp.int32)

    def kernel(slots_ref, k_ref, v_ref, kv_hbm, kv_out, sem):
        t = pl.program_id(0)
        slot = slots_ref[t]
        block = slot // bs
        off = slot % bs
        cp1 = pltpu.make_async_copy(
            k_ref.at[t], kv_out.at[block, 0, :, off], sem)
        cp1.start()
        cp1.wait()
        cp2 = pltpu.make_async_copy(
            v_ref.at[t], kv_out.at[block, 1, :, off], sem)
        cp2.start()
        cp2.wait()

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct(kv.shape, kv.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    out = f(slots, key, val, kv)
    got = np.asarray(out[slots[3] // bs, 0, :, slots[3] % bs])
    np.testing.assert_allclose(got, np.asarray(key[3]), atol=1e-2)
    print("  pallas write check OK")

    @jax.jit
    def many(kv, k):
        def body(i, carry):
            kv, k = carry
            kv2 = f(slots + i, k, val, kv)
            return (kv2, k + kv2[0, 0, :, 0, :] * jnp.bfloat16(1e-8))
        return jax.lax.fori_loop(0, reps, body, (kv, k))

    dt = timed(many, kv, key) / reps
    print(f"pallas cache write: {dt*1e6:.1f} us "
          f"(x32 = {dt*32*1e3:.2f} ms/step)")


def int16_sub_probe():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    x16 = jnp.arange(16 * 256, dtype=jnp.int16).reshape(16, 256)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] - jnp.int16(8)

    try:
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, 256), jnp.int16),
        )
        jax.block_until_ready(f(x16))
        print("PROBE i16 subtract: OK")
    except Exception as e:
        print(f"PROBE i16 subtract: FAIL {str(e)[:200]}")


def main():
    import jax
    print("devices:", jax.devices())
    int16_sub_probe()
    try:
        pallas_cache_write(20)
    except Exception as e:
        print(f"pallas_cache_write FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}")
    corr_pieces(20)


if __name__ == "__main__":
    main()
