"""TPU experiment round 3: relayout-free dequant via int16 containers.

Round-2 finding: Mosaic int8 dots run at ~13.7 TFLOP/s (NOT MXU speed),
and int8->bf16 astype pays a sublane relayout ((32,128) tile -> (16,128)).
Hypothesis: packing quantized weights into int16 words (tile (16,128) ==
bf16's) makes unpack (int16 shifts) + convert (int16->bf16) relayout-free,
so the dequant-GEMM runs at bf16-MXU + HBM-stream speed.

Variants (all chained loops, M=64):
  1. bf16 dense dot           — the streaming/MXU baseline (235 MB)
  2. int16-packed W8 dequant  — 2 int8 per word (117 MB)
  3. int16-packed W4 dequant  — 4 nibbles per word (59 MB)
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

M, K, N = 64, 4096, 28672
BN = 1024
BK = 2048


def timed(fn, *args, iters=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(name, dt, wbytes):
    print(f"{name}: {dt*1e3:.3f} ms  {wbytes/dt/1e9:.0f} GB/s  "
          f"{2*M*K*N/dt/1e12:.1f} TFLOP/s")


def chain(xx, y, k):
    import jax.numpy as jnp
    return xx + y[:, :k].astype(jnp.bfloat16) * jnp.bfloat16(1e-8)


def bench_bf16(reps):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (M, K), jnp.bfloat16)
    w = jax.random.normal(rng, (K, N), jnp.bfloat16)

    def kernel(x_ref, w_ref, o_ref, acc):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        acc[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[:] = acc[:]

    f = pl.pallas_call(
        kernel,
        grid=(N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((M, BK), lambda j, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    @jax.jit
    def many(x):
        def body(i, xx):
            return chain(xx, f(xx, w), K)
        return jax.lax.fori_loop(0, reps, body, x)

    report("bf16 dense", timed(many, x) / reps, K * N * 2)


def bench_int16_w8(reps):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (M, K), jnp.bfloat16)
    # w16 word t of column n = (w[2t+1,n] << 8) | (w[2t,n] & 0xFF)
    w16 = jax.random.randint(rng, (K // 2, N), -2**15, 2**15,
                             jnp.int32).astype(jnp.int16)

    def kernel(x_ref, w_ref, o_ref, acc):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        w = w_ref[:]                                   # (BK//2, BN) i16
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w, jnp.int16(8)), jnp.int16(8))
        hi = jax.lax.shift_right_arithmetic(w, jnp.int16(8))
        wd = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
        acc[:] += jnp.dot(x_ref[:], wd,
                          preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[:] = acc[:]

    f = pl.pallas_call(
        kernel,
        grid=(N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((M, BK), lambda j, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // 2, BN), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    # NOTE x should be [evens|odds]-permuted per k-block for real use; the
    # benchmark skips the (outside-kernel, one-off) permutation.
    @jax.jit
    def many(x):
        def body(i, xx):
            return chain(xx, f(xx, w16), K)
        return jax.lax.fori_loop(0, reps, body, x)

    report("int16-packed W8", timed(many, x) / reps, K * N)


def bench_int16_w4(reps, with_group_scales=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    rng = jax.random.PRNGKey(2)
    g = 128
    x = jax.random.normal(rng, (M, K), jnp.bfloat16)
    w16 = jax.random.randint(rng, (K // 4, N), -2**15, 2**15,
                             jnp.int32).astype(jnp.int16)
    scales = jnp.full((K // g, N), 1e-3, jnp.float32)

    def kernel(x_ref, w_ref, s_ref, o_ref, acc):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        w = w_ref[:]                                   # (BK//4, BN) i16
        n0 = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w, jnp.int16(12)), jnp.int16(12))
        n1 = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w, jnp.int16(8)), jnp.int16(12))
        n2 = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w, jnp.int16(4)), jnp.int16(12))
        n3 = jax.lax.shift_right_arithmetic(w, jnp.int16(12))
        wd = jnp.concatenate([n0, n1, n2, n3], axis=0).astype(jnp.bfloat16)
        if with_group_scales:
            gpb = BK // g
            kk = pl.program_id(1)
            sg = s_ref[:]                              # (BK//g, BN)
            # nibble-major row order == 4 interleaved k-strides; group
            # scaling in this layout needs a row->group map; for the
            # bench apply a single block scale (cost model only).
            wd = wd * sg[0:1, :].astype(jnp.bfloat16)
        acc[:] += jnp.dot(x_ref[:], wd,
                          preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[:] = acc[:]

    f = pl.pallas_call(
        kernel,
        grid=(N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((M, BK), lambda j, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // 4, BN), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // g, BN), lambda j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    @jax.jit
    def many(x):
        def body(i, xx):
            return chain(xx, f(xx, w16, scales), K)
        return jax.lax.fori_loop(0, reps, body, x)

    tag = "int16-packed W4" + ("+gscale" if with_group_scales else "")
    report(tag, timed(many, x) / reps, K * N // 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    import jax
    print("devices:", jax.devices())
    for fn in (bench_bf16, bench_int16_w8, bench_int16_w4):
        try:
            fn(args.reps)
        except Exception as e:
            print(f"{fn.__name__} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
    try:
        bench_int16_w4(args.reps, with_group_scales=True)
    except Exception as e:
        print(f"w4+gscale FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
