"""TPU experiment round 4: diagnose int16 ops + per-grid-step overhead.

1. Minimal Mosaic probes: int16 shifts, int16->bf16 convert, sublane
   concat — print FULL compile errors.
2. Per-step overhead: bf16 dense with varying grid-step counts.
3. If int16 works: W4 full-K-block kernel (28 grid steps total).
"""
import argparse
import os
import sys
import time
import traceback

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


def probe(name, fn):
    try:
        fn()
        print(f"PROBE {name}: OK")
        return True
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:600]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}")
        return False


def probes():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x16 = jnp.arange(16 * 256, dtype=jnp.int16).reshape(16, 256)

    def mk(body):
        def kernel(x_ref, o_ref):
            o_ref[:] = body(x_ref[:])
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, 256), jnp.int16),
        )

    probe("i16-shift-left", lambda: jax.block_until_ready(
        mk(lambda w: jax.lax.shift_left(w, jnp.int16(8)))(x16)))
    probe("i16-shift-right-arith", lambda: jax.block_until_ready(
        mk(lambda w: jax.lax.shift_right_arithmetic(w, jnp.int16(8)))(x16)))

    def mk_out(body, shape, dtype):
        def kernel(x_ref, o_ref):
            o_ref[:] = body(x_ref[:])
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )

    probe("i16->bf16 astype", lambda: jax.block_until_ready(
        mk_out(lambda w: w.astype(jnp.bfloat16), (16, 256),
               jnp.bfloat16)(x16)))
    probe("i16 concat sublane", lambda: jax.block_until_ready(
        mk_out(lambda w: jnp.concatenate([w, w], axis=0), (32, 256),
               jnp.int16)(x16)))
    probe("i16 full: shifts+concat+cvt", lambda: jax.block_until_ready(
        mk_out(lambda w: jnp.concatenate(
            [jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(w, jnp.int16(8)), jnp.int16(8)),
             jax.lax.shift_right_arithmetic(w, jnp.int16(8))],
            axis=0).astype(jnp.bfloat16), (32, 256), jnp.bfloat16)(x16)))
    # int32-domain alternative (known-good ops) -> bitcast to int16?
    x32 = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
    probe("i32->i16 bitcast", lambda: jax.block_until_ready(
        mk_out(lambda w: pltpu.bitcast(w, jnp.int16), (16, 256),
               jnp.int16)(x32)))
    probe("i32->bf16 bitcast", lambda: jax.block_until_ready(
        mk_out(lambda w: pltpu.bitcast(w, jnp.bfloat16), (16, 256),
               jnp.bfloat16)(x32)))


def bench_step_overhead(reps):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    M, K, N = 64, 4096, 28672
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (M, K), jnp.bfloat16)
    w = jax.random.normal(rng, (K, N), jnp.bfloat16)

    def run(bn, bk):
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
            grid=(N // bn, K // bk),
            in_specs=[
                pl.BlockSpec((M, bk), lambda j, kk: (0, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda j, kk: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

        @jax.jit
        def many(x):
            def body(i, xx):
                y = f(xx, w)
                return xx + y[:, :K].astype(jnp.bfloat16) * \
                    jnp.bfloat16(1e-8)
            return jax.lax.fori_loop(0, reps, body, x)

        dt = timed(many, x) / reps
        steps = (N // bn) * (K // bk)
        print(f"bf16 bn={bn} bk={bk}: {dt*1e3:.3f} ms  ({steps} steps, "
              f"{dt/steps*1e6:.1f} us/step)  {K*N*2/dt/1e9:.0f} GB/s")

    run(512, 2048)    # 224 steps
    run(1024, 1024)   # 112 steps (different aspect)
    run(2048, 512)    # 112 steps, wide n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--probes", action="store_true")
    ap.add_argument("--steps", action="store_true")
    args = ap.parse_args()
    import jax
    print("devices:", jax.devices())
    if args.probes:
        probes()
    if args.steps:
        bench_step_overhead(args.reps)


if __name__ == "__main__":
    main()
