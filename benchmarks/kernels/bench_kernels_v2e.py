"""TPU experiment round 5: relayout-free paired dequant-GEMM.

Packing places pair partners 16 bits apart in each int32 word, so
extraction is `(w >> s) & 0x000F000F` (one masked shift per 2 weights),
then pltpu.bitcast(int32 -> int16) (probe-OK, no relayout) and
astype(bf16) (same (16,128) tile geometry, no relayout).

Variants:
  A. W4 channel-scale: flat dequant of the whole k-block, scale folded
     into the OUTPUT epilogue (outside kernel).
  B. W4 group-scale: per-group (g=128) dequant loop with in-kernel scale.
  C. W8 channel-scale: bytes at (0-7,16-23)+(8-15,24-31).
All with correctness checks vs a host reference.
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

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


# ---- packing helpers (numpy; natural (K, N) unsigned -> paired words) ----

def pair_order_w4(k):
    """Natural row order produced by the kernel's [P0;P1;P2;P3] concat
    per 8-row word group: P_m covers natural rows (8j+2m, 8j+2m+1)."""
    order = []
    words = k // 8
    for m in range(4):
        for j in range(words):
            order += [8 * j + 2 * m, 8 * j + 2 * m + 1]
    return np.asarray(order)


def pack_w4_paired(w_u, block_k):
    """(K, N) unsigned nibbles -> (K//8, N) int32; natural row 8j+2m ->
    bits [4m..4m+3], row 8j+2m+1 -> bits [16+4m..16+4m+3]. Packing is
    k-block-local only in the sense that the kernel permutes x per block;
    the packing itself is global."""
    k, n = w_u.shape
    w = w_u.astype(np.uint32)
    out = np.zeros((k // 8, n), np.uint32)
    for m in range(4):
        out |= w[2 * m::8] << (4 * m)          # A_m: rows 8j+2m
        out |= w[2 * m + 1::8] << (16 + 4 * m)  # B_m: rows 8j+2m+1
    return out.view(np.int32)


def pair_order_w8(k):
    """W8: P0 covers rows (4j, 4j+1), P1 covers (4j+2, 4j+3)."""
    order = []
    words = k // 4
    for m in range(2):
        for j in range(words):
            order += [4 * j + 2 * m, 4 * j + 2 * m + 1]
    return np.asarray(order)


def pack_w8_paired(w_u):
    k, n = w_u.shape
    w = w_u.astype(np.uint32)
    out = np.zeros((k // 4, n), np.uint32)
    out |= w[0::4]
    out |= w[1::4] << 16
    out |= w[2::4] << 8
    out |= w[3::4] << 24
    return out.view(np.int32)


def perm_blockwise(order_fn, k, bk):
    """Apply the pair order within each k-block of bk rows."""
    base = order_fn(bk)
    return np.concatenate([base + s for s in range(0, k, bk)])


# ---- kernels -------------------------------------------------------------

def w4_channel(reps):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    w_u = rng.integers(0, 16, (K, N)).astype(np.int32)
    qw = jax.numpy.asarray(pack_w4_paired(w_u, BK))
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    perm = perm_blockwise(pair_order_w4, K, BK)
    xp = x[:, perm]

    def kernel(x_ref, w_ref, o_ref, acc):
        mask = jnp.int32(0x000F000F)
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        w = w_ref[:]                           # (BK//8, BN) int32
        parts = []
        for m in range(4):
            p = jax.lax.shift_right_logical(w, jnp.int32(4 * m)) & mask
            parts.append(pltpu.bitcast(p, jnp.int16))  # (BK//4, BN)
        wd = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
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
            pl.BlockSpec((BK // 8, BN), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    # correctness: unsigned dot; zero/scale fold outside
    out = f(xp, qw)
    ref = np.asarray(x.astype(jnp.float32)) @ w_u.astype(np.float32)
    rel = np.linalg.norm(np.asarray(out) - ref) / np.linalg.norm(ref)
    print(f"  w4 channel check rel={rel:.4f}")
    assert rel < 2e-2, rel

    @jax.jit
    def many(xp):
        def body(i, xx):
            y = f(xx, qw)
            return xx + y[:, :K].astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
        return jax.lax.fori_loop(0, reps, body, xp)

    report("W4 paired channel", timed(many, xp) / reps, K * N // 2)


def w4_group(reps):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 128
    rng = np.random.default_rng(1)
    w_u = rng.integers(0, 16, (K, N)).astype(np.int32)
    scales = np.abs(rng.normal(0, 0.02, (K // G, N))).astype(np.float32) \
        + 1e-3
    qw = jnp.asarray(pack_w4_paired(w_u, G))   # pair order per group
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    perm = perm_blockwise(pair_order_w4, K, G)
    xp = x[:, perm]
    s_in = jnp.asarray(scales)
    wpg = G // 8     # word-rows per group

    def kernel(x_ref, w_ref, s_ref, o_ref, acc, deq):
        mask = jnp.int32(0x000F000F)
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        gpb = BK // G
        g0 = pl.program_id(1) * gpb

        def per_group(gi, _):
            w = w_ref[pl.ds(pl.multiple_of(gi * wpg, wpg), wpg), :]
            parts = []
            for m in range(4):
                p = jax.lax.shift_right_logical(w, jnp.int32(4 * m)) & mask
                parts.append(pltpu.bitcast(p, jnp.int16))
            wd = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
            sg = s_ref[pl.ds(g0 + gi, 1), :].astype(jnp.float32)
            deq[pl.ds(pl.multiple_of(gi * G, G), G), :] = \
                (wd.astype(jnp.float32) * sg).astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, gpb, per_group, 0, unroll=False)
        acc[:] += jnp.dot(x_ref[:], deq[:],
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
            pl.BlockSpec((BK // 8, BN), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // G, BN), lambda j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32),
                        pltpu.VMEM((BK, BN), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    out = f(xp, qw, s_in)
    sfull = np.repeat(scales, G, axis=0)
    ref = np.asarray(x.astype(jnp.float32)) @ (w_u * sfull)
    rel = np.linalg.norm(np.asarray(out) - ref) / np.linalg.norm(ref)
    print(f"  w4 group check rel={rel:.4f}")
    assert rel < 2e-2, rel

    @jax.jit
    def many(xp):
        def body(i, xx):
            y = f(xx, qw, s_in)
            return xx + y[:, :K].astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
        return jax.lax.fori_loop(0, reps, body, xp)

    report("W4 paired group", timed(many, xp) / reps, K * N // 2)


def w8_channel(reps):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    w_u = rng.integers(0, 256, (K, N)).astype(np.int32)
    qw = jnp.asarray(pack_w8_paired(w_u))
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    perm = perm_blockwise(pair_order_w8, K, BK)
    xp = x[:, perm]
    def kernel(x_ref, w_ref, o_ref, acc):
        mask = jnp.int32(0x00FF00FF)
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        w = w_ref[:]                           # (BK//4, BN)
        p0 = w & mask
        p1 = jax.lax.shift_right_logical(w, jnp.int32(8)) & mask
        wd = jnp.concatenate(
            [pltpu.bitcast(p0, jnp.int16), pltpu.bitcast(p1, jnp.int16)],
            axis=0).astype(jnp.bfloat16)
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
        ],
        out_specs=pl.BlockSpec((M, BN), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    out = f(xp, qw)
    ref = np.asarray(x.astype(jnp.float32)) @ w_u.astype(np.float32)
    rel = np.linalg.norm(np.asarray(out) - ref) / np.linalg.norm(ref)
    print(f"  w8 channel check rel={rel:.4f}")
    assert rel < 2e-2, rel

    @jax.jit
    def many(xp):
        def body(i, xx):
            y = f(xx, qw)
            return xx + y[:, :K].astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
        return jax.lax.fori_loop(0, reps, body, xp)

    report("W8 paired channel", timed(many, xp) / reps, K * N)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    import jax
    print("devices:", jax.devices())
    for fn in (w4_channel, w4_group, w8_channel):
        try:
            fn(args.reps)
        except Exception as e:
            print(f"{fn.__name__} FAILED: {type(e).__name__}: "
                  f"{str(e)[:400]}")


if __name__ == "__main__":
    main()
