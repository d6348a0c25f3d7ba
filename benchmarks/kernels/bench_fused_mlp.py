"""Microbench: fused_mlp_w4 vs the production two-call path, chained.

Decode geometry (m=64, K=4096, I=14336, g=128). Chained on-device loop
(CSE-proof: output feeds the next iteration's input) per
docs/PERF_NOTES.md measurement discipline.
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])


def timed(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][:1])
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.fused_mlp import fused_mlp_w4
    from nmvllm_tpu.ops.quant_matmul import (pack_weights,
                                             quant_matmul)

    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--i", type=int, default=14336)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--block-n", type=int, default=512)
    ap.add_argument("--shard", action="store_true",
                    help="wrap the chain in shard_map on a (1,1) mesh "
                         "(isolates the e2e slowdown context)")
    args = ap.parse_args()
    m, k, i, g = args.m, args.k, args.i, args.g

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    nw = jnp.asarray(rng.standard_normal((k,)), jnp.float32)

    def mk(kk, nn):
        w = rng.integers(0, 16, (kk, nn), dtype=np.int32)
        qw = pack_weights(jnp.asarray(w), 4, g)
        s = jnp.asarray(rng.standard_normal((kk // g, nn)) * 0.01,
                        jnp.float32)
        z = jnp.full((kk // g, nn), 8, jnp.int32)
        return qw, s, z

    gu_qw, gu_s, gu_z = mk(k, 2 * i)
    d_qw, d_s, d_z = mk(i, k)

    def body_of(mode):
        def body(c, _):
            if mode == "fused":
                y = fused_mlp_w4(c, nw, gu_qw, gu_s, gu_z, d_qw, d_s, d_z,
                                 group_size=g, block_n=args.block_n)
            elif mode == "prologue":
                # The model's actual MLP path (models/llama.py): rmsnorm
                # fused into gate_up, silu_mul fused into down.
                gu = quant_matmul(c, gu_qw, gu_s, gu_z, bits=4,
                                  group_size=g, prologue="rmsnorm", aux=nw)
                y = quant_matmul(gu[:, :i], d_qw, d_s, d_z, bits=4,
                                 group_size=g, prologue="silu_mul",
                                 aux=gu[:, i:])
            elif mode == "plain1":
                # One plain (no-prologue) paired-W4 call, N=2I.
                y = quant_matmul(c, gu_qw, gu_s, gu_z, bits=4,
                                 group_size=g)[:, :k]
            elif mode == "gate_rms":
                # One rmsnorm-prologue call, K=4096 N=2I (bk == K).
                y = quant_matmul(c, gu_qw, gu_s, gu_z, bits=4,
                                 group_size=g, prologue="rmsnorm",
                                 aux=nw)[:, :k]
            elif mode == "down_only":
                # One plain call at the down geometry, K=I N=4096.
                a = jnp.concatenate([c] * (-(-i // k)), axis=1)[:, :i]
                y = quant_matmul(a, d_qw, d_s, d_z, bits=4, group_size=g)
            elif mode == "down_silu":
                # One silu_mul-prologue call at the down geometry.
                a = jnp.concatenate([c] * (-(-i // k)), axis=1)[:, :i]
                y = quant_matmul(a, d_qw, d_s, d_z, bits=4, group_size=g,
                                 prologue="silu_mul", aux=a)
            else:
                from nmvllm_tpu.ops.quant_matmul import apply_prologue_jnp
                h = apply_prologue_jnp("rmsnorm", c, nw, 1e-6)
                gu = quant_matmul(h, gu_qw, gu_s, gu_z, bits=4,
                                  group_size=g)
                a = apply_prologue_jnp("silu_mul", gu[:, :i], gu[:, i:],
                                       1e-6)
                y = quant_matmul(a, d_qw, d_s, d_z, bits=4, group_size=g)
            # feed back (keep magnitude bounded)
            return (y.astype(jnp.bfloat16) * jnp.bfloat16(1e-3) + c), None
        return body

    @functools.partial(jax.jit, static_argnames=("iters", "mode"))
    def chain(x, iters, mode):
        def run(x):
            c, _ = jax.lax.scan(body_of(mode), x, None, length=iters)
            return c
        if args.shard:
            from jax.sharding import PartitionSpec as P
            from nmvllm_tpu.parallel.mesh import build_mesh
            from nmvllm_tpu.worker.runner import shard_map_fn
            return shard_map_fn(run, build_mesh(1, 1), in_specs=(P(),),
                                out_specs=P())(x)
        return run(x)

    import os
    modes = tuple((os.getenv("BENCH_MODES") or "twocall,fused").split(","))
    dump = os.getenv("BENCH_DUMP_HLO")
    for mode in modes:
        if dump:
            lowered = chain.lower(x, args.iters, mode)
            compiled = lowered.compile()
            path = f"{dump}.{mode}.hlo"
            with open(path, "w") as f:
                f.write(compiled.as_text())
            stats = compiled.cost_analysis()
            if isinstance(stats, list):
                stats = stats[0]
            print({"mode": mode, "hlo": path,
                   "bytes": stats.get("bytes accessed"),
                   "flops": stats.get("flops"),
                   "transcendentals": stats.get("transcendentals")})
            continue
        dt = timed(lambda xx: chain(xx, args.iters, mode), x,
                   iters=args.iters)
        gb = (2 * i * k // 2 + i * k // 2) / 1e9
        print({"mode": mode, "ms": round(dt * 1e3, 3),
               "GB/s": round(gb / dt, 1)})


if __name__ == "__main__":
    main()
