"""Microbench: fused_mlp_a8p vs the production two-call A8P path.

Decode geometry (m=72, K=4096, I=14336, g=128). Chained on-device scan
(CSE-proof feedback) with interleaved rounds per the round-4
measurement discipline (docs/PERF_NOTES.md): compile both first, then
alternate timings and compare medians.
"""
import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])


def main():
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.fused_mlp import fused_mlp_a8p
    from nmvllm_tpu.ops.quant_matmul import (quant_matmul_a8p,
                                             quantize_weights_to_packed,
                                             requantize_grouped_to_a8p)

    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=72)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--i", type=int, default=14336)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--block-n", type=int, default=0)
    args = ap.parse_args()
    m, k, i, g = args.m, args.k, args.i, args.g

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    nw = jnp.asarray(rng.uniform(0.5, 1.5, (k,)), jnp.float32)

    def mk(kk, nn):
        w = jnp.asarray(rng.standard_normal((nn, kk)) * 0.02, jnp.float32)
        qw, s, z = quantize_weights_to_packed(w, 4, g)
        return requantize_grouped_to_a8p(qw, s, z, group_size=g, k=kk)

    gqw, gmult, gsc, gzms = mk(k, 2 * i)
    dqw, dmult, dsc, dzms = mk(i, k)

    def body_of(mode):
        def body(c, _):
            if mode == "fused":
                y = fused_mlp_a8p(c, nw, gqw, gmult, gsc, gzms,
                                  dqw, dmult, dsc, dzms, group_size=g,
                                  block_n=args.block_n)
                assert y is not None
            else:
                gu = quant_matmul_a8p(c, gqw, gmult, gsc, gzms,
                                      group_size=g, prologue="rmsnorm",
                                      aux=nw)
                y = quant_matmul_a8p(gu[:, :i].astype(jnp.bfloat16),
                                     dqw, dmult, dsc, dzms, group_size=g,
                                     prologue="silu_mul",
                                     aux=gu[:, i:].astype(jnp.bfloat16))
            return (y.astype(jnp.bfloat16) * jnp.bfloat16(1e-3) + c), None
        return body

    @functools.partial(jax.jit, static_argnames=("iters", "mode"))
    def chain(x, iters, mode):
        c, _ = jax.lax.scan(body_of(mode), x, None, length=iters)
        return c

    modes = ("twocall", "fused")
    for mode in modes:
        t0 = time.perf_counter()
        np.asarray(chain(x, 1, mode)[:1, :1])
        np.asarray(chain(x, args.iters, mode)[:1, :1])
        print(f"compiled {mode} in {time.perf_counter()-t0:.1f}s",
              flush=True)

    def one(mode):
        # Deep-minus-shallow delta cancels the per-dispatch tunnel RPC
        # (~30-60 ms) that otherwise swamps sub-ms kernels.
        t0 = time.perf_counter()
        np.asarray(chain(x, 1, mode)[:1, :1])
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chain(x, args.iters, mode)[:1, :1])
        b = time.perf_counter() - t0
        return max((b - a) / (args.iters - 1), 1e-9)

    samples = {mo: [] for mo in modes}
    ratios = []
    for _ in range(args.rounds):
        a = one("twocall")
        b = one("fused")
        samples["twocall"].append(a)
        samples["fused"].append(b)
        ratios.append(b / a)
    gb = (2 * i * k // 2 + i * k // 2) / 1e9
    for mo in modes:
        ts = sorted(samples[mo])
        med = ts[len(ts) // 2]
        print(json.dumps({"mode": mo, "ms_median": round(med * 1e3, 4),
                          "GBps_weights": round(gb / med, 1)}), flush=True)
    rs = sorted(ratios)
    print(json.dumps({"ratio_fused_vs_twocall_median":
                      round(rs[len(rs) // 2], 3),
                      "ratio_samples": [round(r, 3) for r in ratios]}),
          flush=True)


if __name__ == "__main__":
    main()
