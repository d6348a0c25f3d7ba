"""W4 (INT4 weight-only) dequant-GEMM kernel microbench — the VERDICT
round-2 weight-stream roofline table (docs/PERF_NOTES.md).

Measures the EXACT production variants at Llama-3-8B decode shapes:
  qkv    : K=4096, N=6144  (fused q/k/v, rmsnorm prologue)
  o_proj : K=4096, N=4096  (plain)
  gate_up: K=4096, N=28672 (fused gate/up, rmsnorm prologue)
  down   : K=14336, N=4096 (silu_mul prologue over the (M, 2I) gate_up
           output — production feeds the fused gate_up activation)

Effective bandwidth = weight-stream bytes (packed int4 + scales + zeros)
per call / time.  Roofline: the kernel is weight-bandwidth-bound at
decode M, so GB/s / 819 is the % of speed-of-light on v5e.

Discipline (docs/PERF_NOTES.md): one TPU process, chained on-device scan
(output feeds back into x's first column so XLA cannot hoist), timing
fenced by a one-element device_get, first config repeated last as drift
control.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def bench_case(name, m, k, n, prologue, reps, idx, block_n=0, block_k=0):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.quant_matmul import (quant_matmul,
                                             quantize_weights_to_packed)
    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (n, k), jnp.float32) * 0.02
    qw, s, z = quantize_weights_to_packed(w, 4, 128, symmetric=False)
    x = jax.random.normal(rng, (m, k), jnp.bfloat16)
    if prologue == "rmsnorm":
        aux = jnp.ones((k,), jnp.bfloat16)
    elif prologue == "silu_mul":
        # Production: x is the gate activation, aux the up partner.
        aux = jax.random.normal(rng, (m, k), jnp.bfloat16)
    else:
        aux = None
    eps = 1e-6 * (1.0 + idx * 1e-9)   # cache-busting static

    def mk(nper, e):
        @jax.jit
        def many(x):
            def body(x, _):
                for _ in range(nper):
                    y = quant_matmul(x, qw, s, z, bits=4, group_size=128,
                                     block_n=block_n, block_k=block_k,
                                     prologue=prologue, aux=aux, eps=e)
                    # Chain one output column back into x (defeats hoist).
                    upd = (y[:, :1] * jnp.bfloat16(1e-6)).astype(x.dtype)
                    x = x.at[:, :1].add(upd)
                return x, ()
            x, _ = jax.lax.scan(body, x, None, length=reps)
            return x
        return many

    def timed(fn, x):
        out = fn(x)
        np.asarray(out[:1, :1])       # fence (device_get)
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out[:1, :1])
        return (time.perf_counter() - t0) / reps

    # The tunnel charges ~0.5 ms PER SCAN ITERATION regardless of body
    # (docs/PERF_NOTES.md round 3) — difference two chain depths so the
    # per-call time excludes it. Depth 9 keeps the delta well above the
    # tunnel's run-to-run noise for small shapes.
    t1 = timed(mk(1, eps), x)
    t9 = timed(mk(9, eps * (1 + 1e-9)), x)
    t1b = timed(mk(1, eps * (1 + 2e-9)), x)   # drift-bracketed baseline
    dt = (t9 - (t1 + t1b) / 2) / 8
    wbytes = k * n // 2 + (k // 128) * n * (4 + 4)   # int4 + f32 s/z
    return {"case": name, "m": m, "K": k, "N": n, "prologue": prologue,
            "bn": block_n, "bk": block_k,
            "ms": round(dt * 1e3, 4), "GBps": round(wbytes / dt / 1e9, 1),
            "pct_of_819": round(100 * wbytes / dt / 1e9 / 819, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=56)
    p.add_argument("--reps", type=int, default=64)
    p.add_argument("--sweep", action="store_true",
                   help="block_n x block_k sweep at the qkv shape")
    args = p.parse_args()
    m = args.m
    if args.sweep:
        for bn in (256, 512, 1024, 2048):
            for bk in (1024, 2048, 4096):
                r = bench_case("qkv", m, 4096, 6144, "rmsnorm",
                               args.reps, bn * 13 + bk, bn, bk)
                print(json.dumps(r), flush=True)
        return
    cases = [
        ("qkv", m, 4096, 6144, "rmsnorm"),
        ("o_proj", m, 4096, 4096, None),
        ("gate_up", m, 4096, 28672, "rmsnorm"),
        ("down", m, 14336, 4096, "silu_mul"),
        ("qkv", m, 4096, 6144, "rmsnorm"),       # drift control
    ]
    results = []
    for i, (name, mm, k, n, pro) in enumerate(cases):
        r = bench_case(name, mm, k, n, pro, args.reps, i)
        results.append(r)
        print(json.dumps(r), flush=True)
    tot_ms = sum(r["ms"] for r in results[:-1])
    print(json.dumps({"total_layer_ms_x32": round(tot_ms * 32, 2),
                      "all": results}))


if __name__ == "__main__":
    main()
