"""Sweep heads_per_dot (NMVLLM_ATTN_HPD) x pages_per_compute_block for
the decode attention kernel (ops/paged_attention.py).

Measurement discipline (docs/PERF_NOTES.md): chained on-device loop (the
output feeds the next query so XLA cannot hoist the call), control config
measured FIRST and LAST to bracket tunnel drift, everything in one
process. Each config uses a minutely different static scale so the
trace re-reads the env var (jit would otherwise reuse the first compile).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def bench_config(hpd, ppcb, *, batch, kv_heads, q_heads, head, ctx,
                 block_size, reps, idx, fused):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.paged_attention import paged_attention
    os.environ["NMVLLM_ATTN_HPD"] = str(hpd)
    rng = jax.random.PRNGKey(0)
    bpp = ctx // block_size
    nb = batch * bpp + 1
    q = jax.random.normal(rng, (batch, q_heads, head), jnp.bfloat16)
    kv = jax.random.normal(rng, (nb, 2, kv_heads, block_size, head),
                           jnp.bfloat16)
    bt = jnp.asarray(np.arange(batch * bpp).reshape(batch, bpp), jnp.int32)
    cl = jnp.full((batch,), ctx, jnp.int32)
    scale = (head ** -0.5) * (1.0 + idx * 1e-7)  # cache-busting static
    if fused:
        nk = jax.random.normal(rng, (batch, kv_heads, head), jnp.bfloat16)
        ws = jnp.asarray((np.arange(batch) * bpp + bpp - 1) * block_size
                         + (ctx - 1) % block_size, jnp.int32)

    def mk(nper, sc):
        @jax.jit
        def many(q, kv):
            def body(carry, _):
                q, kv = carry
                for _ in range(nper):
                    if fused:
                        o, kv = paged_attention(
                            q, kv, bt, cl, scale=sc,
                            pages_per_compute_block=ppcb,
                            new_k=nk, new_v=nk, write_slots=ws)
                    else:
                        o = paged_attention(q, kv, bt, cl, scale=sc,
                                            pages_per_compute_block=ppcb)
                    # Chain: output is the next query (defeats hoisting).
                    q = o.astype(q.dtype)
                return (q, kv), ()
            (q, kv), _ = jax.lax.scan(body, (q, kv), None, length=reps)
            return q, kv
        return many

    def timed(fn, q, kv):
        import numpy as _np
        q2, kv2 = fn(q, kv)
        _np.asarray(q2[:1, :1, :1])          # fence
        t0 = time.perf_counter()
        q2, kv2 = fn(q2, kv2)
        _np.asarray(q2[:1, :1, :1])
        return (time.perf_counter() - t0) / reps, kv2

    # The tunnel charges ~0.5 ms PER SCAN ITERATION regardless of body
    # (docs/PERF_NOTES.md round 3): difference two chain depths so the
    # per-call time excludes it.
    t0c = time.perf_counter()
    t1, kv = timed(mk(1, scale), q, kv)
    compile_and_run = time.perf_counter() - t0c
    t5, kv = timed(mk(5, scale * (1 + 1e-9)), q, kv)
    dt = (t5 - t1) / 4
    kv_bytes = 2 * batch * ctx * kv_heads * head * 2
    return dt, kv_bytes / dt / 1e9, compile_and_run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--kv-heads", type=int, default=8)
    p.add_argument("--q-heads", type=int, default=32)
    p.add_argument("--head", type=int, default=128)
    p.add_argument("--ctx", type=int, default=1024)
    p.add_argument("--block-size", type=int, default=32)
    p.add_argument("--reps", type=int, default=48)
    p.add_argument("--fused", action="store_true",
                   help="include the in-kernel cache write (engine path)")
    p.add_argument("--configs", default="8:16,2:16,1:16,2:32,8:16",
                   help="comma list of hpd:ppcb; repeat the first at the "
                        "end as the drift control")
    args = p.parse_args()
    results = []
    for i, tok in enumerate(args.configs.split(",")):
        hpd, ppcb = (int(x) for x in tok.split(":"))
        dt, gbps, cr = bench_config(
            hpd, ppcb, batch=args.batch, kv_heads=args.kv_heads,
            q_heads=args.q_heads, head=args.head, ctx=args.ctx,
            block_size=args.block_size, reps=args.reps, idx=i,
            fused=args.fused)
        r = {"hpd": hpd, "ppcb": ppcb, "ms": dt * 1e3,
             "GBps": round(gbps, 1), "compile_s": round(cr, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
