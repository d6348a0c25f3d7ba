"""Composition-gap analysis: per-call cost of each hot op INSIDE a
chained lax.scan, at exact bench.py decode geometry.

bench.py --profile reports ~8.4 ms/layer while the sum of component
microbenches is ~2.5 ms (docs/PERF_NOTES.md). This bench measures each
op the way the model runs it — chained in a scan, with the same
prologue/fused-write options — via a two-point slope (L calls vs L/4
calls), so per-call numbers include whatever composition overhead the
microbenches miss.

Run in ONE process per tunnel window; compare only within a window.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def timed(fn, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def slope(build, lo, hi):
    """build(n_calls) -> (fn, args); returns (per-call s, fixed s)."""
    t_lo = timed(*build(lo))
    t_hi = timed(*build(hi))
    per = (t_hi - t_lo) / (hi - lo)
    return per, t_lo - lo * per


def exp_quant_chain(b, k, n, n_calls, prologue=None):
    """Chain of paired-W4 quant matmuls: y (b,n) -> slice back to (b,k)."""
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.quant_matmul import quant_matmul
    rng = jax.random.PRNGKey(0)
    g = 128
    x = jax.random.normal(rng, (b, k), jnp.bfloat16)
    qw = jax.random.randint(rng, (k // 8, n), -2**31, 2**31 - 1, jnp.int32)
    scales = jnp.full((k // g, n), 1e-3, jnp.float32)
    zeros = jnp.full((k // g, n), 8, jnp.int32)
    aux_w = jnp.ones((k,), jnp.float32) if prologue == "rmsnorm" else None

    @jax.jit
    def many(x):
        def body(carry, _):
            kw = {}
            if prologue == "rmsnorm":
                kw = dict(prologue="rmsnorm", aux=aux_w, eps=1e-6)
            elif prologue == "silu_mul":
                kw = dict(prologue="silu_mul", aux=carry)
            y = quant_matmul(carry, qw, scales, zeros, bits=4,
                             group_size=g, **kw)
            return y[:, :k].astype(carry.dtype) * 1e-3, ()
        out, _ = jax.lax.scan(body, x, None, length=n_calls)
        return out
    return many, (x,)


def exp_attn_chain(b, kv_heads, q_heads, head, ctx, block_size, n_layers,
                   fused_write=True):
    """Per-layer attention the way the model runs it: one kv cache per
    layer, all carried through the scan, fused write enabled."""
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.paged_attention import paged_attention
    rng = jax.random.PRNGKey(0)
    bpp = ctx // block_size
    nb = b * bpp + 1
    q = jax.random.normal(rng, (b, q_heads, head), jnp.bfloat16)
    kvs = [jnp.zeros((nb, 2, kv_heads, block_size, head), jnp.bfloat16)
           for _ in range(n_layers)]
    bt = jnp.asarray(np.arange(b * bpp).reshape(b, bpp), jnp.int32)
    cl = jnp.full((b,), ctx, jnp.int32)
    nk = jax.random.normal(rng, (b, kv_heads, head), jnp.bfloat16)
    ws = jnp.asarray((np.arange(b) * bpp + bpp - 1) * block_size
                     + (ctx - 1) % block_size, jnp.int32)

    @jax.jit
    def many(q, kvs):
        def step(carry, _):
            q, kvs = carry
            new_kvs = []
            for kv in kvs:
                if fused_write:
                    o, kv = paged_attention(q, kv, bt, cl, scale=0.088,
                                            new_k=nk, new_v=nk,
                                            write_slots=ws)
                else:
                    o = paged_attention(q, kv, bt, cl, scale=0.088)
                q = q + o * 1e-6
                new_kvs.append(kv)
            return (q, new_kvs), ()
        (q, kvs), _ = jax.lax.scan(step, (q, kvs), None, length=2)
        return q, kvs
    return many, (q, kvs)


def exp_head_chain(b, hidden, vocab, n_calls):
    """lm_head dot + argmax chained (the non-layer step cost)."""
    import jax
    import jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, hidden), jnp.bfloat16)
    w = jax.random.normal(rng, (vocab, hidden), jnp.bfloat16)

    @jax.jit
    def many(x):
        def body(carry, _):
            logits = jnp.dot(carry, w.T, preferred_element_type=jnp.float32)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            return carry * (1.0 + tok[0].astype(carry.dtype) * 1e-9), ()
        out, _ = jax.lax.scan(body, x, None, length=n_calls)
        return out
    return many, (x,)


def exp_embed_sampler(b, hidden, vocab, n_calls):
    """Embed lookup + argmax-free chain: isolates embed cost."""
    import jax
    import jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (vocab, hidden), jnp.bfloat16)
    toks = jnp.zeros((b, 1), jnp.int32)

    @jax.jit
    def many(toks):
        def body(carry, _):
            x = emb[carry[:, 0]]
            nxt = (carry + jnp.max(x, axis=-1, keepdims=True)
                   .astype(jnp.int32) % 3)
            return nxt, ()
        out, _ = jax.lax.scan(body, toks, None, length=n_calls)
        return out
    return many, (toks,)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=56)
    parser.add_argument("--exp", default="all",
                        choices=["all", "quant", "attn", "head", "embed"])
    args = parser.parse_args()
    b = args.batch
    results = {}

    if args.exp in ("all", "quant"):
        for name, (k, n, pro) in {
            "gate_up+rmsnorm (4096->28672)": (4096, 28672, "rmsnorm"),
            "gate_up plain (4096->28672)": (4096, 28672, None),
            "down+silu (14336->4096)": (14336, 4096, "silu_mul"),
            "qkv+rmsnorm (4096->6144)": (4096, 6144, "rmsnorm"),
            "o plain (4096->4096)": (4096, 4096, None),
        }.items():
            per, fixed = slope(
                lambda L, k=k, n=n, pro=pro: exp_quant_chain(b, k, n, L,
                                                             pro), 8, 32)
            results[f"quant {name}"] = {
                "ms_per_call": round(per * 1e3, 3),
                "dispatch_ms": round(fixed * 1e3, 1)}

    if args.exp in ("all", "attn"):
        per, fixed = slope(
            lambda L: exp_attn_chain(b, 8, 32, 128, 1024, 32, L), 4, 16)
        results["attn fused-write per-layer"] = {
            "ms_per_call": round(per * 1e3 / 2, 3),  # scan length=2
            "dispatch_ms": round(fixed * 1e3, 1)}
        per, fixed = slope(
            lambda L: exp_attn_chain(b, 8, 32, 128, 1024, 32, L,
                                     fused_write=False), 4, 16)
        results["attn read-only per-layer"] = {
            "ms_per_call": round(per * 1e3 / 2, 3),
            "dispatch_ms": round(fixed * 1e3, 1)}

    if args.exp in ("all", "head"):
        per, fixed = slope(lambda L: exp_head_chain(b, 4096, 128256, L),
                           4, 16)
        results["lm_head+argmax"] = {
            "ms_per_call": round(per * 1e3, 3),
            "dispatch_ms": round(fixed * 1e3, 1)}

    if args.exp in ("all", "embed"):
        per, fixed = slope(lambda L: exp_embed_sampler(b, 4096, 128256, L),
                           4, 16)
        results["embed lookup"] = {
            "ms_per_call": round(per * 1e3, 3),
            "dispatch_ms": round(fixed * 1e3, 1)}

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
