"""LM head microbench: (56,4096) bf16 @ (128256,4096)^T + argmax.

The e2e head+argmax measured ~29 s/step (bench.py --no-head ablation);
this isolates it and compares formulations:
  nt        — jnp.dot(x, w.T) on the (V, H) weight (current layers/embedding.py)
  dg        — explicit lax.dot_general contracting dim 1 of both
  pre_t     — weight stored (H, V), plain dot
  nt_noarg  — nt without the argmax (isolate argmax cost)
  argmax    — argmax alone on a (56, V) f32 buffer
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=56)
    ap.add_argument("--h", type=int, default=4096)
    ap.add_argument("--v", type=int, default=128256)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    m, h, v = args.m, args.h, args.v

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, h)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((v, h)) * 0.01, jnp.bfloat16)
    wt = jnp.asarray(np.ascontiguousarray(
        np.asarray(w, np.float32).T), jnp.bfloat16)

    def head(mode, c):
        if mode == "pre_t":
            logits = jnp.dot(c, wt, preferred_element_type=jnp.float32)
        elif mode == "dg":
            logits = jax.lax.dot_general(
                c, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:  # nt / nt_noarg
            logits = jnp.dot(c, w.T, preferred_element_type=jnp.float32)
        if mode == "nt_noarg":
            nxt = jnp.sum(logits[:, :8], axis=-1).astype(jnp.int32) % 7
        else:
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return nxt

    @functools.partial(jax.jit, static_argnames=("mode", "iters"))
    def chain(x, mode, iters):
        def body(c, _):
            if mode == "argmax":
                logits = (c @ jnp.ones((h, v), jnp.bfloat16)
                          * jnp.bfloat16(0.0) + c[:, :1])  # cheap (m,v)
                logits = jnp.broadcast_to(c[:, :1], (m, v)).astype(
                    jnp.float32)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            else:
                nxt = head(mode, c)
            # dependence: perturb one column by the sampled id
            c2 = c.at[:, 0].add(nxt.astype(jnp.bfloat16) * 1e-6)
            return c2, None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    modes = (os.getenv("BENCH_MODES") or "nt,dg,pre_t,nt_noarg").split(",")
    for mode in modes:
        out = chain(x, mode, args.iters)
        np.asarray(out[:1])
        t0 = time.perf_counter()
        out = chain(x, mode, args.iters)
        np.asarray(out[:1])
        dt = (time.perf_counter() - t0) / args.iters
        gb = v * h * 2 / 1e9
        print({"mode": mode, "ms": round(dt * 1e3, 3),
               "GB/s": round(gb / dt, 1)})


if __name__ == "__main__":
    main()
