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

    def head(mode, c, w, wt):
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

    # Weights must be ARGUMENTS (closed-over 1 GB literals break the
    # remote-compile tunnel; docs/PERF_NOTES.md).
    @functools.partial(jax.jit, static_argnames=("mode", "iters"))
    def chain(x, w, wt, mode, iters):
        def body(c, _):
            if mode == "argmax":
                logits = jnp.broadcast_to(c[:, :1], (m, v)).astype(
                    jnp.float32)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            else:
                nxt = head(mode, c, w, wt)
            # dependence: perturb one column by the sampled id
            c2 = c.at[:, 0].add(nxt.astype(jnp.bfloat16) * 1e-6)
            return c2, None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    modes = (os.getenv("BENCH_MODES") or "nt,dg,pre_t,nt_noarg").split(",")
    for mode in modes:
        out = chain(x, w, wt, mode, args.iters)
        np.asarray(out[:1])
        t0 = time.perf_counter()
        out = chain(x, w, wt, mode, args.iters)
        np.asarray(out[:1])
        dt = (time.perf_counter() - t0) / args.iters
        gb = v * h * 2 / 1e9
        print({"mode": mode, "ms": round(dt * 1e3, 3),
               "GB/s": round(gb / dt, 1)})




def minimal_loop():
    """Minimal autoregressive core: tok -> embed gather -> head dot ->
    argmax -> tok, chained in scan; with/without shard_map. Isolates the
    e2e pathology that is independent of decoder layers."""
    import functools
    import time

    import jax
    import jax.numpy as jnp

    m, h, v = 56, 4096, 128256
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((v, h)) * 0.01, jnp.bfloat16)
    tok0 = jnp.asarray(rng.integers(0, 1000, (m,)), jnp.int32)

    def body_fn(w):
        def body(tok, _):
            xe = w[tok]                      # embed gather (m, h)
            logits = jnp.dot(xe, w.T, preferred_element_type=jnp.float32)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return nxt, None
        return body

    @functools.partial(jax.jit, static_argnames=("iters", "shard"))
    def chain(tok, w, iters, shard):
        def run(tok, w):
            out, _ = jax.lax.scan(body_fn(w), tok, None, length=iters)
            return out
        if shard:
            from jax.sharding import PartitionSpec as P
            from nmvllm_tpu.parallel.mesh import build_mesh
            from nmvllm_tpu.worker.runner import shard_map_fn
            return shard_map_fn(run, build_mesh(1, 1),
                                in_specs=(P(), P()), out_specs=P())(tok, w)
        return run(tok, w)

    for shard in (False, True):
        out = chain(tok0, w, 10, shard)
        np.asarray(out[:1])
        t0 = time.perf_counter()
        out = chain(tok0, w, 10, shard)
        np.asarray(out[:1])
        dt = (time.perf_counter() - t0) / 10
        print({"mode": f"loop_shard={shard}", "ms": round(dt * 1e3, 3)})


if __name__ == "__main__":
    if os.getenv("BENCH_MINIMAL"):
        import numpy as np  # noqa
        minimal_loop()
    else:
        main()
