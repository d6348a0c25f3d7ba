"""Flash-prefill variant hunt (round 5, VERDICT r4 item 8).

The production kernel microbenches at ~15 TF/s at T=2048 (~8% of bf16
peak) while its MXU+VPU floor models to ~100 TF/s — something
structural is 6x off. Variants (B=1, 32q/8kv, d=128):

  base    production _flash_prefill (ops/prefill_attention.py)
  ktr     K pre-transposed to (B, H, d, T): the score dot becomes a
          natural (rows, d) @ (d, bk) MXU matmul instead of a
          dot_general contracting both minor dims (which lowers to a
          per-chunk k-tile transpose)
  bk1k    key chunks of 1024 (half the loop iterations, bigger dots)
  ktrbk   both

Interleaved deep-chain ratios vs base (docs/PERF_NOTES.md round-4
measurement discipline).
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

_NEG_INF = float("-inf")


def make_variant(name, t, hq, hkv, d):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import nmvllm_tpu.ops.prefill_attention as pa

    b = 1
    group = hq // hkv
    scale = d**-0.5

    if name == "base":
        def run(q, k, v, sl):
            return pa._flash_prefill(q, k, v, sl, scale=scale,
                                     sliding_window=0, logit_soft_cap=0.0)
        return run

    ktr = name in ("ktr", "ktrbk")
    bk = 1024 if name in ("bk1k", "ktrbk") else 512
    bk = min(bk, t)
    bq = min(512, t)
    if group * bq > 2048:
        bq = max(128, 2048 // group)

    def kernel(sl_ref, q_ref, k_ref, v_ref, o_ref):
        bq_ = bq
        qi = pl.program_id(2)
        sl = sl_ref[pl.program_id(0)]
        rows = group * bq_
        q = q_ref[0, 0].reshape(rows, d)
        q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
        q_pos = qi * bq_ + jax.lax.broadcasted_iota(
            jnp.int32, (rows, bk), 0) % bq_
        col0 = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1)
        n_kc = jnp.minimum(pl.cdiv(t, bk),
                           pl.cdiv((qi + 1) * bq_, bk)).astype(jnp.int32)
        n_kc = jnp.minimum(n_kc, pl.cdiv(sl, bk))

        def body(kc, carry):
            m, l, acc = carry
            if ktr:
                kt = k_ref[0, 0, :, pl.ds(kc * bk, bk)]
                s = jnp.dot(q, kt, preferred_element_type=jnp.float32)
            else:
                kk = k_ref[0, 0, pl.ds(kc * bk, bk), :]
                s = jax.lax.dot_general(
                    q, kk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            v_ = v_ref[0, 0, pl.ds(kc * bk, bk), :]
            k_pos = kc * bk + col0
            valid = (k_pos <= q_pos) & (k_pos < sl)
            s = jnp.where(valid, s, _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            m_new = jnp.maximum(m_new, -1e30)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_new = acc * alpha + jnp.dot(
                p.astype(v_.dtype), v_, preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        m0 = jnp.full((rows, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((rows, 1), jnp.float32)
        acc0 = jnp.zeros((rows, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_kc, body, (m0, l0, acc0))
        out = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        o_ref[0, 0] = out.reshape(group, bq_, d)

    def run(q, k, v, sl):
        q_r = q.reshape(b, t, hkv, group, d).transpose(0, 2, 3, 1, 4)
        if ktr:
            k_r = k.transpose(0, 2, 3, 1)          # (B, H, d, T)
            k_spec = pl.BlockSpec((1, 1, d, t), lambda bb, h, i, *_:
                                  (bb, h, 0, 0))
        else:
            k_r = k.transpose(0, 2, 1, 3)
            k_spec = pl.BlockSpec((1, 1, t, d), lambda bb, h, i, *_:
                                  (bb, h, 0, 0))
        v_r = v.transpose(0, 2, 1, 3)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, hkv, pl.cdiv(t, bq)),
                in_specs=[
                    pl.BlockSpec((1, 1, group, bq, d),
                                 lambda bb, h, i, *_: (bb, h, 0, i, 0)),
                    k_spec,
                    pl.BlockSpec((1, 1, t, d),
                                 lambda bb, h, i, *_: (bb, h, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 1, group, bq, d),
                                       lambda bb, h, i, *_:
                                       (bb, h, 0, i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((b, hkv, group, t, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                # bk=1024 variants carry a (2048, 1024) f32 score tile:
                # ~17.4M scoped, over the 16M default.
                vmem_limit_bytes=48 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * b * hq * t * t * d // 2,
                bytes_accessed=(q.size + 2 * k.size) * 2,
                transcendentals=b * hq * t * t // 2),
            interpret=pa.pallas_interpret(),
        )(sl.astype(jnp.int32), q_r, k_r, v_r)
        return out.transpose(0, 3, 1, 2, 4).reshape(b, t, hq, d)

    return run


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=2048)
    ap.add_argument("--variants", default="ktr,bk1k,ktrbk")
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    t, d, hq, hkv = args.t, 128, 32, 8
    b = 1

    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, t, hq, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, t, hkv, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, t, hkv, d), jnp.bfloat16)
    sl = jnp.full((b,), t, jnp.int32)

    names = ["base"] + [x for x in args.variants.split(",") if x]
    fns, chains = {}, {}
    ref = None
    for name in names:
        fn = make_variant(name, t, hq, hkv, d)

        @functools.partial(jax.jit, static_argnames=("iters", "nm"))
        def chain(q0, iters, nm, fn=fn):
            def body(c, _):
                o = fn(c, k, v, sl)
                return (c + o * jnp.bfloat16(1e-4)), ()
            c, _ = jax.lax.scan(body, q0, None, length=iters)
            return c
        got = np.asarray(jax.jit(fn)(q, k, v, sl), dtype=np.float32)
        if ref is None:
            ref = got
        else:
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            print(json.dumps({"variant": name,
                              "max_rel_err_vs_base": round(float(err), 5)}),
                  flush=True)
            assert err < 2e-2, (name, err)
        t0 = time.perf_counter()
        np.asarray(chain(q, 1, name)[:1, :1, 0, 0])
        np.asarray(chain(q, args.iters, name)[:1, :1, 0, 0])
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s",
              flush=True)
        chains[name] = chain

    def one(name):
        c = chains[name]
        t0 = time.perf_counter()
        np.asarray(c(q, 1, name)[:1, :1, 0, 0])
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(c(q, args.iters, name)[:1, :1, 0, 0])
        bt = time.perf_counter() - t0
        return max((bt - a) / (args.iters - 1), 1e-9)

    flops = 2 * 2 * b * hq * t * t * d // 2
    samples = {nm: [] for nm in names[1:]}
    base_s = []
    for _ in range(args.rounds):
        c0 = one("base")
        base_s.append(c0)
        for nm in names[1:]:
            samples[nm].append((one(nm), c0))
    cmed = sorted(base_s)[len(base_s) // 2]
    print(json.dumps({"variant": "base", "ms": round(cmed * 1e3, 4),
                      "TFLOPs": round(flops / cmed / 1e12, 1)}), flush=True)
    for nm in names[1:]:
        rs = sorted(r / c for r, c in samples[nm])
        med = rs[len(rs) // 2]
        ts = sorted(r for r, _ in samples[nm])
        tmed = ts[len(ts) // 2]
        print(json.dumps({
            "variant": nm, "ratio_vs_base_median": round(med, 3),
            "ratio_samples": [round(r / c, 3) for r, c in samples[nm]],
            "ms_median": round(tmed * 1e3, 4),
            "TFLOPs": round(flops / tmed / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
