"""Round-5 W4A8 decision bench (VERDICT r4 item 1, step zero).

The bf16-dequant W4 kernel family is structurally capped near ~350 GB/s
of the 819 GB/s weight stream (r4 `raw` floor). The designed escape is
W4A8: unpack int4 -> int8 in-kernel (2 masked ops + free bitcast per 8
weights), fold GPTQ group scales into small per-group integer
multipliers applied SIMD-in-int32 during unpack, run ONE full-depth
int8xint8->int32 MXU dot, and fold per-channel scale + zero correction
into a tiny f32 epilogue. That plan is dead on arrival if the int8 MXU
dot itself is slow: the round-1 chained reading said 13.7 TFLOP/s, but
it predates the round-3 scan-tax discovery and the round-4 interleaved
methodology. This bench re-measures everything under the current
discipline (compile-all-first, deep chains, interleaved ctrl ratios).

Variants (gate_up decode geometry m=72, K=4096, N=28672 by default):
  ctrl    production quant_matmul (paired-magic bf16 dequant)
  bf16    plain full-depth bf16 Pallas dot (MXU sanity / dense bound)
  i8      int8-stored weights, ONE full-depth int8 dot + channel-scale
          epilogue -> the int8 MXU ceiling at production shapes
  w4a8    packed int4 weights, in-kernel byte-lane unpack -> int8 with
          per-group SIMD multiplier, int8 dot, epilogue with rank-G
          zero-correction dot  -> the real candidate
  w4a8nm  w4a8 without the group multiplier or correction (floor probe)
  i8xla   jnp int8 dot_general (XLA lowering datapoint)

Packing (w4a8): word r, byte i: low nibble = orig k-row 8r+i, high
nibble = orig row 8r+4+i. lo = w & 0x0F0F0F0F bitcasts (free) to int8
rows 4r+i; hi = (w >> 4) & 0x0F0F0F0F likewise. The activation is
pre-permuted (cheap static gather fused into the int8 quantize pass)
so the dot sums in deq order. Group structure survives: lo/hi words
[16g, 16g+16) cover exactly orig scale group g, so the multiplier is
constant per word chunk -> one int32 SIMD multiply per 4 weights.
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

G = 128          # scale group size (orig k rows)
MASK = 0x0F0F0F0F


def _perm(k):
    """deq row -> orig row for the byte-lane packing (numpy)."""
    j = np.arange(k // 2)
    lo = 8 * (j // 4) + (j % 4)
    hi = 8 * (j // 4) + 4 + (j % 4)
    return np.concatenate([lo, hi])


def pack_w4(v4):
    """(K, N) uint4 values (orig k order) -> (K//8, N) int32 words."""
    k, n = v4.shape
    v = v4.astype(np.uint32).reshape(k // 8, 8, n)
    word = np.zeros((k // 8, n), np.uint32)
    for i in range(4):
        word |= v[:, i] << (8 * i)
        word |= v[:, 4 + i] << (8 * i + 4)
    return word.astype(np.int32)


def _build(m, k, n, seed=0):
    """Synthesize a GPTQ-like W4 channel: group scales with ~4x spread,
    symmetric zero z=8, requantized to (multiplier, channel-scale)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    g = k // G
    v4 = rng.integers(0, 16, size=(k, n), dtype=np.int64)
    sg = (rng.uniform(0.25, 1.0, size=(g, n)) * 0.01).astype(np.float32)
    # Requantize: S_n = max_g sg / 8; m_g = round(sg / S_n) in [1, 8].
    s_chan = sg.max(axis=0) / 8.0                       # (n,)
    mult = np.clip(np.rint(sg / s_chan[None, :]), 1, 8).astype(np.int32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    ax = np.abs(x).max(axis=1, keepdims=True) / 127.0   # (m, 1)
    x8 = np.clip(np.rint(x / ax), -127, 127).astype(np.int8)
    perm = _perm(k)
    x8p = x8[:, perm]                                   # deq order
    # Per-orig-group activation sums (f32) for the zero correction.
    xg = x8.astype(np.float32).reshape(m, g, G).sum(axis=2)   # (m, g)
    packed = pack_w4(v4)
    # zms[g, n] = z * m_g * 1.0 (S applied in epilogue); z = 8.
    zms = (8.0 * mult).astype(np.float32)
    # int8-stored variant: w8 = (v4 - 8) * mult  (fits [-120, 120])
    w8 = ((v4 - 8)[..., :] * mult.repeat(G, axis=0)).astype(np.int8)
    d = dict(
        x8=jnp.asarray(x8), x8p=jnp.asarray(x8p), ax=jnp.asarray(ax),
        xg=jnp.asarray(xg), packed=jnp.asarray(packed),
        mult=jnp.asarray(mult), zms=jnp.asarray(zms),
        s_chan=jnp.asarray(s_chan[None, :]), w8=jnp.asarray(w8),
        xbf=jnp.asarray(x, jnp.bfloat16),
        wbf=jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16),
    )
    # f32 reference of the w4a8 semantics.
    deq = (v4 - 8) * mult.repeat(G, axis=0) * s_chan[None, :]
    d["ref"] = jnp.asarray((x8.astype(np.float32) @ deq) * ax)
    return d


def make_variant(name, m, k, n, bn=1024):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from nmvllm_tpu.utils import round_up
    from nmvllm_tpu.ops.utils import pallas_interpret

    bm = round_up(m, 32)
    g = k // G

    if name == "ctrl":
        from nmvllm_tpu.ops.quant_matmul import quant_matmul

        def run(d):
            return quant_matmul(d["xbf"], d["qw"], d["s"], d["z"], bits=4,
                                group_size=G)
        return run

    if name == "bf16":
        def kern(x_ref, w_ref, o_ref):
            o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                               preferred_element_type=jnp.float32)

        bmb = round_up(m, 16)
        bn = min(bn, 512)   # (k, 1024) bf16 blocks double-buffer to 16M

        def run(d):
            xp = jnp.pad(d["xbf"], ((0, bmb - m), (0, 0)))
            out = pl.pallas_call(
                kern, grid=(n // bn,),
                interpret=pallas_interpret(),
                in_specs=[
                    pl.BlockSpec((bmb, k), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k, bn), lambda j: (0, j),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((bmb, bn), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((bmb, n), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                cost_estimate=pl.CostEstimate(
                    flops=2 * bmb * n * k,
                    bytes_accessed=bmb * k * 2 + k * n * 2 + bmb * n * 4,
                    transcendentals=0),
            )(xp, d["wbf"])
            return out[:m]
        return run

    if name == "i8":
        def kern(x_ref, w_ref, s_ref, ax_ref, o_ref):
            acc = jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)
            o_ref[:] = (acc.astype(jnp.float32) * s_ref[0, :]
                        * ax_ref[:, :1])

        def run(d):
            xp = jnp.pad(d["x8"], ((0, bm - m), (0, 0)))
            axp = jnp.pad(d["ax"], ((0, bm - m), (0, 0)))
            out = pl.pallas_call(
                kern, grid=(n // bn,),
                interpret=pallas_interpret(),
                in_specs=[
                    pl.BlockSpec((bm, k), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k, bn), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bn), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bm, 1), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((bm, bn), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((bm, n), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                cost_estimate=pl.CostEstimate(
                    flops=2 * bm * n * k,
                    bytes_accessed=bm * k + k * n + bm * n * 4,
                    transcendentals=0),
            )(xp, d["w8"], d["s_chan"], axp)
            return out[:m]
        return run

    if name in ("w4a8", "w4a8nm"):
        with_mult = name == "w4a8"
        gp = round_up(g, 128)      # padded G for the correction dot

        def kern(x_ref, w_ref, m_ref, zms_ref, s_ref, xg_ref, ax_ref,
                 o_ref, deq_ref):
            half = k // 2

            def per_group(gi, _):
                w = w_ref[pl.ds(pl.multiple_of(gi * 16, 16), 16), :]
                lo = w & MASK
                hi = jax.lax.shift_right_logical(w, jnp.int32(4)) & MASK
                if with_mult:
                    mg = m_ref[pl.ds(gi, 1), :]         # (1, bn) i32
                    lo = lo * mg
                    hi = hi * mg
                r0 = gi * 64
                deq_ref[pl.ds(pl.multiple_of(r0, 64), 64), :] = \
                    pltpu.bitcast(lo, jnp.int8)
                deq_ref[pl.ds(pl.multiple_of(half + r0, 64), 64), :] = \
                    pltpu.bitcast(hi, jnp.int8)
                return 0

            jax.lax.fori_loop(0, g, per_group, 0, unroll=False)
            acc = jnp.dot(x_ref[:], deq_ref[:],
                          preferred_element_type=jnp.int32
                          ).astype(jnp.float32)
            if with_mult:
                corr = jnp.dot(xg_ref[:], zms_ref[:],
                               preferred_element_type=jnp.float32)
                acc = acc - corr
            o_ref[:] = acc * s_ref[0, :] * ax_ref[:, :1]

        def run(d):
            xp = jnp.pad(d["x8p"], ((0, bm - m), (0, 0)))
            axp = jnp.pad(d["ax"], ((0, bm - m), (0, 0)))
            xgp = jnp.pad(d["xg"], ((0, bm - m), (0, gp - g)))
            zmsp = jnp.pad(d["zms"], ((0, gp - g), (0, 0)))
            out = pl.pallas_call(
                kern, grid=(n // bn,),
                interpret=pallas_interpret(),
                in_specs=[
                    pl.BlockSpec((bm, k), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k // 8, bn), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((g, bn), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gp, bn), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bn), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bm, gp), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bm, 1), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((bm, bn), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((bm, n), jnp.float32),
                scratch_shapes=[pltpu.VMEM((k, bn), jnp.int8)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                cost_estimate=pl.CostEstimate(
                    flops=2 * bm * n * k,
                    bytes_accessed=bm * k + k * n // 2 + bm * n * 4,
                    transcendentals=0),
            )(xp, d["packed"], d["mult"], zmsp, d["s_chan"], xgp, axp)
            return out[:m]
        return run

    if name == "i8xla":
        def run(d):
            acc = jax.lax.dot_general(
                d["x8"], d["w8"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * d["s_chan"] * d["ax"]
        return run

    raise ValueError(name)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=72)
    p.add_argument("--case", default="gate_up",
                   choices=["gate_up", "down", "qkv"])
    p.add_argument("--variants", default="bf16,i8,w4a8,w4a8nm,i8xla")
    p.add_argument("--bn", type=int, default=1024)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--deep", type=int, default=25)
    args = p.parse_args()
    shapes = {"gate_up": (4096, 28672), "down": (14336, 4096),
              "qkv": (4096, 6144)}
    k, n = shapes[args.case]
    m = args.m

    import jax
    import jax.numpy as jnp
    d = _build(m, k, n)
    # ctrl needs production-format weights.
    from nmvllm_tpu.ops.quant_matmul import quantize_weights_to_packed
    rng = jax.random.PRNGKey(0)
    wref = jax.random.normal(rng, (n, k), jnp.float32) * 0.02
    d["qw"], d["s"], d["z"] = quantize_weights_to_packed(
        wref, 4, G, symmetric=False)

    refm = float(jnp.max(jnp.abs(d["ref"]))) + 1e-9

    variants = [v for v in args.variants.split(",") if v]
    names = ["ctrl"] + variants

    timers = {}
    for i, name in enumerate(names):
        fn = make_variant(name, m, k, n, bn=args.bn)
        if name in ("i8", "w4a8", "i8xla"):
            got = jax.jit(fn)(d)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - d["ref"])))
            assert err / refm < 2e-2, (name, err, refm)
            print(json.dumps({"variant": name, "max_abs_err": err,
                              "ref_max": refm}), flush=True)

        def mk(nper, salt, fn=fn):
            @jax.jit
            def many(d):
                def body(c, _):
                    x8p, xbf = c
                    for _ in range(nper):
                        # Rebuild inputs from the updated carry EVERY
                        # call — a loop-invariant dd lets XLA CSE all
                        # nper calls into one (observed: flat timings).
                        dd = dict(d, x8p=x8p, x8=x8p, xbf=xbf)
                        y = fn(dd)
                        u = y[:, :1].astype(jnp.float32) * (1e-7 * salt)
                        # Runtime-zero (not statically foldable) int8
                        # update keeps the chain's data dependency
                        # without perturbing the int values.
                        x8p = x8p.at[:, :1].add(
                            (u * 1e-20).astype(jnp.int8))
                        xbf = xbf.at[:, :1].add(u.astype(jnp.bfloat16)
                                                * 1e-6)
                    return (x8p, xbf), ()
                c, _ = jax.lax.scan(body, (d["x8p"], d["xbf"]), None,
                                    length=8)
                return c[1]
            return many
        t1, td = mk(1, 1.0 + i * 1e-9), mk(args.deep, 1.0 + i * 1e-9)
        print(f"compiling {name} ...", flush=True)
        t0 = time.perf_counter()
        np.asarray(t1(d)[:1, :1]); np.asarray(td(d)[:1, :1])
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s",
              flush=True)
        timers[name] = (t1, td)

    def one(name):
        t1, td = timers[name]
        t0 = time.perf_counter()
        np.asarray(t1(d)[:1, :1])
        a = (time.perf_counter() - t0) / 8
        t0 = time.perf_counter()
        np.asarray(td(d)[:1, :1])
        b = (time.perf_counter() - t0) / 8
        return max((b - a) / (args.deep - 1), 1e-9)

    wbytes = {"ctrl": k * n // 2 + (k // G) * n * 8, "bf16": k * n * 2,
              "i8": k * n, "i8xla": k * n,
              "w4a8": k * n // 2 + (k // G) * n * 8,
              "w4a8nm": k * n // 2}
    samples = {v: [] for v in variants}
    ctrl_samples = []
    for _ in range(args.rounds):
        c = one("ctrl")
        ctrl_samples.append(c)
        for v in variants:
            samples[v].append((one(v), c))
    cmed = sorted(ctrl_samples)[len(ctrl_samples) // 2]
    print(json.dumps({"variant": "ctrl", "ms": round(cmed * 1e3, 4),
                      "GBps": round(wbytes["ctrl"] / cmed / 1e9, 1)}),
          flush=True)
    for v in variants:
        rs = sorted(t / c for t, c in samples[v])
        med = rs[len(rs) // 2]
        ts = sorted(t for t, _ in samples[v])
        tmed = ts[len(ts) // 2]
        print(json.dumps({
            "variant": v, "m": m, "K": k, "N": n, "bn": args.bn,
            "ratio_vs_ctrl_median": round(med, 3),
            "ratio_samples": [round(t / c, 3) for t, c in samples[v]],
            "ms_median": round(tmed * 1e3, 4),
            "GBps_stream": round(wbytes[v] / tmed / 1e9, 1),
            "TFLOPs": round(2 * m * k * n / tmed / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
