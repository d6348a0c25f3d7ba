"""Round-4 W4 dequant-GEMM variant hunt (VERDICT r3 item 1).

The production paired-magic kernel streams 177-253 GB/s of the 819 GB/s
weight roofline; per-element VPU dequant work + per-grid-step fixed cost
are the candidate walls. This bench measures surgical variants at the
production gate_up/down decode shapes to find the next 1.5-2x:

  ctrl     production quant_matmul (paired magic unpack)
  fma      zs=(z+128)*s per group row; deq = wd*sg - zs  (FMA form, one
           fewer per-element op than (wd - zg) * sg)
  nocat    fma + store each magic part directly (no 4-way sublane concat)
  chunk    dequant/dot interleaved in 1024-deep chunks (VPU dequant of
           chunk c+1 can overlap the MXU dot of chunk c)
  raw      unpack+store+dot only, NO scale/zero per-element work
           (decomposition probe: how much do the scale ops cost?)
  chan     per-channel scales folded into the k-final epilogue with a
           rank-1 zero correction — ZERO per-element scale work (probe
           for an opt-in fast path; numerics differ from group scaling)

Discipline (docs/PERF_NOTES.md): one TPU process; chained calls inside
one scan body; per-call = (t9 - t1)/8 differencing; drift control.
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


def _build(m, k, n, seed=0):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.quant_matmul import quantize_weights_to_packed
    rng = jax.random.PRNGKey(seed)
    w = jax.random.normal(rng, (n, k), jnp.float32) * 0.02
    qw, s, z = quantize_weights_to_packed(w, 4, 128, symmetric=False)
    x = jax.random.normal(rng, (m, k), jnp.bfloat16)
    return x, qw, s, z


def make_variant(name, m, k, n, bn=1024, bk=2048, chunk=1024):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from nmvllm_tpu.ops.quant_matmul import quant_matmul
    from nmvllm_tpu.utils import round_up

    g = 128
    if name == "ctrl" or name.startswith("prod"):
        # Production quant_matmul path. prod_nocat / prod_cat trace the
        # kernel with NMVLLM_W4_NOCAT forced on/off (flag is read at
        # trace time); prod_bn2048 etc. change block shapes.
        flag = None
        use_bn, use_bk = bn, bk
        if name == "prod_nocat":
            flag = "1"
        elif name == "prod_cat":
            flag = "0"
        elif name == "prod_bn2048":
            use_bn = 2048
        elif name == "prod_bn2048_bk1024":
            use_bn, use_bk = 2048, 1024
        elif name == "prod_bk4096":
            use_bk = 4096

        # block_m cache-buster: the env flag is read at trace time and
        # is NOT part of quant_matmul's jit key — give each flag value
        # a distinct static block_m (both resolve to the same bm=80 at
        # m=72) so the traces don't collide in the cache.
        bm_buster = {"prod_nocat": 80, "prod_cat": 96}.get(name, 0)

        def run(x, qw, s, z, _flag=flag, _bn=use_bn, _bk=use_bk,
                _bm=bm_buster):
            if _flag is not None:
                os.environ["NMVLLM_W4_NOCAT"] = _flag
            return quant_matmul(x, qw, s, z, bits=4, group_size=g,
                                block_m=_bm, block_n=_bn, block_k=_bk)
        return run

    def unpack_parts(w32):
        mask = jnp.int32(0x000F000F)
        magic = jnp.int32(0x43004300)
        parts = []
        for mm in range(4):
            p = (jax.lax.shift_right_logical(w32, jnp.int32(4 * mm)) & mask
                 ) | magic
            parts.append(pltpu.bitcast(p, jnp.bfloat16))
        return parts

    def kern(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, deq_ref, *,
             bk, variant):
        gpb = bk // g
        wpg = g // 8

        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        g0 = pl.program_id(2) * gpb

        if variant in ("nocat", "raw"):
            def per_group(gi, _):
                w = w_ref[pl.ds(pl.multiple_of(gi * wpg, wpg), wpg), :]
                parts = unpack_parts(w)
                if variant == "raw":
                    deq_ref[pl.ds(pl.multiple_of(gi * g, g), g), :] = \
                        jnp.concatenate(parts, axis=0)
                    return 0
                sg = s_ref[pl.ds(g0 + gi, 1), :].astype(jnp.bfloat16)
                zg = z_ref[pl.ds(g0 + gi, 1), :].astype(jnp.bfloat16)
                zb = zg + 128              # exact small int in bf16
                # nocat: store each part at its natural slab rows —
                # drops the 4-way sublane concat. Exact (wd - z) * s
                # form (wd*s - zs cancels catastrophically in bf16).
                for mm in range(4):
                    r0 = gi * g + mm * (g // 4)
                    deq_ref[pl.ds(pl.multiple_of(r0, g // 4),
                                  g // 4), :] = (parts[mm] - zb) * sg
                return 0

            jax.lax.fori_loop(0, gpb, per_group, 0, unroll=False)
            acc_ref[:] += jnp.dot(x_ref[:], deq_ref[:],
                                  preferred_element_type=jnp.float32)
        elif variant in ("chunk", "nochunk"):
            # Interleave: dequant chunk c, dot chunk c. Mosaic can
            # schedule the dequant of chunk c+1 under the dot of chunk c
            # (no data dependency between them). "nochunk" additionally
            # stores each magic part directly (nocat).
            gpc = chunk // g
            nch = bk // chunk
            for c in range(nch):
                for gi in range(c * gpc, (c + 1) * gpc):
                    w = w_ref[pl.ds(pl.multiple_of(gi * wpg, wpg), wpg), :]
                    sg = s_ref[pl.ds(g0 + gi, 1), :].astype(jnp.bfloat16)
                    zg = z_ref[pl.ds(g0 + gi, 1), :].astype(jnp.bfloat16)
                    zb = zg + 128
                    parts = unpack_parts(w)
                    if variant == "nochunk":
                        for mm in range(4):
                            r0 = gi * g + mm * (g // 4)
                            deq_ref[pl.ds(pl.multiple_of(r0, g // 4),
                                          g // 4), :] = \
                                (parts[mm] - zb) * sg
                    else:
                        wd = jnp.concatenate(parts, axis=0)
                        deq_ref[pl.ds(pl.multiple_of(gi * g, g), g),
                                :] = (wd - zb) * sg
                acc_ref[:] += jnp.dot(
                    x_ref[:, pl.ds(pl.multiple_of(c * chunk, chunk),
                                   chunk)],
                    deq_ref[pl.ds(pl.multiple_of(c * chunk, chunk),
                                  chunk), :],
                    preferred_element_type=jnp.float32)
        else:
            raise ValueError(name)

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:]

    def kern_chan(x_ref, w_ref, sc_ref, zc_ref, o_ref, acc_ref, xs_ref,
                  deq_ref, *, bk):
        # Per-channel: dot raw magic values; scales + rank-1 zero
        # correction fold into the k-final epilogue. Zero per-element
        # scale work.
        wpg = g // 8
        gpb = bk // g

        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            xs_ref[:] = jnp.zeros_like(xs_ref)

        def per_group(gi, _):
            w = w_ref[pl.ds(pl.multiple_of(gi * wpg, wpg), wpg), :]
            deq_ref[pl.ds(pl.multiple_of(gi * g, g), g), :] = \
                jnp.concatenate(unpack_parts(w), axis=0)
            return 0

        jax.lax.fori_loop(0, gpb, per_group, 0, unroll=False)
        acc_ref[:] += jnp.dot(x_ref[:], deq_ref[:],
                              preferred_element_type=jnp.float32)
        xs_ref[:] += jnp.sum(x_ref[:].astype(jnp.float32), axis=1,
                             keepdims=True)

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            sc = sc_ref[0, :].astype(jnp.float32)
            zc = zc_ref[0, :].astype(jnp.float32)     # 128 + z, f32
            o_ref[:] = (acc_ref[:] - xs_ref[:] * zc) * sc

    sublane = 16
    bm = round_up(m, sublane)

    def call(x, qw, s, z, variant):
        mm, kk = x.shape
        nn = qw.shape[1]
        xp = jnp.pad(x, ((0, bm - mm), (0, 0))) if bm != mm else x
        grid = (1, nn // bn, kk // bk)
        common = dict(
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kc: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, nn), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * bm * nn * kk,
                bytes_accessed=bm * kk * 2 + kk * nn // 2 + bm * nn * 4,
                transcendentals=0),
        )
        x_spec = pl.BlockSpec((bm, bk), lambda i, j, kc: (i, kc),
                              memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec((bk // 8, bn), lambda i, j, kc: (kc, j),
                              memory_space=pltpu.VMEM)
        if variant == "chan":
            # Fold group scales/zeros to per-channel host-side (probe:
            # numerics intentionally differ from group scaling).
            sc = jnp.max(s, axis=0, keepdims=True)           # (1, N)
            zc = 128.0 + jnp.mean(z, axis=0, keepdims=True).astype(
                jnp.float32)
            out = pl.pallas_call(
                functools.partial(kern_chan, bk=bk), grid=grid,
                in_specs=[x_spec, w_spec,
                          pl.BlockSpec((1, bn), lambda i, j, kc: (0, j),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, bn), lambda i, j, kc: (0, j),
                                       memory_space=pltpu.VMEM)],
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                                pltpu.VMEM((bm, 1), jnp.float32),
                                pltpu.VMEM((bk, bn), jnp.bfloat16)],
                **common,
            )(xp, qw, sc, zc)
            return out[:mm].astype(x.dtype)
        sg_spec = pl.BlockSpec((kk // g, bn), lambda i, j, kc: (0, j),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(kern, bk=bk, variant=variant), grid=grid,
            in_specs=[x_spec, w_spec, sg_spec, sg_spec],
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                            pltpu.VMEM((bk, bn), jnp.bfloat16)],
            **common,
        )(xp, qw, s, z)
        return out[:mm].astype(x.dtype)

    return functools.partial(call, variant=name)


def bench_interleaved(variants, m, k, n, bn=1024, bk=2048, chunk=1024):
    """Drift-immune comparison: compile EVERYTHING first, then time
    ctrl,v,ctrl,v,... back-to-back and report each variant as a ratio
    to its bracketing ctrl measurements (the tunnel's fixed costs drift
    3x+ between minutes — absolute ms across cases are meaningless,
    adjacent ratios are not)."""
    import jax
    import jax.numpy as jnp
    x, qw, s, z = _build(m, k, n)

    from nmvllm_tpu.ops.quant_matmul import quant_matmul_reference
    ref = quant_matmul_reference(x, qw, s, z, bits=4, group_size=128)
    refm = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9

    def make_timers(name, salt):
        fn = make_variant(name, m, k, n, bn=bn, bk=bk, chunk=chunk)
        if name not in ("raw", "chan"):
            got = jax.jit(fn)(x, qw, s, z)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                        ref.astype(jnp.float32))))
            assert err / refm < 2e-2, (name, err, refm)

        DEEP = 25      # delta = 24 calls/iter x 8 iters ≈ 60 ms of
                       # kernel time — far above tunnel RPC jitter

        def mk(nper):
            @jax.jit
            def many(x):
                def body(x, _):
                    for _ in range(nper):
                        y = fn(x, qw, s, z)
                        upd = (y[:, :1] * jnp.bfloat16(1e-6 * salt)
                               ).astype(x.dtype)
                        x = x.at[:, :1].add(upd)
                    return x, ()
                x, _ = jax.lax.scan(body, x, None, length=8)
                return x
            return many
        return mk(1), mk(DEEP)

    timers = {}
    for i, v in enumerate(dict.fromkeys(["ctrl"] + variants)):
        timers[v] = make_timers(v, 1.0 + i * 1e-9)
        # Compile both depths now so the timing loop is compile-free.
        for f in timers[v]:
            np.asarray(f(x)[:1, :1])

    def one(v):
        f1, fd = timers[v]
        t0 = time.perf_counter()
        np.asarray(f1(x)[:1, :1])
        t1 = (time.perf_counter() - t0) / 8
        t0 = time.perf_counter()
        np.asarray(fd(x)[:1, :1])
        td = (time.perf_counter() - t0) / 8
        return max((td - t1) / 24, 1e-9)

    # ROUNDS interleaved passes; per-round ratios vs the adjacent ctrl,
    # medians reported (single bracketed readings still flipped sign
    # between runs on this tunnel).
    ROUNDS = 5
    wbytes = k * n // 2 + (k // 128) * n * 8
    samples = {v: [] for v in variants}
    ctrl_samples = []
    for _ in range(ROUNDS):
        c = one("ctrl")
        ctrl_samples.append(c)
        for v in variants:
            samples[v].append(one(v) / c)
    out = []
    cmed = sorted(ctrl_samples)[len(ctrl_samples) // 2]
    for v in variants:
        rs = sorted(samples[v])
        med = rs[len(rs) // 2]
        out.append({
            "variant": v, "m": m, "K": k, "N": n, "bn": bn, "bk": bk,
            "ratio_vs_ctrl_median": round(med, 3),
            "ratio_samples": [round(r, 3) for r in samples[v]],
            "ctrl_ms_median": round(cmed * 1e3, 4),
            "ctrl_GBps": round(wbytes / cmed / 1e9, 1),
            "GBps_at_median": round(wbytes / (med * cmed) / 1e9, 1),
        })
        print(json.dumps(out[-1]), flush=True)
    return out


def bench_case(variant, m, k, n, reps, idx, bn=1024, bk=2048, chunk=1024,
               check=True):
    import jax
    import jax.numpy as jnp
    x, qw, s, z = _build(m, k, n)
    fn = make_variant(variant, m, k, n, bn=bn, bk=bk, chunk=chunk)

    if check and variant not in ("raw", "chan"):
        from nmvllm_tpu.ops.quant_matmul import quant_matmul_reference
        ref = quant_matmul_reference(x, qw, s, z, bits=4, group_size=128)
        got = jax.jit(fn)(x, qw, s, z)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                    ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
        assert err / scale < 2e-2, (variant, err, scale)

    def mk(nper, salt):
        @jax.jit
        def many(x):
            def body(x, _):
                for _ in range(nper):
                    y = fn(x, qw, s, z)
                    upd = (y[:, :1] * jnp.bfloat16(1e-6 * salt)).astype(
                        x.dtype)
                    x = x.at[:, :1].add(upd)
                return x, ()
            x, _ = jax.lax.scan(body, x, None, length=8)
            return x
        return many

    def timed(fn2, x):
        out = fn2(x)
        np.asarray(out[:1, :1])
        t0 = time.perf_counter()
        out = fn2(out)
        np.asarray(out[:1, :1])
        return (time.perf_counter() - t0) / 8

    t1 = timed(mk(1, 1.0 + idx * 1e-9), x)
    t9 = timed(mk(9, 1.0 + idx * 1e-9), x)
    t1b = timed(mk(1, 1.0 + (idx + 0.5) * 1e-9), x)
    dt = (t9 - (t1 + t1b) / 2) / 8
    wbytes = k * n // 2 + (k // 128) * n * 8
    return {"variant": variant, "m": m, "K": k, "N": n,
            "bn": bn, "bk": bk,
            "ms": round(dt * 1e3, 4),
            "GBps": round(wbytes / dt / 1e9, 1),
            "pct_819": round(100 * wbytes / dt / 1e9 / 819, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=72)
    p.add_argument("--case", default="gate_up",
                   choices=["gate_up", "down", "qkv"])
    p.add_argument("--variants", default="ctrl,nocat,chunk,raw,chan")
    p.add_argument("--bn", type=int, default=1024)
    p.add_argument("--bk", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=1024)
    args = p.parse_args()
    shapes = {"gate_up": (4096, 28672), "down": (14336, 4096),
              "qkv": (4096, 6144)}
    k, n = shapes[args.case]
    variants = [v for v in args.variants.split(",") if v != "ctrl"]
    bench_interleaved(variants, args.m, k, n, bn=args.bn, bk=args.bk,
                      chunk=args.chunk)


if __name__ == "__main__":
    main()
