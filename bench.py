"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): tokens/sec/chip, Llama-3-8B INT4 decode.
`vs_baseline` is measured throughput / the HBM-bandwidth roofline for the
INT4 dequant-GEMM decode step on this chip (the reference's own north-star
framing: Marlin-class kernels are judged against the bandwidth roofline).

Scales the model to the available HBM: full Llama-3-8B geometry on real
TPU; a reduced-layer variant elsewhere. Selectable with --config.
"""
import argparse
import json
import os
import time

import numpy as np


def roofline_tokens_per_s(param_bytes: int, hbm_gbps: float,
                          batch: int, kv_bytes_per_step: float = 0.0
                          ) -> float:
    """Bandwidth-bound decode roofline: every step must read all weights
    plus each sequence's KV context; tok/s = batch * BW / bytes_per_step."""
    return batch * (hbm_gbps * 1e9) / (param_bytes + kv_bytes_per_step)


def detect_hbm_gbps() -> float:
    import jax
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819.0
    if "v4" in kind:
        return 1228.0
    if "v5p" in kind or "v5" in kind:
        return 2765.0
    if "v6" in kind:
        return 1640.0
    return 819.0


def measure_hbm_gbps(size_mb: int = 512, reps: int = 8) -> float:
    """Achievable HBM read bandwidth via chained in-graph reductions.
    The tunnel charges ~0.5 ms per scan ITERATION regardless of body
    (docs/PERF_NOTES.md round 3), so two chain depths are differenced:
    per-read = (t_4 - t_1) / 3."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    rows = size_mb * 1024 * 1024 // 256
    # x must be an ARGUMENT, not a closure: a closed-over 512 MB array
    # becomes an HLO constant and overflows the tunnel's remote-compile
    # request size limit (HTTP 413).
    x = jax.jit(lambda k: jax.random.normal(k, (rows, 128),
                                            jnp.bfloat16))(
        jax.random.PRNGKey(0))

    def mk(nper):
        @jax.jit
        def many(x, c):
            def body(c, _):
                for _ in range(nper):
                    # The carry scales the whole read: each pass depends
                    # on the previous (no CSE / hoisting).
                    s = jnp.sum(x * c, dtype=jnp.float32)
                    c = (s * jnp.float32(1e-12)).astype(jnp.bfloat16)
                return c, ()
            c, _ = jax.lax.scan(body, c, None, length=reps)
            return c
        return many

    def timed(fn, c):
        c = fn(x, c)
        np.asarray(c)                 # fence
        t0 = time.perf_counter()
        c = fn(x, c)
        np.asarray(c)
        return (time.perf_counter() - t0) / reps

    # Deep chain (1 vs 8 reads/iter) + two trials bracketing drift:
    # shallow deltas on the tunnel are noisy enough to read above the
    # 819 GB/s spec.
    f1, f8 = mk(1), mk(8)
    t1a = timed(f1, jnp.bfloat16(1))
    t8 = timed(f8, jnp.bfloat16(1))
    t1b = timed(f1, jnp.bfloat16(1))
    per_read = max((t8 - (t1a + t1b) / 2) / 7, 1e-9)
    return size_mb * 2**20 / per_read / 1e9


def measure_hbm_bracketed(samples: int = 3):
    """VERDICT r3 item 8: the single-shot probe drifted ~2x between
    windows. Take N in-run samples and report (min, max, spread); the
    caller drops `vs_achievable` when the spread exceeds 15% (a drifting
    tunnel number is not evidence)."""
    vals = [measure_hbm_gbps() for _ in range(samples)]
    lo, hi = min(vals), max(vals)
    spread = (hi - lo) / max(hi, 1e-9)
    return lo, hi, spread


def run_prefill_bench(model_name: str, quantization,
                      configs, block_size: int = 32,
                      dtype: str = "bfloat16", num_layers_override=None):
    """On-device differenced prefill-step timings (VERDICT r3 item 6):
    the TTFT-proportional number the serving harness cannot measure
    through the tunnel RPC. One model build; per (B, T) config a jitted
    prefill forward (causal flash attention + KV write + last-token
    logits) is chained R deep inside one scan iteration and differenced
    against a depth-1 chain (docs/PERF_NOTES.md microbench rule)."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
    from nmvllm_tpu.model_loader import (_finalize, build_model,
                                         init_params_on_mesh)
    from nmvllm_tpu.models.base import AttentionMetadata
    from nmvllm_tpu.parallel.mesh import build_mesh
    from nmvllm_tpu.utils import cdiv
    from nmvllm_tpu.worker.runner import shard_map_fn

    mesh = build_mesh(1, 1)
    model_config = ModelConfig(model=model_name, quantization=quantization,
                               dtype=dtype)
    engine_config = EngineConfig(
        model_config=model_config,
        cache_config=CacheConfig(block_size=block_size),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(
            max_model_len=max(t for _, t in configs),
            max_num_seqs=max(b for b, _ in configs)),
        device_config=DeviceConfig())
    model = build_model(engine_config)
    if num_layers_override is not None:
        model.layers = model.layers[:num_layers_override]
    params = _finalize(model, init_params_on_mesh(model, mesh, 0))
    num_layers = len(model.layers)

    param_specs = model.specs()
    kv_specs = [P(None, None, "tp") for _ in range(num_layers)]
    results = {}
    for b, t in configs:
        blocks = b * cdiv(t, block_size) + 1
        kv_shape = (blocks, 2, model.total_num_kv_heads, block_size,
                    model.head_dim)
        bt = np.arange(b * cdiv(t, block_size)).reshape(b, -1).astype(
            np.int32)
        slots = (bt[:, :, None] * block_size +
                 np.arange(block_size)[None, None, :]).reshape(b, -1)
        slots = slots[:, :t].astype(np.int32)
        positions = np.tile(np.arange(t, dtype=np.int32), (b, 1))
        seq_lens = np.full((b,), t, np.int32)

        def fwd(params, kv_caches, tokens, positions, slots,
                block_tables, seq_lens):
            meta = AttentionMetadata(
                slot_mapping=slots, block_tables=block_tables,
                context_lens=seq_lens, seq_lens=seq_lens,
                prefix_lens=jnp.zeros_like(seq_lens))
            x, kv_caches = model.forward(params, tokens, positions,
                                         kv_caches, meta, is_prefill=True)
            hidden = model.select_last_token(x, seq_lens)
            logits = model.compute_logits(params, hidden)
            return jnp.argmax(logits, -1).astype(jnp.int32), kv_caches

        sharded = shard_map_fn(
            fwd, mesh,
            in_specs=(param_specs, kv_specs, P(), P(), P(), P(), P()),
            out_specs=(P(), kv_specs))

        # Prefill steps are LONG (tens-to-hundreds of ms at these
        # shapes) so no chaining/differencing is needed — the tunnel's
        # per-dispatch overhead (~1 ms) is noise here, and a chained
        # multi-call program at T=8192 x 32 layers crashed the remote
        # compile helper outright. Median of 3 fenced single dispatches.
        @jax.jit
        def one(params, tokens):
            kv = [jnp.zeros(kv_shape, jnp.bfloat16)
                  for _ in range(num_layers)]
            nxt, kv = sharded(params, kv, tokens,
                              jnp.asarray(positions), jnp.asarray(slots),
                              jnp.asarray(bt), jnp.asarray(seq_lens))
            return nxt

        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(0, 256, (b, t)), jnp.int32)
        np.asarray(one(params, tokens)[:1])      # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(one(params, tokens)[:1])  # fence: device_get
            ts.append(time.perf_counter() - t0)
        results[f"{b}x{t}"] = round(sorted(ts)[1] * 1e3, 2)
    return results


def count_quant_param_bytes(params) -> int:
    import jax
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total


def run_decode_bench(model_name: str, quantization, batch: int,
                     context_len: int, steps: int, block_size: int = 32,
                     dtype: str = "bfloat16", num_layers_override=None,
                     dump_hlo=None, head: str = "argmax",
                     samples: int = 1, kv_dtype: str = "auto"):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
    from nmvllm_tpu.model_loader import build_model, init_params_on_mesh
    from nmvllm_tpu.models.base import AttentionMetadata
    from nmvllm_tpu.parallel.mesh import build_mesh
    from nmvllm_tpu.utils import STR_DTYPE_TO_JNP, cdiv

    mesh = build_mesh(1, 1)
    model_config = ModelConfig(model=model_name, quantization=quantization,
                               dtype=dtype)
    engine_config = EngineConfig(
        model_config=model_config,
        cache_config=CacheConfig(block_size=block_size,
                                 cache_dtype=kv_dtype),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_model_len=context_len,
                                         max_num_seqs=batch),
        device_config=DeviceConfig())
    kv_jnp_dtype = jnp.dtype(STR_DTYPE_TO_JNP.get(
        kv_dtype if kv_dtype != "auto" else "bfloat16", "bfloat16"))
    model = build_model(engine_config)
    if num_layers_override is not None:
        # Differential profiling: per-layer device time = slope of step
        # time vs layer count (the scan step is ONE XLA program, so this
        # captures on-device per-layer cost, not host dispatch).
        model.layers = model.layers[:num_layers_override]
    params = init_params_on_mesh(model, mesh, 0)
    # Serving-time param transforms (q/k/v + gate/up fusion, optional
    # LM-head quantization) — the engine's get_model applies these on
    # every load path; skipping them here benched the UNFUSED model
    # (3 extra kernel calls per layer).
    from nmvllm_tpu.model_loader import _finalize
    params = _finalize(model, params)
    params_bytes = count_quant_param_bytes(params)

    num_layers = len(model.layers)
    # Room for the scan-decoded continuation tokens past context_len.
    blocks_per_seq = cdiv(context_len + steps + 8, block_size)
    num_blocks = batch * blocks_per_seq + 1
    kv_shape = (num_blocks, 2, model.total_num_kv_heads, block_size,
                model.head_dim)
    kv_shapes = [kv_shape] * num_layers

    import functools
    from jax.sharding import PartitionSpec as P
    from nmvllm_tpu.worker.runner import shard_map_fn

    param_specs = model.specs()
    kv_specs = [P(None, None, "tp") for _ in range(num_layers)]

    def fwd(params, kv_caches, tokens, positions, slots, block_tables, ctx):
        meta = AttentionMetadata(
            slot_mapping=slots, block_tables=block_tables,
            context_lens=ctx, seq_lens=jnp.ones_like(ctx),
            prefix_lens=jnp.zeros_like(ctx))
        x, kv_caches = model.forward(params, tokens, positions, kv_caches,
                                     meta, is_prefill=False)
        if head == "none":
            # Ablation: skip lm_head + argmax; derive the next token from
            # the hidden state so the scan dependence chain is preserved.
            nxt = (jnp.sum(x[:, 0, :8], axis=-1).astype(jnp.int32) % 7)
            return nxt, kv_caches
        logits = model.compute_logits(params, x[:, 0, :])
        return jnp.argmax(logits, -1).astype(jnp.int32), kv_caches

    sharded = shard_map_fn(
        fwd, mesh,
        in_specs=(param_specs, kv_specs, P(), P(), P(), P(), P()),
        out_specs=(P(), kv_specs))

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode_step(params, kv_caches, tokens, positions, slots,
                    block_tables, ctx):
        return sharded(params, kv_caches, tokens, positions, slots,
                       block_tables, ctx)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 256, (batch, 1)), jnp.int32)
    positions = jnp.full((batch, 1), context_len - 1, jnp.int32)
    block_tables = jnp.asarray(
        np.arange(batch * blocks_per_seq).reshape(batch, blocks_per_seq),
        jnp.int32)
    slots = jnp.asarray(
        (np.arange(batch) * blocks_per_seq + blocks_per_seq - 1) *
        block_size + (context_len - 1) % block_size,
        jnp.int32).reshape(batch, 1)
    ctx = jnp.full((batch,), context_len, jnp.int32)

    # Multi-step autoregressive decode fully on device (lax.scan): the
    # sampled token feeds the next step, positions/slots advance in-graph.
    # This measures the compiled decode path without host-dispatch latency —
    # the single-step path (decode_step above) stays for latency checks.
    import functools as _ft

    # Donating the KV carry into the scan measured >100x SLOWER on this
    # stack (1-layer e2e: 0.77 -> 164.9 tok/s undonated; the donated
    # while-loop appears to host-sync per iteration, ~0.9 s RPC on the
    # tunnel). lax.scan already threads the carry in place inside the
    # loop, so instead of donation the KV pool is ALLOCATED IN-GRAPH
    # (zeros init ~9 ms for 7.7 GB) — no donated buffers, no double
    # residency of input+output pools.
    @_ft.partial(jax.jit, static_argnames=("n_steps",))
    def decode_many(params, tokens, positions, block_tables, n_steps):
        kv_caches = [jnp.zeros(s, kv_jnp_dtype) for s in kv_shapes]

        def body(carry, _):
            kv_caches, tokens, positions = carry
            pos = positions[:, 0]
            slots = (jnp.take_along_axis(
                block_tables, (pos // block_size)[:, None], axis=1)[:, 0] *
                block_size + pos % block_size)[:, None]
            ctx_now = pos + 1
            next_tok, kv_caches = sharded(params, kv_caches, tokens,
                                          positions, slots, block_tables,
                                          ctx_now)
            return (kv_caches, next_tok[:, None], positions + 1), next_tok

        (kv_caches, tokens, positions), toks = jax.lax.scan(
            body, (kv_caches, tokens, positions), None, length=n_steps)
        return toks, tokens, positions

    if dump_hlo:
        # Compile-only: write the optimized HLO of the multi-step decode
        # program for composition analysis (hidden copies, fusion count).
        lowered = decode_many.lower(params, tokens, positions,
                                    block_tables, n_steps=2)
        compiled = lowered.compile()
        with open(dump_hlo, "w") as f:
            f.write(compiled.as_text())
        stats = compiled.cost_analysis()
        if isinstance(stats, list):
            stats = stats[0]
        print(json.dumps({
            "metric": "hlo_dump", "path": dump_hlo,
            "bytes_accessed": stats.get("bytes accessed"),
            "flops": stats.get("flops"),
        }))
        return None, None, None

    # Warmup/compile with the EXACT timed executable (n_steps is a static
    # arg: warming with a different length would leave the timed call to
    # pay its own compile — which measured as a large phantom per-step
    # cost on the axon AOT service). Positions reset between calls, so
    # repeat calls rewrite the same slots; kv chains through donation.
    toks, _, _ = decode_many(params, tokens, positions, block_tables,
                             n_steps=steps)
    np.asarray(toks[-1][:1])  # real fence (block_until_ready lies here)

    tok_s = []
    for _ in range(max(1, samples)):
        t0 = time.perf_counter()
        toks, _, _ = decode_many(params, tokens, positions, block_tables,
                                 n_steps=steps)
        # block_until_ready alone is not trustworthy on the axon tunnel
        # (repeat calls have reported impossible numbers, docs/
        # PERF_NOTES.md "tunnel measurement traps"); a device_get of the
        # result serializes real bytes and cannot return early.
        np.asarray(toks[-1][:1])
        dt = time.perf_counter() - t0
        tok_s.append(batch * steps / dt)
    kv_bytes_per_step = (num_layers * 2 * model.total_num_kv_heads *
                         model.head_dim * context_len * batch *
                         jnp.dtype(kv_jnp_dtype).itemsize)
    tokens_per_s = tok_s[0] if len(tok_s) == 1 else tok_s
    return tokens_per_s, params_bytes, kv_bytes_per_step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="auto",
                        choices=["auto", "llama3-8b-int4", "mixtral",
                                 "debug"])
    parser.add_argument("--no-prefill", action="store_true",
                        help="skip the prefill_ms side metric")
    parser.add_argument("--prefill-only", action="store_true",
                        help="emit only the prefill_ms metric")
    parser.add_argument("--kv-dtype", default="auto",
                        choices=["auto", "fp8", "fp8_e5m2"],
                        help="paged-KV storage dtype; fp8 halves the KV "
                             "stream so batch can roughly double "
                             "(accuracy certified by the fp8-kv leg of "
                             "accuracy_cert.py)")
    # B=72 verified to fit HBM and beat B=64/56 (1561 vs 1496/1386
    # tok/s, docs/PERF_NOTES.md round 3); B=80 OOMs.
    parser.add_argument("--batch", type=int, default=72)
    parser.add_argument("--context-len", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--block-size", type=int, default=32)
    parser.add_argument("--a8", action="store_true", default=None,
                        help="serve INT4 via the W4A8 'packed' path: "
                             "weights stay packed int4 in HBM, in-kernel "
                             "unpack to int8 + one full-depth int8 MXU "
                             "dot (0.43x the exact kernel's time at "
                             "decode shapes, docs/PERF_NOTES.md round 5)")
    parser.add_argument("--no-a8", dest="a8", action="store_false")
    parser.add_argument("--profile", action="store_true",
                        help="differential per-layer profile: run at two "
                             "layer counts and report on-device ms/layer "
                             "+ non-layer (embed/head/sampler) cost")
    parser.add_argument("--dump-hlo", default=None, metavar="PATH",
                        help="compile-only: write the optimized decode-step "
                             "HLO to PATH and exit (composition analysis)")
    parser.add_argument("--layers", type=int, default=None,
                        help="override layer count (differential runs)")
    parser.add_argument("--no-head", action="store_true",
                        help="ablation: skip lm_head+argmax in the step")
    parser.add_argument("--quant-head", default=None, choices=["4", "8"],
                        help="serve the LM head weight-only quantized "
                             "(NMVLLM_QUANT_LM_HEAD)")
    args = parser.parse_args()
    if args.a8 is None:
        # Round-5 default ON: the packed W4A8 path is certified
        # (ACCURACY_r05 w4a8 legs) and 1.16x the exact kernel e2e
        # (docs/PERF_NOTES.md round 5). --no-a8 restores exact dequant.
        args.a8 = True
    if args.a8:
        import os
        os.environ["NMVLLM_INT4_A8"] = "packed"
    if args.quant_head:
        import os
        os.environ["NMVLLM_QUANT_LM_HEAD"] = args.quant_head

    import jax
    on_tpu = jax.devices()[0].platform == "tpu"
    config = args.config
    if config == "auto":
        config = "llama3-8b-int4" if on_tpu else "debug"

    layers_override = args.layers
    if config == "llama3-8b-int4":
        model_name, quant = "llama-3-8b", "gptq"
        batch, ctx, steps = args.batch, args.context_len, args.steps
        # The A8 "packed" mode keeps weights int4-packed in HBM (plus
        # small mult/zms sidecars) — no batch cap needed (the old
        # int8-stored mode halved the batch to fit).
    elif config == "mixtral":
        # Mixtral-8x7B geometry MoE decode (BASELINE config 5), scaled
        # to fit one 16 GB chip: 12 of 32 layers at FULL width, with
        # attention linears AND expert stacks INT4 (A8P packed stacks +
        # the grouped W4A8 kernel, round 5 — the r4 bf16-expert config
        # OOMed at 34.6 GB). At B>=32 nearly every expert activates
        # each step, so the all-weights roofline still applies.
        model_name, quant = "mixtral-8x7b", "gptq"
        batch, ctx, steps = min(args.batch, 32), args.context_len, \
            args.steps
        if layers_override is None:
            # Full-depth 12-layer INT4 experts (round 5; the r4 4-layer
            # bf16-expert proxy OOMed at 12 layers).
            layers_override = 12
    else:
        model_name, quant = "debug-llama", None
        batch, ctx, steps = 8, 128, args.steps

    if args.profile:
        full_layers = 32 if config == "llama3-8b-int4" else 2
        lo_layers = 8 if config == "llama3-8b-int4" else 1
        tps_lo, _, _ = run_decode_bench(
            model_name, quant, batch, ctx, steps,
            block_size=args.block_size, num_layers_override=lo_layers)
        tps_hi, _, _ = run_decode_bench(
            model_name, quant, batch, ctx, steps,
            block_size=args.block_size)
        ms_lo = batch / tps_lo * 1e3
        ms_hi = batch / tps_hi * 1e3
        per_layer = (ms_hi - ms_lo) / (full_layers - lo_layers)
        other = ms_lo - lo_layers * per_layer
        print(json.dumps({
            "metric": "decode_profile",
            "ms_per_layer": round(per_layer, 4),
            "layer_total_ms": round(per_layer * full_layers, 3),
            "embed_head_sampler_ms": round(other, 3),
            "step_ms": round(ms_hi, 3),
            "layer_fraction": round(per_layer * full_layers / ms_hi, 3),
        }))
        return

    head = "none" if args.no_head else "argmax"
    if args.dump_hlo:
        run_decode_bench(model_name, quant, batch, ctx, steps,
                         block_size=args.block_size,
                         num_layers_override=layers_override,
                         dump_hlo=args.dump_hlo, head=head)
        return

    def emit_prefill():
        # TTFT-proportional side metric (VERDICT r3 item 6): on-device
        # per-call prefill-step ms at serving shapes, incl. the batched
        # multi-prompt grid. Resilient: a prefill failure must not cost
        # the headline decode metric.
        if config == "debug":
            cfgs, nlo = [(1, 128), (4, 64)], None
        elif config == "mixtral":
            cfgs, nlo = [(1, 1024), (4, 512)], layers_override
        else:
            cfgs, nlo = [(1, 2048), (1, 8192), (4, 512)], layers_override
        try:
            # Keep the side metric from ever eating the headline: the
            # driver parses the LAST line, so the decode result prints
            # after this — but a hung prefill compile would lose both.
            pf = run_prefill_bench(model_name, quant, cfgs,
                                   block_size=args.block_size,
                                   num_layers_override=nlo)
            print(json.dumps({
                "metric": f"prefill_ms[{model_name}"
                          f"{'+' + quant if quant else ''}]",
                "unit": "ms/prefill-call", **{
                    f"prefill_ms[{k}]": v for k, v in pf.items()}}),
                flush=True)
        except Exception as e:
            print(json.dumps({"metric": "prefill_ms_error",
                              "error": str(e)[:300]}), flush=True)

    if args.prefill_only:
        emit_prefill()
        return

    try:
        tokens_per_s, params_bytes, kv_bytes = run_decode_bench(
            model_name, quant, batch, ctx, steps,
            block_size=args.block_size, kv_dtype=args.kv_dtype,
            num_layers_override=layers_override, head=head)
    except Exception as e:  # HBM OOM at the default batch: retry smaller.
        # Match ONLY the allocator's status code: a loose "memory" match
        # once caught "#tpu.memory_space<hbm>" inside a Mosaic compile
        # diagnostic and pointlessly retried a deterministic failure.
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        for batch in (56, 32):
            try:
                tokens_per_s, params_bytes, kv_bytes = run_decode_bench(
                    model_name, quant, batch, ctx, steps,
                    block_size=args.block_size, kv_dtype=args.kv_dtype,
                    num_layers_override=layers_override)
                break
            except Exception as e2:
                if "RESOURCE_EXHAUSTED" not in str(e2) or batch == 32:
                    raise
    if not args.no_prefill:
        emit_prefill()
    if (config == "llama3-8b-int4" and args.kv_dtype == "auto"
            and on_tpu):
        # fp8-KV capacity record as a SIDE metric (the headline stays
        # the bf16-KV config whose roofline matches prior rounds): fp8
        # halves KV bytes so batch roughly doubles — 2675.5 tok/s at
        # B=128 in the round-5 rehearsal vs 1812.6 at B=72 bf16.
        try:
            for b8 in (128, 128, 112, 96):
                # B=128 listed twice: one free retry for transient
                # tunnel INTERNAL errors (observed: "read body: response
                # body closed" from the remote-compile service).
                try:
                    t8, pb8, kvb8 = run_decode_bench(
                        model_name, quant, b8, ctx, steps,
                        block_size=args.block_size, kv_dtype="fp8",
                        num_layers_override=layers_override)
                    break
                except Exception as e8:
                    transient = ("INTERNAL" in str(e8)
                                 or "RESOURCE_EXHAUSTED" in str(e8))
                    if not transient or b8 == 96:
                        raise
            roof8 = roofline_tokens_per_s(pb8, detect_hbm_gbps(), b8,
                                          kvb8)
            print(json.dumps({
                "metric": f"decode_tokens_per_s_per_chip[{model_name}"
                          f"+{quant},B={b8},ctx={ctx},kv=fp8]",
                "value": round(t8, 2), "unit": "tokens/s/chip",
                "vs_baseline": round(t8 / roof8, 4)}), flush=True)
        except Exception as e8:
            print(json.dumps({"metric": "fp8_kv_side_metric_failed",
                              "error": str(e8)[:300]}), flush=True)
    hbm = detect_hbm_gbps()
    roof = roofline_tokens_per_s(params_bytes, hbm, batch, kv_bytes)
    bw_lo, bw_hi, bw_spread = measure_hbm_bracketed()
    out = {
        "metric": f"decode_tokens_per_s_per_chip[{model_name}"
                  f"{'+' + quant if quant else ''},B={batch},ctx={ctx}"
                  f"{',kv=fp8' if args.kv_dtype.startswith('fp8') else ''}]",
        "value": round(tokens_per_s, 2),
        "unit": "tokens/s/chip",
        # vs the SPEC-sheet roofline (819 GB/s v5e). The tunnel device
        # achieves far less: hbm_measured_gbps brackets 3 in-run chained
        # full-HBM read samples; vs_achievable re-rooflines against the
        # best sample ONLY when the bracket is tight (<15% spread) —
        # a drifting probe is not evidence (VERDICT r3 item 8).
        "vs_baseline": round(tokens_per_s / roof, 4),
        "hbm_measured_gbps": [round(bw_lo, 1), round(bw_hi, 1)],
        "hbm_probe_spread": round(bw_spread, 3),
    }
    if bw_spread < 0.15:
        out["vs_achievable"] = round(tokens_per_s / roofline_tokens_per_s(
            params_bytes, bw_hi, batch, kv_bytes), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
