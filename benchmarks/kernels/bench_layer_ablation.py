"""Layer-cost ablation at bench.py geometry (Llama-3-8B INT4).

Times the REAL LlamaDecoderLayer stack (same construction path as
bench.py: build_model + serving fusion) inside a lax.scan, then
re-times it with individual components knocked out, so the per-layer
cost is attributed instead of guessed.

Ablations:
  full        — the layer exactly as the model runs it
  no_attn     — paged_attention + cache write replaced by identity
  no_mlp      — MLP replaced by identity
  no_rotary   — RoPE skipped
  no_quant    — all projections replaced by plain bf16 dots of the
                SAME shapes (isolates dequant cost vs MXU+glue)

Methodology (round-5 rewrite — the original version was wrong three
ways: instance-level ``__call__`` assignment is a silent no-op for the
``obj()`` syntax, per-call RPC did not cancel across layer counts, and
non-donated KV inputs added data-dependent copy costs):
  * ONE model + params per layer count; ablation wrappers are applied
    only while that ablation's jit trace is warmed, then restored —
    all executables share the same weight buffers;
  * KV pools allocated in-graph (bench.py decode_many pattern);
  * per-layer cost = (t_hi - t_lo) / (hi - lo) slope, both points and
    all ablations timed in interleaved rounds, median reported.
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


class _Wrap:
    """Call-replacing delegate. Assigning ``obj.__call__`` on an
    INSTANCE does nothing for the ``obj(...)`` syntax (Python looks
    special methods up on the type), so ablation replaces the attribute
    holding the object with this wrapper instead, forwarding every
    other attribute."""

    def __init__(self, inner, fn):
        object.__setattr__(self, "_inner", inner)
        object.__setattr__(self, "_fn", fn)

    def __getattr__(self, k):
        return getattr(object.__getattribute__(self, "_inner"), k)

    def __call__(self, *a, **kw):
        return object.__getattribute__(self, "_fn")(*a, **kw)


def build_base(batch, ctx, block_size, n_layers):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
    from nmvllm_tpu.model_loader import (_finalize, build_model,
                                         init_params_on_mesh)
    from nmvllm_tpu.parallel.mesh import build_mesh
    from nmvllm_tpu.utils import cdiv

    mesh = build_mesh(1, 1)
    engine_config = EngineConfig(
        model_config=ModelConfig(model="llama-3-8b", quantization="gptq",
                                 dtype="bfloat16"),
        cache_config=CacheConfig(block_size=block_size),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_model_len=ctx,
                                         max_num_seqs=batch),
        device_config=DeviceConfig())
    model = build_model(engine_config)
    model.layers = model.layers[:n_layers]
    params = init_params_on_mesh(model, mesh, 0)
    params = _finalize(model, params)  # serving fusion (as bench.py)
    # Only the layer stack runs here — drop embed/head/final-norm
    # buffers (1+ GB each at 8B geometry; ten resident copies OOMed the
    # previous version of this script).
    params_sub = {"layers": params["layers"], "rotary": params["rotary"]}
    del params

    blocks_per_seq = cdiv(ctx + 32, block_size)
    num_blocks = batch * blocks_per_seq + 1
    rng = np.random.default_rng(0)
    state = dict(
        mesh=mesh, model=model, params=params_sub,
        n_layers=n_layers, batch=batch, block_size=block_size,
        num_blocks=num_blocks,
        x0=jnp.asarray(rng.standard_normal((batch, 1, 4096)),
                       jnp.bfloat16),
        positions=jnp.full((batch, 1), ctx - 1, jnp.int32),
        block_tables=jnp.asarray(
            np.arange(batch * blocks_per_seq).reshape(batch,
                                                      blocks_per_seq),
            jnp.int32),
        slots=jnp.asarray(
            (np.arange(batch) * blocks_per_seq + blocks_per_seq - 1) *
            block_size + (ctx - 1) % block_size,
            jnp.int32).reshape(batch, 1),
        ctx_arr=jnp.full((batch,), ctx, jnp.int32),
    )
    return state


def _apply_ablation(state, ablation):
    """Mutates the model for ``ablation``; returns (params_variant,
    restore_fn)."""
    import jax
    import jax.numpy as jnp
    model = state["model"]
    params = state["params"]
    saved = []

    def save(obj, attr):
        saved.append((obj, attr, getattr(obj, attr)))

    if ablation == "no_attn":
        for l in model.layers:
            save(l, "self_attn")
            l.self_attn = _Wrap(
                l.self_attn,
                lambda p, rotary, rotary_params, x, positions, kv_cache,
                meta, **kw: (x, kv_cache))
    elif ablation == "no_mlp":
        for l in model.layers:
            save(l, "mlp")
            l.mlp = _Wrap(l.mlp, lambda p, x, **kw: x)
    elif ablation == "no_rotary":
        save(model, "rotary")
        model.rotary = None
        params = dict(params, rotary={})
    elif ablation == "no_quant":
        def make_dense(fused):
            k = fused.in_features
            n = fused.out_features

            def call(p, x, prologue=None, aux=None, eps=1e-6,
                     epilogue_add=None, bias=None):
                if prologue == "rmsnorm":
                    xf = x.astype(jnp.float32)
                    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
                    x = (xf * jax.lax.rsqrt(var + eps) *
                         aux.astype(jnp.float32)[None, :]).astype(x.dtype)
                elif prologue == "silu_mul":
                    x = (jax.nn.silu(x.astype(jnp.float32)) *
                         aux.astype(jnp.float32)).astype(x.dtype)
                # In-graph zeros (a closed-over (k, n) literal would
                # blow the remote-compile body limit).
                w = jnp.zeros((k, n), jnp.bfloat16)
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                if epilogue_add is not None:
                    y = y + epilogue_add.astype(jnp.float32)
                return y.astype(x.dtype)
            return call

        for l in model.layers:
            sa = l.self_attn
            if sa._qkv_fused is not None:
                save(sa, "_qkv_fused")
                sa._qkv_fused = _Wrap(sa._qkv_fused,
                                      make_dense(sa._qkv_fused))
            save(sa, "o_proj")
            sa.o_proj = _Wrap(sa.o_proj, make_dense(sa.o_proj))
            if l.mlp._gu_fused is not None:
                save(l.mlp, "_gu_fused")
                l.mlp._gu_fused = _Wrap(l.mlp._gu_fused,
                                        make_dense(l.mlp._gu_fused))
            save(l.mlp, "down_proj")
            l.mlp.down_proj = _Wrap(l.mlp.down_proj,
                                    make_dense(l.mlp.down_proj))

    def restore():
        for obj, attr, val in reversed(saved):
            setattr(obj, attr, val)

    return params, restore


def make_run(state, ablation, steps):
    """Builds + WARMS (compiles) the ablated executable, then restores
    the model. Returns (timed_call, params_variant)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from nmvllm_tpu.models.base import AttentionMetadata
    from nmvllm_tpu.worker.runner import shard_map_fn

    model = state["model"]
    n_layers = state["n_layers"]
    params, restore = _apply_ablation(state, ablation)
    specs = {"layers": [l.specs() for l in model.layers],
             "rotary": (model.rotary.specs()
                        if model.rotary is not None else {})}
    kv_specs = [P(None, None, "tp") for _ in range(n_layers)]
    kv_shape = (state["num_blocks"], 2, model.total_num_kv_heads,
                state["block_size"], model.head_dim)
    positions, slots = state["positions"], state["slots"]
    block_tables, ctx_arr = state["block_tables"], state["ctx_arr"]

    def fwd(params, kvs, x):
        meta = AttentionMetadata(
            slot_mapping=slots, block_tables=block_tables,
            context_lens=ctx_arr, seq_lens=jnp.ones_like(ctx_arr),
            prefix_lens=jnp.zeros_like(ctx_arr))
        residual = None
        new = []
        for layer, lp, kv in zip(model.layers, params["layers"], kvs):
            x, residual, kv = layer(lp, model.rotary, params["rotary"],
                                    x, positions, kv, meta, residual,
                                    is_prefill=False, has_prefix=False)
            new.append(kv)
        if residual is not None:
            x = (x.astype(jnp.float32) +
                 residual.astype(jnp.float32)).astype(x.dtype)
        return x, new

    sharded = shard_map_fn(
        fwd, state["mesh"], in_specs=(specs, kv_specs, P()),
        out_specs=(P(), kv_specs))

    @jax.jit
    def run(params, x):
        kv_caches = [jnp.zeros(kv_shape, jnp.bfloat16)
                     for _ in range(n_layers)]

        def step(carry, _):
            x, kvs = carry
            x, kvs = sharded(params, kvs, x)
            return (x * 1e-3, kvs), ()
        (x, kvs), _ = jax.lax.scan(step, (x, kv_caches), None,
                                   length=steps)
        return x

    x0 = state["x0"]
    try:
        for attempt in (0, 1, 2):
            try:
                out = run(params, x0)               # trace + compile
                np.asarray(jax.tree.leaves(out)[0])[:1]
                break
            except Exception as e:
                # The tunnel compile service throws transient INTERNAL
                # ("read body: response body closed") errors; retry.
                if "INTERNAL" not in str(e) or attempt == 2:
                    raise
                time.sleep(5)
    finally:
        restore()

    def call():
        t0 = time.perf_counter()
        out = run(params, x0)
        np.asarray(jax.tree.leaves(out)[0])[:1]     # real fence
        return time.perf_counter() - t0

    return call


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=72)
    parser.add_argument("--ctx", type=int, default=1024)
    parser.add_argument("--layers-lo", type=int, default=4)
    parser.add_argument("--layers-hi", type=int, default=12)
    parser.add_argument("--steps", type=int, default=24)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--ablations", default="full,no_attn,no_mlp,"
                        "no_rotary,no_quant")
    args = parser.parse_args()
    lo, hi, steps = args.layers_lo, args.layers_hi, args.steps
    ablations = [a for a in args.ablations.split(",") if a]

    calls = {}
    for n_layers in (lo, hi):
        state = build_base(args.batch, args.ctx, 32, n_layers)
        for ab in ablations:
            t0 = time.perf_counter()
            calls[(ab, n_layers)] = make_run(state, ab, steps)
            print(json.dumps({"ablation": ab, "layers": n_layers,
                              "compile_s":
                              round(time.perf_counter() - t0, 1)}),
                  flush=True)

    slopes = {ab: [] for ab in ablations}
    for _ in range(args.rounds):
        for ab in ablations:
            t_lo = calls[(ab, lo)]()
            t_hi = calls[(ab, hi)]()
            slopes[ab].append((t_hi - t_lo) / (hi - lo) / steps * 1e3)
    results = {}
    for ab, ss in slopes.items():
        ss_sorted = sorted(ss)
        med = ss_sorted[len(ss_sorted) // 2]
        results[ab] = round(med, 4)
        print(json.dumps({"ablation": ab,
                          "ms_per_layer_slope": results[ab],
                          "samples": [round(s, 4) for s in ss]}),
              flush=True)
    if "full" in results:
        out = {"full": results["full"]}
        for k, v in results.items():
            if k != "full":
                out[f"delta {k}"] = round(results["full"] - v, 4)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
