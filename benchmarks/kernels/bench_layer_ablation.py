"""Layer-cost ablation at bench.py geometry (Llama-3-8B INT4, B=56).

bench.py --profile measures ~8.4 ms/layer in-model while the component
microbenches sum to ~2.5 ms. This bench times the REAL LlamaDecoderLayer
(same construction path as bench.py: build_model + finalize_for_serving)
inside a lax.scan, then re-times it with individual components knocked
out, so the gap is attributed instead of guessed.

Ablations:
  full        — the layer exactly as the model runs it
  no_attn     — paged_attention + cache write replaced by identity
  no_mlp      — MLP replaced by identity
  no_rotary   — RoPE skipped
  no_quant    — all projections replaced by plain bf16 dots of the
                SAME shapes (isolates dequant cost vs MXU+glue)

One process, chained scan, two-point slope over layer repeats.
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
    np.asarray(jax.tree.leaves(out)[0])[:1]  # real fence (PERF_NOTES)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    return time.perf_counter() - t0


def build(batch, ctx, block_size, n_layers, ablation):
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
    from nmvllm_tpu.model_loader import build_model, init_params_on_mesh
    from nmvllm_tpu.models.base import AttentionMetadata
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
    from nmvllm_tpu.model_loader import _finalize
    params = _finalize(model, params)  # serving fusion (as bench.py)

    layer = model.layers[0]
    lp = params["layers"][0]

    if ablation == "no_attn":
        orig_call = type(layer.self_attn).__call__

        def attn_identity(self, p, rotary, rotary_params, x, positions,
                          kv_cache, meta, **kw):
            return x, kv_cache
        for l in model.layers:
            l.self_attn.__call__ = attn_identity.__get__(l.self_attn)
    elif ablation == "no_mlp":
        for l in model.layers:
            l.mlp.__call__ = (lambda self, p, x, **kw: x).__get__(l.mlp)
    elif ablation == "no_rotary":
        model.rotary = None
        # Attention calls rotary only if not None; LlamaDecoderLayer
        # passes model.rotary through.
    elif ablation == "no_quant":
        import types
        from nmvllm_tpu.layers.fused import split_fused

        def make_dense(fused):
            k = fused.in_features
            n = fused.out_features
            w = jnp.zeros((k, n), jnp.bfloat16)

            def call(self, p, x, prologue=None, aux=None, eps=1e-6,
                     epilogue_add=None):
                if prologue == "rmsnorm":
                    xf = x.astype(jnp.float32)
                    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
                    x = (xf * jax.lax.rsqrt(var + eps) *
                         aux.astype(jnp.float32)[None, :]).astype(x.dtype)
                elif prologue == "silu_mul":
                    x = (jax.nn.silu(x.astype(jnp.float32)) *
                         aux.astype(jnp.float32)).astype(x.dtype)
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                if epilogue_add is not None:
                    y = y + epilogue_add.astype(jnp.float32)
                return y.astype(x.dtype)
            return call

        for l in model.layers:
            sa = l.self_attn
            if sa._qkv_fused is not None:
                sa._qkv_fused.__call__ = types.MethodType(
                    make_dense(sa._qkv_fused), sa._qkv_fused)
            sa.o_proj.__call__ = types.MethodType(
                make_dense(sa.o_proj), sa.o_proj)
            if l.mlp._gu_fused is not None:
                l.mlp._gu_fused.__call__ = types.MethodType(
                    make_dense(l.mlp._gu_fused), l.mlp._gu_fused)
            l.mlp.down_proj.__call__ = types.MethodType(
                make_dense(l.mlp.down_proj), l.mlp.down_proj)

    blocks_per_seq = cdiv(ctx + 32, block_size)
    num_blocks = batch * blocks_per_seq + 1
    kv_caches = [jnp.zeros((num_blocks, 2, model.total_num_kv_heads,
                            block_size, model.head_dim), jnp.bfloat16)
                 for _ in range(n_layers)]

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((batch, 1, 4096)), jnp.bfloat16)
    positions = jnp.full((batch, 1), ctx - 1, jnp.int32)
    block_tables = jnp.asarray(
        np.arange(batch * blocks_per_seq).reshape(batch, blocks_per_seq),
        jnp.int32)
    slots = jnp.asarray(
        (np.arange(batch) * blocks_per_seq + blocks_per_seq - 1) *
        block_size + (ctx - 1) % block_size, jnp.int32).reshape(batch, 1)
    ctx_arr = jnp.full((batch,), ctx, jnp.int32)

    import functools
    from jax.sharding import PartitionSpec as P
    from nmvllm_tpu.worker.runner import shard_map_fn

    param_specs = model.specs()
    kv_specs = [P(None, None, "tp") for _ in range(n_layers)]

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
        fwd, mesh, in_specs=(param_specs, kv_specs, P()),
        out_specs=(P(), kv_specs))

    # No donation: timed() calls the fn twice with the same buffers (the
    # one-time loop-init copy is equal across ablations and amortized).
    # params must be an ARGUMENT: closed-over quantized weights embed as
    # HLO literals and blow past the remote-compile body limit (HTTP 413).
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(params, x, kv_caches, n):
        def step(carry, _):
            x, kvs = carry
            x, kvs = sharded(params, kvs, x)
            return (x * 1e-3, kvs), ()
        (x, kvs), _ = jax.lax.scan(step, (x, kv_caches), None, length=n)
        return x, kvs

    return run, params, x0, kv_caches


def measure(batch, ctx, block_size, n_layers, ablation, steps):
    run, params, x0, kvs = build(batch, ctx, block_size, n_layers, ablation)
    dt = timed(lambda p, x, k: run(p, x, k, steps), params, x0, kvs)
    return dt / steps / n_layers


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=56)
    parser.add_argument("--ctx", type=int, default=1024)
    parser.add_argument("--layers", type=int, default=8)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--ablations", default="full,no_attn,no_mlp,"
                        "no_rotary,no_quant")
    args = parser.parse_args()
    results = {}
    for ab in args.ablations.split(","):
        ms = measure(args.batch, args.ctx, 32, args.layers, ab,
                     args.steps) * 1e3
        results[ab] = round(ms, 3)
        print(json.dumps({"ablation": ab, "ms_per_layer": results[ab]}),
              flush=True)
    if "full" in results:
        out = {"full": results["full"]}
        for k, v in results.items():
            if k != "full":
                out[f"delta {k}"] = round(results["full"] - v, 3)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
