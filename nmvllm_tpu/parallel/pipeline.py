"""Pipeline-parallel serving (GPipe-style) over a (pp, tp) mesh.

Reference: vllm's PP support — NCCL stage groups + IntermediateTensors
send/recv between per-stage workers and one "virtual engine" per stage
(parallel_state.py:832, worker_base.py:267, llm_engine.py:303). The
TPU-native rebuild is SPMD: per-layer params are STACKED along a leading
layer axis sharded over the ``pp`` mesh axis, every stage runs the same
compiled program, activations hop stages via ``lax.ppermute`` (ICI
neighbour exchange), and microbatches fill the pipeline — the canonical
scan-over-stacked-layers JAX pipeline (no send/recv control plane, no
per-stage processes, no virtual engines: the scheduler stays stage-
agnostic because one compiled step advances every stage).

Decode semantics: batch B splits into ``num_micro`` microbatches; tick t
has stage s processing microbatch t - s (bubble ticks carry slot=-1 so
the paged-KV write is a no-op and ctx=0 makes attention skip). Prefill
runs the same schedule with T>1 tokens per row (the engine prefills one
prompt at a time, so num_micro=1 and the pipeline drains in pp ticks).
The last stage's head outputs are combined with one masked psum.
"""
import functools
from typing import Any, List

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.models.base import AttentionMetadata
from nmvllm_tpu.parallel.mesh import PP_AXIS, TP_AXIS


def stack_layer_params(layer_params: List[Any]):
    """[{...}, {...}, ...] (identical structure) -> {...} of (L, ...)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)


def pp_param_specs(model):
    """Sharding specs for the pipeline step: stacked layers get a leading
    PP dim on every leaf; the rest of the model is replicated over pp
    (embed on stage 0 and head on the last stage read replicated
    weights — their FLOPs are negligible at decode sizes)."""
    layer_spec = model.layers[0].specs()
    stacked = jax.tree.map(
        lambda spec: P(PP_AXIS, *spec), layer_spec,
        is_leaf=lambda s: isinstance(s, P))
    other = {k: v for k, v in model.specs().items() if k != "layers"}
    return {"layers": stacked, **other}


def pp_kv_spec(data_parallel: bool = False):
    """(L, blocks, 2, kv_heads, bs, d): layers over pp, kv heads over tp;
    under PP×DP the block pool additionally shards over the data axis
    (replica r owns its pool segment, as in the single-stage DP path)."""
    from nmvllm_tpu.parallel.mesh import DATA_AXIS
    return P(PP_AXIS, DATA_AXIS if data_parallel else None, None,
             TP_AXIS, None, None)


def layer_static_sig(layer):
    """Static (non-param) attention config of a decoder layer — what the
    stage scan would silently homogenize if it differed across layers."""
    sa = getattr(layer, "self_attn", None)
    if sa is None:
        return (type(layer).__name__,)
    alibi = getattr(sa, "alibi_slopes", None)
    return (type(layer).__name__,
            int(getattr(sa, "sliding_window", 0) or 0),
            float(getattr(sa, "attn_logit_soft_cap", 0.0) or 0.0),
            getattr(sa, "blocksparse", None),
            None if alibi is None else tuple(
                float(x) for x in jax.device_get(alibi).reshape(-1)))


def scan_period(model) -> int:
    """Smallest p such that layer i's static config == layer (i % p)'s.

    Homogeneous stacks (llama, mistral, ...) give 1; gemma2 and
    phi-3-small alternate sliding-window/blocksparse layers and give 2.
    The stage scan then applies p distinct layer programs cyclically."""
    sigs = [layer_static_sig(la) for la in model.layers]
    n = len(sigs)
    for p in range(1, n + 1):
        if n % p == 0 and all(sigs[i] == sigs[i % p] for i in range(n)):
            return p
    return n


def pp_lora_layer_names(model):
    """Per-layer ordered LoRA target names: names[i][z] = layer i's z-th
    adapter-bearing Linear. Positional correspondence across layers is
    guaranteed by the PP one-param-structure requirement."""
    from nmvllm_tpu.worker.runner import _layer_named_linears
    return [[name for name, _ in _layer_named_linears(layer)]
            for layer in model.layers]


def make_pipeline_fwd(model, pp: int, num_micro: int, *,
                      is_prefill: bool = False, has_prefix: bool = False,
                      capture_hidden: bool = False, lora_names=None):
    """Per-device (shard_map body) pipeline forward.

    fwd(params_stacked, kv_stacked, tokens, positions, slots,
        block_tables, ctx, seq_lens, prefix_lens[, lora_indices,
        lora_stacks])
      -> (last_token_logits (B, V_pad) f32, kv_stacked)
    With ``capture_hidden`` (prompt logprobs / draft heads) the return is
    (logits, hidden (B, T, hidden) of the final-normed stack, kv_stacked);
    the hidden buffer is psum-replicated off the last stage like logits.

    tokens/positions/slots: (B, T); ctx/seq_lens/prefix_lens: (B,).
    ``params_stacked``: model params with params["layers"] stacked
    (stack_layer_params); kv_stacked: (L, blocks, 2, H, bs, d) with the
    layer axis sharded over ``pp``. B must divide by ``num_micro``.

    Multi-LoRA: pass ``lora_names`` (pp_lora_layer_names) and the fwd
    takes two extra args — per-row adapter slots (B,) and positionally
    stacked adapter factors (tuple over target position z of
    (A (L, S+1, K, r), B (L, S+1, r, N)), layer axis sharded over pp
    like params["layers"]). Each scan step re-binds the sliced per-layer
    stacks to the proto layers' names via a nested lora_scope.
    """
    period = scan_period(model)
    protos = model.layers[:period]
    rotary = model.rotary

    def fwd(params, kv, tokens, positions, slots, block_tables, ctx,
            seq_lens, prefix_lens, lora_indices=None, lora_stacks=None):
        batch, t_len = tokens.shape
        assert batch % num_micro == 0, (batch, num_micro)
        mb = batch // num_micro
        x_all = model.embed_tokens(params["embed_tokens"], tokens)
        if model.embedding_multiplier != 1.0:
            x_all = x_all * jnp.asarray(model.embedding_multiplier,
                                        x_all.dtype)
        stage = jax.lax.axis_index(PP_AXIS)
        hidden = x_all.shape[-1]
        n_ticks = num_micro + pp - 1

        def meta_for(mb_idx, valid):
            def take(a):
                return jax.lax.dynamic_slice_in_dim(a, mb_idx * mb, mb, 0)
            sl = jnp.where(valid, take(slots), -1)  # bubble: no KV write
            cl = jnp.where(valid, take(ctx), 0)     # bubble: no attention
            sq = jnp.where(valid, take(seq_lens), 1)
            pf = jnp.where(valid, take(prefix_lens), 0)
            return AttentionMetadata(
                slot_mapping=sl, block_tables=take(block_tables),
                context_lens=cl, seq_lens=sq, prefix_lens=pf), sq

        def run_stage(carry_x, carry_res, kv, mb_idx, valid):
            meta, sq = meta_for(mb_idx, valid)
            pos = jax.lax.dynamic_slice_in_dim(positions, mb_idx * mb,
                                               mb, 0)
            if lora_names is not None:
                idx_mb = jnp.where(
                    valid,
                    jax.lax.dynamic_slice_in_dim(lora_indices,
                                                 mb_idx * mb, mb, 0),
                    0)  # bubble rows use the zero (no-LoRA) slot

            def body(carry, layer_in):
                x, res = carry
                lp_chunk, kv_chunk, la_chunk = layer_in
                kv_outs = []
                # One scan step = `period` layers, each with its OWN
                # static config (gemma2 alternates sliding windows,
                # phi-3-small alternates dense/blocksparse — a plain
                # stacked scan would homogenize them to layer 0's).
                for j, proto in enumerate(protos):
                    lp = jax.tree.map(lambda a: a[j], lp_chunk)
                    if lora_names is not None:
                        from nmvllm_tpu.lora.context import lora_scope
                        scope_stacks = {
                            nm: (la_chunk[z][0][j], la_chunk[z][1][j])
                            for z, nm in enumerate(lora_names[j])}
                        scope = lora_scope(idx_mb, scope_stacks)
                    else:
                        import contextlib
                        scope = contextlib.nullcontext()
                    with scope:
                        x, res, kv_j = proto(lp, rotary, params["rotary"],
                                             x, pos, kv_chunk[j], meta,
                                             res, is_prefill=is_prefill,
                                             has_prefix=has_prefix)
                    if res is None:  # epilogue-fused layers: one stream
                        res = jnp.zeros_like(x)
                    kv_outs.append(kv_j)
                return (x, res), jnp.stack(kv_outs)

            def per_period(a):
                return a.reshape(a.shape[0] // period, period,
                                 *a.shape[1:])

            layers_local = jax.tree.map(per_period, params["layers"])
            kv_local = kv.reshape(kv.shape[0] // period, period,
                                  *kv.shape[1:])
            stacks_local = (jax.tree.map(per_period, lora_stacks)
                            if lora_names is not None else None)
            (x, res), kv_new = jax.lax.scan(
                body, (carry_x, carry_res),
                (layers_local, kv_local, stacks_local))
            kv_new = kv_new.reshape(kv.shape)
            return x, res, kv_new, sq

        def tick(t, state):
            x_cur, res_cur, kv, out, xhid = state
            mb_idx = jnp.clip(t - stage, 0, num_micro - 1)
            valid = (t - stage >= 0) & (t - stage < num_micro)
            # Stage 0 injects a fresh microbatch each tick.
            inject = jax.lax.dynamic_slice_in_dim(
                x_all, jnp.clip(t, 0, num_micro - 1) * mb, mb, 0)
            x_in = jnp.where(stage == 0, inject, x_cur)
            res_in = jnp.where(stage == 0, jnp.zeros_like(res_cur),
                               res_cur)
            x, res, kv, sq = run_stage(x_in, res_in, kv, mb_idx, valid)
            # Last stage finishes microbatch t - (pp - 1).
            done_idx = t - (pp - 1)
            is_last = stage == pp - 1
            write = is_last & (done_idx >= 0)

            def compute(state):
                o, xh = state
                x_fin = (x.astype(jnp.float32) +
                         res.astype(jnp.float32)).astype(x.dtype)
                x_fin = model.norm(params["norm"], x_fin)
                if is_prefill:
                    last = model.select_last_token(x_fin, sq)
                else:
                    last = x_fin[:, 0, :]
                logits = model.compute_logits(params, last)
                o = jax.lax.dynamic_update_slice_in_dim(
                    o, logits[None].astype(jnp.float32),
                    jnp.maximum(done_idx, 0), 0)
                if capture_hidden:
                    xh = jax.lax.dynamic_update_slice_in_dim(
                        xh, x_fin[None], jnp.maximum(done_idx, 0), 0)
                return o, xh

            out, xhid = jax.lax.cond(write, compute, lambda s: s,
                                     (out, xhid))
            # Hop activations to the next stage (ring; the wraparound
            # edge into stage 0 is overwritten by the inject above).
            perm = [(i, (i + 1) % pp) for i in range(pp)]
            x = jax.lax.ppermute(x, PP_AXIS, perm)
            res = jax.lax.ppermute(res, PP_AXIS, perm)
            return x, res, kv, out, xhid

        mb = batch // num_micro
        x0 = jnp.zeros((mb, t_len, hidden), x_all.dtype)
        res0 = jnp.zeros_like(x0)
        out0 = jnp.zeros((num_micro, mb, model.lm_head.padded_vocab),
                         jnp.float32)
        xh0 = (jnp.zeros((num_micro, mb, t_len, hidden), x_all.dtype)
               if capture_hidden else jnp.zeros((), x_all.dtype))
        _, _, kv_out, out, xhid = jax.lax.fori_loop(
            0, n_ticks, tick, (x0, res0, kv, out0, xh0))
        # Only the last stage holds real logits: one masked psum shares
        # them with every stage (replicated output).
        is_last = jax.lax.axis_index(PP_AXIS) == pp - 1
        out = jnp.where(is_last, out, 0.0)
        out = jax.lax.psum(out, PP_AXIS)
        logits = out.reshape(batch, -1)
        if capture_hidden:
            xhid = jax.lax.psum(jnp.where(is_last, xhid, 0.0), PP_AXIS)
            return logits, xhid.reshape(batch, t_len, hidden), kv_out
        return logits, kv_out

    return fwd


def build_pipeline_decode_fn(model, mesh, batch: int, num_micro: int):
    """Compiled standalone PP decode step (tests / dryrun).

    fn(params_stacked, kv_stacked, tokens, positions, slots,
       block_tables, ctx) -> (logits, kv_stacked)
    """
    from nmvllm_tpu.worker.runner import shard_map_fn
    assert batch % num_micro == 0, (batch, num_micro)
    pp = mesh.shape[PP_AXIS]
    inner = make_pipeline_fwd(model, pp, num_micro, is_prefill=False)

    def fwd(params, kv, tokens, positions, slots, block_tables, ctx):
        return inner(params, kv, tokens, positions, slots, block_tables,
                     ctx, jnp.ones_like(ctx), jnp.zeros_like(ctx))

    param_specs = pp_param_specs(model)
    kv_spec = pp_kv_spec()
    sharded = shard_map_fn(
        fwd, mesh,
        in_specs=(param_specs, kv_spec, P(), P(), P(), P(), P()),
        out_specs=(P(), kv_spec))
    return jax.jit(sharded, donate_argnums=(1,))


def pipeline_shard_params(model, params, mesh):
    """Stack layer params and place them (and the rest) on the mesh."""
    stacked = stack_layer_params(params["layers"])
    new_params = {k: v for k, v in params.items() if k != "layers"}
    new_params["layers"] = stacked
    specs = pp_param_specs(model)
    # Specs tree leads (its P leaves terminate traversal; the params
    # tree matches structurally at those leaves).
    return jax.tree.map(
        lambda spec, arr: jax.device_put(
            arr, NamedSharding(mesh, spec)),
        specs, new_params,
        is_leaf=lambda x: isinstance(x, P))
