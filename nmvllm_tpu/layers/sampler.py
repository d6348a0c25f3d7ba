"""In-graph sampling pipeline.

Reference parity: vllm/model_executor/layers/sampler.py:50-120 with the exact
op order documented in SURVEY.md §A.2: min-tokens stop-token ban →
presence/frequency/repetition penalties → temperature → top-k/top-p → min-p →
log_softmax → sample (greedy argmax / categorical with per-row seeds) →
logprobs gather.

TPU-native design: sampling runs *inside* the compiled step function over the
padded batch (the reference's TPU ModelWrapper does the same —
tpu_model_runner.py:503), with per-row parameter vectors from
``SamplingTensors``. Per-row seeded generation uses counter-based keys folded
on the host, so replicated SPMD execution samples identically on every shard.
Variants (penalties on/off, logprobs on/off) are static flags so each bucket
compiles at most a handful of graphs.
"""
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-5
_NEG_INF = float("-inf")


@jax.tree_util.register_dataclass
@dataclass
class SamplingTensors:
    """Device-side per-row sampling parameters (reference
    sampling_metadata.py SamplingTensors.from_sampling_metadata)."""
    temperature: jax.Array        # (B,) f32; <EPS → greedy
    top_k: jax.Array              # (B,) int32; 0 → disabled
    top_p: jax.Array              # (B,) f32
    min_p: jax.Array              # (B,) f32
    presence_penalty: jax.Array   # (B,) f32
    frequency_penalty: jax.Array  # (B,) f32
    repetition_penalty: jax.Array  # (B,) f32
    key_data: jax.Array           # (B, 2) uint32 per-row PRNG keys
    # Token history for penalties; padded with vocab_size (dropped by
    # scatter). Only populated when do_penalties.
    output_tokens: jax.Array      # (B, max_out) int32
    prompt_tokens: jax.Array      # (B, max_prompt) int32
    # min-tokens ban list, padded with vocab_size.
    banned_tokens: jax.Array      # (B, max_ban) int32
    # guided-decoding allow list, padded with vocab_size; a row with no
    # valid entries is unconstrained.
    allowed_tokens: Optional[jax.Array] = None  # (B, max_allow) int32
    # OpenAI logit_bias: token ids (padded with vocab_size) + additive
    # bias values.
    bias_tokens: Optional[jax.Array] = None     # (B, max_bias) int32
    bias_values: Optional[jax.Array] = None     # (B, max_bias) f32


@jax.tree_util.register_dataclass
@dataclass
class SamplerOutputArrays:
    """What the compiled step returns to the host."""
    next_tokens: jax.Array        # (B,) int32
    logprob: jax.Array            # (B,) f32 logprob of the sampled token
    topk_ids: Optional[jax.Array]  # (B, L) int32
    topk_logprobs: Optional[jax.Array]  # (B, L) f32


def _apply_penalties(logits, t: SamplingTensors, vocab_size: int):
    b = logits.shape[0]
    rows = jnp.arange(b)[:, None]
    out_counts = jnp.zeros((b, vocab_size), jnp.float32).at[
        rows, t.output_tokens].add(1.0, mode="drop")
    prompt_mask = jnp.zeros((b, vocab_size), jnp.bool_).at[
        rows, t.prompt_tokens].set(True, mode="drop")
    out_mask = out_counts > 0

    # Repetition penalty over prompt+output tokens (sampler.py:200).
    rep = t.repetition_penalty[:, None]
    in_rep = prompt_mask | out_mask
    logits = jnp.where(in_rep,
                       jnp.where(logits > 0, logits / rep, logits * rep),
                       logits)
    # Frequency/presence on output counts only.
    logits = logits - t.frequency_penalty[:, None] * out_counts
    logits = logits - t.presence_penalty[:, None] * out_mask.astype(
        jnp.float32)
    return logits


def _apply_top_k_top_p(logits, top_k, top_p):
    vocab = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # descending
    # top-k: threshold at the k-th largest.
    k = jnp.where(top_k <= 0, vocab, top_k)
    k = jnp.clip(k, 1, vocab)
    kth = jnp.take_along_axis(sorted_logits, (k - 1)[:, None], axis=-1)
    logits = jnp.where(logits < kth, _NEG_INF, logits)
    # top-p: nucleus over the sorted distribution.
    probs_sorted = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # Keep tokens whose cumulative prob (exclusive) < top_p.
    keep_sorted = (cum - probs_sorted) < top_p[:, None]
    # Threshold logit: smallest kept logit per row.
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
                     keepdims=True)
    return jnp.where(logits < thresh, _NEG_INF, logits)


def _apply_min_p(logits, min_p):
    probs = jax.nn.softmax(logits, axis=-1)
    top_prob = jnp.max(probs, axis=-1, keepdims=True)
    cutoff = min_p[:, None] * top_prob
    return jnp.where(probs < cutoff, _NEG_INF, logits)


def sample(
    logits: jax.Array,            # (B, V_padded) f32
    tensors: SamplingTensors,
    *,
    vocab_size: int,
    do_penalties: bool = False,
    do_min_tokens: bool = False,
    do_top_k_top_p: bool = True,
    do_min_p: bool = False,
    do_guided: bool = False,
    do_logit_bias: bool = False,
    num_logprobs: int = 0,
) -> SamplerOutputArrays:
    b, v_pad = logits.shape
    logits = logits.astype(jnp.float32)
    # Mask vocab padding.
    if v_pad > vocab_size:
        logits = jnp.where(jnp.arange(v_pad)[None, :] < vocab_size, logits,
                           _NEG_INF)

    if do_logit_bias and tensors.bias_tokens is not None:
        rows = jnp.arange(b)[:, None]
        logits = logits.at[rows, tensors.bias_tokens].add(
            tensors.bias_values, mode="drop")

    if do_min_tokens:
        rows = jnp.arange(b)[:, None]
        ban = jnp.zeros((b, v_pad), jnp.bool_).at[
            rows, tensors.banned_tokens].set(True, mode="drop")
        logits = jnp.where(ban, _NEG_INF, logits)

    if do_guided and tensors.allowed_tokens is not None:
        rows = jnp.arange(b)[:, None]
        allow = jnp.zeros((b, v_pad), jnp.bool_).at[
            rows, tensors.allowed_tokens].set(True, mode="drop")
        constrained = jnp.any(allow, axis=-1, keepdims=True)
        logits = jnp.where(constrained & ~allow, _NEG_INF, logits)

    if do_penalties:
        logits = _apply_penalties(logits, tensors, v_pad)

    # Raw (pre-truncation) logprobs — the reference computes returned
    # logprobs from penalized+temperature-scaled logits (sampler.py:50+).
    temp = jnp.maximum(tensors.temperature, _EPS)[:, None]
    scaled = logits / temp
    greedy = tensors.temperature < _EPS

    sample_logits = scaled
    if do_top_k_top_p:
        sample_logits = _apply_top_k_top_p(sample_logits, tensors.top_k,
                                           tensors.top_p)
    if do_min_p:
        sample_logits = _apply_min_p(sample_logits, tensors.min_p)

    # Gumbel-max categorical with per-row counter-based keys.
    keys = jax.vmap(jax.random.wrap_key_data)(tensors.key_data)
    uniform = jax.vmap(
        lambda kk: jax.random.uniform(kk, (v_pad,), jnp.float32,
                                      minval=1e-20, maxval=1.0))(keys)
    gumbel = -jnp.log(-jnp.log(uniform))
    sampled = jnp.argmax(sample_logits + gumbel, axis=-1)
    argmax_tok = jnp.argmax(scaled, axis=-1)
    next_tokens = jnp.where(greedy, argmax_tok, sampled).astype(jnp.int32)

    logprobs = jax.nn.log_softmax(scaled, axis=-1)
    chosen_lp = jnp.take_along_axis(logprobs, next_tokens[:, None],
                                    axis=-1)[:, 0]
    topk_ids = topk_lp = None
    if num_logprobs > 0:
        topk_lp, topk_ids = jax.lax.top_k(logprobs, num_logprobs)
        topk_ids = topk_ids.astype(jnp.int32)
    return SamplerOutputArrays(next_tokens=next_tokens, logprob=chosen_lp,
                               topk_ids=topk_ids, topk_logprobs=topk_lp)


def make_key_data(seed: int, step: int) -> np.ndarray:
    """Host-side counter-based key derivation.

    Pure numpy (no device dispatch — on TPU every eager op is a compile
    round-trip): splitmix64 over (seed, step) yields 2 uint32 words, which
    form a valid threefry2x32 key for jax.random.wrap_key_data.
    """
    mask = (1 << 64) - 1
    z = ((seed & mask) * 0x9E3779B97F4A7C15 + step +
         0x632BE59BD9B4E019) & mask
    for _ in range(2):
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        z = z ^ (z >> 31)
    return np.array([z >> 32, z & 0xFFFFFFFF], dtype=np.uint32)
