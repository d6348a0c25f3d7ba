"""Spec-decode e2e: ngram speculation must not change greedy output
(reference tests/spec_decode/e2e greedy-equality tier)."""
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def baseline_llm():
    return LLM(model="debug-llama", num_gpu_blocks_override=64,
               max_num_seqs=8, max_model_len=256)


@pytest.fixture(scope="module")
def spec_llm():
    return LLM(model="debug-llama", num_gpu_blocks_override=64,
               max_num_seqs=8, max_model_len=256,
               ngram_prompt_lookup_max=3, ngram_prompt_lookup_min=1,
               num_speculative_tokens=4)


# Repetitive prompts give the ngram proposer matches; varied ones force
# empty proposals and correction paths.
PROMPTS = [
    "the cat sat on the mat the cat sat on the",
    "one two three one two three one two",
    "Hello world",
    "a b c d a b c d a b",
]


def test_greedy_equality(baseline_llm, spec_llm):
    # Logprob-closeness, not bitwise equality: the verification step's
    # chunked-prefill attention and the baseline decode kernel reduce in
    # different orders, so near-tie argmaxes may differ on the
    # random-weight debug model (same policy as the reference's
    # check_logprobs_close, tests/models/utils.py).
    from tests.models.utils import check_logprobs_close
    sp = SamplingParams(temperature=0.0, max_tokens=16, logprobs=5)
    base = baseline_llm.generate(PROMPTS, sp)
    spec = spec_llm.generate(PROMPTS, sp)
    check_logprobs_close(base, spec, "baseline", "spec")


def test_spec_steps_actually_ran(spec_llm):
    engine = spec_llm.llm_engine
    sp = SamplingParams(temperature=0.0, max_tokens=16)
    before = dict(engine.spec_stats)
    spec_llm.generate(["x y z x y z x y z x y"], sp)
    after = engine.spec_stats
    assert after["num_spec_steps"] > before["num_spec_steps"]
    assert after["num_drafted"] > before["num_drafted"]


def test_sampling_rows_fall_back(spec_llm):
    # Non-greedy rows must still generate (empty drafts, sampler path).
    sp = SamplingParams(temperature=0.8, seed=7, max_tokens=8)
    out = spec_llm.generate(["one two three one two three one"], sp)
    assert len(out[0].outputs[0].token_ids) == 8


def test_stop_inside_accepted_run(spec_llm):
    # A stop token that lands inside an accepted draft run must truncate
    # the emitted run at that token (multi-step stop checking).
    prompt = "p q r p q r p q"
    probe = spec_llm.generate(
        [prompt], SamplingParams(temperature=0.0, max_tokens=8))
    toks = probe[0].outputs[0].token_ids
    if len(toks) < 3:
        pytest.skip("no tokens generated")
    stop_tok = toks[2]
    sp = SamplingParams(temperature=0.0, max_tokens=16,
                        stop_token_ids=[stop_tok])
    out = spec_llm.generate([prompt], sp)
    got = out[0].outputs[0].token_ids
    assert out[0].outputs[0].finish_reason == "stop"
    assert got == toks[:3], (got, toks)


@pytest.fixture(scope="module")
def draft_spec_llm():
    return LLM(model="debug-llama", num_gpu_blocks_override=64,
               max_num_seqs=8, max_model_len=256,
               speculative_model="debug-llama", num_speculative_tokens=3)


def test_draft_model_spec_accepts_and_matches(baseline_llm, draft_spec_llm):
    from tests.models.utils import check_logprobs_close
    sp = SamplingParams(temperature=0.0, max_tokens=16, logprobs=5)
    base = baseline_llm.generate(PROMPTS[:2], sp)
    spec = draft_spec_llm.generate(PROMPTS[:2], sp)
    check_logprobs_close(base, spec, "baseline", "draft-spec")
    st = draft_spec_llm.llm_engine.spec_stats
    assert st["num_spec_steps"] > 0
    # Identical draft ⇒ high acceptance (numerics-driven mismatches only).
    assert st["num_accepted"] / max(1, st["num_drafted"]) > 0.3


def test_stochastic_rows_speculate_and_reproduce(draft_spec_llm):
    # Near-greedy temperature exercises the stochastic acceptance branch
    # (accept prob ≈ p(argmax) ≈ 1); seeded output must reproduce.
    sp = SamplingParams(temperature=0.01, seed=11, max_tokens=12)
    before = dict(draft_spec_llm.llm_engine.spec_stats)
    o1 = draft_spec_llm.generate(["near greedy probe"], sp)
    after = dict(draft_spec_llm.llm_engine.spec_stats)
    assert after["num_spec_steps"] > before["num_spec_steps"]
    assert after["num_accepted"] > before["num_accepted"]
    o2 = draft_spec_llm.generate(["near greedy probe"], sp)
    assert o1[0].outputs[0].token_ids == o2[0].outputs[0].token_ids


def test_typical_acceptance_sampler():
    """MEDUSA typical acceptance (reference
    typical_acceptance_sampler.py): deterministic entropy-thresholded
    acceptance; near-greedy rows still produce high acceptance with an
    identical draft model."""
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256,
              speculative_model="debug-llama", num_speculative_tokens=3,
              spec_decoding_acceptance_method="typical_acceptance")
    sp = SamplingParams(temperature=0.01, seed=3, max_tokens=12)
    llm.generate(["typical probe"], sp)  # warm the draft KV pool
    o1 = llm.generate(["typical probe"], sp)
    st = llm.llm_engine.spec_stats
    assert st["num_spec_steps"] > 0
    assert st["num_accepted"] > 0
    o2 = llm.generate(["typical probe"], sp)
    # Warm-state runs reproduce exactly (the cold first run can differ:
    # rejected-draft KV rows in the draft cache are an acceptance-only
    # approximation — the verifier gates every emitted token).
    assert o1[0].outputs[0].token_ids == o2[0].outputs[0].token_ids


def test_typical_acceptance_unit():
    import jax.numpy as jnp
    import numpy as np

    from nmvllm_tpu.spec_decode.rejection_sampler import (
        typical_acceptance_mask)
    # Peaked target distribution: matching draft accepted, mismatch not.
    v = 16
    p = np.full((1, 2, v), 1e-4, np.float32)
    p[0, :, 3] = 1.0 - 15e-4
    mask = typical_acceptance_mask(jnp.asarray(p),
                                   jnp.asarray([[3, 5]], jnp.int32))
    assert bool(mask[0, 0]) and not bool(mask[0, 1])
    # Uniform target: high entropy relaxes the threshold to
    # alpha/v = 0.0188 < 1/v, so any draft is accepted (the leniency
    # that distinguishes typical acceptance from rejection sampling).
    q = np.full((1, 1, v), 1.0 / v, np.float32)
    mask2 = typical_acceptance_mask(jnp.asarray(q),
                                    jnp.asarray([[0]], jnp.int32))
    assert bool(mask2[0, 0])


def test_draft_kv_catchup_no_stale_rows():
    """Draft-KV freshness: with target == draft, after generation the
    draft's paged KV must agree with the target's on every written slot
    except each sequence's newest position (which the draft never
    processes as an input). Fully-accepted runs would otherwise leave one
    stale/hole row per run (the catch-up pre-step backfills them —
    executor._draft_upto / ModelRunner._get_propose_fn(catchup=True))."""
    import numpy as np
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256,
              speculative_model="debug-llama", num_speculative_tokens=3)
    ex = llm.llm_engine.executor
    # Capture each sequence's block table and length at every spec step
    # (blocks are freed when the request finishes, before we can look).
    tables = {}
    orig = ex.execute_spec_decode

    def wrapped(req, proposals, k):
        for m in req.seq_group_metadata_list:
            for sid, tb in m.block_tables.items():
                tables[sid] = list(tb)
        return orig(req, proposals, k)

    ex.execute_spec_decode = wrapped
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    outs = llm.generate(PROMPTS[:2], sp)
    assert all(len(o.outputs[0].token_ids) == 24 for o in outs)
    st = llm.llm_engine.spec_stats
    assert st["num_spec_steps"] > 0
    # Identical draft => acceptance should be near-perfect once the
    # draft KV never goes stale.
    assert st["num_accepted"] / max(1, st["num_drafted"]) > 0.9
    assert tables, "spec steps never ran"
    bs = ex.cache_engine.block_size
    lens = {}
    for o, sid in zip(outs, sorted(tables)):
        lens[sid] = len(o.prompt_token_ids) + len(o.outputs[0].token_ids)
    tgt = [np.asarray(a, np.float32) for a in ex.cache_engine.kv_caches]
    drf = [np.asarray(a, np.float32) for a in ex.draft_cache_engine.kv_caches]
    for sid, tb in tables.items():
        # Positions < final_len - 1 must match between the caches; allow
        # one trailing hole (a final-step full accept has no next round
        # to catch up in). Stale rows from earlier full-accept runs
        # would show up here without the backfill.
        n = lens[sid]
        for li, (t, d) in enumerate(zip(tgt, drf)):
            bad = 0
            for p in range(n - 1):
                blk, off = tb[p // bs], p % bs
                # bf16 rounding between the decode-path and verify-path
                # attention reaches ~3e-2; stale rows (wrong/no token)
                # sit at O(1) — threshold in between.
                if np.abs(t[blk, :, :, off] - d[blk, :, :, off]).max() \
                        > 1e-1:
                    bad += 1
            assert bad <= 1, (f"seq {sid} layer {li}: {bad} stale "
                              f"draft-KV rows")


def test_sliding_window_spec_gated_and_exact():
    """Sliding-window models speculate at ANY length (round 3): the ring
    carries num_lookahead_slots of headroom so rejected draft writes
    cannot alias live slots, and the verifier masks the window
    in-kernel. An identical draft model must accept ~everything across
    the window boundary."""
    from tests.models.utils import check_logprobs_close
    prompt = "abc abc abc abc"  # short: well inside the 64-token window
    sp = SamplingParams(temperature=0.0, max_tokens=48, ignore_eos=True,
                        logprobs=5)
    base = LLM(model="debug-mistral", num_gpu_blocks_override=64,
               max_num_seqs=8, max_model_len=256)
    b = base.generate([prompt], sp)
    assert len(b[0].outputs[0].token_ids) == 48  # crosses the window
    del base
    spec = LLM(model="debug-mistral", num_gpu_blocks_override=64,
               max_num_seqs=8, max_model_len=256,
               speculative_model="debug-mistral",
               num_speculative_tokens=3)
    s = spec.generate([prompt], sp)
    st = spec.llm_engine.spec_stats
    assert st["num_spec_steps"] > 0, "spec never engaged inside the window"
    # Identical draft + fresh KV (no wrap corruption) => full acceptance.
    assert st["num_accepted"] / max(1, st["num_drafted"]) > 0.9, st
    check_logprobs_close(b, s, "base", "sw-spec")


def test_min_p_rows_speculate_and_reproduce(draft_spec_llm):
    """min_p rows speculate: the in-graph verifier applies the min_p
    filter to the target distribution before acceptance (same filter
    order as the sampler: temp -> top-k/p -> min_p -> softmax)."""
    sp = SamplingParams(temperature=0.01, min_p=0.2, seed=5, max_tokens=10)
    eng = draft_spec_llm.llm_engine
    before = dict(eng.spec_stats)
    o1 = draft_spec_llm.generate(["min p probe text"], sp)
    after = dict(eng.spec_stats)
    assert after["num_drafted"] > before["num_drafted"]
    o2 = draft_spec_llm.generate(["min p probe text"], sp)
    assert o1[0].outputs[0].token_ids == o2[0].outputs[0].token_ids


def test_penalized_rows_speculate_and_match(baseline_llm, draft_spec_llm):
    """Penalty rows speculate: the verifier extends each position's
    output history with the preceding drafts, reproducing sequential
    penalty state (reference batch-expansion re-derives SamplingTensors
    per expanded row)."""
    from tests.models.utils import check_logprobs_close
    sp = SamplingParams(temperature=0.0, max_tokens=16, logprobs=5,
                        repetition_penalty=1.3, frequency_penalty=0.2,
                        presence_penalty=0.1)
    eng = draft_spec_llm.llm_engine
    before = dict(eng.spec_stats)
    base = baseline_llm.generate(PROMPTS[:2], sp)
    spec = draft_spec_llm.generate(PROMPTS[:2], sp)
    after = dict(eng.spec_stats)
    assert after["num_drafted"] > before["num_drafted"]
    assert after["num_accepted"] > before["num_accepted"]
    check_logprobs_close(base, spec, "baseline", "penalized-spec")


# ---------------------------------------------------------------------------
# Sliding-window models (mistral-style): speculation past the window.
# The block manager gives the circular block table `num_lookahead_slots`
# of ring headroom so rejected draft writes cannot alias live slots, and
# the verifier masks the window in-kernel — so spec stays ON at any
# sequence length (round-3 fix; previously rows past the window decoded
# normally).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sw_baseline_llm():
    return LLM(model="debug-mistral", num_gpu_blocks_override=96,
               max_num_seqs=8, max_model_len=256)


@pytest.fixture(scope="module")
def sw_spec_llm():
    return LLM(model="debug-mistral", num_gpu_blocks_override=96,
               max_num_seqs=8, max_model_len=256,
               ngram_prompt_lookup_max=3, ngram_prompt_lookup_min=1,
               num_speculative_tokens=4)


def test_sliding_window_greedy_equality_past_window(sw_baseline_llm,
                                                    sw_spec_llm):
    # debug-mistral has sliding_window=64; run every sequence well past
    # it so speculative writes exercise the ring-wrap region.
    from tests.models.utils import check_logprobs_close
    base = " ".join(["tick tock"] * 20)          # ~40-token prompt
    prompts = [base, base + " tick", "go go go go go go go go"]
    sp = SamplingParams(temperature=0.0, max_tokens=48, logprobs=5)
    want = sw_baseline_llm.generate(prompts, sp)
    got = sw_spec_llm.generate(prompts, sp)
    check_logprobs_close(want, got, "baseline", "spec")


def test_sliding_window_spec_runs_past_window(sw_spec_llm):
    engine = sw_spec_llm.llm_engine
    before = dict(engine.spec_stats)
    sp = SamplingParams(temperature=0.0, max_tokens=80)
    out = sw_spec_llm.generate([" ".join(["ping pong"] * 16)], sp)
    assert len(out[0].outputs[0].token_ids) == 80   # len > window + k
    after = engine.spec_stats
    assert after["num_spec_steps"] > before["num_spec_steps"]
    assert after["num_drafted"] > before["num_drafted"]
