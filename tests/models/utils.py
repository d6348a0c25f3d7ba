"""Output comparison helpers (reference tests/models/utils.py:
check_outputs_equal, check_logprobs_close — top-N logprob overlap instead
of bitwise equality, tolerating numerics-driven divergence)."""


def check_outputs_equal(outputs_0, outputs_1, name_0="run0", name_1="run1"):
    assert len(outputs_0) == len(outputs_1)
    for i, (o0, o1) in enumerate(zip(outputs_0, outputs_1)):
        assert o0.outputs[0].token_ids == o1.outputs[0].token_ids, (
            f"request {i}: {name_0}={o0.outputs[0].token_ids} "
            f"{name_1}={o1.outputs[0].token_ids}")


def check_logprobs_close(outputs_0, outputs_1, name_0="run0",
                         name_1="run1"):
    """Each run's chosen token must be within the other run's reported
    top-N logprobs at every position until the sequences diverge."""
    assert len(outputs_0) == len(outputs_1)
    for i, (o0, o1) in enumerate(zip(outputs_0, outputs_1)):
        tokens_0 = o0.outputs[0].token_ids
        tokens_1 = o1.outputs[0].token_ids
        logprobs_0 = o0.outputs[0].logprobs
        logprobs_1 = o1.outputs[0].logprobs
        assert logprobs_0 is not None and logprobs_1 is not None, (
            "runs must be generated with logprobs=N")
        for idx, (t0, t1) in enumerate(zip(tokens_0, tokens_1)):
            if t0 == t1:
                continue
            lp0 = logprobs_0[idx]
            lp1 = logprobs_1[idx]
            assert t0 in lp1 and t1 in lp0, (
                f"request {i} pos {idx}: tokens {t0} ({name_0}) vs {t1} "
                f"({name_1}) not within each other's top logprobs\n"
                f"{name_0} top: {sorted(lp0)}\n{name_1} top: {sorted(lp1)}")
            # Sequences diverged legitimately; later tokens incomparable.
            break
