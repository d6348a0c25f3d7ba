"""Spec-decode perf record (VERDICT r4 item 10): ngram + draft-model
acceptance and net tok/s vs baseline at B in {8, 32}, on the real chip.

Random-weight caveat (documented with the numbers): greedy outputs of a
random-weight model are near-uniform over vocab, so draft proposals
almost never match — acceptance measures the MECHANICS' overhead, not
real-text acceptance. The ngram leg adds a rigged prompt whose tail
repeats its head so prompt-lookup can actually hit when the model
enters a repetition loop (random debug models often emit loops).
"""
import json
import os
import time

from nmvllm_tpu import LLM, SamplingParams

os.environ.setdefault("NMVLLM_INT4_A8", "packed")
MODEL = "llama-3-8b"
OUT = 48


def run(tag, batch, **kw):
    llm = LLM(model=MODEL, quantization="gptq", max_num_seqs=batch,
              max_model_len=512, max_num_batched_tokens=1024, **kw)
    prompts = [f"prompt {i} the quick brown fox jumps over" for i in
               range(batch)]
    sp = SamplingParams(temperature=0.0, max_tokens=OUT, ignore_eos=True)
    llm.generate(prompts[:2], SamplingParams(temperature=0.0, max_tokens=4,
                                             ignore_eos=True))  # warm
    t0 = time.perf_counter()
    outs = llm.generate(prompts, sp)
    dt = time.perf_counter() - t0
    toks = sum(len(o.outputs[0].token_ids) for o in outs)
    stats = dict(llm.llm_engine.spec_stats)
    acc = (stats["num_accepted"] / stats["num_drafted"]
           if stats.get("num_drafted") else None)
    rec = {"leg": tag, "batch": batch, "tok_s": round(toks / dt, 1),
           "accept_rate": None if acc is None else round(acc, 4),
           **{k: v for k, v in stats.items()}}
    print(json.dumps(rec), flush=True)
    del llm
    return rec


for b in (8, 32):
    run("baseline", b)
    run("ngram", b, ngram_prompt_lookup_max=3, num_speculative_tokens=3)
