"""Round-4 verify drive: batched multi-prompt prefill through the
public LLM surface (parity + single-dispatch check)."""
import os

from nmvllm_tpu import LLM, SamplingParams

PROMPTS = ["the quick brown fox jumps over", "a b c",
           "one two three four five six", "hello world this is a test"]
SP = SamplingParams(temperature=0.0, max_tokens=8)


def run():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=128)
    runner = llm.llm_engine.executor.runner
    calls = {"batch": 0, "single": 0}
    ob, osg = runner.execute_prefill_batch, runner.execute_prefill
    runner.execute_prefill_batch = (
        lambda m, kv: (calls.__setitem__("batch", calls["batch"] + 1),
                       ob(m, kv))[1])
    runner.execute_prefill = (
        lambda m, kv: (calls.__setitem__("single", calls["single"] + 1),
                       osg(m, kv))[1])
    outs = llm.generate(PROMPTS, SP)
    return [tuple(o.outputs[0].token_ids) for o in outs], calls


os.environ["NMVLLM_BATCHED_PREFILL"] = "0"
base, c0 = run()
os.environ["NMVLLM_BATCHED_PREFILL"] = "1"
batched, c1 = run()
print("unbatched dispatches:", c0, "batched dispatches:", c1)
assert c0 == {"batch": 0, "single": 4}
assert c1 == {"batch": 1, "single": 0}
assert batched == base, (batched, base)
print("tokens:", batched[0])
print("DRIVE OK")
