"""AsyncLLMEngine + RequestTracker (reference tests/async_engine/
test_async_llm_engine.py and test_request_tracker.py)."""
import asyncio

import pytest

from nmvllm_tpu.engine.async_llm_engine import (AsyncEngineDeadError,
                                                AsyncLLMEngine,
                                                RequestTracker)
from nmvllm_tpu.outputs import CompletionOutput, RequestOutput


def _out(request_id, finished=False):
    return RequestOutput(
        request_id=request_id, prompt="p", prompt_token_ids=[1],
        prompt_logprobs=None, finished=finished,
        outputs=[CompletionOutput(index=0, text="", token_ids=[2],
                                  cumulative_logprob=0.0, logprobs=None)])


def test_request_tracker_lifecycle():
    tracker = RequestTracker()
    stream = tracker.add_request("r1", prompt="p", params=None)
    # The stream registers at engine pickup, not at add (reference
    # semantics: get_new_and_finished_requests installs it).
    assert "r1" not in tracker
    new, finished = tracker.get_new_and_finished_requests()
    assert [r["request_id"] for r in new] == ["r1"] and not finished
    assert "r1" in tracker and len(tracker) == 1

    tracker.process_request_output(_out("r1"))
    assert not stream.finished
    tracker.process_request_output(_out("r1", finished=True))
    assert stream.finished


def test_request_tracker_abort_before_schedule():
    tracker = RequestTracker()
    stream = tracker.add_request("r2", prompt="p", params=None)
    tracker.abort_request("r2")
    new, finished = tracker.get_new_and_finished_requests()
    # Aborted before pickup: never surfaced as new, reported finished.
    assert new == [] and "r2" in finished
    assert stream.finished


def test_request_tracker_duplicate_id_raises():
    tracker = RequestTracker()
    tracker.add_request("r3", prompt="p", params=None)
    tracker.get_new_and_finished_requests()       # picked up
    with pytest.raises(KeyError):
        tracker.add_request("r3", prompt="p", params=None)


def test_request_tracker_propagate_exception():
    tracker = RequestTracker()
    s1 = tracker.add_request("a", prompt="p", params=None)
    s2 = tracker.add_request("b", prompt="p", params=None)
    tracker.get_new_and_finished_requests()       # picked up
    tracker.propagate_exception(RuntimeError("dead"))
    assert s1.finished and s2.finished
    with pytest.raises(RuntimeError):
        asyncio.new_event_loop().run_until_complete(s1.__anext__())


@pytest.mark.e2e
def test_async_engine_generate_and_abort():
    from nmvllm_tpu.engine.arg_utils import AsyncEngineArgs

    async def main():
        engine = AsyncLLMEngine.from_engine_args(AsyncEngineArgs(
            model="debug-llama", num_gpu_blocks_override=32,
            max_num_seqs=4, max_model_len=64,
            disable_log_requests=True, disable_log_stats=True))
        from nmvllm_tpu.sampling_params import SamplingParams
        texts = []
        async for out in engine.generate(
                "hello async", SamplingParams(temperature=0.0,
                                              max_tokens=4,
                                              ignore_eos=True), "req-1"):
            texts.append(out)
        assert texts and texts[-1].finished
        assert len(texts[-1].outputs[0].token_ids) == 4

        # Abort mid-flight: the generator must terminate cleanly.
        gen = engine.generate("abort me", SamplingParams(
            temperature=0.0, max_tokens=32, ignore_eos=True), "req-2")
        got = await gen.__anext__()
        assert got.request_id == "req-2"
        await engine.abort("req-2")
        outs = []
        try:
            async for out in gen:
                outs.append(out)
        except asyncio.CancelledError:
            pass
        assert engine.is_running
        return True

    assert asyncio.new_event_loop().run_until_complete(main())


@pytest.mark.e2e
def test_async_engine_dead_after_loop_error():
    from nmvllm_tpu.engine.arg_utils import AsyncEngineArgs

    async def main():
        engine = AsyncLLMEngine.from_engine_args(AsyncEngineArgs(
            model="debug-llama", num_gpu_blocks_override=32,
            max_num_seqs=4, max_model_len=64,
            disable_log_requests=True, disable_log_stats=True))
        from nmvllm_tpu.sampling_params import SamplingParams
        async for _ in engine.generate("warm", SamplingParams(
                temperature=0.0, max_tokens=2, ignore_eos=True), "w"):
            pass
        # Sabotage the engine: the background loop must die, flip
        # `errored`, and new generate calls must raise
        # AsyncEngineDeadError (reference health-check propagation).
        engine.engine.step = lambda: (_ for _ in ()).throw(
            RuntimeError("boom"))
        with pytest.raises((AsyncEngineDeadError, RuntimeError)):
            async for _ in engine.generate("x", SamplingParams(
                    temperature=0.0, max_tokens=4, ignore_eos=True), "d"):
                pass
        assert engine.errored
        return True

    assert asyncio.new_event_loop().run_until_complete(main())
