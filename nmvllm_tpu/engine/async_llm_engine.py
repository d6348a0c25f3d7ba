"""Async engine: background step loop + per-request async streams.

Reference: vllm/engine/async_llm_engine.py:321 (AsyncLLMEngine;
RequestTracker:94, run_engine_loop:555, generate:676). The blocking
device step runs in a thread-pool executor so the asyncio event loop stays
responsive while XLA executes.
"""
import asyncio
import time
from functools import partial
from typing import (AsyncIterator, Callable, Dict, Iterable, List, Optional,
                    Set, Tuple, Union)

from nmvllm_tpu import envs
from nmvllm_tpu.config import EngineConfig
from nmvllm_tpu.engine.arg_utils import AsyncEngineArgs
from nmvllm_tpu.engine.llm_engine import LLMEngine
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.outputs import RequestOutput
from nmvllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)

ENGINE_ITERATION_TIMEOUT_S = envs.NMVLLM_ENGINE_ITERATION_TIMEOUT_S


class AsyncEngineDeadError(RuntimeError):
    pass


def _log_task_completion(task: asyncio.Task,
                         error_callback: Callable[[Exception], None]) -> None:
    exception = None
    try:
        return_value = task.result()
        raise AssertionError(
            f"The engine background task should never finish without an "
            f"exception. {return_value}")
    except asyncio.exceptions.CancelledError:
        return
    except Exception as e:
        exception = e
        logger.error("Engine background task failed", exc_info=e)
        error_callback(exception)
        raise AsyncEngineDeadError(
            "Task finished unexpectedly. This should never happen! "
            "See stack trace above for the actual cause.") from e


class AsyncStream:
    """Per-request stream of RequestOutputs (reference :70)."""

    def __init__(self, request_id: str) -> None:
        self.request_id = request_id
        self._queue: asyncio.Queue = asyncio.Queue()
        self._finished = False

    def put(self, item: Union[RequestOutput, Exception]) -> None:
        if self._finished:
            return
        self._queue.put_nowait(item)

    def finish(self) -> None:
        self._queue.put_nowait(StopAsyncIteration())
        self._finished = True

    @property
    def finished(self) -> bool:
        return self._finished

    def __aiter__(self):
        return self

    async def __anext__(self) -> RequestOutput:
        result = await self._queue.get()
        if isinstance(result, StopAsyncIteration):
            raise StopAsyncIteration
        if isinstance(result, Exception):
            raise result
        return result


class RequestTracker:
    """Request lifecycle synchronization (reference :94)."""

    def __init__(self) -> None:
        self._request_streams: Dict[str, AsyncStream] = {}
        self._finished_requests: asyncio.Queue = asyncio.Queue()
        self._new_requests: asyncio.Queue = asyncio.Queue()
        self.new_requests_event = asyncio.Event()

    def __contains__(self, item):
        return item in self._request_streams

    def __len__(self) -> int:
        return len(self._request_streams)

    def propagate_exception(self, exc: Exception,
                            request_id: Optional[str] = None) -> None:
        if request_id is not None:
            self.abort_request(request_id)
            self._request_streams[request_id].put(exc)
        else:
            for rid, stream in self._request_streams.items():
                stream.put(exc)
                self.abort_request(rid)

    def process_request_output(self, request_output: RequestOutput,
                               *, verbose: bool = False) -> None:
        request_id = request_output.request_id
        stream = self._request_streams.get(request_id)
        if stream is not None:
            stream.put(request_output)
            if request_output.finished:
                if verbose:
                    logger.info("Finished request %s.", request_id)
                self.abort_request(request_id)

    def add_request(self, request_id: str,
                    **engine_add_request_kwargs) -> AsyncStream:
        if request_id in self._request_streams:
            raise KeyError(f"Request {request_id} already exists.")
        stream = AsyncStream(request_id)
        self._new_requests.put_nowait(
            (stream, {"request_id": request_id,
                      **engine_add_request_kwargs}))
        self.new_requests_event.set()
        return stream

    def abort_request(self, request_id: str, *,
                      verbose: bool = False) -> None:
        if verbose:
            logger.info("Aborted request %s.", request_id)
        self._finished_requests.put_nowait(request_id)
        if request_id not in self._request_streams or \
                self._request_streams[request_id].finished:
            return
        self._request_streams[request_id].finish()

    def get_new_and_finished_requests(self) -> Tuple[List[dict], Set[str]]:
        new_requests: List[dict] = []
        finished_requests: Set[str] = set()
        while not self._finished_requests.empty():
            request_id = self._finished_requests.get_nowait()
            finished_requests.add(request_id)
        while not self._new_requests.empty():
            stream, request = self._new_requests.get_nowait()
            if stream.request_id in finished_requests:
                stream.finish()
                continue
            self._request_streams[stream.request_id] = stream
            new_requests.append(request)
        return new_requests, finished_requests

    async def wait_for_new_requests(self):
        if not self.has_new_requests():
            await self.new_requests_event.wait()
        self.new_requests_event.clear()

    def has_new_requests(self):
        return not self._new_requests.empty()

    def remove_finished(self, finished: Iterable[str]) -> None:
        for request_id in finished:
            self._request_streams.pop(request_id, None)


class AsyncLLMEngine:

    def __init__(self, engine_config: EngineConfig, *,
                 log_requests: bool = True,
                 start_engine_loop: bool = True,
                 log_stats: bool = True) -> None:
        self.engine = LLMEngine(engine_config, log_stats=log_stats)
        self.log_requests = log_requests
        self.background_loop: Optional[asyncio.Future] = None
        self._background_loop_unshielded: Optional[asyncio.Task] = None
        self.start_engine_loop = start_engine_loop
        self._errored_with: Optional[BaseException] = None
        self._request_tracker: Optional[RequestTracker] = None

    @classmethod
    def from_engine_args(cls, engine_args: AsyncEngineArgs,
                         start_engine_loop: bool = True) -> "AsyncLLMEngine":
        engine_config = engine_args.create_engine_config()
        return cls(engine_config,
                   log_requests=not engine_args.disable_log_requests,
                   log_stats=not engine_args.disable_log_stats,
                   start_engine_loop=start_engine_loop)

    # ------------------------------------------------------------ lifecycle
    @property
    def is_running(self) -> bool:
        return (self.background_loop is not None
                and self._background_loop_unshielded is not None
                and not self._background_loop_unshielded.done())

    @property
    def is_stopped(self) -> bool:
        return self.errored or (self.background_loop is not None and
                                self._background_loop_unshielded is not None
                                and self._background_loop_unshielded.done())

    @property
    def errored(self) -> bool:
        return self._errored_with is not None

    def set_errored(self, exc: Exception) -> None:
        self._errored_with = exc

    def _error_callback(self, exc: Exception) -> None:
        self.set_errored(exc)
        if self._request_tracker:
            self._request_tracker.propagate_exception(exc)

    def start_background_loop(self) -> None:
        if self.errored:
            raise AsyncEngineDeadError(
                "Background loop has errored already.") from self._errored_with
        if self.is_running:
            raise RuntimeError("Background loop is already running.")
        self._request_tracker = RequestTracker()
        self._background_loop_unshielded = asyncio.get_event_loop(
        ).create_task(self.run_engine_loop())
        self._background_loop_unshielded.add_done_callback(
            partial(_log_task_completion,
                    error_callback=self._error_callback))
        self.background_loop = asyncio.shield(
            self._background_loop_unshielded)

    # ------------------------------------------------------------- stepping
    async def engine_step(self) -> bool:
        """One engine iteration; returns whether work remains."""
        new_requests, finished_requests = \
            self._request_tracker.get_new_and_finished_requests()
        for new_request in new_requests:
            try:
                self.engine.add_request(**new_request)
            except ValueError as e:
                self._request_tracker.process_request_output(
                    RequestOutput(
                        request_id=new_request["request_id"], prompt=None,
                        prompt_token_ids=[], prompt_logprobs=None,
                        outputs=[], finished=True))
                self._request_tracker.propagate_exception(
                    e, new_request["request_id"])
        if finished_requests:
            self.engine.abort_request(finished_requests)

        loop = asyncio.get_event_loop()
        request_outputs = await loop.run_in_executor(None, self.engine.step)
        for request_output in request_outputs:
            self._request_tracker.process_request_output(
                request_output, verbose=self.log_requests)
        self._request_tracker.remove_finished(
            r.request_id for r in request_outputs if r.finished)
        return len(request_outputs) > 0 or \
            self.engine.has_unfinished_requests()

    async def run_engine_loop(self):
        has_requests_in_progress = False
        while True:
            if not has_requests_in_progress:
                logger.debug("Waiting for new requests...")
                await self._request_tracker.wait_for_new_requests()
                logger.debug("Got new requests!")
            try:
                has_requests_in_progress = await asyncio.wait_for(
                    self.engine_step(), ENGINE_ITERATION_TIMEOUT_S)
            except asyncio.TimeoutError as exc:
                logger.error(
                    "Engine iteration timed out. This should never happen!")
                self.set_errored(exc)
                raise
            await asyncio.sleep(0)

    # -------------------------------------------------------------- requests
    async def add_request(
        self,
        request_id: str,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        prompt_token_ids: Optional[List[int]] = None,
        arrival_time: Optional[float] = None,
        lora_request=None,
        trace_headers: Optional[Dict[str, str]] = None,
        multi_modal_data: Optional[dict] = None,
    ) -> AsyncStream:
        if not self.is_running:
            if self.start_engine_loop:
                self.start_background_loop()
            else:
                raise AsyncEngineDeadError(
                    "Background loop is not running. Use "
                    "start_background_loop() or AsyncLLMEngine directly.")
        group = getattr(self.engine, "tokenizer_group", None)
        if prompt_token_ids is None and prompt is not None and \
                group is not None:
            # Tokenize off the engine loop (and, with a TokenizerPoolConfig,
            # on the thread pool) so long prompts don't stall the loop —
            # the reference's Ray tokenizer-pool role.
            prompt_token_ids = await group.encode_async(prompt,
                                                        lora_request)
        return self._request_tracker.add_request(
            request_id, prompt=prompt, sampling_params=sampling_params,
            prompt_token_ids=prompt_token_ids,
            arrival_time=arrival_time or time.time(),
            lora_request=lora_request, trace_headers=trace_headers,
            multi_modal_data=multi_modal_data)

    async def generate(
        self,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        request_id: str,
        prompt_token_ids: Optional[List[int]] = None,
        lora_request=None,
        trace_headers: Optional[Dict[str, str]] = None,
        multi_modal_data: Optional[dict] = None,
    ) -> AsyncIterator[RequestOutput]:
        stream = await self.add_request(request_id, prompt, sampling_params,
                                        prompt_token_ids=prompt_token_ids,
                                        lora_request=lora_request,
                                        trace_headers=trace_headers,
                                        multi_modal_data=multi_modal_data)
        try:
            async for request_output in stream:
                yield request_output
        except (Exception, asyncio.CancelledError) as e:
            self._abort(request_id)
            raise e

    async def abort(self, request_id: str) -> None:
        if not self.is_running:
            raise AsyncEngineDeadError("Background loop is not running.")
        return self._abort(request_id)

    def _abort(self, request_id: str) -> None:
        self._request_tracker.abort_request(request_id,
                                            verbose=self.log_requests)

    # --------------------------------------------------------------- queries
    async def get_model_config(self):
        return self.engine.get_model_config()

    async def get_decoding_config(self):
        return self.engine.get_decoding_config()

    def get_tokenizer(self):
        return self.engine.tokenizer

    async def check_health(self) -> None:
        t = time.perf_counter()
        logger.debug("Starting health check...")
        if self.is_stopped:
            raise AsyncEngineDeadError("Background loop is stopped.")
        self.engine.check_health()
        logger.debug("Health check took %fs", time.perf_counter() - t)
