"""OpenAI serving logic: chat/completions/embeddings over AsyncLLMEngine.

Reference: vllm/entrypoints/openai/serving_chat.py, serving_completion.py,
serving_engine.py — chat templates, SSE streaming, logprobs, usage info.
"""
import asyncio
import json
import time
from typing import AsyncIterator, Dict, List, Optional, Union

from nmvllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from nmvllm_tpu.entrypoints.protocol import (
    ChatCompletionLogProb, ChatCompletionLogProbs,
    ChatCompletionLogProbsContent, ChatCompletionRequest,
    ChatCompletionResponse, ChatCompletionResponseChoice,
    ChatCompletionResponseStreamChoice, ChatCompletionStreamResponse,
    ChatMessage, CompletionRequest, CompletionResponse,
    CompletionResponseChoice, CompletionResponseStreamChoice,
    CompletionStreamResponse, DeltaMessage, EmbeddingRequest, ErrorResponse,
    LogProbsPart, ModelCard, ModelList, UsageInfo)
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.outputs import RequestOutput
from nmvllm_tpu.utils import random_uuid

logger = init_logger(__name__)


class OpenAIServing:

    def __init__(self, engine: AsyncLLMEngine, served_model_names: List[str]):
        self.engine = engine
        self.served_model_names = served_model_names
        self.max_model_len = 0
        self.tokenizer = None

    async def _post_init(self):
        model_config = await self.engine.get_model_config()
        self.max_model_len = model_config.max_model_len
        self.tokenizer = self.engine.get_tokenizer()

    async def show_available_models(self) -> ModelList:
        return ModelList(data=[
            ModelCard(id=name, root=self.served_model_names[0])
            for name in self.served_model_names
        ])

    def _check_model(self, model: str) -> Optional[ErrorResponse]:
        if model in self.served_model_names:
            return None
        return ErrorResponse(
            message=f"The model `{model}` does not exist.",
            type="NotFoundError", code=404)

    def _validate_prompt(self, prompt_ids: List[int],
                         max_tokens: Optional[int]
                         ) -> Optional[ErrorResponse]:
        if len(prompt_ids) >= self.max_model_len:
            return ErrorResponse(
                message=f"This model's maximum context length is "
                f"{self.max_model_len} tokens, but the prompt is "
                f"{len(prompt_ids)} tokens long.",
                type="BadRequestError", code=400)
        return None

    async def _maybe_guided_processors(self, request):
        """Resolve guided-decoding constraints (native FSM backend)."""
        from nmvllm_tpu.guided_decoding import (
            get_guided_decoding_logits_processors)
        return await get_guided_decoding_logits_processors(
            request, self.tokenizer)


def _replace_subsequence(ids, pattern, repl):
    """Replace the first occurrence of `pattern` token run with `repl`."""
    if not pattern:
        return ids
    for i in range(len(ids) - len(pattern) + 1):
        if ids[i:i + len(pattern)] == list(pattern):
            return list(ids[:i]) + list(repl) + list(ids[i + len(pattern):])
    return ids


class OpenAIServingChat(OpenAIServing):

    def __init__(self, engine, served_model_names,
                 response_role: str = "assistant",
                 chat_template: Optional[str] = None):
        super().__init__(engine, served_model_names)
        self.response_role = response_role
        self.chat_template = chat_template

    def _extract_multimodal(self, request: ChatCompletionRequest):
        """Pull image parts out of OpenAI content lists (reference:
        vllm image_url chat content). Returns (text_messages, mm_data)."""
        import base64
        import io

        messages = []
        image = None
        for m in request.messages:
            content = m.content
            if isinstance(content, list):
                texts = []
                for part in content:
                    ptype = part.get("type") if isinstance(part, dict) \
                        else None
                    if ptype == "text":
                        texts.append(part.get("text", ""))
                    elif ptype == "image_url":
                        url = (part.get("image_url") or {}).get("url", "")
                        if not url.startswith("data:"):
                            raise ValueError(
                                "Only data: image URLs are supported "
                                "(zero-egress environment).")
                        b64 = url.split(",", 1)[1]
                        from PIL import Image
                        image = Image.open(
                            io.BytesIO(base64.b64decode(b64)))
                        texts.append("<image>")
                content = "".join(texts)
            messages.append({"role": m.role, "content": content or ""})
        return messages, ({"image": image} if image is not None else None)

    def _apply_chat_template(self, request: ChatCompletionRequest,
                             messages=None) -> str:
        if messages is None:
            messages = [{"role": m.role, "content": m.content or ""}
                        for m in request.messages]
        try:
            return self.tokenizer.apply_chat_template(
                messages, tokenize=False,
                add_generation_prompt=request.add_generation_prompt,
                chat_template=request.chat_template or self.chat_template)
        except Exception:
            # Fallback simple template.
            parts = [f"<|{m['role']}|>\n{m['content']}\n" for m in messages]
            if request.add_generation_prompt:
                parts.append("<|assistant|>\n")
            return "".join(parts)

    async def create_chat_completion(
            self, request: ChatCompletionRequest
    ) -> Union[ChatCompletionResponse, ErrorResponse, AsyncIterator[str]]:
        err = self._check_model(request.model)
        if err:
            return err
        try:
            messages, mm_data = self._extract_multimodal(request)
        except ValueError as e:
            return ErrorResponse(message=str(e), type="BadRequestError")
        prompt_text = self._apply_chat_template(request, messages)
        prompt_ids = self.tokenizer.encode(prompt_text)
        if mm_data is not None:
            model = self.engine.engine.executor.runner.model
            if not getattr(model, "is_vision_model", False):
                return ErrorResponse(
                    message=f"{request.model} is not a vision model",
                    type="BadRequestError")
            # Mark the placeholder with the model's image token id (the
            # engine expands it to num_patches repeats).
            img_tok = model.image_token_index
            try:
                marker = self.tokenizer.encode("<image>",
                                               add_special_tokens=False)
            except TypeError:
                marker = self.tokenizer.encode("<image>")
                if len(marker) > 1 and prompt_ids[:1] == marker[:1]:
                    marker = marker[1:]  # strip BOS
            prompt_ids = _replace_subsequence(prompt_ids, marker,
                                              [img_tok])
            if img_tok not in prompt_ids:
                return ErrorResponse(
                    message="image provided but no <image> placeholder "
                            "found in the prompt",
                    type="BadRequestError")
        err = self._validate_prompt(prompt_ids, request.max_tokens)
        if err:
            return err
        tool_fn = self._named_tool(request)
        if isinstance(tool_fn, ErrorResponse):
            return tool_fn
        try:
            sampling_params = request.to_sampling_params(
                self.max_model_len - len(prompt_ids))
            if tool_fn is not None:
                # Constrain generation to the tool's parameter schema
                # (reference: tool_choice -> guided json).
                from nmvllm_tpu.guided_decoding.json_schema import (
                    schema_to_regex)
                from nmvllm_tpu.guided_decoding.regex_fsm import (
                    RegexLogitsProcessor)
                pattern = schema_to_regex(tool_fn.parameters or {})
                sampling_params.logits_processors.append(
                    RegexLogitsProcessor(self.tokenizer, pattern))
            else:
                guided = await self._maybe_guided_processors(request)
                if guided:
                    sampling_params.logits_processors.extend(guided)
        except ValueError as e:
            return ErrorResponse(message=str(e), type="BadRequestError")
        request_id = f"chatcmpl-{random_uuid()}"
        generator = self.engine.generate(prompt_text, sampling_params,
                                         request_id,
                                         prompt_token_ids=prompt_ids,
                                         multi_modal_data=mm_data)
        if request.stream:
            return self._stream_chat(request, generator, request_id)
        return await self._full_chat(request, generator, request_id,
                                     prompt_ids)

    def _named_tool(self, request):
        """Resolve a named tool_choice to its FunctionDefinition (or an
        ErrorResponse; None = no tool constraint). Named-only, like the
        reference (protocol.py:337)."""
        tc = getattr(request, "tool_choice", None)
        if tc is None or tc == "none" or tc == "auto":
            return None
        if isinstance(tc, str):
            return ErrorResponse(
                message="Only named tool_choice objects (or 'none') are "
                        "supported.", type="BadRequestError", code=400)
        if not request.tools:
            return ErrorResponse(
                message="`tools` must be set when using `tool_choice`.",
                type="BadRequestError", code=400)
        for tool in request.tools:
            if tool.function.name == tc.function.name:
                return tool.function
        return ErrorResponse(
            message=f"Tool {tc.function.name!r} not found in `tools`.",
            type="BadRequestError", code=400)

    async def _full_chat(self, request, generator, request_id, prompt_ids):
        final: Optional[RequestOutput] = None
        async for output in generator:
            final = output
        assert final is not None
        choices = []
        for out in final.outputs:
            logprobs = None
            if request.logprobs and out.logprobs:
                logprobs = self._chat_logprobs(out.logprobs,
                                               request.top_logprobs or 0)
            tool_fn = self._named_tool(request)
            if tool_fn is not None and not isinstance(tool_fn,
                                                      ErrorResponse):
                from nmvllm_tpu.entrypoints.protocol import (FunctionCall,
                                                             ToolCall)
                message = ChatMessage(
                    role=self.response_role, content=None,
                    tool_calls=[ToolCall(function=FunctionCall(
                        name=tool_fn.name, arguments=out.text))])
            else:
                message = ChatMessage(role=self.response_role,
                                      content=out.text)
            choices.append(ChatCompletionResponseChoice(
                index=out.index,
                message=message,
                logprobs=logprobs,
                finish_reason=out.finish_reason,
                stop_reason=out.stop_reason))
        num_gen = sum(len(o.token_ids) for o in final.outputs)
        usage = UsageInfo(prompt_tokens=len(prompt_ids),
                          completion_tokens=num_gen,
                          total_tokens=len(prompt_ids) + num_gen)
        return ChatCompletionResponse(id=request_id,
                                      model=request.model,
                                      choices=choices, usage=usage)

    def _chat_logprobs(self, logprobs_list,
                       top_n: int) -> ChatCompletionLogProbs:
        content = []
        for pos_logprobs in logprobs_list:
            if not pos_logprobs:
                continue
            sampled = max(pos_logprobs.items(),
                          key=lambda kv: (kv[1].rank is None,
                                          -(kv[1].rank or 1e9)))
            # sampled token = the one appended; find it: rank may be None
            items = sorted(pos_logprobs.items(),
                           key=lambda kv: kv[1].rank or 10**9)
            chosen_id, chosen = items[0]
            top = [ChatCompletionLogProb(
                token=lp.decoded_token or str(tid), logprob=lp.logprob)
                for tid, lp in items[:top_n]]
            content.append(ChatCompletionLogProbsContent(
                token=chosen.decoded_token or str(chosen_id),
                logprob=chosen.logprob, top_logprobs=top))
        return ChatCompletionLogProbs(content=content)

    async def _stream_chat(self, request, generator,
                           request_id) -> AsyncIterator[str]:
        first = ChatCompletionStreamResponse(
            id=request_id, model=request.model,
            choices=[ChatCompletionResponseStreamChoice(
                index=i, delta=DeltaMessage(role=self.response_role),
                finish_reason=None) for i in range(request.n or 1)])
        yield f"data: {first.model_dump_json(exclude_unset=True)}\n\n"
        previous_texts = {}
        prompt_tokens = 0
        completion_tokens = 0
        async for output in generator:
            prompt_tokens = len(output.prompt_token_ids)
            for out in output.outputs:
                prev = previous_texts.get(out.index, "")
                delta_text = out.text[len(prev):]
                previous_texts[out.index] = out.text
                new_tok = len(out.token_ids) - completion_tokens
                completion_tokens = len(out.token_ids)
                if new_tok or delta_text or out.finish_reason is not None:
                    chunk = ChatCompletionStreamResponse(
                        id=request_id, model=request.model,
                        choices=[ChatCompletionResponseStreamChoice(
                            index=out.index,
                            delta=DeltaMessage(content=delta_text),
                            finish_reason=out.finish_reason,
                            stop_reason=out.stop_reason)])
                    yield (f"data: "
                           f"{chunk.model_dump_json(exclude_unset=True)}\n\n")
        if request.stream_options and request.stream_options.include_usage:
            usage_chunk = ChatCompletionStreamResponse(
                id=request_id, model=request.model, choices=[],
                usage=UsageInfo(
                    prompt_tokens=prompt_tokens,
                    completion_tokens=completion_tokens,
                    total_tokens=prompt_tokens + completion_tokens))
            yield f"data: {usage_chunk.model_dump_json()}\n\n"
        yield "data: [DONE]\n\n"


class OpenAIServingEmbedding(OpenAIServing):
    """/v1/embeddings (reference serving_embedding.py). Embedding models
    bypass the decode scheduler: one pooled prefill per input, serialized
    with the engine loop via an asyncio lock."""

    def __init__(self, engine, served_model_names):
        super().__init__(engine, served_model_names)
        self._lock = None

    async def create_embedding(self, request):
        import asyncio

        from nmvllm_tpu.entrypoints.protocol import (EmbeddingResponse,
                                                     EmbeddingResponseData,
                                                     UsageInfo)
        if self._lock is None:
            self._lock = asyncio.Lock()
        if self.tokenizer is None:
            await self._post_init()
        err = self._check_model(request.model)
        if err is not None:
            return err
        inner = self.engine.engine
        model = inner.executor.runner.model
        if not getattr(model, "is_embedding_model", False):
            from nmvllm_tpu.entrypoints.protocol import ErrorResponse
            return ErrorResponse(
                message=f"{request.model} is not an embedding model",
                type="BadRequestError", code=400)
        inputs = request.input
        if isinstance(inputs, str):
            inputs = [inputs]
        elif inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        from nmvllm_tpu.sequence import SequenceData, SequenceGroupMetadata
        bs = inner.cache_config.block_size
        data = []
        total_tokens = 0
        loop = asyncio.get_event_loop()
        async with self._lock:
            for i, item in enumerate(inputs):
                ids = (self.tokenizer.encode(item)
                       if isinstance(item, str) else list(item))
                total_tokens += len(ids)
                nblocks = -(-len(ids) // bs)
                meta = SequenceGroupMetadata(
                    request_id=f"embd-{i}", is_prompt=True,
                    seq_data={0: SequenceData(ids)}, sampling_params=None,
                    block_tables={0: list(range(nblocks))})

                def run(meta=meta):
                    kv, pooled = inner.executor.runner.execute_embedding(
                        meta, inner.executor.cache_engine.kv_caches)
                    inner.executor.cache_engine.kv_caches = kv
                    return pooled
                pooled = await loop.run_in_executor(None, run)
                data.append(EmbeddingResponseData(
                    index=i, embedding=[float(v) for v in pooled]))
        return EmbeddingResponse(
            model=request.model, data=data,
            usage=UsageInfo(prompt_tokens=total_tokens,
                            total_tokens=total_tokens))


class OpenAIServingCompletion(OpenAIServing):

    async def create_completion(
            self, request: CompletionRequest
    ) -> Union[CompletionResponse, ErrorResponse, AsyncIterator[str]]:
        err = self._check_model(request.model)
        if err:
            return err
        if request.suffix is not None:
            return ErrorResponse(message="suffix is not supported",
                                 type="BadRequestError")
        prompts = request.prompt
        if isinstance(prompts, str):
            prompts = [prompts]
        elif prompts and isinstance(prompts[0], int):
            prompts = [prompts]
        request_id = f"cmpl-{random_uuid()}"
        generators = []
        prompt_lens = []
        try:
            guided = await self._maybe_guided_processors(request)
        except ValueError as e:
            return ErrorResponse(message=str(e), type="BadRequestError")
        for i, prompt in enumerate(prompts):
            if isinstance(prompt, str):
                prompt_ids = self.tokenizer.encode(prompt)
                prompt_text: Optional[str] = prompt
            else:
                prompt_ids = list(prompt)
                prompt_text = None
            err = self._validate_prompt(prompt_ids, request.max_tokens)
            if err:
                return err
            sampling_params = request.to_sampling_params(
                self.max_model_len - len(prompt_ids))
            if guided:
                sampling_params.logits_processors.extend(guided)
            prompt_lens.append(len(prompt_ids))
            generators.append(self.engine.generate(
                prompt_text, sampling_params, f"{request_id}-{i}",
                prompt_token_ids=prompt_ids))
        if request.stream:
            return self._stream_completion(request, generators, request_id)
        return await self._full_completion(request, generators, request_id,
                                           prompt_lens)

    async def _full_completion(self, request, generators, request_id,
                               prompt_lens):
        choices = []
        total_gen = 0
        for i, generator in enumerate(generators):
            final = None
            async for output in generator:
                final = output
            for out in final.outputs:
                text = out.text
                if request.echo:
                    text = (final.prompt or "") + text
                logprobs = None
                if request.logprobs is not None:
                    logprobs = self._completion_logprobs(
                        out, request.logprobs)
                    if request.echo and final.prompt_logprobs:
                        logprobs = self._merge_prompt_logprobs(
                            final, logprobs)
                choices.append(CompletionResponseChoice(
                    index=i * (request.n or 1) + out.index, text=text,
                    logprobs=logprobs, finish_reason=out.finish_reason,
                    stop_reason=out.stop_reason))
                total_gen += len(out.token_ids)
        usage = UsageInfo(prompt_tokens=sum(prompt_lens),
                          completion_tokens=total_gen,
                          total_tokens=sum(prompt_lens) + total_gen)
        return CompletionResponse(id=request_id, model=request.model,
                                  choices=choices, usage=usage)

    def _merge_prompt_logprobs(self, final, gen_part: LogProbsPart
                               ) -> LogProbsPart:
        """echo=True + logprobs: prepend per-prompt-token logprobs
        (reference serving_completion echo handling)."""
        part = LogProbsPart(top_logprobs=[])
        offset = 0
        for tid, pos in zip(final.prompt_token_ids,
                            final.prompt_logprobs or []):
            if pos is None:
                token_str = str(tid)
                part.token_logprobs.append(None)
                part.top_logprobs.append(None)
            else:
                lp = pos.get(tid)
                token_str = (lp.decoded_token if lp and lp.decoded_token
                             else str(tid))
                part.token_logprobs.append(lp.logprob if lp else None)
                part.top_logprobs.append({
                    (v.decoded_token or str(k)): v.logprob
                    for k, v in pos.items()})
            part.tokens.append(token_str)
            part.text_offset.append(offset)
            offset += len(token_str)
        part.tokens.extend(gen_part.tokens)
        part.token_logprobs.extend(gen_part.token_logprobs)
        part.top_logprobs.extend(gen_part.top_logprobs or [])
        part.text_offset.extend(o + offset for o in gen_part.text_offset)
        return part

    def _completion_logprobs(self, out, top_n: int) -> LogProbsPart:
        part = LogProbsPart(top_logprobs=[])
        offset = 0
        for tid, pos in zip(out.token_ids, out.logprobs or []):
            lp = pos.get(tid)
            token_str = (lp.decoded_token if lp and lp.decoded_token
                         else str(tid))
            part.tokens.append(token_str)
            part.token_logprobs.append(lp.logprob if lp else None)
            part.text_offset.append(offset)
            offset += len(token_str)
            part.top_logprobs.append({
                (v.decoded_token or str(k)): v.logprob
                for k, v in list(pos.items())[:top_n]
            } if top_n else None)
        return part

    async def _stream_completion(self, request, generators,
                                 request_id) -> AsyncIterator[str]:
        for i, generator in enumerate(generators):
            previous_texts: Dict[int, str] = {}
            previous_ntok: Dict[int, int] = {}
            async for output in generator:
                for out in output.outputs:
                    prev = previous_texts.get(out.index, "")
                    delta = out.text[len(prev):]
                    previous_texts[out.index] = out.text
                    new_tok = len(out.token_ids) - previous_ntok.get(
                        out.index, 0)
                    previous_ntok[out.index] = len(out.token_ids)
                    # Stream a chunk per NEW TOKEN even when the text
                    # delta is empty (partial-UTF8 / empty-piece
                    # tokens): the reference emits per-token chunks and
                    # TTFT/ITL measurement depends on the cadence.
                    if new_tok or delta or out.finish_reason is not None:
                        chunk = CompletionStreamResponse(
                            id=request_id, model=request.model,
                            choices=[CompletionResponseStreamChoice(
                                index=i * (request.n or 1) + out.index,
                                text=delta,
                                finish_reason=out.finish_reason,
                                stop_reason=out.stop_reason)])
                        yield (f"data: "
                               f"{chunk.model_dump_json(exclude_unset=True)}"
                               f"\n\n")
        yield "data: [DONE]\n\n"
