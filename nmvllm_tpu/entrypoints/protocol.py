"""OpenAI-compatible API schema (reference:
vllm/entrypoints/openai/protocol.py, 758 LoC of pydantic models)."""
import time
from typing import Any, Dict, List, Literal, Optional, Union

from pydantic import BaseModel, Field

from nmvllm_tpu.sampling_params import SamplingParams
from nmvllm_tpu.utils import random_uuid


class ErrorResponse(BaseModel):
    object: str = "error"
    message: str
    type: str
    param: Optional[str] = None
    code: int = 400


class ModelCard(BaseModel):
    id: str
    object: str = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "nmvllm_tpu"
    root: Optional[str] = None


class ModelList(BaseModel):
    object: str = "list"
    data: List[ModelCard] = Field(default_factory=list)


class UsageInfo(BaseModel):
    prompt_tokens: int = 0
    total_tokens: int = 0
    completion_tokens: Optional[int] = 0


class FunctionCall(BaseModel):
    name: str
    arguments: str


class ToolCall(BaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-tool-{random_uuid()}")
    type: str = "function"
    function: FunctionCall


class ChatMessage(BaseModel):
    role: str
    # str, or OpenAI content-part list ({type: text|image_url, ...}).
    content: Optional[Union[str, List[Dict[str, Any]]]] = None
    tool_calls: Optional[List[ToolCall]] = None


class FunctionDefinition(BaseModel):
    name: str
    description: Optional[str] = None
    parameters: Optional[Dict[str, Any]] = None


class ChatCompletionToolsParam(BaseModel):
    type: str = "function"
    function: FunctionDefinition


class ChatCompletionNamedFunction(BaseModel):
    name: str


class ChatCompletionNamedToolChoiceParam(BaseModel):
    type: str = "function"
    function: ChatCompletionNamedFunction


class ResponseFormat(BaseModel):
    type: Literal["text", "json_object"] = "text"


class _SamplingMixin(BaseModel):
    frequency_penalty: Optional[float] = 0.0
    presence_penalty: Optional[float] = 0.0
    repetition_penalty: Optional[float] = 1.0
    temperature: Optional[float] = 1.0
    top_p: Optional[float] = 1.0
    top_k: Optional[int] = -1
    min_p: Optional[float] = 0.0
    seed: Optional[int] = None
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    include_stop_str_in_output: Optional[bool] = False
    ignore_eos: Optional[bool] = False
    max_tokens: Optional[int] = None
    min_tokens: Optional[int] = 0
    n: Optional[int] = 1
    best_of: Optional[int] = None
    use_beam_search: Optional[bool] = False
    length_penalty: Optional[float] = 1.0
    early_stopping: Optional[bool] = False
    skip_special_tokens: Optional[bool] = True
    spaces_between_special_tokens: Optional[bool] = True
    truncate_prompt_tokens: Optional[int] = None
    # guided decoding
    guided_json: Optional[Union[str, dict]] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[List[str]] = None
    guided_grammar: Optional[str] = None
    response_format: Optional[ResponseFormat] = None

    def _base_sampling_params(self, default_max_tokens: int,
                              logprobs: Optional[int],
                              prompt_logprobs: Optional[int] = None,
                              echo_without_generation: bool = False
                              ) -> SamplingParams:
        max_tokens = self.max_tokens
        if max_tokens is None:
            max_tokens = default_max_tokens
        return SamplingParams(
            n=self.n or 1,
            best_of=self.best_of,
            presence_penalty=self.presence_penalty or 0.0,
            frequency_penalty=self.frequency_penalty or 0.0,
            repetition_penalty=self.repetition_penalty or 1.0,
            temperature=(self.temperature
                         if self.temperature is not None else 1.0),
            top_p=self.top_p if self.top_p is not None else 1.0,
            top_k=self.top_k if self.top_k is not None else -1,
            min_p=self.min_p or 0.0,
            seed=self.seed,
            use_beam_search=self.use_beam_search or False,
            length_penalty=self.length_penalty or 1.0,
            early_stopping=self.early_stopping or False,
            stop=self.stop,
            stop_token_ids=self.stop_token_ids,
            include_stop_str_in_output=self.include_stop_str_in_output
            or False,
            ignore_eos=self.ignore_eos or False,
            max_tokens=max_tokens if not echo_without_generation else 1,
            min_tokens=self.min_tokens or 0,
            logprobs=logprobs,
            prompt_logprobs=prompt_logprobs,
            skip_special_tokens=self.skip_special_tokens
            if self.skip_special_tokens is not None else True,
            spaces_between_special_tokens=self.spaces_between_special_tokens
            if self.spaces_between_special_tokens is not None else True,
            truncate_prompt_tokens=self.truncate_prompt_tokens,
            logit_bias=self.logit_bias,
        )


class StreamOptions(BaseModel):
    include_usage: Optional[bool] = False


class ChatCompletionRequest(_SamplingMixin):
    model: str
    messages: List[ChatMessage]
    # Named tool choice -> guided json on the function's parameter schema
    # (reference serving_chat.py:530, protocol.py:337 named-only).
    tools: Optional[List[ChatCompletionToolsParam]] = None
    tool_choice: Optional[Union[str,
                                ChatCompletionNamedToolChoiceParam]] = "none"
    stream: Optional[bool] = False
    stream_options: Optional[StreamOptions] = None
    logprobs: Optional[bool] = False
    top_logprobs: Optional[int] = 0
    user: Optional[str] = None
    add_generation_prompt: Optional[bool] = True
    chat_template: Optional[str] = None
    echo: Optional[bool] = False
    logit_bias: Optional[Dict[str, float]] = None

    def to_sampling_params(self, default_max_tokens: int) -> SamplingParams:
        logprobs = self.top_logprobs if self.logprobs else None
        return self._base_sampling_params(default_max_tokens, logprobs)


class CompletionRequest(_SamplingMixin):
    model: str
    prompt: Union[str, List[str], List[int], List[List[int]]]
    stream: Optional[bool] = False
    stream_options: Optional[StreamOptions] = None
    logprobs: Optional[int] = None
    echo: Optional[bool] = False
    suffix: Optional[str] = None
    user: Optional[str] = None
    logit_bias: Optional[Dict[str, float]] = None

    def to_sampling_params(self, default_max_tokens: int) -> SamplingParams:
        echo_without_generation = bool(self.echo and self.max_tokens == 0)
        return self._base_sampling_params(
            default_max_tokens, self.logprobs,
            prompt_logprobs=self.logprobs if self.echo else None,
            echo_without_generation=echo_without_generation)


class EmbeddingRequest(BaseModel):
    model: str
    input: Union[str, List[str], List[int], List[List[int]]]
    encoding_format: Optional[str] = "float"
    dimensions: Optional[int] = None
    user: Optional[str] = None


class LogProbsPart(BaseModel):
    text_offset: List[int] = Field(default_factory=list)
    token_logprobs: List[Optional[float]] = Field(default_factory=list)
    tokens: List[str] = Field(default_factory=list)
    top_logprobs: Optional[List[Optional[Dict[str, float]]]] = None


class CompletionResponseChoice(BaseModel):
    index: int
    text: str
    logprobs: Optional[LogProbsPart] = None
    finish_reason: Optional[str] = None
    stop_reason: Optional[Union[int, str]] = None


class CompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"cmpl-{random_uuid()}")
    object: str = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    choices: List[CompletionResponseChoice]
    usage: UsageInfo


class CompletionResponseStreamChoice(BaseModel):
    index: int
    text: str
    logprobs: Optional[LogProbsPart] = None
    finish_reason: Optional[str] = None
    stop_reason: Optional[Union[int, str]] = None


class CompletionStreamResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"cmpl-{random_uuid()}")
    object: str = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    choices: List[CompletionResponseStreamChoice]
    usage: Optional[UsageInfo] = None


class ChatCompletionLogProb(BaseModel):
    token: str
    logprob: float
    bytes: Optional[List[int]] = None


class ChatCompletionLogProbsContent(ChatCompletionLogProb):
    top_logprobs: List[ChatCompletionLogProb] = Field(default_factory=list)


class ChatCompletionLogProbs(BaseModel):
    content: Optional[List[ChatCompletionLogProbsContent]] = None


class ChatCompletionResponseChoice(BaseModel):
    index: int
    message: ChatMessage
    logprobs: Optional[ChatCompletionLogProbs] = None
    finish_reason: Optional[str] = None
    stop_reason: Optional[Union[int, str]] = None


class ChatCompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-{random_uuid()}")
    object: str = "chat.completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    choices: List[ChatCompletionResponseChoice]
    usage: UsageInfo


class DeltaMessage(BaseModel):
    role: Optional[str] = None
    content: Optional[str] = None


class ChatCompletionResponseStreamChoice(BaseModel):
    index: int
    delta: DeltaMessage
    logprobs: Optional[ChatCompletionLogProbs] = None
    finish_reason: Optional[str] = None
    stop_reason: Optional[Union[int, str]] = None


class ChatCompletionStreamResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-{random_uuid()}")
    object: str = "chat.completion.chunk"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    choices: List[ChatCompletionResponseStreamChoice]
    usage: Optional[UsageInfo] = None


class EmbeddingResponseData(BaseModel):
    index: int
    object: str = "embedding"
    embedding: List[float]


class EmbeddingResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"embd-{random_uuid()}")
    object: str = "list"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    data: List[EmbeddingResponseData]
    usage: UsageInfo


class TokenizeRequest(BaseModel):
    model: Optional[str] = None
    prompt: str
    add_special_tokens: bool = True


class TokenizeResponse(BaseModel):
    tokens: List[int]
    count: int
    max_model_len: int


class DetokenizeRequest(BaseModel):
    model: Optional[str] = None
    tokens: List[int]


class DetokenizeResponse(BaseModel):
    prompt: str
