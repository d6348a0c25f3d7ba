"""User-facing request outputs (reference: vllm/outputs.py)."""
from dataclasses import dataclass
from typing import Dict, List, Optional, Union

from nmvllm_tpu.sequence import (PromptLogprobs, RequestMetrics,
                                 SampleLogprobs, SequenceGroup,
                                 SequenceStatus)


@dataclass
class CompletionOutput:
    """Output of one completed/streaming sequence
    (reference outputs.py:10)."""
    index: int
    text: str
    token_ids: List[int]
    cumulative_logprob: float
    logprobs: Optional[SampleLogprobs]
    finish_reason: Optional[str] = None
    stop_reason: Union[int, str, None] = None

    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclass
class EmbeddingOutput:
    embedding: List[float]


class RequestOutput:
    """Output of one request at one engine step (reference outputs.py:41)."""

    def __init__(self, request_id: str, prompt: Optional[str],
                 prompt_token_ids: List[int],
                 prompt_logprobs: Optional[PromptLogprobs],
                 outputs: List[CompletionOutput], finished: bool,
                 metrics: Optional[RequestMetrics] = None) -> None:
        self.request_id = request_id
        self.prompt = prompt
        self.prompt_token_ids = prompt_token_ids
        self.prompt_logprobs = prompt_logprobs
        self.outputs = outputs
        self.finished = finished
        self.metrics = metrics

    @classmethod
    def from_seq_group(cls, seq_group: SequenceGroup) -> "RequestOutput":
        seqs = seq_group.get_seqs()
        sampling_params = seq_group.sampling_params
        if sampling_params is not None and len(seqs) > sampling_params.n:
            if sampling_params.use_beam_search:
                def key(seq):
                    return seq.get_beam_search_score(
                        sampling_params.length_penalty)
            else:
                def key(seq):
                    return seq.get_cumulative_logprob()
            top_n_seqs = sorted(seqs, key=key, reverse=True)
            top_n_seqs = top_n_seqs[:sampling_params.n]
        elif sampling_params is not None and sampling_params.n > 1:
            top_n_seqs = sorted(
                seqs, key=lambda s: s.get_cumulative_logprob(),
                reverse=True)[:sampling_params.n]
        else:
            top_n_seqs = seqs

        include_logprobs = (sampling_params is not None
                            and sampling_params.logprobs is not None)
        outputs = []
        for i, seq in enumerate(top_n_seqs):
            outputs.append(
                CompletionOutput(
                    index=i,
                    text=seq.output_text,
                    token_ids=list(seq.get_output_token_ids()),
                    cumulative_logprob=seq.get_cumulative_logprob(),
                    logprobs=seq.output_logprobs if include_logprobs else None,
                    finish_reason=SequenceStatus.get_finished_reason(
                        seq.status),
                    stop_reason=seq.stop_reason))
        return cls(request_id=seq_group.request_id,
                   prompt=seq_group.prompt,
                   prompt_token_ids=seq_group.prompt_token_ids,
                   prompt_logprobs=seq_group.prompt_logprobs,
                   outputs=outputs,
                   finished=seq_group.is_finished(),
                   metrics=seq_group.metrics)

    def __repr__(self) -> str:
        return (f"RequestOutput(request_id={self.request_id}, "
                f"finished={self.finished}, outputs={self.outputs})")


class EmbeddingRequestOutput:
    def __init__(self, request_id: str, outputs: EmbeddingOutput,
                 prompt_token_ids: List[int], finished: bool) -> None:
        self.request_id = request_id
        self.outputs = outputs
        self.prompt_token_ids = prompt_token_ids
        self.finished = finished
