"""Core request/sequence data model.

Parity with the reference's vllm/sequence.py (SequenceData:100, Sequence:232,
SequenceGroup:401, SequenceGroupMetadata:598, SamplerOutput:802,
ExecuteModelRequest:916): the request lifecycle objects that flow between the
engine, scheduler, and model runner. Pure host-side Python — nothing here is
traced.
"""
import enum
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Set, Tuple, Union

from nmvllm_tpu.sampling_params import SamplingParams


class SequenceStatus(enum.IntEnum):
    WAITING = 0
    RUNNING = 1
    SWAPPED = 2
    FINISHED_STOPPED = 3
    FINISHED_LENGTH_CAPPED = 4
    FINISHED_ABORTED = 5
    FINISHED_IGNORED = 6

    @staticmethod
    def is_finished(status: "SequenceStatus") -> bool:
        return status >= SequenceStatus.FINISHED_STOPPED

    @staticmethod
    def get_finished_reason(status: "SequenceStatus") -> Optional[str]:
        return {
            SequenceStatus.FINISHED_STOPPED: "stop",
            SequenceStatus.FINISHED_LENGTH_CAPPED: "length",
            SequenceStatus.FINISHED_ABORTED: "abort",
            SequenceStatus.FINISHED_IGNORED: "length",
        }.get(status)


class SequenceStage(enum.Enum):
    PREFILL = enum.auto()
    DECODE = enum.auto()


@dataclass
class Logprob:
    logprob: float
    rank: Optional[int] = None
    decoded_token: Optional[str] = None


# {token_id: Logprob} per generated position.
SampleLogprobs = List[Dict[int, Logprob]]
PromptLogprobs = List[Optional[Dict[int, Logprob]]]


class SequenceData:
    """Token ids + bookkeeping for one sequence (reference sequence.py:100)."""

    def __init__(self, prompt_token_ids: List[int],
                 output_token_ids: Optional[List[int]] = None) -> None:
        self.prompt_token_ids = list(prompt_token_ids)
        self.output_token_ids = list(output_token_ids or [])
        self.cumulative_logprob = 0.0
        # Number of tokens whose KV is already computed (chunked prefill /
        # prefix cache advance this before decode starts).
        self._num_computed_tokens = 0
        self._stage = SequenceStage.PREFILL

    def append_token_id(self, token_id: int, logprob: float) -> None:
        self.output_token_ids.append(token_id)
        self.cumulative_logprob += logprob

    def get_len(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    def get_prompt_len(self) -> int:
        return len(self.prompt_token_ids)

    def get_output_len(self) -> int:
        return len(self.output_token_ids)

    def get_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    def get_num_computed_tokens(self) -> int:
        return self._num_computed_tokens

    def update_num_computed_tokens(self, num: int) -> None:
        self._num_computed_tokens += num
        if self.get_num_uncomputed_tokens() == 0:
            self._stage = SequenceStage.DECODE

    def reset_state_for_recompute(self) -> None:
        self._num_computed_tokens = 0
        self._stage = SequenceStage.PREFILL

    def get_num_uncomputed_tokens(self) -> int:
        # During decode the last token is always "uncomputed" (it produces
        # the next step's KV write).
        return self.get_len() - self._num_computed_tokens

    def get_last_token_id(self) -> int:
        if self.output_token_ids:
            return self.output_token_ids[-1]
        return self.prompt_token_ids[-1]

    @property
    def stage(self) -> SequenceStage:
        return self._stage

    def __repr__(self) -> str:
        return (f"SequenceData(prompt_len={self.get_prompt_len()}, "
                f"output_len={self.get_output_len()})")


class Sequence:
    """One branch of generation with its logical block usage
    (reference sequence.py:232)."""

    def __init__(self, seq_id: int, prompt: Optional[str],
                 prompt_token_ids: List[int], block_size: int,
                 eos_token_id: Optional[int] = None,
                 lora_request: Optional[Any] = None) -> None:
        self.seq_id = seq_id
        self.prompt = prompt
        self.block_size = block_size
        self.eos_token_id = eos_token_id
        self.lora_request = lora_request
        self.data = SequenceData(prompt_token_ids)
        self.status = SequenceStatus.WAITING
        self.stop_reason: Union[int, str, None] = None
        # Incremental detokenization state.
        self.output_text = ""
        self.tokens: Optional[List[str]] = None
        self.prefix_offset = 0
        self.read_offset = 0
        # Logprobs accumulated per output token.
        self.output_logprobs: SampleLogprobs = []
        # Prefix-cache hash chain: _hash_chain[i] = content hash of the
        # prefix through full block i (chained FNV-1a, csrc/host/
        # nm_host.cpp). Full-block tokens are append-only, so the memo
        # never invalidates; fork() deepcopy carries it to beam children.
        self._hash_chain: List[int] = []

    # -- token accessors ----------------------------------------------------
    def get_len(self) -> int:
        return self.data.get_len()

    def get_prompt_len(self) -> int:
        return self.data.get_prompt_len()

    def get_output_len(self) -> int:
        return self.data.get_output_len()

    def get_token_ids(self) -> List[int]:
        return self.data.get_token_ids()

    def get_last_token_id(self) -> int:
        return self.data.get_last_token_id()

    def get_output_token_ids(self) -> List[int]:
        return self.data.output_token_ids

    def get_cumulative_logprob(self) -> float:
        return self.data.cumulative_logprob

    def append_token_id(self, token_id: int,
                        logprobs: Dict[int, Logprob]) -> None:
        assert token_id in logprobs
        self.output_logprobs.append(logprobs)
        self.data.append_token_id(token_id, logprobs[token_id].logprob)

    def n_blocks(self) -> int:
        return -(-self.get_len() // self.block_size)

    def hash_of_block(self, logical_idx: int) -> int:
        """Prefix-aware content hash of full logical block `logical_idx`
        (reference block_manager_v1 hash-based prefix caching). Chained
        incremental hashing — O(block) per new block instead of
        re-hashing the whole prefix — memoized in _hash_chain; the chain
        runs in the native host library when available."""
        chain = self._hash_chain
        if logical_idx < len(chain):
            return chain[logical_idx]
        from nmvllm_tpu.native import hash_block_chain
        tokens = self.get_token_ids()
        bs = self.block_size
        lora_salt = (self.lora_request.lora_int_id
                     if self.lora_request else 0)
        while len(chain) <= logical_idx:
            i = len(chain)
            prev = chain[i - 1] if i else lora_salt
            block = tokens[i * bs:(i + 1) * bs]
            assert len(block) == bs, "hash_of_block needs a full block"
            chain.append(hash_block_chain(prev, block))
        return chain[logical_idx]

    def is_finished(self) -> bool:
        return SequenceStatus.is_finished(self.status)

    def is_prefill(self) -> bool:
        return self.data.stage == SequenceStage.PREFILL

    def reset_state_for_recompute(self) -> None:
        self.data.reset_state_for_recompute()

    def fork(self, new_seq_id: int) -> "Sequence":
        import copy
        new_seq = copy.deepcopy(self)
        new_seq.seq_id = new_seq_id
        return new_seq

    def get_beam_search_score(self, length_penalty: float = 1.0,
                              seq_len: Optional[int] = None,
                              eos_token_id: Optional[int] = None) -> float:
        if seq_len is None:
            seq_len = self.get_len()
            if (eos_token_id is not None
                    and self.get_last_token_id() == eos_token_id):
                seq_len -= 1
        return self.get_cumulative_logprob() / (seq_len**length_penalty)

    def __repr__(self) -> str:
        return (f"Sequence(seq_id={self.seq_id}, status={self.status.name}, "
                f"num_blocks={self.n_blocks()})")


@dataclass
class RequestMetrics:
    """Per-request latency bookkeeping (reference sequence.py:375)."""
    arrival_time: float
    last_token_time: float
    first_scheduled_time: Optional[float] = None
    first_token_time: Optional[float] = None
    time_in_queue: Optional[float] = None
    finished_time: Optional[float] = None


class SequenceGroup:
    """All sequences born from one request (reference sequence.py:401)."""

    def __init__(self, request_id: str, seqs: List[Sequence],
                 arrival_time: float,
                 sampling_params: Optional[SamplingParams] = None,
                 lora_request: Optional[Any] = None,
                 trace_headers: Optional[Dict[str, str]] = None,
                 pooling_params: Optional[Any] = None,
                 encoder_seq: Optional[Sequence] = None,
                 multi_modal_data: Optional[Any] = None) -> None:
        self.request_id = request_id
        self.seqs_dict = {seq.seq_id: seq for seq in seqs}
        self.sampling_params = sampling_params
        self.lora_request = lora_request
        self.trace_headers = trace_headers
        self.pooling_params = pooling_params
        self.encoder_seq = encoder_seq
        self.multi_modal_data = multi_modal_data
        self.metrics = RequestMetrics(arrival_time=arrival_time,
                                      last_token_time=arrival_time)
        self.prompt_logprobs: Optional[PromptLogprobs] = None
        self.state_generator_seed_offset = 0

    @property
    def prompt(self) -> Optional[str]:
        return next(iter(self.seqs_dict.values())).prompt

    @property
    def prompt_token_ids(self) -> List[int]:
        return next(iter(self.seqs_dict.values())).data.prompt_token_ids

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    def get_max_num_running_seqs(self) -> int:
        if self.sampling_params and self.sampling_params.use_beam_search:
            return self.sampling_params.best_of
        if self.sampling_params and self.sampling_params.best_of > self.num_seqs():
            return self.sampling_params.best_of
        return self.num_unfinished_seqs()

    def get_seqs(self, status: Optional[SequenceStatus] = None
                 ) -> List[Sequence]:
        if status is None:
            return list(self.seqs_dict.values())
        return [s for s in self.seqs_dict.values() if s.status == status]

    def get_unfinished_seqs(self) -> List[Sequence]:
        return [s for s in self.seqs_dict.values() if not s.is_finished()]

    def get_finished_seqs(self) -> List[Sequence]:
        return [s for s in self.seqs_dict.values() if s.is_finished()]

    def update_num_computed_tokens(self, num_new_computed: int) -> None:
        for seq in self.seqs_dict.values():
            if not seq.is_finished():
                seq.data.update_num_computed_tokens(num_new_computed)

    def get_num_uncomputed_tokens(self) -> int:
        return sum(s.data.get_num_uncomputed_tokens()
                   for s in self.get_unfinished_seqs())

    def num_seqs(self, status: Optional[SequenceStatus] = None) -> int:
        return len(self.get_seqs(status))

    def num_unfinished_seqs(self) -> int:
        return len(self.get_unfinished_seqs())

    def find(self, seq_id: int) -> Sequence:
        return self.seqs_dict[seq_id]

    def add(self, seq: Sequence) -> None:
        assert seq.seq_id not in self.seqs_dict
        self.seqs_dict[seq.seq_id] = seq

    def remove(self, seq_id: int) -> None:
        del self.seqs_dict[seq_id]

    def is_finished(self) -> bool:
        return all(s.is_finished() for s in self.seqs_dict.values())

    def is_prefill(self) -> bool:
        return next(iter(self.seqs_dict.values())).is_prefill()

    def maybe_set_first_token_time(self, time: float) -> None:
        if (self.metrics.first_token_time is None
                and self.get_seqs()[0].get_output_len() == 1):
            self.metrics.first_token_time = time

    def maybe_set_first_scheduled_time(self, time: float) -> None:
        if self.metrics.first_scheduled_time is None:
            self.metrics.first_scheduled_time = time
            self.metrics.time_in_queue = time - self.metrics.arrival_time

    def set_finished_time(self, time: Optional[float]) -> None:
        self.metrics.finished_time = time

    def __repr__(self) -> str:
        return (f"SequenceGroup(request_id={self.request_id}, "
                f"num_seqs={self.num_seqs()})")


@dataclass
class SequenceGroupMetadata:
    """Scheduler → model-runner contract (reference sequence.py:598).

    block_tables maps seq_id → list of physical KV block ids. token_chunk_size
    is the number of prompt tokens scheduled this step (chunked prefill).
    do_sample=False for non-final prefill chunks.
    """
    request_id: str
    is_prompt: bool
    seq_data: Dict[int, SequenceData]
    sampling_params: Optional[SamplingParams]
    block_tables: Dict[int, List[int]]
    do_sample: bool = True
    token_chunk_size: Optional[int] = None
    computed_block_nums: Optional[List[int]] = None
    lora_request: Optional[Any] = None
    multi_modal_data: Optional[Any] = None
    state_seed: Optional[int] = None
    # seq_id -> block-table version (core/block_manager.py _bump): lets
    # the runner's native batch-assembly mirror detect table changes
    # (swap/CoW/promotion) without diffing table contents.
    table_versions: Optional[Dict[int, int]] = None

    def __post_init__(self):
        if self.token_chunk_size is None:
            if self.is_prompt:
                self.token_chunk_size = next(
                    iter(self.seq_data.values())).get_len()
            else:
                self.token_chunk_size = 1

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0


@dataclass
class SequenceOutput:
    """One sampled token for one sequence (reference sequence.py:744)."""
    parent_seq_id: int
    output_token: int
    logprobs: Dict[int, Logprob]


@dataclass
class CompletionSequenceGroupOutput:
    """Model output for one sequence group at one step."""
    samples: List[SequenceOutput]
    prompt_logprobs: Optional[PromptLogprobs] = None


@dataclass
class SamplerOutput:
    """Engine-facing output of one model step (reference sequence.py:802)."""
    outputs: List[CompletionSequenceGroupOutput]
    sampled_token_ids: Optional[Any] = None  # device array, for multi-step
    spec_decode_worker_metrics: Optional[Any] = None

    def __len__(self):
        return len(self.outputs)

    def __iter__(self):
        return iter(self.outputs)

    def __getitem__(self, idx):
        return self.outputs[idx]


@dataclass
class ExecuteModelRequest:
    """Engine → executor step payload (reference sequence.py:916)."""
    seq_group_metadata_list: List[SequenceGroupMetadata]
    blocks_to_swap_in: List[Tuple[int, int]] = field(default_factory=list)
    blocks_to_swap_out: List[Tuple[int, int]] = field(default_factory=list)
    blocks_to_copy: List[Tuple[int, int]] = field(default_factory=list)
    num_lookahead_slots: int = 0
    running_queue_size: int = 0

    def clone(self, seq_group_metadata_list: List[SequenceGroupMetadata]
              ) -> "ExecuteModelRequest":
        return ExecuteModelRequest(
            seq_group_metadata_list=seq_group_metadata_list,
            blocks_to_swap_in=list(self.blocks_to_swap_in),
            blocks_to_swap_out=list(self.blocks_to_swap_out),
            blocks_to_copy=list(self.blocks_to_copy),
            num_lookahead_slots=self.num_lookahead_slots,
            running_queue_size=self.running_queue_size)


@dataclass
class IntermediateTensors:
    """Hidden states crossing a pipeline-stage boundary
    (reference sequence.py:774)."""
    tensors: Dict[str, Any]

    def __getitem__(self, key: str):
        return self.tensors[key]

    def __setitem__(self, key: str, value) -> None:
        self.tensors[key] = value
