"""Test helpers (reference: tests/core/utils.py create_dummy_prompt)."""
import time
from typing import List, Optional, Tuple

from nmvllm_tpu.sampling_params import SamplingParams
from nmvllm_tpu.sequence import Logprob, Sequence, SequenceGroup


def create_dummy_prompt(
        request_id: str, prompt_length: int, block_size: int = 4,
        best_of: int = 1,
        sampling_params: Optional[SamplingParams] = None
) -> Tuple[Sequence, SequenceGroup]:
    prompt_tokens = list(range(prompt_length))
    prompt_str = " ".join(str(t) for t in prompt_tokens)
    seq = Sequence(int(request_id), prompt_str, prompt_tokens, block_size)
    if sampling_params is None:
        sampling_params = SamplingParams(best_of=best_of, n=best_of,
                                         temperature=1.0 if best_of > 1
                                         else 0.0)
    group = SequenceGroup(request_id=request_id, seqs=[seq],
                          arrival_time=time.time(),
                          sampling_params=sampling_params)
    return seq, group


def append_token(seq: Sequence, token_id: int = 0) -> None:
    seq.append_token_id(token_id, {token_id: Logprob(0.0)})
