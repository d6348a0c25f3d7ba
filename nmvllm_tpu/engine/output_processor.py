"""Output processing: incremental detokenization, stop checking, token
appending.

Reference: vllm/engine/output_processor/single_step.py:18
(SingleStepOutputProcessor), stop_checker.py:10 (StopChecker), and
vllm/transformers_utils/detokenizer.py (incremental decode with
prefix/read offsets).
"""
from typing import Dict, List, Optional, Union

from nmvllm_tpu.sampling_params import SamplingParams
from nmvllm_tpu.sequence import (CompletionSequenceGroupOutput, Logprob,
                                 Sequence, SequenceGroup, SequenceStatus)

INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET = 5


def _convert_tokens_to_string_with_added_encoders(tokenizer, tokens,
                                                  skip_special_tokens,
                                                  spaces_between_special):
    sub_texts: List[str] = []
    current_sub_text: List[str] = []
    all_special_tokens = set(
        getattr(tokenizer, "all_special_tokens", []) or [])
    added = tokenizer.get_added_vocab() if hasattr(
        tokenizer, "get_added_vocab") else {}
    for token in tokens:
        if skip_special_tokens and token in all_special_tokens:
            continue
        if token in added:
            if current_sub_text:
                sub_texts.append(
                    tokenizer.convert_tokens_to_string(current_sub_text))
                current_sub_text = []
            sub_texts.append(token)
        else:
            current_sub_text.append(token)
    if current_sub_text:
        sub_texts.append(tokenizer.convert_tokens_to_string(current_sub_text))
    if spaces_between_special:
        return " ".join(sub_texts)
    return "".join(sub_texts)


def detokenize_incrementally(tokenizer, all_input_ids: List[int],
                             prev_tokens: Optional[List[str]],
                             prefix_offset: int, read_offset: int,
                             skip_special_tokens: bool = False,
                             spaces_between_special_tokens: bool = True):
    """Incremental decode (reference detokenizer.py:
    detokenize_incrementally)."""
    new_token_id = all_input_ids[-1]
    first_call = prev_tokens is None
    if first_call:
        # Initialize offsets from the tokens BEFORE the new one, then treat
        # the new token incrementally (reference detokenizer.py behavior).
        prompt_tokens = tokenizer.convert_ids_to_tokens(
            all_input_ids[:-1], skip_special_tokens=skip_special_tokens)
        if isinstance(prompt_tokens, str):
            prompt_tokens = [prompt_tokens]
        prev_tokens = prompt_tokens
        prefix_offset = max(
            len(prompt_tokens) - INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET,
            0)
        read_offset = len(prompt_tokens)
    if skip_special_tokens and new_token_id in getattr(
            tokenizer, "all_special_ids", []):
        return [], "", prefix_offset, read_offset
    new_tokens = tokenizer.convert_ids_to_tokens(
        [new_token_id], skip_special_tokens=skip_special_tokens)
    if isinstance(new_tokens, str):
        new_tokens = [new_tokens]
    output_tokens = prev_tokens + new_tokens
    if first_call:
        # Caller stores the returned tokens as the sequence's token list;
        # on the first call that must include the prompt tokens so offsets
        # stay aligned.
        new_tokens = output_tokens

    has_added = bool(tokenizer.get_added_vocab()) if hasattr(
        tokenizer, "get_added_vocab") else False
    if not has_added:
        prefix_text = tokenizer.convert_tokens_to_string(
            output_tokens[prefix_offset:read_offset])
        new_text = tokenizer.convert_tokens_to_string(
            output_tokens[prefix_offset:])
    else:
        prefix_text = _convert_tokens_to_string_with_added_encoders(
            tokenizer, output_tokens[prefix_offset:read_offset],
            skip_special_tokens, spaces_between_special_tokens)
        new_text = _convert_tokens_to_string_with_added_encoders(
            tokenizer, output_tokens[prefix_offset:],
            skip_special_tokens, spaces_between_special_tokens)
    if len(new_text) > len(prefix_text) and not new_text.endswith("�"):
        new_text = new_text[len(prefix_text):]
        return new_tokens, new_text, read_offset, len(output_tokens)
    return new_tokens, "", prefix_offset, read_offset


class Detokenizer:
    """Per-sequence incremental detokenization
    (reference transformers_utils/detokenizer.py)."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    def decode_sequence_inplace(self, seq: Sequence,
                                params: SamplingParams) -> int:
        all_input_ids = seq.get_token_ids()
        token_id_generated_this_iteration = all_input_ids[-1]
        new_tokens, new_text, prefix_offset, read_offset = \
            detokenize_incrementally(
                self.tokenizer, all_input_ids, seq.tokens,
                seq.prefix_offset, seq.read_offset,
                skip_special_tokens=params.skip_special_tokens,
                spaces_between_special_tokens=params.
                spaces_between_special_tokens)
        if seq.tokens is None:
            seq.tokens = new_tokens
        else:
            seq.tokens.extend(new_tokens)
        seq.prefix_offset = prefix_offset
        seq.read_offset = read_offset
        seq.output_text += new_text
        # Decode logprob tokens for this position if requested.
        logprobs = seq.output_logprobs[-1] if seq.output_logprobs else None
        if logprobs:
            for tid, lp in logprobs.items():
                if lp.decoded_token is None:
                    toks = self.tokenizer.convert_ids_to_tokens([tid])
                    lp.decoded_token = self.tokenizer.\
                        convert_tokens_to_string(toks)
        return len(new_text)


class StopChecker:
    """Stop conditions after each new token (reference stop_checker.py:10)."""

    def __init__(self, max_model_len: int):
        self.max_model_len = max_model_len

    def maybe_stop_sequence(self, seq: Sequence, new_char_count: int,
                            sampling_params: SamplingParams) -> None:
        # 1. min_tokens not yet reached -> never stop.
        if seq.get_output_len() < sampling_params.min_tokens:
            pass
        else:
            last_token = seq.get_last_token_id()
            # 2. stop token ids (incl. eos unless ignore_eos).
            if last_token in sampling_params.all_stop_token_ids:
                if not sampling_params.include_stop_str_in_output:
                    # eos is never included; explicit stop ids also trimmed
                    # from text only via stop strings (ids have no text).
                    pass
                seq.status = SequenceStatus.FINISHED_STOPPED
                seq.stop_reason = last_token
                return
            # 3. stop strings.
            if new_char_count and sampling_params.stop:
                stop_str = self._check_stop_strings(seq, new_char_count,
                                                    sampling_params)
                if stop_str is not None:
                    seq.status = SequenceStatus.FINISHED_STOPPED
                    seq.stop_reason = stop_str
                    return
        # 4. length limits.
        if seq.get_len() >= self.max_model_len:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return
        if (sampling_params.max_tokens is not None
                and seq.get_output_len() >= sampling_params.max_tokens):
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED

    @staticmethod
    def _check_stop_strings(seq: Sequence, new_char_count: int,
                            sampling_params: SamplingParams) -> Optional[str]:
        for stop_str in sampling_params.stop:
            stop_len = len(stop_str)
            if sampling_params.include_stop_str_in_output:
                stop_index = seq.output_text.find(
                    stop_str, max(0, len(seq.output_text) - new_char_count -
                                  stop_len))
                if stop_index != -1:
                    seq.output_text = seq.output_text[:stop_index + stop_len]
                    return stop_str
            else:
                stop_index = seq.output_text.find(
                    stop_str, max(0, len(seq.output_text) - new_char_count -
                                  stop_len))
                if stop_index != -1:
                    seq.output_text = seq.output_text[:stop_index]
                    return stop_str
        return None


class SingleStepOutputProcessor:
    """Appends sampled tokens, detokenizes, checks stops, frees finished
    (reference output_processor/single_step.py:18)."""

    def __init__(self, detokenizer: Optional[Detokenizer],
                 stop_checker: StopChecker, scheduler, seq_counter=None):
        self.detokenizer = detokenizer
        self.stop_checker = stop_checker
        self.scheduler = scheduler
        self.seq_counter = seq_counter

    def process_outputs(self, seq_group: SequenceGroup,
                        output: CompletionSequenceGroupOutput) -> int:
        if (seq_group.sampling_params is not None
                and seq_group.sampling_params.use_beam_search):
            return self._process_beam_search(seq_group, output)
        return self._process_samples(seq_group, output)

    def _process_samples(self, seq_group: SequenceGroup,
                         output: CompletionSequenceGroupOutput) -> int:
        """Append sampled tokens; returns the number appended.

        A parent seq with multiple samples receives them in order with a
        stop check after each (the reference's MultiStepOutputProcessor,
        output_processor/multi_step.py:20 — used by spec decode); stopping
        early discards the rest.
        """
        samples_by_parent: Dict[int, list] = {}
        for sample in output.samples:
            samples_by_parent.setdefault(sample.parent_seq_id,
                                         []).append(sample)
        num_appended = 0
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            samples = samples_by_parent.get(seq.seq_id, [])
            sampling_params = seq_group.sampling_params
            for sample in samples:
                seq.append_token_id(sample.output_token, sample.logprobs)
                num_appended += 1
                new_char_count = 0
                if sampling_params.detokenize and \
                        self.detokenizer is not None:
                    new_char_count = \
                        self.detokenizer.decode_sequence_inplace(
                            seq, sampling_params)
                self.stop_checker.maybe_stop_sequence(seq, new_char_count,
                                                      sampling_params)
                if seq.is_finished():
                    break
            if seq.is_finished():
                self.scheduler.free_seq(seq)
        return num_appended

    def _process_beam_search(self, seq_group: SequenceGroup,
                             output: CompletionSequenceGroupOutput) -> int:
        """Beam-search step: fork parents into candidate children, keep the
        top ``beam_width`` running beams and the best finished beams
        (behavior parity with reference single_step.py:113-249; candidates
        arrive pre-scored from the runner's top-k capture)."""
        sampling_params = seq_group.sampling_params
        beam_width = sampling_params.best_of
        length_penalty = sampling_params.length_penalty
        parent_seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
        existing_finished = seq_group.get_finished_seqs()
        by_parent: Dict[int, list] = {p.seq_id: [] for p in parent_seqs}
        for sample in output.samples:
            by_parent[sample.parent_seq_id].append(sample)

        child_seqs = []  # (child, parent)
        for parent in parent_seqs:
            samples = by_parent[parent.seq_id]
            if not samples:
                # Unselected parent: drop it entirely.
                parent.status = SequenceStatus.FINISHED_ABORTED
                seq_group.remove(parent.seq_id)
                self.scheduler.free_seq(parent)
                continue
            # Fork a child per extra candidate; the parent continues with
            # the last one (reference ordering: forks happen pre-append).
            for sample in samples[:-1]:
                child = parent.fork(next(self.seq_counter))
                child.append_token_id(sample.output_token, sample.logprobs)
                child_seqs.append((child, parent))
            last = samples[-1]
            parent.append_token_id(last.output_token, last.logprobs)
            child_seqs.append((parent, parent))

        for seq, _ in child_seqs:
            new_char_count = 0
            if sampling_params.detokenize and self.detokenizer is not None:
                new_char_count = self.detokenizer.decode_sequence_inplace(
                    seq, sampling_params)
            self.stop_checker.maybe_stop_sequence(seq, new_char_count,
                                                  sampling_params)

        # ---- beam selection ----
        selected = []    # (seq, parent)
        unselected = []  # (seq, parent)
        existing_finished = [(s, None, False) for s in existing_finished]
        new_finished = [(s, p, True) for s, p in child_seqs
                        if s.is_finished()]
        all_finished = existing_finished + new_finished
        all_finished.sort(
            key=lambda x: x[0].get_beam_search_score(
                length_penalty=length_penalty,
                eos_token_id=x[0].eos_token_id),
            reverse=True)
        for seq, parent, is_new in all_finished[:beam_width]:
            if is_new:
                selected.append((seq, parent))
        for seq, parent, is_new in all_finished[beam_width:]:
            if is_new:
                unselected.append((seq, parent))
            else:
                seq_group.remove(seq.seq_id)

        running = [(s, p) for s, p in child_seqs if not s.is_finished()]
        running.sort(
            key=lambda x: x[0].get_beam_search_score(
                length_penalty=length_penalty,
                eos_token_id=x[0].eos_token_id),
            reverse=True)
        if not running:
            stop_beam = True
        elif len(all_finished) < beam_width:
            stop_beam = False
        else:
            stop_beam = self._beam_early_stop(
                sampling_params, running[0][0],
                all_finished[beam_width - 1][0])
        if stop_beam:
            unselected.extend(running)
        else:
            selected.extend(running[:beam_width])
            unselected.extend(running[beam_width:])

        for seq, parent in selected:
            if seq is not parent:
                seq_group.add(seq)
                if not seq.is_finished():
                    self.scheduler.fork_seq(parent, seq)
        for seq, parent in selected:
            if seq is parent and seq.is_finished():
                self.scheduler.free_seq(seq)
        for seq, parent in unselected:
            if seq is parent:
                seq_group.remove(seq.seq_id)
                self.scheduler.free_seq(seq)
        return 1

    def _beam_early_stop(self, sampling_params: SamplingParams,
                         best_running: Sequence,
                         current_worst: Sequence) -> bool:
        """Early-stop criteria (reference single_step.py:251+)."""
        early_stopping = sampling_params.early_stopping
        length_penalty = sampling_params.length_penalty
        if early_stopping is True:
            return True
        worst_score = current_worst.get_beam_search_score(
            length_penalty=length_penalty,
            eos_token_id=current_worst.eos_token_id)
        if early_stopping is False:
            best_attainable = best_running.get_beam_search_score(
                length_penalty=length_penalty,
                eos_token_id=best_running.eos_token_id)
        else:  # "never"
            if length_penalty > 0.0:
                max_len = (best_running.get_prompt_len() +
                           (sampling_params.max_tokens or
                            self.stop_checker.max_model_len))
                max_len = max(max_len, self.stop_checker.max_model_len)
                best_attainable = best_running.get_beam_search_score(
                    length_penalty=length_penalty, seq_len=max_len,
                    eos_token_id=best_running.eos_token_id)
            else:
                best_attainable = best_running.get_beam_search_score(
                    length_penalty=length_penalty,
                    eos_token_id=best_running.eos_token_id)
        return worst_score >= best_attainable
