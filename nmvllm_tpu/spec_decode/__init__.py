"""Speculative decoding components.

Reference: vllm/spec_decode/ (SpecDecodeWorker spec_decode_worker.py:73,
NGramWorker ngram_worker.py:13, BatchExpansionTop1Scorer batch_expansion.py)
and the rejection/typical-acceptance samplers
(model_executor/layers/rejection_sampler.py).

Round-1 scope: proposers + samplers as tested components; the engine
integration (multi-token appends via a MultiStepOutputProcessor and
lookahead-slot scheduling) follows. Scoring proposals on TPU maps onto the
existing chunked-prefill path: proposed tokens run as a prefill chunk over
the paged prefix, yielding logits for every proposed position in one step.
"""
from nmvllm_tpu.spec_decode.ngram_proposer import NGramProposer
from nmvllm_tpu.spec_decode.rejection_sampler import (
    rejection_sample_greedy, rejection_sample)

__all__ = ["NGramProposer", "rejection_sample", "rejection_sample_greedy"]
