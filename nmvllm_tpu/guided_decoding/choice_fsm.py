"""Token-trie constrained decoding for `guided_choice`.

Builds a trie of the tokenized choices; at each step the processor exposes
the set of token ids that continue at least one choice. The engine applies
this as an allow-mask in-graph (via SamplingTensors banned/allowed masks).
"""
from typing import Dict, List, Optional, Set


class ChoiceLogitsProcessor:
    """Host-side automaton; the runner consumes `allowed_token_ids(seq)`."""

    is_guided = True

    def __init__(self, tokenizer, choices: List[str]):
        self.tokenizer = tokenizer
        self.eos_token_id = getattr(tokenizer, "eos_token_id", None)
        # Trie over token sequences.
        self.root: Dict = {}
        for choice in choices:
            ids = tokenizer.encode(choice, add_special_tokens=False) \
                if hasattr(tokenizer, "encode") else tokenizer.encode(choice)
            node = self.root
            for tid in ids:
                node = node.setdefault(tid, {})
            node[None] = True  # terminal marker

    def allowed_token_ids(self, generated: List[int]) -> Optional[Set[int]]:
        """Token ids allowed after `generated`; None = unconstrained."""
        node = self.root
        for tid in generated:
            if tid not in node:
                # Off-trie (shouldn't happen when enforced): allow eos only.
                return {self.eos_token_id} if self.eos_token_id is not None \
                    else set()
            node = node[tid]
        allowed = {tid for tid in node.keys() if tid is not None}
        if None in node and self.eos_token_id is not None:
            allowed.add(self.eos_token_id)
        return allowed

    def __call__(self, generated: List[int], logits):
        # Reference-compatible host-side application (used by tests and the
        # CPU path): mask logits in numpy.
        import numpy as np
        allowed = self.allowed_token_ids(generated)
        if allowed is None:
            return logits
        mask = np.full(logits.shape[-1], -float("inf"))
        for tid in allowed:
            if tid is not None and tid < logits.shape[-1]:
                mask[tid] = 0.0
        return logits + mask
