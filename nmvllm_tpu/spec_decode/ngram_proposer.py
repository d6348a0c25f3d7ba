"""Prompt-lookup (n-gram) draft proposer.

Reference: vllm/spec_decode/ngram_worker.py:13 — no draft model; the last
n-gram of the sequence is searched in the earlier tokens and the
continuation after the match is proposed.
"""
from typing import List, Optional


class NGramProposer:

    def __init__(self, ngram_min: int = 1, ngram_max: int = 4,
                 num_speculative_tokens: int = 4):
        assert 1 <= ngram_min <= ngram_max
        self.ngram_min = ngram_min
        self.ngram_max = ngram_max
        self.k = num_speculative_tokens

    def propose(self, token_ids: List[int]) -> Optional[List[int]]:
        """Return up to k proposed continuation tokens, or None."""
        n = len(token_ids)
        if n < self.ngram_min + 1:
            return None
        for size in range(min(self.ngram_max, n - 1), self.ngram_min - 1,
                          -1):
            pattern = token_ids[-size:]
            # Search latest match first (recency bias like the reference's
            # tensor roll/argmax trick).
            for start in range(n - size - 1, -1, -1):
                if token_ids[start:start + size] == pattern:
                    cont = token_ids[start + size:start + size + self.k]
                    if cont:
                        return cont
        return None
