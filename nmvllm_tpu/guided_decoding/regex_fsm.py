"""Regex-constrained decoding: regex -> NFA -> lazy DFA -> token masks.

Reference behavior: vllm/model_executor/guided_decoding/
outlines_logits_processors.py (RegexLogitsProcessor over an outlines FSM).
Rebuilt dependency-free: a Thompson-construction NFA over codepoint ranges,
lazily determinized; per-DFA-state allowed-token sets are computed by
walking each vocab token's string through the DFA once and cached, so the
steady-state per-step cost is one dict lookup per generated token.

Supported syntax: literals, escapes (\\d \\w \\s \\D \\W \\S and escaped
metachars), ``.``, char classes ``[a-z]``/``[^...]``, groups ``(...)`` /
``(?:...)``, alternation ``|``, quantifiers ``* + ? {m} {m,} {m,n}``.
Anchors ``^``/``$`` are implicit (full-match semantics).
"""
from typing import Dict, FrozenSet, List, Optional, Set, Tuple

MAX_CODEPOINT = 0x10FFFF

# A character set is a tuple of inclusive (lo, hi) codepoint ranges.
CharSet = Tuple[Tuple[int, int], ...]


def _ranges(*pairs) -> CharSet:
    return tuple((lo, hi) for lo, hi in pairs)


_DIGIT = _ranges((48, 57))
_WORD = _ranges((48, 57), (65, 90), (95, 95), (97, 122))
_SPACE = tuple(sorted([(9, 13), (32, 32)]))
_DOT = _ranges((0, 9), (11, MAX_CODEPOINT))  # any char but newline
_ANY = _ranges((0, MAX_CODEPOINT))


def _negate(cs: CharSet) -> CharSet:
    out = []
    prev = 0
    for lo, hi in sorted(cs):
        if lo > prev:
            out.append((prev, lo - 1))
        prev = max(prev, hi + 1)
    if prev <= MAX_CODEPOINT:
        out.append((prev, MAX_CODEPOINT))
    return tuple(out)


def _cs_contains(cs: CharSet, cp: int) -> bool:
    for lo, hi in cs:
        if lo <= cp <= hi:
            return True
    return False


# ---------------------------------------------------------------- parsing
class _Parser:
    """Recursive-descent parser producing an AST of tuples:
    ('lit', charset) | ('cat', [..]) | ('alt', [..]) |
    ('star', node) | ('plus', node) | ('opt', node) |
    ('rep', node, m, n|None) | ('eps',)
    """

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def take(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            raise ValueError(f"unexpected '{self.peek()}' at {self.i}")
        return node

    def _alt(self):
        branches = [self._cat()]
        while self.peek() == "|":
            self.take()
            branches.append(self._cat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def _cat(self):
        parts = []
        while self.peek() is not None and self.peek() not in "|)":
            parts.append(self._repeat())
        if not parts:
            return ("eps",)
        return parts[0] if len(parts) == 1 else ("cat", parts)

    def _repeat(self):
        node = self._atom()
        while True:
            ch = self.peek()
            if ch == "*":
                self.take()
                node = ("star", node)
            elif ch == "+":
                self.take()
                node = ("plus", node)
            elif ch == "?":
                self.take()
                node = ("opt", node)
            elif ch == "{":
                save = self.i
                self.take()
                spec = ""
                while self.peek() is not None and self.peek() != "}":
                    spec += self.take()
                if self.peek() != "}":
                    self.i = save
                    break
                self.take()
                if "," in spec:
                    lo_s, hi_s = spec.split(",", 1)
                    m = int(lo_s) if lo_s else 0
                    n = int(hi_s) if hi_s else None
                else:
                    m = n = int(spec)
                node = ("rep", node, m, n)
            else:
                break
        return node

    def _atom(self):
        ch = self.peek()
        if ch == "(":
            self.take()
            if self.p.startswith("?:", self.i):
                self.i += 2
            elif self.peek() == "?":
                raise ValueError("unsupported group modifier")
            node = self._alt()
            if self.peek() != ")":
                raise ValueError("unbalanced parenthesis")
            self.take()
            return node
        if ch == "[":
            return ("lit", self._char_class())
        if ch == ".":
            self.take()
            return ("lit", _DOT)
        if ch == "\\":
            self.take()
            return ("lit", self._escape(self.take()))
        if ch in "^$":
            # Full-match semantics: anchors are no-ops.
            self.take()
            return ("eps",)
        if ch in "*+?{":
            raise ValueError(f"nothing to repeat at {self.i}")
        self.take()
        cp = ord(ch)
        return ("lit", _ranges((cp, cp)))

    def _escape(self, ch: str) -> CharSet:
        if ch == "d":
            return _DIGIT
        if ch == "D":
            return _negate(_DIGIT)
        if ch == "w":
            return _WORD
        if ch == "W":
            return _negate(_WORD)
        if ch == "s":
            return _SPACE
        if ch == "S":
            return _negate(_SPACE)
        if ch == "n":
            return _ranges((10, 10))
        if ch == "t":
            return _ranges((9, 9))
        if ch == "r":
            return _ranges((13, 13))
        if ch == "u":
            hexs = ""
            for _ in range(4):
                hexs += self.take()
            cp = int(hexs, 16)
            return _ranges((cp, cp))
        if ch == "x":
            hexs = self.take() + self.take()
            cp = int(hexs, 16)
            return _ranges((cp, cp))
        cp = ord(ch)
        return _ranges((cp, cp))

    def _char_class(self) -> CharSet:
        assert self.take() == "["
        negated = False
        if self.peek() == "^":
            negated = True
            self.take()
        items: List[Tuple[int, int]] = []
        first = True
        while True:
            ch = self.peek()
            if ch is None:
                raise ValueError("unterminated character class")
            if ch == "]" and not first:
                self.take()
                break
            first = False
            # One class atom: escaped charset, escaped single char, or a
            # literal char. Single-codepoint atoms may start a range
            # (including escaped bounds like [\x00-\x1f]).
            if ch == "\\":
                self.take()
                cs = self._escape(self.take())
                if not (len(cs) == 1 and cs[0][0] == cs[0][1]):
                    items.extend(cs)  # multi-char class (\d, \w, ...)
                    continue
                lo = cs[0][0]
            else:
                self.take()
                lo = ord(ch)
            if (self.peek() == "-" and self.i + 1 < len(self.p)
                    and self.p[self.i + 1] != "]"):
                self.take()
                hi_ch = self.take()
                if hi_ch == "\\":
                    hi_cs = self._escape(self.take())
                    hi = hi_cs[0][0]
                else:
                    hi = ord(hi_ch)
                items.append((lo, hi))
            else:
                items.append((lo, lo))
        cs = tuple(sorted(items))
        return _negate(cs) if negated else cs


# ---------------------------------------------------------------- NFA/DFA
class _NFA:
    def __init__(self):
        self.eps: List[List[int]] = []
        self.edges: List[List[Tuple[CharSet, int]]] = []

    def new_state(self) -> int:
        self.eps.append([])
        self.edges.append([])
        return len(self.eps) - 1

    def add_eps(self, a: int, b: int) -> None:
        self.eps[a].append(b)

    def add_edge(self, a: int, cs: CharSet, b: int) -> None:
        self.edges[a].append((cs, b))


def _build(nfa: _NFA, node) -> Tuple[int, int]:
    """Thompson construction; returns (start, accept)."""
    kind = node[0]
    if kind == "eps":
        s = nfa.new_state()
        return s, s
    if kind == "lit":
        s, a = nfa.new_state(), nfa.new_state()
        nfa.add_edge(s, node[1], a)
        return s, a
    if kind == "cat":
        first_s, prev_a = _build(nfa, node[1][0])
        for child in node[1][1:]:
            cs, ca = _build(nfa, child)
            nfa.add_eps(prev_a, cs)
            prev_a = ca
        return first_s, prev_a
    if kind == "alt":
        s, a = nfa.new_state(), nfa.new_state()
        for child in node[1]:
            cs, ca = _build(nfa, child)
            nfa.add_eps(s, cs)
            nfa.add_eps(ca, a)
        return s, a
    if kind == "star":
        s, a = nfa.new_state(), nfa.new_state()
        cs, ca = _build(nfa, node[1])
        nfa.add_eps(s, cs)
        nfa.add_eps(s, a)
        nfa.add_eps(ca, cs)
        nfa.add_eps(ca, a)
        return s, a
    if kind == "plus":
        return _build(nfa, ("cat", [node[1], ("star", node[1])]))
    if kind == "opt":
        return _build(nfa, ("alt", [node[1], ("eps",)]))
    if kind == "rep":
        _, child, m, n = node
        parts = [child] * m
        if n is None:
            parts.append(("star", child))
        else:
            parts.extend([("opt", child)] * (n - m))
        if not parts:
            return _build(nfa, ("eps",))
        return _build(nfa, parts[0] if len(parts) == 1
                      else ("cat", parts))
    raise ValueError(f"bad node {kind}")


class RegexGuide:
    """Lazy DFA over the NFA; exposes per-state token masks.

    ``initial`` is state 0; ``-1`` is the dead state.
    """

    def __init__(self, pattern: str, eos_token_id: Optional[int] = None):
        self.pattern = pattern
        self.eos_token_id = eos_token_id
        self.nfa = _NFA()
        start, accept = _build(self.nfa, _Parser(pattern).parse())
        self.accept = accept
        init = frozenset(self._closure({start}))
        self._dfa_sets: List[FrozenSet[int]] = [init]
        self._dfa_ids: Dict[FrozenSet[int], int] = {init: 0}
        self._char_trans: List[Dict[int, int]] = [{}]
        self._token_trans: List[Dict[int, int]] = [{}]
        self._vocab_strings: Optional[List[Optional[str]]] = None
        self._allowed_cache: Dict[int, Set[int]] = {}

    # ---- core automaton ----
    def _closure(self, states: Set[int]) -> Set[int]:
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for t in self.nfa.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return seen

    def step_char(self, state: int, cp: int) -> int:
        if state < 0:
            return -1
        cache = self._char_trans[state]
        if cp in cache:
            return cache[cp]
        nxt: Set[int] = set()
        for s in self._dfa_sets[state]:
            for cs, t in self.nfa.edges[s]:
                if _cs_contains(cs, cp):
                    nxt.add(t)
        if not nxt:
            cache[cp] = -1
            return -1
        closed = frozenset(self._closure(nxt))
        sid = self._dfa_ids.get(closed)
        if sid is None:
            sid = len(self._dfa_sets)
            self._dfa_sets.append(closed)
            self._dfa_ids[closed] = sid
            self._char_trans.append({})
            self._token_trans.append({})
        cache[cp] = sid
        return sid

    def is_final(self, state: int) -> bool:
        return state >= 0 and self.accept in self._dfa_sets[state]

    def walk_string(self, state: int, s: str) -> int:
        for ch in s:
            state = self.step_char(state, ord(ch))
            if state < 0:
                return -1
        return state

    # ---- token level ----
    def set_vocab(self, vocab_strings: List[Optional[str]]) -> None:
        """vocab_strings[tid] = decoded string, or None for special/skip."""
        self._vocab_strings = vocab_strings

    def step_token(self, state: int, token_id: int) -> int:
        if state < 0:
            return -1
        cache = self._token_trans[state]
        if token_id in cache:
            return cache[token_id]
        s = self._vocab_strings[token_id] \
            if token_id < len(self._vocab_strings) else None
        nxt = self.walk_string(state, s) if s else -1
        cache[token_id] = nxt
        return nxt

    def allowed_tokens(self, state: int) -> Set[int]:
        if state in self._allowed_cache:
            return self._allowed_cache[state]
        assert self._vocab_strings is not None, "set_vocab() first"
        allowed: Set[int] = set()
        for tid, s in enumerate(self._vocab_strings):
            if not s:
                continue
            if self.step_token(state, tid) >= 0:
                allowed.add(tid)
        if self.is_final(state) and self.eos_token_id is not None:
            allowed.add(self.eos_token_id)
        self._allowed_cache[state] = allowed
        return allowed


def build_vocab_strings(tokenizer) -> List[Optional[str]]:
    """Decode every vocab id to its surface string once (cached by the
    processor layer). Special tokens map to None (never allowed)."""
    size = getattr(tokenizer, "vocab_size", None)
    if size is None:
        size = len(tokenizer)
    try:
        size = max(size, len(tokenizer))
    except TypeError:
        pass
    special = set(getattr(tokenizer, "all_special_ids", []) or [])
    out: List[Optional[str]] = []
    convert = getattr(tokenizer, "convert_ids_to_tokens", None)
    to_string = getattr(tokenizer, "convert_tokens_to_string", None)
    for tid in range(size):
        if tid in special:
            out.append(None)
            continue
        try:
            if convert is not None and to_string is not None:
                tok = convert([tid])
                s = to_string(tok if isinstance(tok, list) else [tok])
            else:
                s = tokenizer.decode([tid])
        except Exception:
            s = None
        out.append(s if s else None)
    return out


class RegexLogitsProcessor:
    """Host-side automaton consumed by the runner's in-graph allow-mask
    (same interface as ChoiceLogitsProcessor.allowed_token_ids)."""

    is_guided = True
    _vocab_cache: Dict[int, List[Optional[str]]] = {}

    def __init__(self, tokenizer, pattern: str):
        eos = getattr(tokenizer, "eos_token_id", None)
        self.guide = RegexGuide(pattern, eos_token_id=eos)
        key = id(tokenizer)
        if key not in RegexLogitsProcessor._vocab_cache:
            RegexLogitsProcessor._vocab_cache[key] = \
                build_vocab_strings(tokenizer)
        self.guide.set_vocab(RegexLogitsProcessor._vocab_cache[key])
        self.eos_token_id = eos
        # Path cache: state after each generated prefix (append-only).
        self._path: List[int] = [0]
        self._path_tokens: List[int] = []

    def _state_for(self, generated: List[int]) -> int:
        # Reuse the cached path while it matches; recompute on divergence.
        if self._path_tokens == list(generated[:len(self._path_tokens)]) \
                and len(generated) >= len(self._path_tokens):
            start = len(self._path_tokens)
        else:
            self._path = [0]
            self._path_tokens = []
            start = 0
        state = self._path[-1]
        for tid in generated[start:]:
            if self.eos_token_id is not None and tid == self.eos_token_id:
                break
            state = self.guide.step_token(state, tid)
            self._path.append(state)
            self._path_tokens.append(tid)
            if state < 0:
                break
        return state

    def allowed_token_ids(self, generated: List[int]) -> Optional[Set[int]]:
        state = self._state_for(list(generated))
        if state < 0:
            # Dead (shouldn't happen when enforced): allow eos only.
            return {self.eos_token_id} if self.eos_token_id is not None \
                else set()
        return self.guide.allowed_tokens(state)

    def __call__(self, generated: List[int], logits):
        import numpy as np
        allowed = self.allowed_token_ids(generated)
        mask = np.full(logits.shape[-1], -float("inf"))
        for tid in allowed:
            if tid is not None and tid < logits.shape[-1]:
                mask[tid] = 0.0
        return logits + mask
