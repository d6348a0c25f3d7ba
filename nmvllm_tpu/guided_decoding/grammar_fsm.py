"""Grammar-constrained decoding: Lark-subset CFG -> char-level Earley
recognizer -> token masks.

Reference behavior: vllm guided_grammar via outlines' CFGGuide
(model_executor/guided_decoding/outlines_logits_processors.py,
CFGLogitsProcessor). Rebuilt dependency-free:

  * Grammar syntax (the Lark subset the reference's examples use):
    ``rule : expansion | expansion`` definitions, lowercase rule refs,
    UPPERCASE terminal refs, "quoted" literals (with escapes), /regex/
    terminals (compiled with the in-repo regex parser), groups ``(...)``,
    quantifiers ``* + ?``, and ``start`` as the entry rule. ``//`` and
    ``#`` comments are stripped.
  * Everything lowers to a char-level CFG whose terminals are codepoint
    sets; regex terminals lower through the regex AST into grammar rules
    (star/alt/cat become fresh rules), so one recognizer serves all.
  * Recognition is an incremental Earley chart over characters. The
    per-step token mask walks the shared vocab character-trie, advancing
    the chart once per trie node — only prefixes the grammar can extend
    are visited. Masks are memoized by chart signature, so loops (e.g.
    inside strings and number runs) cost one dict lookup.
  * EOS is allowed whenever the chart contains a completed ``start``.
"""
from typing import Dict, List, Optional, Tuple

from nmvllm_tpu.guided_decoding.regex_fsm import (_Parser as _RegexParser,
                                                  _cs_contains)

# Grammar IR: rules: Dict[str, List[List[sym]]]; sym is
#   ("t", charset)  terminal char-class
#   ("nt", name)    nonterminal reference


class GrammarError(ValueError):
    pass


class _GrammarParser:
    """Parses the Lark-subset text into the char-level rule table."""

    def __init__(self, text: str):
        self.rules: Dict[str, List[List[Tuple]]] = {}
        self._fresh = 0
        # strip comments
        lines = []
        for raw in text.splitlines():
            line = raw
            for marker in ("//", "#"):
                # don't cut inside quotes or regex
                out = []
                in_q = None
                i = 0
                while i < len(line):
                    ch = line[i]
                    if in_q:
                        out.append(ch)
                        if ch == "\\" and i + 1 < len(line):
                            out.append(line[i + 1])
                            i += 2
                            continue
                        if ch == in_q:
                            in_q = None
                        i += 1
                        continue
                    if ch in "\"/" and marker.startswith(ch) and \
                            line[i:i + len(marker)] == marker:
                        line = "".join(out)
                        break
                    if ch in ("\"", "/"):
                        in_q = ch
                    out.append(ch)
                    i += 1
                else:
                    line = "".join(out)
            lines.append(line)
        text = "\n".join(lines)
        # join continuation lines: a definition is NAME ':' ... until the
        # next line that looks like a definition.
        defs: List[str] = []
        for raw in text.splitlines():
            s = raw.strip()
            if not s:
                continue
            head = s.split(":", 1)[0].strip()
            is_def = (":" in s and head.replace("_", "").isalnum()
                      and not s.startswith("|"))
            if is_def:
                defs.append(s)
            elif defs:
                defs[-1] += " " + s
        for d in defs:
            name, body = d.split(":", 1)
            name = name.strip().rstrip("?")  # lark's ?rule inlining marker
            self.rules[name.lower() if name.isupper() else name] = None
            self._parse_rule(name, body.strip())

    # -- fresh helper rules ------------------------------------------------
    def _fresh_rule(self, alts) -> str:
        self._fresh += 1
        name = f"__g{self._fresh}"
        self.rules[name] = alts
        return name

    def _parse_rule(self, name: str, body: str) -> None:
        alts = self._parse_alts(_Tok(body))
        key = name.lower() if name.isupper() else name
        self.rules[key] = alts

    def _parse_alts(self, tk: "_Tok") -> List[List[Tuple]]:
        alts = [self._parse_seq(tk)]
        while tk.peek() == "|":
            tk.take()
            alts.append(self._parse_seq(tk))
        return alts

    def _parse_seq(self, tk: "_Tok") -> List[Tuple]:
        seq: List[Tuple] = []
        while True:
            t = tk.peek()
            if t is None or t in ("|", ")"):
                break
            seq.extend(self._parse_atom(tk))
        return seq

    def _parse_atom(self, tk: "_Tok") -> List[Tuple]:
        t = tk.take()
        syms: List[Tuple]
        if t == "(":
            alts = self._parse_alts(tk)
            if tk.take() != ")":
                raise GrammarError("unbalanced parentheses")
            syms = [("nt", self._fresh_rule(alts))]
        elif t.startswith('"'):
            chars = _unquote(t)
            syms = [("t", ((ord(c), ord(c)),)) for c in chars]
        elif t.startswith("/"):
            syms = [("nt", self._regex_rule(t[1:-1]))]
        else:
            syms = [("nt", t.lower())]
        # quantifier
        q = tk.peek()
        if q in ("*", "+", "?"):
            tk.take()
            inner = self._fresh_rule([syms])
            if q == "*":
                rep = self._fresh_rule([])
                self.rules[rep] = [[], [("nt", inner), ("nt", rep)]]
                return [("nt", rep)]
            if q == "+":
                rep = self._fresh_rule([])
                self.rules[rep] = [[("nt", inner)],
                                   [("nt", inner), ("nt", rep)]]
                return [("nt", rep)]
            opt = self._fresh_rule([[], [("nt", inner)]])
            return [("nt", opt)]
        return syms

    # -- regex terminal lowering -------------------------------------------
    def _regex_rule(self, pattern: str) -> str:
        ast = _RegexParser(pattern).parse()
        return self._lower_regex(ast)

    def _lower_regex(self, node) -> str:
        kind = node[0]
        if kind == "lit":
            return self._fresh_rule([[("t", node[1])]])
        if kind == "eps":
            return self._fresh_rule([[]])
        if kind == "cat":
            seq = [("nt", self._lower_regex(c)) for c in node[1]]
            return self._fresh_rule([seq])
        if kind == "alt":
            return self._fresh_rule(
                [[("nt", self._lower_regex(c))] for c in node[1]])
        if kind == "star":
            inner = self._lower_regex(node[1])
            rep = self._fresh_rule([])
            self.rules[rep] = [[], [("nt", inner), ("nt", rep)]]
            return rep
        if kind == "plus":
            inner = self._lower_regex(node[1])
            rep = self._fresh_rule([])
            self.rules[rep] = [[("nt", inner)], [("nt", inner),
                                                 ("nt", rep)]]
            return rep
        if kind == "opt":
            inner = self._lower_regex(node[1])
            return self._fresh_rule([[], [("nt", inner)]])
        if kind == "rep":
            _, child, m, n = node
            inner = self._lower_regex(child)
            seq = [("nt", inner)] * m
            if n is None:
                rep = self._fresh_rule([])
                self.rules[rep] = [[], [("nt", inner), ("nt", rep)]]
                seq.append(("nt", rep))
            else:
                for _ in range(n - m):
                    seq.append(("nt", self._fresh_rule(
                        [[], [("nt", inner)]])))
            return self._fresh_rule([seq])
        raise GrammarError(f"unsupported regex node {kind}")


class _Tok:
    """Tokenizer for rule bodies: quotes, regexes, punctuation, names."""

    def __init__(self, s: str):
        self.toks: List[str] = []
        i = 0
        while i < len(s):
            ch = s[i]
            if ch.isspace():
                i += 1
                continue
            if ch == '"':
                j = i + 1
                while j < len(s):
                    if s[j] == "\\":
                        j += 2
                        continue
                    if s[j] == '"':
                        break
                    j += 1
                self.toks.append(s[i:j + 1])
                i = j + 1
            elif ch == "/":
                j = i + 1
                while j < len(s):
                    if s[j] == "\\":
                        j += 2
                        continue
                    if s[j] == "/":
                        break
                    j += 1
                self.toks.append(s[i:j + 1])
                i = j + 1
            elif ch in "()|*+?":
                self.toks.append(ch)
                i += 1
            else:
                j = i
                while j < len(s) and (s[j].isalnum() or s[j] == "_"):
                    j += 1
                if j == i:
                    raise GrammarError(f"unexpected char {ch!r}")
                self.toks.append(s[i:j])
                i = j
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t


def _unquote(tok: str) -> str:
    body = tok[1:-1]
    out = []
    i = 0
    esc = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\",
           "/": "/"}
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            out.append(esc.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


# ------------------------------------------------------------ Earley chart
# Item: (rule_name, alt_index, dot, origin_chart_id). Charts are frozensets
# of items; origin ids refer to an interning table so signatures hash fast.

class EarleyMachine:

    def __init__(self, grammar_text: str, start: str = "start"):
        p = _GrammarParser(grammar_text)
        self.rules = p.rules
        if start not in self.rules:
            raise GrammarError(f"grammar has no '{start}' rule")
        for name, alts in self.rules.items():
            if alts is None:
                raise GrammarError(f"rule '{name}' never defined")
            for alt in alts:
                for kind, v in alt:
                    if kind == "nt" and v not in self.rules:
                        raise GrammarError(f"undefined rule '{v}'")
        self.start = start
        # Nullable computation for completion through empty rules.
        self.nullable = set()
        changed = True
        while changed:
            changed = False
            for name, alts in self.rules.items():
                if name in self.nullable:
                    continue
                for alt in alts:
                    if all(k == "nt" and v in self.nullable
                           for k, v in alt):
                        self.nullable.add(name)
                        changed = True
                        break

    # A parser STATE is a tuple of charts (the "history" Earley needs is
    # captured by letting items carry their origin chart's own state id);
    # we intern full chart-stacks by signature for memoization.

    def initial_state(self):
        chart = self._closure([(self.start, ai, 0, 0)
                               for ai in range(len(self.rules[self.start]))],
                              [()])
        return (chart,)

    def _closure(self, items, charts_so_far):
        """Predict + complete until fixpoint. ``charts_so_far[origin]``
        holds earlier charts for completion."""
        n = len(charts_so_far) - 1  # index of the chart being built
        seen = set(items)
        stack = list(items)
        while stack:
            rule, ai, dot, origin = stack.pop()
            alt = self.rules[rule][ai]
            if dot < len(alt):
                kind, v = alt[dot]
                if kind == "nt":
                    # predict
                    for nai in range(len(self.rules[v])):
                        it = (v, nai, 0, n)
                        if it not in seen:
                            seen.add(it)
                            stack.append(it)
                    if v in self.nullable:
                        it = (rule, ai, dot + 1, origin)
                        if it not in seen:
                            seen.add(it)
                            stack.append(it)
            else:
                # complete into the origin chart
                src = charts_so_far[origin] if origin < n else seen
                for it2 in tuple(src):
                    r2, a2, d2, o2 = it2
                    alt2 = self.rules[r2][a2]
                    if d2 < len(alt2) and alt2[d2] == ("nt", rule):
                        it = (r2, a2, d2 + 1, o2)
                        if it not in seen:
                            seen.add(it)
                            stack.append(it)
        return frozenset(seen)

    def scan(self, state, cp: int):
        """Advance all charts by one character; returns None if dead."""
        charts = list(state)
        cur = charts[-1]
        nxt = []
        for rule, ai, dot, origin in cur:
            alt = self.rules[rule][ai]
            if dot < len(alt):
                kind, v = alt[dot]
                if kind == "t" and _cs_contains(v, cp):
                    nxt.append((rule, ai, dot + 1, origin))
        if not nxt:
            return None
        charts.append(None)  # placeholder for closure's index math
        chart = self._closure(nxt, charts[:-1] + [()])
        new_state = tuple(charts[:-1]) + (chart,)
        return new_state

    def allowed_chars(self, state) -> List[Tuple[int, int]]:
        out = []
        for rule, ai, dot, origin in state[-1]:
            alt = self.rules[rule][ai]
            if dot < len(alt) and alt[dot][0] == "t":
                out.extend(alt[dot][1])
        return out

    def is_accepting(self, state) -> bool:
        for rule, ai, dot, origin in state[-1]:
            if rule == self.start and origin == 0 and \
                    dot == len(self.rules[rule][ai]):
                return True
        return False


# ------------------------------------------------------------ vocab trie
class _TrieNode:
    __slots__ = ("children", "token_ids")

    def __init__(self):
        self.children: Dict[str, "_TrieNode"] = {}
        self.token_ids: List[int] = []


_TRIE_CACHE: Dict[int, Tuple[_TrieNode, List[int]]] = {}


def _vocab_trie(tokenizer):
    key = id(tokenizer)
    if key in _TRIE_CACHE:
        return _TRIE_CACHE[key]
    root = _TrieNode()
    specials = []
    vocab_size = getattr(tokenizer, "vocab_size", None) or len(
        tokenizer.get_vocab())
    all_special = set(getattr(tokenizer, "all_special_ids", []) or [])
    n = max(vocab_size, len(getattr(tokenizer, "get_vocab", dict)() or {}))
    for tid in range(n):
        if tid in all_special:
            specials.append(tid)
            continue
        try:
            s = tokenizer.decode([tid])
        except Exception:
            continue
        if not s:
            continue
        node = root
        for ch in s:
            node = node.children.setdefault(ch, _TrieNode())
        node.token_ids.append(tid)
    _TRIE_CACHE[key] = (root, specials)
    return root, specials


class GrammarLogitsProcessor:
    """Per-request grammar constraint (reference CFGLogitsProcessor);
    same host-side interface as RegexLogitsProcessor.allowed_token_ids."""

    is_guided = True

    def __init__(self, tokenizer, grammar: str):
        self.tokenizer = tokenizer
        self.machine = EarleyMachine(grammar)
        self.eos_token_id = getattr(tokenizer, "eos_token_id", None)
        self.root, _ = _vocab_trie(tokenizer)
        self._mask_cache: Dict = {}
        # Path cache: Earley state after each generated prefix.
        self._path = [self.machine.initial_state()]
        self._path_tokens: List[int] = []
        self._dead = False

    def _state_for(self, generated: List[int]):
        gen = list(generated)
        if gen[:len(self._path_tokens)] != self._path_tokens:
            self._path = [self.machine.initial_state()]
            self._path_tokens = []
            self._dead = False
        state = self._path[-1]
        for tid in gen[len(self._path_tokens):]:
            if self._dead or tid == self.eos_token_id:
                break
            s = self.tokenizer.decode([tid])
            for ch in s:
                nxt = self.machine.scan(state, ord(ch))
                if nxt is None:
                    self._dead = True
                    break
                state = nxt
            self._path.append(state)
            self._path_tokens.append(tid)
        return state

    def allowed_token_ids(self, generated: List[int]):
        state = self._state_for(generated)
        if self._dead:
            return ({self.eos_token_id}
                    if self.eos_token_id is not None else set())
        sig = state[-1]
        cached = self._mask_cache.get(sig)
        if cached is not None:
            return cached
        allowed = set()
        # DFS the vocab trie, advancing the chart once per trie node.
        stack = [(self.root, state)]
        while stack:
            node, st = stack.pop()
            for ch, child in node.children.items():
                st2 = self.machine.scan(st, ord(ch))
                if st2 is None:
                    continue
                allowed.update(child.token_ids)
                stack.append((child, st2))
        if self.machine.is_accepting(state) and \
                self.eos_token_id is not None:
            allowed.add(self.eos_token_id)
        self._mask_cache[sig] = allowed
        return allowed
