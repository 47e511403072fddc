"""Streaming CEP pattern compiler: regex over the event-code alphabet
→ Thompson NFA → subset-construction DFA, driver-side, so the per-user
streaming state stays ONE integer (plus counters) no matter the pattern
— the Flink-CEP design (pattern → automaton, per-key automaton state),
generalized from round 9's hand-built ``vc*p`` matcher (r9 verdict #9).

Pattern grammar (single-character event codes):

    expr    := alt
    alt     := concat ('|' concat)*
    concat  := repeat+
    repeat  := atom ('*' | '+' | '?')?
    atom    := <any char not in "()|*+?"> | '(' expr ')'

MATCH SEMANTICS — earliest-end, non-overlapping: the matcher counts a
match the moment ANY occurrence of the pattern can end at the current
event, then skips past it (all pending partial matches are discarded —
Flink's AFTER MATCH SKIP PAST LAST ROW). Greedily taking the earliest
end is the classic interval-scheduling argument: it yields the MAXIMUM
possible number of non-overlapping matches, and it is the only
non-overlap semantics computable online with O(1) state — leftmost-
GREEDY (re.findall) needs future lookahead to decide how far ``a+``
extends, which no bounded-state stream matcher can know. For terminal-
anchored patterns (every match ends on a code that cannot extend —
e.g. ``vc*p``) the two semantics coincide, which is why the registered
query hash-matches the regexp_count batch oracle. Both semantics are
property-tested (tests/test_round10_ops.py): the DFA against an
executable earliest-end specification on random patterns/streams, and
against re.findall on the terminal-anchored family.

A pattern that matches the EMPTY string is rejected (it would "match"
at every position without consuming input).
"""

from __future__ import annotations

EPS = None  # epsilon edge label


class _Frag:
    """NFA fragment: start node + set of dangling (node, label) exits
    to patch. Nodes are ints into the shared ``edges`` list."""

    __slots__ = ("start", "outs")

    def __init__(self, start: int, outs: list[tuple[int, str | None]]):
        self.start = start
        self.outs = outs


class _Parser:
    """Recursive-descent regex → Thompson NFA. ``edges[n]`` is a list
    of (label, target) with label a char or EPS."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0
        self.edges: list[list[tuple[str | None, int]]] = []

    def _node(self) -> int:
        self.edges.append([])
        return len(self.edges) - 1

    def _peek(self) -> str | None:
        return self.p[self.i] if self.i < len(self.p) else None

    def parse(self) -> tuple[int, int]:
        """Returns (start, accept) node ids of the full NFA."""
        if not self.p:
            raise ValueError("empty pattern")
        frag = self._alt()
        if self.i != len(self.p):
            raise ValueError(
                f"unexpected {self.p[self.i]!r} at {self.i} in {self.p!r}"
            )
        acc = self._node()
        for node, label in frag.outs:
            self.edges[node].append((label, acc))
        return frag.start, acc

    def _alt(self) -> _Frag:
        frags = [self._concat()]
        while self._peek() == "|":
            self.i += 1
            frags.append(self._concat())
        if len(frags) == 1:
            return frags[0]
        start = self._node()
        outs: list[tuple[int, str | None]] = []
        for f in frags:
            self.edges[start].append((EPS, f.start))
            outs.extend(f.outs)
        return _Frag(start, outs)

    def _concat(self) -> _Frag:
        frags = []
        while (c := self._peek()) is not None and c not in "|)":
            frags.append(self._repeat())
        if not frags:
            raise ValueError(f"empty branch at {self.i} in {self.p!r}")
        out = frags[0]
        for nxt in frags[1:]:
            for node, label in out.outs:
                self.edges[node].append((label, nxt.start))
            out = _Frag(out.start, nxt.outs)
        return out

    def _repeat(self) -> _Frag:
        frag = self._atom()
        op = self._peek()
        if op not in ("*", "+", "?"):
            return frag
        self.i += 1
        hub = self._node()
        if op in ("*", "+"):
            for node, label in frag.outs:
                self.edges[node].append((label, hub))
            self.edges[hub].append((EPS, frag.start))
            if op == "*":
                return _Frag(hub, [(hub, EPS)])
            return _Frag(frag.start, [(hub, EPS)])
        # '?': bypass
        self.edges[hub].append((EPS, frag.start))
        return _Frag(hub, frag.outs + [(hub, EPS)])

    def _atom(self) -> _Frag:
        c = self._peek()
        if c is None:
            raise ValueError(f"dangling operator at end of {self.p!r}")
        if c == "(":
            self.i += 1
            frag = self._alt()
            if self._peek() != ")":
                raise ValueError(f"unbalanced '(' in {self.p!r}")
            self.i += 1
            return frag
        if c in ")|*+?":
            raise ValueError(f"unexpected {c!r} at {self.i} in {self.p!r}")
        self.i += 1
        node = self._node()
        return _Frag(node, [(node, c)])


class CompiledPattern:
    """Scanning DFA with fold-in of the non-overlap reset: ``step(s,
    c)`` returns ``(next_state, emitted)``. The subset construction
    seeds a fresh start-thread at EVERY position (so matches may begin
    anywhere) and empties the active set on accept (skip past match).

    The full transition table is built EAGERLY (BFS over reachable
    subsets × the pattern's alphabet) so state ids are deterministic:
    a streaming state store persists the bare int across micro-batches
    and executor restarts, and every pickled copy of the automaton
    must decode it identically — a lazily-memoized table would number
    states in discovery order, which differs per copy. A code outside
    the pattern's alphabet kills every pending thread (no NFA edge can
    consume it), i.e. transitions to :attr:`START`."""

    def __init__(self, pattern: str):
        self.pattern = pattern
        parser = _Parser(pattern)
        self._start, self._accept = parser.parse()
        self._edges = parser.edges
        seed = frozenset(self._closure({self._start}))
        if self._accept in seed:
            raise ValueError(
                f"pattern {pattern!r} matches the empty string — it would "
                "match at every event without consuming input"
            )
        alphabet = sorted(
            {label for es in self._edges for label, _ in es if label is not EPS}
        )
        ids: dict[frozenset[int], int] = {frozenset(): 0}
        self._table: list[dict[str, tuple[int, int]]] = [{}]
        todo = [frozenset()]
        while todo:
            active = todo.pop()
            row = self._table[ids[active]]
            for c in alphabet:
                moved = {
                    t
                    for n in (active | seed)
                    for label, t in self._edges[n]
                    if label == c
                }
                nxt = frozenset(self._closure(moved))
                if self._accept in nxt:
                    row[c] = (0, 1)  # match: count + skip past (reset)
                    continue
                if nxt not in ids:
                    ids[nxt] = len(self._table)
                    self._table.append({})
                    todo.append(nxt)
                row[c] = (ids[nxt], 0)
        self.START = 0
        self.n_states = len(self._table)

    def _closure(self, states: set[int]) -> set[int]:
        out, todo = set(states), list(states)
        while todo:
            n = todo.pop()
            for label, t in self._edges[n]:
                if label is EPS and t not in out:
                    out.add(t)
                    todo.append(t)
        return out

    def step(self, s: int, c: str) -> tuple[int, int]:
        """One event: (state, code) → (state', emitted ∈ {0, 1}). A
        code outside the pattern alphabet clears all pending threads."""
        return self._table[s].get(c, (0, 0))

    def count(self, codes: str) -> int:
        """Batch convenience / executable spec twin: total matches over
        a complete code string."""
        s, n = self.START, 0
        for c in codes:
            s, hit = self.step(s, c)
            n += hit
        return n
