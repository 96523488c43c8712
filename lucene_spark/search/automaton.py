"""Term automaton construction — the build/finish half of
sandbox/search/TermAutomatonQuery.java.

A TermAutomatonQuery is a proximity query whose transitions are terms:
a generalization of PhraseQuery / MultiPhraseQuery / SpanNearQuery
(TermAutomatonQuery.java:67-75). The builder collects states and
(term | ANY) transitions; ``finish()`` replays the reference's
finish(): expand ANY arcs over the whole term alphabet
(TermAutomatonQuery.java:153-200), determinize (subset construction —
Operations.determinize), drop dead states (Operations.removeDeadStates)
and enforce the no-leading-ANY / no-trailing-ANY / no-empty-string
invariants (TermAutomatonQuery.java:154-171,205-208).

The finished DFA is a dense dest table ``dfa[symbol, state] -> state``
(-1 = no transition) + an accept mask — the shape the executor's
vectorized counting kernel (executor._eval_term_automaton) consumes.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np


@dataclass(frozen=True)
class TermAutomaton:
    """A finished (determinized) term automaton. ``terms[i]`` is the
    term for symbol id i; ``any_id`` is the ANY symbol's id or -1.
    ``dfa`` is (n_symbols, n_states) int32 dest table, -1 = dead;
    state 0 is initial. Hashable identity rides on the builder's
    transition list (the arrays are derived)."""

    field: str
    terms: tuple
    any_id: int
    n_states: int
    dfa_flat: tuple  # row-major (n_symbols * n_states) dest table
    accept: tuple  # bool per state
    boost: float = 1.0

    def dfa(self) -> np.ndarray:
        return np.asarray(self.dfa_flat, dtype=np.int32).reshape(
            len(self.terms) + (1 if self.any_id >= 0 else 0), self.n_states
        )

    def accept_mask(self) -> np.ndarray:
        return np.asarray(self.accept, dtype=bool)


class TermAutomatonBuilder:
    """createState / setAccept / addTransition / addAnyTransition /
    finish — the reference's public build API
    (TermAutomatonQuery.java:98-126)."""

    def __init__(self, field: str):
        self.field = field
        self._n = 0
        self._accept: set[int] = set()
        self._term_ids: dict[str, int] = {}
        self._any_id = -1
        self._trans: list[tuple[int, int, int]] = []  # (src, dst, symbol)

    def create_state(self) -> int:
        s = self._n
        self._n += 1
        return s

    def set_accept(self, state: int, accept: bool = True) -> None:
        if accept:
            self._accept.add(state)
        else:
            self._accept.discard(state)

    def _term_id(self, term: str | None) -> int:
        """Ids in arrival order, ANY included — getTermID(null)
        (TermAutomatonQuery.java:240-254)."""
        if term is None:
            if self._any_id < 0:
                self._any_id = self._n_syms()
            return self._any_id
        if term not in self._term_ids:
            self._term_ids[term] = self._n_syms()
        return self._term_ids[term]

    def _n_syms(self) -> int:
        return len(self._term_ids) + (1 if self._any_id >= 0 else 0)

    def add_transition(self, src: int, dst: int, term: str) -> None:
        if term is None:
            raise ValueError("term should not be null")
        self._trans.append((src, dst, self._term_id(term)))

    def add_any_transition(self, src: int, dst: int) -> None:
        self._trans.append((src, dst, self._term_id(None)))

    def finish(self, boost: float = 1.0) -> TermAutomaton:
        n_syms = len(self._term_ids) + (1 if self._any_id >= 0 else 0)
        trans = list(self._trans)
        if self._any_id >= 0:
            # invariant checks (TermAutomatonQuery.java:154-171)
            for src, dst, sym in trans:
                if sym == self._any_id and src == 0:
                    raise ValueError(
                        "automaton cannot lead with an ANY transition"
                    )
                if sym == self._any_id and dst in self._accept:
                    raise ValueError(
                        "automaton cannot end with an ANY transition"
                    )
            # ANY arcs also match every known term
            # (TermAutomatonQuery.java:175-200: min=0, max=termCount-1)
            expanded = []
            for src, dst, sym in trans:
                if sym == self._any_id:
                    expanded.extend((src, dst, s) for s in range(n_syms))
                else:
                    expanded.append((src, dst, sym))
            trans = expanded

        # subset construction (Operations.determinize) from state {0}
        by_state: dict[int, dict[int, set[int]]] = {}
        for src, dst, sym in trans:
            by_state.setdefault(src, {}).setdefault(sym, set()).add(dst)
        start = frozenset([0])
        ids: dict[frozenset, int] = {start: 0}
        order = [start]
        dests: list[list[int]] = []
        i = 0
        while i < len(order):
            subset = order[i]
            row = [-1] * n_syms
            for sym in range(n_syms):
                nxt = frozenset(
                    d
                    for s in subset
                    for d in by_state.get(s, {}).get(sym, ())
                )
                if nxt:
                    if nxt not in ids:
                        ids[nxt] = len(order)
                        order.append(nxt)
                    row[sym] = ids[nxt]
            dests.append(row)
            i += 1
        accept = [bool(subset & self._accept) for subset in order]

        # removeDeadStates: keep states that can reach an accept state
        n = len(order)
        live = set(s for s in range(n) if accept[s])
        changed = True
        while changed:
            changed = False
            for s in range(n):
                if s in live:
                    continue
                if any(d in live for d in dests[s] if d >= 0):
                    live.add(s)
                    changed = True
        if 0 not in live:
            live.add(0)  # keep the initial state even if it's dead
        remap = {s: j for j, s in enumerate(sorted(live))}
        n2 = len(remap)
        dfa = np.full((n_syms, n2), -1, dtype=np.int32)
        for s, row in enumerate(dests):
            if s not in remap:
                continue
            for sym, d in enumerate(row):
                if d >= 0 and d in remap:
                    dfa[sym, remap[s]] = remap[d]
        accept2 = [accept[s] for s in sorted(live)]

        if accept2[remap[0]]:
            raise ValueError("cannot accept the empty string")

        terms = [None] * n_syms
        for t, tid in self._term_ids.items():
            terms[tid] = t
        if self._any_id >= 0:
            # place ANY last in the symbol table handed to the executor:
            # reorder rows so real terms are 0..n_terms-1, ANY is last
            perm = [tid for tid in range(n_syms) if tid != self._any_id]
            perm.append(self._any_id)
            dfa = dfa[perm]
            terms = [terms[tid] for tid in perm]
            any_out = len(terms) - 1
        else:
            any_out = -1
        return TermAutomaton(
            field=self.field,
            terms=tuple(t for t in terms if t is not None),
            any_id=any_out,
            n_states=n2,
            dfa_flat=tuple(int(x) for x in dfa.reshape(-1)),
            accept=tuple(accept2),
            boost=float(boost),
        )


def token_stream_to_term_automaton(
    field: str,
    stream,
    preserve_position_increments: bool = True,
    boost: float = 1.0,
) -> TermAutomaton:
    """TokenStreamToTermAutomatonQuery (sandbox/search/
    TokenStreamToTermAutomatonQuery.java toQuery:34-75): a (graph)
    token stream becomes a TermAutomatonQuery — states are positions,
    each token is a transition position -> position + posLength, the
    literal term ``*`` becomes an ANY transition, and the LAST state is
    the sole accept state.  Holes (posInc > 1) raise the reference's
    exact error unless ``preserve_position_increments`` is False (then
    they collapse to 1, .java:44-46).

    ``stream`` accepts either analysis.graph.FlatToken objects or
    (term, posInc, posLen) triples (graph.to_stream's view), so a
    GraphAnalyzer's query-side graph feeds straight in — the bridge
    from multi-word-synonym / word-delimiter graphs to proximity
    automata."""
    b = TermAutomatonBuilder(field)
    pos = -1
    max_pos = -1
    states: list[int] = []

    def _state(n: int) -> int:
        while len(states) <= n:
            states.append(b.create_state())
        return states[n]

    triples = []
    prev = -1
    for t in stream:
        if hasattr(t, "position"):
            triples.append((t.term, t.position - prev, t.pos_len))
            prev = t.position
        else:
            triples.append(tuple(t))
    for term, pos_inc, pos_len in triples:
        if not preserve_position_increments and pos_inc > 1:
            pos_inc = 1
        if pos_inc > 1:
            raise ValueError(
                "cannot handle holes; to accept any term, use '*' term"
            )
        if pos_inc > 0:
            pos += pos_inc
        end_pos = pos + max(1, int(pos_len))
        _state(pos)
        _state(end_pos)
        if term == "*":
            b.add_any_transition(states[pos], states[end_pos])
        else:
            b.add_transition(states[pos], states[end_pos], term)
        max_pos = max(max_pos, end_pos)
    if max_pos < 0:
        raise ValueError("empty token stream")
    b.set_accept(states[max_pos], True)
    return b.finish(boost=boost)
