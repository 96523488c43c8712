"""Token graphs: multi-word synonyms, word-delimiter splits, flattening.

Reference parity (semantic contracts, not translations):

- SynonymGraphFilter — analysis/common/src/java/org/apache/lucene/
  analysis/synonym/SynonymGraphFilter.java: multi-word synonym rules
  inserted as SIDE PATHS in a token graph; single-token outputs span
  the whole matched input (posLength = n input positions), multi-token
  outputs thread through freshly inserted positions. Matching is
  greedy-longest, leftmost, non-overlapping, over a LINEAR input
  stream (the reference likewise documents that SynonymGraphFilter
  "cannot consume an incoming graph").
- WordDelimiterGraphFilter — analysis/common/.../miscellaneous/
  WordDelimiterGraphFilter.java: per-token sub-word splits on case
  change / letter-digit boundaries / delimiters, optional catenations
  spanning the parts, PRESERVE_ORIGINAL, STEM_ENGLISH_POSSESSIVE.
- FlattenGraphFilter — analysis/common/.../core/FlattenGraphFilter.java:
  converts the (index-hostile) graph into a flat position stream:
  every graph node maps to its rank in node order; a token's position
  is its from-node rank, posLength = to-rank minus from-rank. This is
  exactly the reference's result on hole-free graphs (the graphs the
  two filters above produce). A single deleted token leaves the same
  posInc=2 hole as the reference (its boundary nodes stay referenced);
  the one deviation is a MULTI-token hole, whose interior nodes vanish
  and partially collapse the gap.
- GraphTokenFilter / QueryBuilder#analyzeGraphPhrase — lucene/core/
  .../analysis/GraphTokenFilter.java + util/QueryBuilder.java: the
  query side enumerates every root-to-sink path of the query's token
  graph (bounded, TooManyClauses-style) and matches a document if ANY
  path matches as an exact phrase.

Node model: a node is ``(base, sub)`` — ``(i, 0)`` is the boundary
before input token ``i``; inserted positions between input boundaries
``i`` and ``i+1`` are ``(i, 1), (i, 2), ...``. Lexicographic node
order is therefore topological order, which makes flattening a rank
lookup. Tokens are EDGES between nodes.

Ordering convention at a shared start node (matches the reference's
published goldens, e.g. dns => "domain name service" with keepOrig
emits domain(posInc 1, posLen 1), dns(0, 3), name(1, 1), ...):
synonym-output edges are emitted before the original edges they
shadow; catenated word-delimiter spans before their parts.

Everything here is plain-Python per Arrow batch (same contract as the
other analyzers in this package): tokenization cost is the pandas UDF
batch, no per-row JVM round trips.
"""

from __future__ import annotations

from dataclasses import dataclass

from lucene_spark.analysis.analyzer import Analyzer

Node = tuple[int, int]


@dataclass(frozen=True)
class Edge:
    """One token in the graph: term spanning from-node -> to-node with
    char offsets [start, end) into the original text."""

    term: str
    frm: Node
    to: Node
    start: int
    end: int


@dataclass(frozen=True)
class FlatToken:
    """One token of the flattened stream (what gets indexed)."""

    term: str
    position: int
    pos_len: int
    start: int
    end: int

    @property
    def pos_inc_seq(self):  # pragma: no cover - convenience only
        raise AttributeError("pos_inc is a stream property; see to_stream")


def linear_edges(
    tokens: list[str],
    starts: list[int] | None = None,
    ends: list[int] | None = None,
) -> list[Edge]:
    """Tokenizer output as a linear chain: token i = edge (i,0)->(i+1,0)."""
    if starts is None:
        starts = list(range(len(tokens)))
        ends = [s + 1 for s in starts]
    return [
        Edge(t, (i, 0), (i + 1, 0), int(starts[i]), int(ends[i]))
        for i, t in enumerate(tokens)
    ]


def flatten_graph(edges: list[Edge]) -> list[FlatToken]:
    """FlattenGraphFilter: node -> rank in sorted node order; position =
    from-rank, posLength = to-rank - from-rank. Stable in input edge
    order within a from-node (callers emit side paths first)."""
    if not edges:
        return []
    nodes = sorted({e.frm for e in edges} | {e.to for e in edges})
    rank = {n: i for i, n in enumerate(nodes)}
    out = sorted(
        range(len(edges)), key=lambda i: (rank[edges[i].frm], i)
    )
    return [
        FlatToken(
            edges[i].term,
            rank[edges[i].frm],
            max(1, rank[edges[i].to] - rank[edges[i].frm]),
            edges[i].start,
            edges[i].end,
        )
        for i in out
    ]


def to_stream(flat: list[FlatToken]) -> list[tuple[str, int, int]]:
    """(term, posInc, posLen) triples — the attribute view the
    reference's assertTokenStreamContents goldens check."""
    out = []
    prev = -1  # the reference's stream starts at position -1
    for t in flat:
        out.append((t.term, t.position - prev, t.pos_len))
        prev = t.position
    return out


def graph_paths(edges: list[Edge], max_paths: int = 128) -> list[list[str]]:
    """Every source-to-sink term path (GraphTokenStreamFiniteStrings
    role behind QueryBuilder#analyzeGraphPhrase). Bounded like
    IndexSearcher's TooManyClauses guard."""
    if not edges:
        return []
    by_from: dict[Node, list[Edge]] = {}
    for e in edges:
        by_from.setdefault(e.frm, []).append(e)
    src = min(e.frm for e in edges)
    sink = max(e.to for e in edges)
    paths: list[list[str]] = []
    stack: list[tuple[Node, list[str]]] = [(src, [])]
    while stack:
        node, terms = stack.pop()
        if node == sink:
            paths.append(terms)
            if len(paths) > max_paths:
                raise ValueError(
                    f"graph expands to more than {max_paths} phrase paths"
                )
            continue
        for e in reversed(by_from.get(node, ())):
            stack.append((e.to, terms + [e.term]))
    return paths


# ---------------------------------------------------------------------------
# SynonymGraphFilter
# ---------------------------------------------------------------------------


class SynonymGraphMap:
    """SynonymMap.Builder analog: rules from an input token sequence to
    one or more output token sequences, each with keepOrig."""

    def __init__(self):
        # first input token -> [(input_seq, output_seqs, keep_orig)]
        self._rules: dict[str, list[tuple[tuple[str, ...], list[tuple[str, ...]], bool]]] = {}

    def add(
        self,
        input_seq: list[str] | tuple[str, ...],
        output_seq: list[str] | tuple[str, ...],
        keep_orig: bool = True,
    ) -> "SynonymGraphMap":
        inp = tuple(input_seq)
        out = tuple(output_seq)
        if not inp or not out:
            raise ValueError("empty synonym side")
        bucket = self._rules.setdefault(inp[0], [])
        for i, (existing, outs, ko) in enumerate(bucket):
            if existing == inp:
                if ko != keep_orig:
                    raise ValueError(f"conflicting keepOrig for {inp}")
                outs.append(out)
                return self
        bucket.append((inp, [out], keep_orig))
        return self

    def match_at(
        self, tokens: list[str], i: int
    ) -> tuple[int, list[tuple[str, ...]], bool] | None:
        """Longest rule whose input matches tokens[i:]; -> (n_matched,
        output_seqs, keep_orig) or None."""
        best = None
        for inp, outs, keep in self._rules.get(tokens[i], ()):  # type: ignore[arg-type]
            n = len(inp)
            if tuple(tokens[i : i + n]) == inp:
                if best is None or n > best[0]:
                    best = (n, outs, keep)
        return best


class SynonymGraphFilter:
    """Linear tokens in -> graph edges out (side paths for matches)."""

    def __init__(self, smap: SynonymGraphMap):
        self.smap = smap

    def apply_graph(
        self,
        tokens: list[str],
        starts: list[int] | None = None,
        ends: list[int] | None = None,
    ) -> list[Edge]:
        if starts is None:
            starts = list(range(len(tokens)))
            ends = [s + 1 for s in starts]
        edges: list[Edge] = []
        fresh: dict[int, int] = {}

        def fresh_node(base: int) -> Node:
            fresh[base] = fresh.get(base, 0) + 1
            return (base, fresh[base])

        i = 0
        n = len(tokens)
        while i < n:
            m = self.smap.match_at(tokens, i)
            if m is None:
                edges.append(
                    Edge(tokens[i], (i, 0), (i + 1, 0), starts[i], ends[i])
                )
                i += 1
                continue
            span, outs, keep = m
            m_start, m_end = starts[i], ends[i + span - 1]
            # side paths first (reference ordering: outputs shadow origs)
            for out in outs:
                node: Node = (i, 0)
                for j, term in enumerate(out):
                    nxt: Node = (i + span, 0) if j == len(out) - 1 else fresh_node(i)
                    edges.append(Edge(term, node, nxt, m_start, m_end))
                    node = nxt
            if keep:
                for j in range(span):
                    edges.append(
                        Edge(
                            tokens[i + j],
                            (i + j, 0),
                            (i + j + 1, 0),
                            starts[i + j],
                            ends[i + j],
                        )
                    )
            i += span
        return edges


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter
# ---------------------------------------------------------------------------


def _subword_spans(tok: str, split_case: bool, split_num: bool):
    """[(lo, hi, is_word)] alphanumeric part spans of one token."""
    spans = []
    i, n = 0, len(tok)
    while i < n:
        c = tok[i]
        if not c.isalnum():
            i += 1
            continue
        is_digit = c.isdigit()
        j = i + 1
        while j < n:
            d = tok[j]
            if not d.isalnum():
                break
            if split_num and d.isdigit() != is_digit:
                break
            if (
                split_case
                and not is_digit
                and d.isupper()
                and tok[j - 1].islower()
            ):
                break
            j += 1
        spans.append((i, j, not is_digit))
        i = j
    return spans


class WordDelimiterGraphFilter:
    """Linear tokens in -> graph edges out (per-token sub-word graphs)."""

    def __init__(
        self,
        generate_word_parts: bool = True,
        generate_number_parts: bool = True,
        catenate_words: bool = False,
        catenate_numbers: bool = False,
        catenate_all: bool = False,
        preserve_original: bool = False,
        split_on_case_change: bool = True,
        split_on_numerics: bool = True,
        stem_english_possessive: bool = True,
    ):
        self.generate_word_parts = generate_word_parts
        self.generate_number_parts = generate_number_parts
        self.catenate_words = catenate_words
        self.catenate_numbers = catenate_numbers
        self.catenate_all = catenate_all
        self.preserve_original = preserve_original
        self.split_on_case_change = split_on_case_change
        self.split_on_numerics = split_on_numerics
        self.stem_english_possessive = stem_english_possessive

    def apply_graph(
        self,
        tokens: list[str],
        starts: list[int] | None = None,
        ends: list[int] | None = None,
    ) -> list[Edge]:
        if starts is None:
            starts = list(range(len(tokens)))
            ends = [s + 1 for s in starts]
        edges: list[Edge] = []
        for i, tok in enumerate(tokens):
            base_s = starts[i]
            work = tok
            if self.stem_english_possessive and (
                work.endswith("'s") or work.endswith("’s")
            ):
                work = work[:-2]
            spans = _subword_spans(
                work, self.split_on_case_change, self.split_on_numerics
            )
            parts = [
                (work[lo:hi], base_s + lo, base_s + hi, is_word)
                for lo, hi, is_word in spans
            ]
            kept = [
                p
                for p in parts
                if (self.generate_word_parts and p[3])
                or (self.generate_number_parts and not p[3])
            ]
            frm: Node = (i, 0)
            to: Node = (i + 1, 0)
            spans_out: list[Edge] = []
            if self.preserve_original:
                spans_out.append(Edge(tok, frm, to, starts[i], ends[i]))
            if len(parts) > 1:
                if self.catenate_all:
                    spans_out.append(
                        Edge(
                            "".join(p[0] for p in parts),
                            frm,
                            to,
                            parts[0][1],
                            parts[-1][2],
                        )
                    )
                if self.catenate_words:
                    w = [p for p in parts if p[3]]
                    if len(w) > 1:
                        spans_out.append(
                            Edge("".join(p[0] for p in w), frm, to, w[0][1], w[-1][2])
                        )
                if self.catenate_numbers:
                    d = [p for p in parts if not p[3]]
                    if len(d) > 1:
                        spans_out.append(
                            Edge("".join(p[0] for p in d), frm, to, d[0][1], d[-1][2])
                        )
            if not kept:
                # no generated parts: the catenations/original (if any)
                # are the only edges; a token with none at all is
                # deleted and the flatten collapses the gap
                edges.extend(spans_out)
                continue
            if len(kept) == 1 and not spans_out:
                p = kept[0]
                edges.append(Edge(p[0], frm, to, p[1], p[2]))
                continue
            edges.extend(spans_out)
            node = frm
            fresh = 0
            for j, p in enumerate(kept):
                if j == len(kept) - 1:
                    nxt = to
                else:
                    fresh += 1
                    nxt = (i, fresh)
                edges.append(Edge(p[0], node, nxt, p[1], p[2]))
                node = nxt
        return edges


# ---------------------------------------------------------------------------
# GraphAnalyzer — the Analyzer wrapper (index + query surfaces)
# ---------------------------------------------------------------------------


class GraphAnalyzer(Analyzer):
    """base tokenizer -> ONE graph filter -> FlattenGraph (index side).

    Mirrors the reference's standard index chain
    (tokenizer -> SynonymGraphFilter -> FlattenGraphFilter) and its
    constraint that a graph filter consumes a linear stream. The
    flattened (term, position) pairs feed the positional index, so
    stacked tokens (posInc 0) land on the same position: term queries
    match every surface form, and phrases cross the stacked position
    exactly as in the reference.
    """

    def __init__(
        self,
        base: Analyzer,
        graph_filter,
        name: str = "graph",
        lowercase: bool = False,
    ):
        self.base = base
        self.graph_filter = graph_filter
        self.name = name
        # LowerCaseFilter placed AFTER the graph filter (the reference's
        # WDGF chains lowercase downstream so case-change splits still see
        # the original casing)
        self.lowercase = lowercase

    def _base_tokens(self, text: str):
        if self.base.supports_offsets():
            return self.base.tokenize_with_offsets_one(text)
        toks = self.base.tokenize_one(text)
        return toks, None, None

    def graph_one(self, text: str) -> list[Edge]:
        toks, starts, ends = self._base_tokens(text)
        edges = self.graph_filter.apply_graph(toks, starts, ends)
        if self.lowercase:
            edges = [
                Edge(e.term.lower(), e.frm, e.to, e.start, e.end) for e in edges
            ]
        return edges

    def flat_one(self, text: str) -> list[FlatToken]:
        return flatten_graph(self.graph_one(text))

    def tokenize_one(self, text: str) -> list[str]:
        return [t.term for t in self.flat_one(text)]

    def supports_positions(self) -> bool:
        return True

    def tokenize_with_positions_one(self, text: str):
        flat = self.flat_one(text)
        return [t.term for t in flat], [t.position for t in flat]

    def paths_one(self, text: str, max_paths: int = 128) -> list[list[str]]:
        """QueryBuilder#analyzeGraphPhrase: every phrase path of the
        QUERY text's token graph (NOT flattened — query side walks the
        real graph)."""
        return graph_paths(self.graph_one(text), max_paths)


# ---------------------------------------------------------------------------
# packaged composite analyzers (registry side effects, like filters.py's)
# ---------------------------------------------------------------------------

from lucene_spark.analysis.analyzer import (  # noqa: E402
    SimpleAnalyzer,
    WhitespaceAnalyzer,
)
from lucene_spark.analysis.filters import register_analyzer  # noqa: E402

# The packaged demo synonym set: multi-word contraction over the gate
# corpus vocabulary ("window join" also indexes as a stacked "merge").
# The correctness gate and tests rely on exactly this rule; applications
# register their own GraphAnalyzer via register_analyzer.
GATE_SYNONYMS = SynonymGraphMap().add(
    ["window", "join"], ["merge"], keep_orig=True
)

register_analyzer(
    "simple_syngraph",
    lambda: GraphAnalyzer(
        SimpleAnalyzer(), SynonymGraphFilter(GATE_SYNONYMS), "simple_syngraph"
    ),
)
register_analyzer(
    "ws_wdg_code",
    lambda: GraphAnalyzer(
        WhitespaceAnalyzer(),
        WordDelimiterGraphFilter(catenate_all=True, preserve_original=False),
        "ws_wdg_code",
        lowercase=True,
    ),
)


# ---------------------------------------------------------------------------
# Synonym rule-file parsers (analysis/synonym/SolrSynonymParser.java,
# WordnetSynonymParser.java): text rule formats -> SynonymGraphMap
# ---------------------------------------------------------------------------


def _split_escaped(s: str, sep: str) -> list[str]:
    """Split on sep honoring backslash escapes (SynonymMap.Builder's
    rule unescaping)."""
    out, cur, i = [], [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            cur.append(s[i + 1])
            i += 2
            continue
        if c == sep:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    out.append("".join(cur))
    return out


def parse_solr_synonyms(
    text: str,
    expand: bool = True,
    tokenize=None,
) -> SynonymGraphMap:
    """SolrSynonymParser.java: one rule per line, '#' comments.

    - ``a, b, c``        — an equivalence set: with expand=True every
      term maps to EVERY term (incl. itself — the reference adds the
      full cross product); with expand=False every term maps to the
      FIRST term only (SolrSynonymParser.java:73-95).
    - ``a, b => c, d``   — explicit: each LHS input maps to all RHS
      outputs (keepOrig False — the input is replaced).
    - multi-word entries split on whitespace (``tokenize`` overrides,
      the parser's analyze() hook); ``\\,`` and ``\\=`` escape.
    """
    tok = tokenize or (lambda s: s.split())
    smap = SynonymGraphMap()
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        # un-escaped '=>' split (scan for it outside escapes)
        arrow = None
        i = 0
        while i < len(line) - 1:
            if line[i] == "\\":
                i += 2
                continue
            if line[i : i + 2] == "=>":
                arrow = i
                break
            i += 1
        if arrow is not None:
            lhs = [
                tuple(tok(p.strip()))
                for p in _split_escaped(line[:arrow], ",")
                if p.strip()
            ]
            rhs = [
                tuple(tok(p.strip()))
                for p in _split_escaped(line[arrow + 2 :], ",")
                if p.strip()
            ]
            if not lhs or not rhs:
                raise ValueError(f"invalid synonym rule: {raw}")
            for inp in lhs:
                for out in rhs:
                    smap.add(inp, out, keep_orig=False)
        else:
            terms = [
                tuple(tok(p.strip()))
                for p in _split_escaped(line, ",")
                if p.strip()
            ]
            if len(terms) < 2:
                raise ValueError(f"invalid synonym rule: {raw}")
            if expand:
                for a in terms:
                    for b in terms:
                        if a != b:
                            smap.add(a, b, keep_orig=True)
            else:
                first = terms[0]
                for a in terms[1:]:
                    smap.add(a, first, keep_orig=False)
    return smap


def parse_wordnet_synonyms(
    text: str, expand: bool = True, tokenize=None
) -> SynonymGraphMap:
    """WordnetSynonymParser.java: prolog lines
    ``s(<synset>,<num>,'<word>',<pos>,<sense>,<tag>).`` — words
    sharing a synset id are synonyms; '' inside a word escapes a
    quote.  expand semantics as in the Solr parser."""
    import re as _re

    tok = tokenize or (lambda s: s.split())
    pat = _re.compile(r"^s\(\s*(\d+)\s*,\s*\d+\s*,\s*'(.*)'\s*,")
    synsets: dict[str, list[tuple[str, ...]]] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or not line.startswith("s("):
            continue
        m = pat.match(line)
        if not m:
            raise ValueError(f"invalid wordnet line: {raw}")
        sid, word = m.group(1), m.group(2).replace("''", "'")
        synsets.setdefault(sid, []).append(tuple(tok(word)))
    smap = SynonymGraphMap()
    for words in synsets.values():
        if len(words) < 2:
            continue
        if expand:
            for a in words:
                for b in words:
                    if a != b:
                        smap.add(a, b, keep_orig=True)
        else:
            first = words[0]
            for a in words[1:]:
                smap.add(a, first, keep_orig=False)
    return smap
