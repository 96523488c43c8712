"""TermAutomatonQuery vs a direct transcription of
TermAutomatonScorer.countMatches (sandbox/search/
TermAutomatonScorer.java:215-340): per doc, walk query-term positions
in order, advance per-position state MULTISETS (PosState keeps
duplicates), count accepts entered via term steps (continuing + fresh
start), advance across gaps via ANY arcs without counting."""

from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search import query as Q
from lucene_spark.search.automaton import TermAutomatonBuilder

VOCAB = ["aa", "bb", "cc", "dd", "ee"]


def _ref_freq(auto, tokens):
    """countMatches transcription over the finished DFA."""
    dfa = auto.dfa()
    accept = auto.accept_mask()
    tid = {t: i for i, t in enumerate(auto.terms)}
    any_id = auto.any_id
    posstates: dict[int, list[int]] = defaultdict(list)
    freq = 0
    last = -1
    for p, tok in enumerate(tokens):
        if tok not in tid:
            continue
        t = tid[tok]
        if last != -1 and any_id >= 0:
            lp, startlp = last, last
            while lp < p:
                cur = posstates[lp]
                if not cur and lp > startlp:
                    break
                for s in cur:
                    d = int(dfa[any_id, s])
                    if d >= 0:
                        posstates[lp + 1].append(d)
                lp += 1
        for s in list(posstates[p]):
            d = int(dfa[t, s])
            if d >= 0:
                posstates[p + 1].append(d)
                if accept[d]:
                    freq += 1
        d = int(dfa[t, 0])
        if d >= 0:
            posstates[p + 1].append(d)
            if accept[d]:
                freq += 1
        last = p
    return freq


def _phrase_auto(*terms, boost=1.0):
    b = TermAutomatonBuilder("text")
    states = [b.create_state() for _ in range(len(terms) + 1)]
    for i, t in enumerate(terms):
        b.add_transition(states[i], states[i + 1], t)
    b.set_accept(states[-1])
    return b.finish(boost=boost)


def _union_then_term():
    # (aa|bb) cc
    b = TermAutomatonBuilder("text")
    s0, s1, s2 = b.create_state(), b.create_state(), b.create_state()
    b.add_transition(s0, s1, "aa")
    b.add_transition(s0, s1, "bb")
    b.add_transition(s1, s2, "cc")
    b.set_accept(s2)
    return b.finish()


def _any_gap():
    # aa . bb (exactly one token between, any term)
    b = TermAutomatonBuilder("text")
    s0, s1, s2, s3 = (b.create_state() for _ in range(4))
    b.add_transition(s0, s1, "aa")
    b.add_any_transition(s1, s2)
    b.add_transition(s2, s3, "bb")
    b.set_accept(s3)
    return b.finish()


def _optional_any():
    # aa (.|) bb : slop-1 ordered pair
    b = TermAutomatonBuilder("text")
    s0, s1, s2, s3 = (b.create_state() for _ in range(4))
    b.add_transition(s0, s1, "aa")
    b.add_any_transition(s1, s2)
    b.add_transition(s1, s3, "bb")
    b.add_transition(s2, s3, "bb")
    b.set_accept(s3)
    return b.finish()


def _loop_auto():
    # aa (bb aa)* : cycles survive determinization
    b = TermAutomatonBuilder("text")
    s0, s1, s2 = b.create_state(), b.create_state(), b.create_state()
    b.add_transition(s0, s1, "aa")
    b.add_transition(s1, s2, "bb")
    b.add_transition(s2, s1, "aa")
    b.set_accept(s1)
    return b.finish()


def _nfa_dup():
    # nondeterministic: two aa arcs from 0 to accepting states
    b = TermAutomatonBuilder("text")
    s0, s1, s2 = b.create_state(), b.create_state(), b.create_state()
    b.add_transition(s0, s1, "aa")
    b.add_transition(s0, s2, "aa")
    b.add_transition(s1, s2, "bb")
    b.set_accept(s2)
    return b.finish()


AUTOMATA = [
    _phrase_auto("aa", "bb"),
    _phrase_auto("aa", "bb", "cc"),
    _phrase_auto("ee"),
    _union_then_term(),
    _any_gap(),
    _optional_any(),
    _loop_auto(),
    _nfa_dup(),
    _phrase_auto("aa", "zzzz"),  # absent term
]


@pytest.fixture(scope="module")
def ta_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rng = np.random.default_rng(23)
    docs = [
        " ".join(rng.choice(VOCAB, size=rng.integers(3, 35)))
        for _ in range(150)
    ]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )
    path = str(tmp_path_factory.mktemp("ta") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="simple",
        doc_id_col="doc_id", docs_per_segment=50,
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    return IndexReader(spark, path), docs


def _engine_freqs(reader, auto):
    from lucene_spark.search.executor import (
        _eval_term_automaton, _SegmentIndex,
    )

    terms = sorted(set(auto.terms))
    pdf = (
        reader.postings()
        .filter(reader.postings().term.isin(terms))
        .toPandas()
    )
    node = {"automaton": auto, "scorer": _IdentityScorer()}
    out: dict[int, float] = {}
    for _sid, grp in pdf.groupby("segment_id"):
        docs, scores = _eval_term_automaton(node, _SegmentIndex(grp))
        for d, f in zip(docs, scores):
            out[int(d)] = float(f)
    return out


class _IdentityScorer:
    """score(freq, norm) = freq — isolates the counting kernel."""

    weight = 1.0

    def score(self, freqs, norms):
        return np.asarray(freqs, dtype=np.float32)


@pytest.mark.parametrize("ai", range(len(AUTOMATA)))
def test_term_automaton_freq_matches_reference(ta_index, ai):
    reader, docs = ta_index
    auto = AUTOMATA[ai]
    got = _engine_freqs(reader, auto)
    want = {
        d: float(f)
        for d, txt in enumerate(docs)
        if (f := _ref_freq(auto, txt.split())) > 0
    }
    assert set(got) == set(want), f"automaton {ai} match sets differ"
    for d in want:
        assert got[d] == want[d], (
            f"automaton {ai} doc {d}: {got[d]} vs {want[d]}"
        )


def test_term_automaton_scored_search(ta_index):
    """End-to-end: BM25-scored top-k via IndexSearcher, rank order
    follows freq with the shared-stats scorer."""
    from lucene_spark.search.executor import IndexSearcher

    reader, docs = ta_index
    auto = AUTOMATA[0]
    top = IndexSearcher(reader).search(
        Q.TermAutomatonQuery(auto), k=500, prune=False
    )
    want = {
        d for d, txt in enumerate(docs) if _ref_freq(auto, txt.split()) > 0
    }
    assert {h.doc_id for h in top.hits} == want
    assert all(h.score > 0 for h in top.hits)
    scores = [h.score for h in top.hits]
    assert scores == sorted(scores, reverse=True)


def test_phrase_equivalence(ta_index):
    """A linear-chain automaton counts exactly phrase occurrences."""
    reader, docs = ta_index
    auto = _phrase_auto("cc", "dd")
    got = _engine_freqs(reader, auto)
    for d, txt in enumerate(docs):
        toks = txt.split()
        n = sum(
            1 for i in range(len(toks) - 1)
            if toks[i] == "cc" and toks[i + 1] == "dd"
        )
        assert got.get(d, 0) == n


def test_builder_invariants():
    b = TermAutomatonBuilder("text")
    s0, s1 = b.create_state(), b.create_state()
    b.add_any_transition(s0, s1)
    b.add_transition(s1, s0, "aa")
    b.set_accept(s1)
    with pytest.raises(ValueError, match="lead with an ANY"):
        b.finish()

    b = TermAutomatonBuilder("text")
    s0, s1 = b.create_state(), b.create_state()
    b.add_transition(s0, s1, "aa")
    b.set_accept(s0)
    with pytest.raises(ValueError, match="empty string"):
        b.finish()

    b = TermAutomatonBuilder("text")
    s0, s1, s2 = b.create_state(), b.create_state(), b.create_state()
    b.add_transition(s0, s1, "aa")
    b.add_any_transition(s1, s2)
    b.set_accept(s2)
    with pytest.raises(ValueError, match="end with an ANY"):
        b.finish()


# ---------------------------------------------------------------------------
# TokenStreamToTermAutomatonQuery (sandbox/search/
# TokenStreamToTermAutomatonQuery.java)
# ---------------------------------------------------------------------------


def test_ts2a_linear_stream_is_phrase(ta_index):
    """A plain linear stream converts to the exact phrase automaton."""
    from lucene_spark.search.automaton import (
        token_stream_to_term_automaton,
    )

    reader, docs = ta_index
    auto = token_stream_to_term_automaton(
        "text", [("aa", 1, 1), ("bb", 1, 1)]
    )
    got = _engine_freqs(reader, auto)
    import re

    want = {
        i: len(re.findall(r"(?<![a-z])aa bb(?![a-z])", d))
        for i, d in enumerate(docs)
    }
    want = {i: c for i, c in want.items() if c > 0}
    assert got == {i: float(c) for i, c in want.items()}


def test_ts2a_graph_stream_multiword_synonym(ta_index):
    """A graph stream (single token 'cc' stacked over the two-token
    path 'aa bb' — the SynonymGraphFilter shape) matches either form."""
    from lucene_spark.search.automaton import (
        token_stream_to_term_automaton,
    )

    reader, docs = ta_index
    # posLen 2 token first (side path), then the two 1-len tokens
    auto = token_stream_to_term_automaton(
        "text", [("cc", 1, 2), ("aa", 0, 1), ("bb", 1, 1)]
    )
    got = _engine_freqs(reader, auto)
    import re

    for i, d in enumerate(docs):
        n = len(re.findall(r"(?<![a-z])aa bb(?![a-z])", d)) + len(
            re.findall(r"(?<![a-z])cc(?![a-z])", d)
        )
        if n > 0:
            assert got.get(i, 0) == float(n), (i, d)
        else:
            assert i not in got


def test_ts2a_any_token_and_flat_tokens(ta_index):
    from lucene_spark.analysis.graph import FlatToken
    from lucene_spark.search.automaton import (
        token_stream_to_term_automaton,
    )

    reader, docs = ta_index
    # 'aa * cc' via FlatToken objects
    flat = [
        FlatToken("aa", 0, 1, 0, 2),
        FlatToken("*", 1, 1, 3, 4),
        FlatToken("cc", 2, 1, 5, 7),
    ]
    auto = token_stream_to_term_automaton("text", flat)
    got = _engine_freqs(reader, auto)
    assert isinstance(got, dict)  # executes through the kernel


def test_ts2a_hole_raises_unless_collapsed():
    import pytest as _pytest

    from lucene_spark.search.automaton import (
        token_stream_to_term_automaton,
    )

    with _pytest.raises(ValueError, match="cannot handle holes"):
        token_stream_to_term_automaton(
            "text", [("aa", 1, 1), ("bb", 2, 1)]
        )
    # preservePositionIncrements=False collapses the hole (.java:44-46)
    auto = token_stream_to_term_automaton(
        "text", [("aa", 1, 1), ("bb", 2, 1)],
        preserve_position_increments=False,
    )
    assert auto is not None
