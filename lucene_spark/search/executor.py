"""Query execution — IndexReader / IndexSearcher over the parquet index.

Physical plan (SURVEY.md §3.2 mapped to Spark):

  Query AST --rewrite--> canonical AST --compile (driver, binds global
  stats: the Weight analog)--> per-segment numpy kernel via
  ``applyInPandas(groupBy segment_id)`` (the per-leaf BulkScorer) -->
  per-segment top-k --> driver k-way merge (TopDocs.merge semantics:
  score DESC, doc_id ASC — TopDocs.java:36-45).

Scale properties:
- the postings scan is filtered by ``term IN (...)`` + field, which
  Parquet row-group stats prune (terms are sorted within segment files);
- scoring never touches the docs table (norm bytes ride in the posting
  rows);
- only ``segments x k`` candidate rows ever reach the driver;
- conjunctions lead with the rarest term and later terms decode only
  blocks whose docID range intersects the candidates (skip-data);
- pure term-disjunctions use batch block-max pruning (WAND/MAXSCORE
  analog): per-block score bounds from the stored impacts gate which
  docs get exact-scored; pruning only skips non-competitive docs, so
  surviving scores are unchanged (WANDScorer.java:31-58 safety).

Float discipline (rank-identity): every leaf emits float32 scores;
every boolean combiner sums children in float64 and casts back to
float32 — exactly the Scorer.score()/DisjunctionSumScorer contract.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index import codec, manifest as mani
from lucene_spark.search import query as Q
from lucene_spark.search.bm25 import CollectionStats, TermStats

_OUT_SCHEMA = "segment_id string, doc_id long, score float, seg_total long"


# --------------------------------------------------------------------------
# compiled query representation (the Weight analog) — plain dicts so the
# closure pickles cheaply to executors
# --------------------------------------------------------------------------


def _leaf(kind: str, field: str, terms: list[str], weight: float, **kw) -> dict:
    return {"kind": kind, "field": field, "terms": terms, "weight": float(weight), **kw}


class IndexReader:
    """Open the committed index at index_dir (largest manifest generation
    wins — SegmentInfos semantics). Pass ``generation`` to open a PAST
    commit point instead (DirectoryReader.open(IndexCommit) — what
    SearcherLifetimeManager hands back for paging consistency): every
    postings/doclens/docs read is already scoped to the opened
    manifest's referenced batches and live segments, so the pinned
    reader sees exactly that commit's docs. Corpus-level term/field
    stats are NOT versioned per commit (they follow the newest build,
    like tombstoned docs inflating stats until merge), so pinned
    readers give point-in-time doc VISIBILITY with live-index scoring
    stats — documented divergence."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 generation: int | None = None):
        self.spark = spark
        self.index_dir = index_dir
        self.manifest = mani.read_manifest(index_dir, generation)
        rows = spark.read.parquet(f"{index_dir}/field_stats").collect()
        self._field_stats = {
            r["field"]: CollectionStats(
                max_doc=r["max_doc_id"] + 1,
                doc_count=r["doc_count"],
                sum_total_term_freq=r["sum_total_term_freq"],
                sum_doc_freq=r["sum_total_term_freq"],
            )
            for r in rows
        }

    # ---- catalogs --------------------------------------------------------

    def _live_filter(self, df: DataFrame, table: str) -> DataFrame:
        """Restrict to this COMMITTED generation's view: first the
        manifest's referenced batch partitions (partition-pruned — so
        batch directories written after this manifest, e.g. a
        concurrent writer's pending flush or an NRT replica's
        pre-copied files, stay invisible: the SegmentInfos snapshot
        contract), then live segments when merges replaced any
        (IndexFileDeleter visibility via manifest.live_segment_ids)."""
        from lucene_spark.index.lifecycle import referenced_batches

        refs = referenced_batches(self.manifest).get(table)
        if refs is not None:
            df = df.filter(F.col("batch").isin(sorted(refs)))
        live = mani.live_segment_ids(self.manifest)
        if live is None:
            return df
        return df.filter(F.col("segment_id").isin(sorted(live)))

    # Catalog DataFrames are immutable logical plans over a COMMITTED
    # generation, so each is built once per reader (a reader is a
    # point-in-time snapshot, like an IndexReader over SegmentInfos):
    # repeated queries skip the parquet listing/schema pass and the
    # live-segment filter construction entirely.

    def postings(self) -> DataFrame:
        if not hasattr(self, "_postings_df"):
            self._postings_df = self._live_filter(
                self.spark.read.parquet(f"{self.index_dir}/postings"),
                "postings",
            )
        return self._postings_df

    def docs(self) -> DataFrame:
        """Docs registry with committed in-place DV updates overlaid
        (ReadersAndUpdates role — see index/dvupdates.py)."""
        if not hasattr(self, "_docs_df"):
            from lucene_spark.index.lifecycle import referenced_batches

            base = self.spark.read.parquet(f"{self.index_dir}/docs")
            refs = referenced_batches(self.manifest).get("docs")
            if refs is not None:
                base = base.filter(F.col("batch").isin(sorted(refs)))
            if self.manifest.get("dv_update_batches"):
                from lucene_spark.index.dvupdates import apply_dv_overlays

                base = apply_dv_overlays(
                    self.spark, base, self.index_dir, self.manifest
                )
            self._docs_df = base
        return self._docs_df

    def doclens(self) -> DataFrame:
        if not hasattr(self, "_doclens_df"):
            self._doclens_df = self._live_filter(
                self.spark.read.parquet(f"{self.index_dir}/doclens"),
                "doclens",
            )
        return self._doclens_df

    def term_stats_df(self) -> DataFrame:
        if not hasattr(self, "_term_stats_df"):
            self._term_stats_df = self.spark.read.parquet(
                f"{self.index_dir}/term_stats"
            )
        return self._term_stats_df

    def bloom(self):
        """Per-(segment, field) term-bloom sidecar gate (index/bloom.py
        — the BloomFilteringPostingsFormat seekExact role). Fail-open:
        answers None when absent or stale, never filters wrongly."""
        if not hasattr(self, "_bloom"):
            from lucene_spark.index.bloom import BloomSidecar

            self._bloom = BloomSidecar(
                self.spark, self.index_dir, self.manifest
            )
        return self._bloom

    def term_rows(self, field: str, terms: list[str]) -> DataFrame:
        """Postings rows of ``(field, term in terms)`` with the bloom
        segment gate applied: segments whose bitsets clear every term
        never enter the scan plan (seekExact-miss analog). Every
        single-field postings lookup should come through here."""
        ts = sorted(set(terms))
        rows = self.postings().filter(
            (F.col("field") == field) & (F.col("term").isin(ts))
        )
        maybe = self.bloom().segments_maybe_containing(
            [(field, t) for t in ts]
        )
        if maybe is not None:
            rows = rows.filter(F.col("segment_id").isin(sorted(maybe)))
        return rows

    # ---- live docs (tombstone deletes — Lucene90LiveDocsFormat role) -----

    def deleted_df(self) -> DataFrame | None:
        """Committed tombstones as DataFrame(doc_id), None if none."""
        if not hasattr(self, "_deleted_df"):
            from lucene_spark.index.deletes import deleted_ids_df

            self._deleted_df = deleted_ids_df(
                self.spark, self.index_dir, self.manifest
            )
        return self._deleted_df

    def is_deleted(self, doc_id: int) -> bool:
        """Point tombstone lookup (explain path) — a filtered scan of the
        tombstone parquet, never a collect of the full delete set."""
        dels = self.deleted_df()
        if dels is None:
            return False
        return dels.filter(F.col("doc_id") == int(doc_id)).head() is not None

    def _live_segment_ranges(self) -> list[tuple[str, int, int]]:
        """(segment_id, first_doc_id, last_doc_id) for every live
        segment, from the manifest (tiny, driver-side)."""
        m = self.manifest
        live = mani.live_segment_ids(m)
        out: list[tuple[str, int, int]] = []
        for coll in (m.get("batches", []), m.get("merges", []) or []):
            for b in coll:
                for s in b["segments"]:
                    if live is None or s["segment_id"] in live:
                        out.append(
                            (
                                s["segment_id"],
                                int(s["first_doc_id"]),
                                int(s["last_doc_id"]),
                            )
                        )
        return out

    def deleted_by_segment_df(self) -> DataFrame | None:
        """Tombstones tagged with their owning segment_id: a broadcast
        range-join of the tombstone table against the (tiny) manifest
        segment ranges. Stays fully distributed — no driver collect."""
        dels = self.deleted_df()
        if dels is None:
            return None
        rdf = self.spark.createDataFrame(
            self._live_segment_ranges(),
            "segment_id string, first_doc_id long, last_doc_id long",
        )
        return (
            dels.join(
                F.broadcast(rdf),
                (F.col("doc_id") >= F.col("first_doc_id"))
                & (F.col("doc_id") <= F.col("last_doc_id")),
            ).select("segment_id", "doc_id")
        )

    def sorted_segment_plan(
        self, field: str, term: str, sort_col: str, ascending: bool, k: int
    ) -> tuple[list[tuple[int, int]] | None, int]:
        """Sorted-index early termination (TopFieldCollector.java
        canEarlyTerminate over IndexWriterConfig.setIndexSort segments):
        -> (doc_id ranges of segments worth scanning, #segments pruned),
        or (None, 0) when the index sort doesn't match the requested
        sort. A segment is skipped only when STRICTLY-better segments
        (whole key range on the winning side) already hold >= k matches
        of `term` even after discounting every live tombstone — a
        conservative bound, so pruning can never change results."""
        m = self.manifest
        if m.get("sort_by") != sort_col:
            return None, 0
        live = mani.live_segment_ids(m)
        segs: list[dict] = []
        for b in m.get("batches", []):
            for s in b["segments"]:
                if live is not None and s["segment_id"] not in live:
                    continue
                if s.get("sort_min") is None or s.get("sort_max") is None:
                    return None, 0  # NRT append without ranges
                segs.append(s)
        for mg in m.get("merges", []) or []:
            for s in mg["segments"]:
                if live is None or s["segment_id"] in live:
                    return None, 0  # merged segments drop sort ranges
        if len(segs) < 2:
            return None, 0
        # per-segment matched-doc upper bound from the term dictionary
        # (one tiny collect: <= one row per live segment)
        df_rows = (
            self.postings()
            .filter((F.col("field") == field) & (F.col("term") == term))
            .groupBy("segment_id")
            .agg(F.sum("doc_freq").alias("df"))
            .collect()
        )
        matched = {r["segment_id"]: int(r["df"]) for r in df_rows}
        n_del = int(m.get("num_deleted", 0) or 0)
        keep: list[tuple[int, int]] = []
        pruned = 0
        for s in segs:
            if ascending:
                better = sum(
                    matched.get(o["segment_id"], 0)
                    for o in segs
                    if o["sort_max"] <= s["sort_min"]
                    and o["segment_id"] != s["segment_id"]
                )
            else:
                better = sum(
                    matched.get(o["segment_id"], 0)
                    for o in segs
                    if o["sort_min"] >= s["sort_max"]
                    and o["segment_id"] != s["segment_id"]
                )
            if better - n_del >= k:
                pruned += 1
            else:
                keep.append((int(s["first_doc_id"]), int(s["last_doc_id"])))
        return keep, pruned

    # ---- stats (the IndexSearcher.termStatistics path) --------------------

    def collection_stats(self, field: str) -> CollectionStats:
        return self._field_stats[field]

    def sum_doc_freq(self, field: str) -> int:
        """Terms.getSumDocFreq — the number of (term, doc) postings
        pairs for the field. Not materialized in field_stats (the
        CollectionStats row carries sumTotalTermFreq only), so it is
        aggregated lazily from the term dictionary and cached per
        reader; one tiny Spark agg, used by the classification module's
        avg-unique-terms estimate."""
        if not hasattr(self, "_sum_doc_freq"):
            self._sum_doc_freq = {
                r["field"]: r["sdf"]
                for r in self.term_stats_df()
                .groupBy("field")
                .agg(F.sum("doc_freq").alias("sdf"))
                .collect()
            }
        return int(self._sum_doc_freq.get(field, 0))

    # term dictionaries up to this many rows are cached on the driver
    # (the .tip-in-RAM analog); larger dictionaries stay Spark-side
    TERM_CACHE_MAX_ROWS = 2_000_000

    def _term_cache(self):
        """Driver-side term dictionary {(field, term): TermStats} — the
        block-tree index-in-heap analog. Loaded once per reader; saves a
        Spark job on every query compile / multi-term expansion. None if
        the dictionary exceeds TERM_CACHE_MAX_ROWS (query paths then
        fall back to filtered Spark scans)."""
        if not hasattr(self, "_tc"):
            df = self.term_stats_df()
            if df.count() > self.TERM_CACHE_MAX_ROWS:
                self._tc = None
            else:
                self._tc = {
                    (r["field"], r["term"]): TermStats(
                        doc_freq=r["doc_freq"],
                        total_term_freq=r["total_term_freq"],
                    )
                    for r in df.collect()
                }
        return self._tc

    def term_stats(self, field: str, terms: list[str]) -> dict[str, TermStats]:
        if not terms:
            return {}
        tc = self._term_cache()
        if tc is not None:
            return {
                t: tc[(field, t)] for t in set(terms) if (field, t) in tc
            }
        rows = (
            self.term_stats_df()
            .filter((F.col("field") == field) & (F.col("term").isin(list(set(terms)))))
            .collect()
        )
        return {
            r["term"]: TermStats(doc_freq=r["doc_freq"], total_term_freq=r["total_term_freq"])
            for r in rows
        }

    # ---- multi-term expansion (MultiTermQuery rewrite) --------------------

    def expand(self, q: Q.Query) -> list[str]:
        """Expand a multi-term query to its matching terms via the term
        dictionary — JVM-side string predicates over the sorted term
        column (PrefixQuery/WildcardQuery/RegexpQuery/FuzzyQuery/
        TermRangeQuery — SURVEY.md §2.4 Spark mapping). With the
        driver-side term cache warm, string-pattern expansions run
        locally over the sorted term list (the SegmentTermsEnum-on-heap
        analog); fuzzy keeps the JVM levenshtein path."""
        tc = self._term_cache()
        if tc is not None and not isinstance(q, Q.FuzzyQuery):
            if not hasattr(self, "_tc_by_field"):
                by_field: dict[str, list[str]] = {}
                for (f, t) in tc:
                    by_field.setdefault(f, []).append(t)
                self._tc_by_field = {f: sorted(v) for f, v in by_field.items()}
            terms = self._tc_by_field.get(q.field, [])
            if isinstance(q, Q.PrefixQuery):
                import bisect

                lo = bisect.bisect_left(terms, q.prefix)
                hi = bisect.bisect_left(terms, q.prefix + "￿")
                return terms[lo:hi]
            if isinstance(q, Q.WildcardQuery):
                rx = re.compile(
                    "".join(
                        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                        for ch in q.pattern
                    )
                )
                return [t for t in terms if rx.fullmatch(t)]
            if isinstance(q, Q.RegexpQuery):
                rx = re.compile(q.regexp)
                return [t for t in terms if rx.fullmatch(t)]
            if isinstance(q, Q.TermRangeQuery):
                import bisect

                lo = 0
                hi = len(terms)
                if q.lower is not None:
                    lo = (
                        bisect.bisect_left(terms, q.lower)
                        if q.include_lower
                        else bisect.bisect_right(terms, q.lower)
                    )
                if q.upper is not None:
                    hi = (
                        bisect.bisect_right(terms, q.upper)
                        if q.include_upper
                        else bisect.bisect_left(terms, q.upper)
                    )
                return terms[lo:hi]
        ts = self.term_stats_df()
        if isinstance(q, Q.PrefixQuery):
            cond = (F.col("field") == q.field) & F.col("term").startswith(q.prefix)
        elif isinstance(q, Q.WildcardQuery):
            # build an ANCHORED regex (Spark rlike matches substrings)
            rx = "".join(
                ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                for ch in q.pattern
            )
            cond = (F.col("field") == q.field) & F.col("term").rlike(f"^(?:{rx})$")
        elif isinstance(q, Q.RegexpQuery):
            # Lucene RegexpQuery is anchored (RegexpQuery.java:44)
            cond = (F.col("field") == q.field) & F.col("term").rlike(f"^(?:{q.regexp})$")
        elif isinstance(q, Q.FuzzyQuery):
            cond = (F.col("field") == q.field) & (
                F.levenshtein(F.col("term"), F.lit(q.term)) <= q.max_edits
            )
            if q.prefix_length:
                cond = cond & F.col("term").startswith(q.term[: q.prefix_length])
        elif isinstance(q, Q.TermRangeQuery):
            cond = F.col("field") == q.field
            if q.lower is not None:
                cond = cond & (
                    F.col("term") >= q.lower if q.include_lower else F.col("term") > q.lower
                )
            if q.upper is not None:
                cond = cond & (
                    F.col("term") <= q.upper if q.include_upper else F.col("term") < q.upper
                )
        else:
            raise TypeError(f"not a multi-term query: {q}")
        return [r["term"] for r in ts.filter(cond).select("term").collect()]


@dataclass
class SearchResult:
    top: Q.TopDocs
    pruned_segments: int = 0


class IndexSearcher:
    def __init__(
        self,
        reader: IndexReader,
        k1: float | None = None,
        b: float | None = None,
        similarity=None,
    ):
        """``similarity``: a search.similarities.Similarity — the
        IndexSearcher.setSimilarity injection point
        (IndexSearcher.java setSimilarity / Similarity.java contract).
        Default is the float32-exact BM25, parameterized by the
        manifest's k1/b."""
        from lucene_spark.search.similarities import BM25Similarity

        self.reader = reader
        self.k1 = k1 if k1 is not None else reader.manifest.get("k1", 1.2)
        self.b = b if b is not None else reader.manifest.get("b", 0.75)
        self.similarity = (
            similarity if similarity is not None else BM25Similarity(self.k1, self.b)
        )

    # ---- compile: AST -> weight tree (binds global stats on the driver) ---

    def _compile(self, q: Q.Query, boost: float = 1.0) -> dict | None:
        R = self.reader
        if isinstance(q, Q.MatchNoDocsQuery):
            return None
        if isinstance(q, Q.TermQuery):
            st = R.term_stats(q.field, [q.term])
            if q.term not in st:
                return None
            coll = R.collection_stats(q.field)
            sc = self.similarity.for_field(q.field).scorer(coll, [st[q.term]], boost * q.boost)
            return _leaf("term", q.field, [q.term], sc.weight,
                         cache=getattr(sc, "cache", None), scorer=sc)
        if isinstance(q, Q.SynonymQuery):
            st = R.term_stats(q.field, list(q.terms))
            present = [t for t in q.terms if t in st]
            if not present:
                return None
            coll = R.collection_stats(q.field)
            # SynonymQuery blends: docFreq = max, totalTermFreq = sum
            blended = TermStats(
                doc_freq=max(st[t].doc_freq for t in present),
                total_term_freq=sum(st[t].total_term_freq for t in present),
            )
            sc = self.similarity.for_field(q.field).scorer(coll, [blended], boost * q.boost)
            return _leaf("syn", q.field, present, sc.weight,
                         cache=getattr(sc, "cache", None), scorer=sc)
        if isinstance(q, Q.PhraseQuery):
            st = R.term_stats(q.field, list(q.terms))
            if len(st) < len(set(q.terms)):
                return None  # a missing term -> no phrase match
            coll = R.collection_stats(q.field)
            sc = self.similarity.for_field(q.field).scorer(
                coll, [st[t] for t in q.terms], boost * q.boost
            )
            return _leaf(
                "phrase", q.field, list(q.terms), sc.weight,
                cache=getattr(sc, "cache", None), scorer=sc, slop=q.slop
            )
        if isinstance(q, Q.MultiPhraseQuery):
            all_terms = [t for slot in q.slots for t in slot]
            st = R.term_stats(q.field, all_terms)
            slots = tuple(
                tuple(t for t in slot if t in st) for slot in q.slots
            )
            if any(not s for s in slots):
                return None  # a slot with no present terms -> no match
            coll = R.collection_stats(q.field)
            # MultiPhraseQuery sums idf over every present term of every
            # slot (idfExplain over the term array)
            present = [t for slot in slots for t in slot]
            sc = self.similarity.for_field(q.field).scorer(
                coll, [st[t] for t in present], boost * q.boost
            )
            return {
                "kind": "multi_phrase",
                "field": q.field,
                "terms": present,
                "slots": slots,
                "weight": sc.weight,
                "cache": getattr(sc, "cache", None),
                "scorer": sc,
            }
        if isinstance(q, Q.PhraseWildcardQuery):
            # expand pattern slots via the term dictionary, then reuse
            # the MultiPhraseQuery path (PhraseWildcardQuery.java's
            # rewrite; segment-sharing expansion replaced by the
            # driver-cached term dict). max_expansions is the TOTAL
            # budget across all multi-term slots, consumed slot by slot
            # in dictionary order — 'controls the total number of
            # expansions across all MultiTermQuery'
            # (PhraseWildcardQuery.java:64-76)
            budget = int(q.max_expansions)
            slots = []
            for slot in q.slots:
                if isinstance(slot, str):
                    slots.append((slot,))
                elif isinstance(slot, Q.TermQuery):
                    slots.append((slot.term,))
                else:
                    terms = sorted(R.expand(slot))[: max(budget, 0)]
                    if not terms:
                        return None  # a slot with no matching terms
                    budget -= len(terms)
                    slots.append(tuple(terms))
            return self._compile(
                Q.MultiPhraseQuery(q.field, tuple(slots)), boost * q.boost
            )
        if isinstance(q, Q.NGramPhraseQuery):
            # keep every n-th gram + the last, at their original
            # position offsets (NGramPhraseQuery.java's rewrite to a
            # positioned PhraseQuery)
            n = max(1, int(q.n))
            kept = list(range(0, len(q.terms), n))
            if kept[-1] != len(q.terms) - 1:
                kept.append(len(q.terms) - 1)
            terms = [q.terms[i] for i in kept]
            offs = [i - kept[0] for i in kept]
            st = R.term_stats(q.field, terms)
            if len(st) < len(set(terms)):
                return None
            coll = R.collection_stats(q.field)
            sc = self.similarity.for_field(q.field).scorer(
                coll, [st[t] for t in terms], boost * q.boost
            )
            return _leaf(
                "phrase", q.field, terms, sc.weight,
                cache=getattr(sc, "cache", None), scorer=sc, slop=0,
                offsets=offs,
            )
        if isinstance(q, Q.NearQuery):
            st = R.term_stats(q.field, [q.term_a, q.term_b])
            if q.term_a not in st or q.term_b not in st:
                return None
            return {
                "kind": "near",
                "field": q.field,
                "terms": [q.term_a, q.term_b],
                "window": int(q.window),
                "ordered": bool(q.ordered),
                "weight": float(boost * q.boost),
            }
        if isinstance(q, Q.IntervalQuery):
            # multi-term sources expand against the term dictionary
            # FIRST (under the field each subtree reads), then fixField
            # subtrees rewrite their term leaves to field-qualified
            # keys (the FieldMaskingSpanQuery mechanism)
            source = _expand_interval_multiterms(q.source, R, q.field)
            source = _fix_interval_fields(source)
            terms = sorted(set(source.terms()))
            st = _field_term_stats(R, q.field, terms)
            if not st:
                return None  # no term present anywhere
            # missing terms are fine for atLeast sources; the evaluator's
            # structure-aware candidate pass handles absences exactly
            return {
                "kind": "intervals",
                "field": q.field,
                "terms": terms,
                "source": source,
                "weight": float(boost * q.boost),
            }
        if isinstance(q, Q.SpanQuery):
            source = _expand_span_source(q.source, R, q.field)
            if _span_has_masking(q.source):
                # a mixed-field tree: qualify the remaining plain leaves
                # with the enclosing field so every lookup is unambiguous
                source = _qualify_leaves(source, q.field)
            terms = sorted(set(source.terms()))
            sterms = [t for t in sorted(set(source.scoring_terms()))]
            st = _field_term_stats(R, q.field, sterms)
            present = [t for t in sterms if t in st]
            if not present:
                return None
            coll = R.collection_stats(q.field)
            # SpanWeight.buildSimWeight: one SimScorer over the summed
            # stats of the scoring subtree's terms (exclude subtrees of
            # SpanNot contribute matching, not stats)
            sc = self.similarity.for_field(q.field).scorer(
                coll, [st[t] for t in present], boost * q.boost
            )
            return {
                "kind": "spans",
                "field": q.field,
                "terms": terms,
                "source": source,
                "weight": sc.weight,
                "scorer": sc,
                "cache": getattr(sc, "cache", None),
            }
        if isinstance(q, Q.TermAutomatonQuery):
            auto = q.automaton
            terms = sorted(set(auto.terms))
            st = R.term_stats(auto.field, terms)
            present = [t for t in terms if t in st]
            if not present:
                return None
            coll = R.collection_stats(auto.field)
            # TermAutomatonWeight: one SimScorer over ALL present terms'
            # stats (TermAutomatonQuery.java:380-399)
            sc = self.similarity.for_field(auto.field).scorer(
                coll, [st[t] for t in present],
                boost * q.boost * auto.boost,
            )
            return {
                "kind": "term_automaton",
                "field": auto.field,
                "terms": terms,
                "automaton": auto,
                "weight": sc.weight,
                "scorer": sc,
            }
        if isinstance(q, Q.PayloadScoreQuery):
            if q.func not in ("min", "max", "sum", "avg"):
                raise ValueError(f"unknown PayloadFunction {q.func!r}")
            source = _expand_span_source(q.source, R, q.field)
            _span_leaf_terms(source)  # validate the shape up front
            terms = sorted(set(source.terms()))
            st = R.term_stats(q.field, terms)
            if not any(t in st for t in terms):
                return None
            node = {
                "kind": "payload_score",
                "field": q.field,
                "terms": terms,
                "source": source,
                "func": q.func,
                "weight": float(boost * q.boost),
                "scorer": None,
            }
            if q.include_span_score:
                sterms = [t for t in sorted(set(source.scoring_terms()))
                          if t in st]
                coll = R.collection_stats(q.field)
                # PayloadScoreQuery.java:61-66: the wrapped SpanWeight's
                # score times the payload factor; boost rides the span
                # scorer, not the payload factor
                node["scorer"] = self.similarity.for_field(q.field).scorer(
                    coll, [st[t] for t in sterms], boost * q.boost
                )
            return node
        if isinstance(q, Q.ScoringRewriteQuery):
            # SCORING_BOOLEAN_REWRITE: expansion terms become scoring
            # SHOULD TermQueries (MultiTermQuery.ScoringRewrite)
            terms = R.expand(q.query)
            if len(terms) > q.max_clause_count:
                raise Q.TooManyClauses(
                    f"{len(terms)} expanded terms > {q.max_clause_count}"
                )
            if not terms:
                return None
            field = q.query.field
            return self._compile(
                Q.BooleanQuery(
                    should=tuple(Q.TermQuery(field, t) for t in terms)
                ),
                boost * q.boost,
            )
        if isinstance(q, (Q.PrefixQuery, Q.WildcardQuery, Q.RegexpQuery,
                          Q.FuzzyQuery, Q.TermRangeQuery)):
            terms = R.expand(q)
            if not terms:
                return None
            # CONSTANT_SCORE_REWRITE: every matching doc scores boost
            return _leaf("const_set", q.field, terms, boost * q.boost)
        if isinstance(q, Q.TermInSetQuery):
            terms = [t for t in q.terms]
            return _leaf("const_set", q.field, terms, boost * q.boost)
        if isinstance(q, Q.ConstantScoreQuery):
            inner = self._compile(q.query, 1.0)
            if inner is None:
                return None
            return {"kind": "const_wrap", "sub": inner, "weight": float(boost * q.boost)}
        if isinstance(q, Q.BoostQuery):
            return self._compile(q.query, boost * q.boost)
        if isinstance(q, Q.DisjunctionMaxQuery):
            subs = [self._compile(s, boost) for s in q.queries]
            subs = [s for s in subs if s is not None]
            if not subs:
                return None
            return {"kind": "dismax", "subs": subs, "tie": float(q.tie_breaker)}
        if isinstance(q, Q.BooleanQuery):
            must = [self._compile(s, boost) for s in q.must]
            if any(m is None for m in must):
                return None  # missing MUST term -> no hits
            filt = [self._compile(s, boost) for s in q.filter]
            if any(f is None for f in filt):
                return None
            should = [s for s in (self._compile(x, boost) for x in q.should) if s is not None]
            must_not = [s for s in (self._compile(x, boost) for x in q.must_not) if s is not None]
            if q.min_should > len(should):
                return None
            if not must and not filt and not should:
                return None
            return {
                "kind": "bool",
                "must": must,
                "should": should,
                "must_not": must_not,
                "filter": filt,
                "min_should": int(q.min_should),
            }
        raise TypeError(f"cannot compile {type(q).__name__}")

    # ---- search ------------------------------------------------------------

    def search(
        self,
        q: Q.Query,
        k: int = 10,
        prune: bool = True,
        search_after: tuple[float, int] | None = None,
    ) -> Q.TopDocs:
        q = Q.rewrite_fixpoint(q)
        if isinstance(q, Q.MatchAllQuery):
            return self._match_all(k, q.boost, search_after)
        node = self._compile(q)
        if node is None:
            return Q.TopDocs(total_hits=0, hits=[])
        node_fields = _collect_fields(node)
        if len(node_fields) > 1:
            # cross-field boolean (MultiFieldQueryParser output): leaf
            # lookups become field-qualified so one kernel pass scores
            # every clause against its own field's rows
            node = _qualify_node_fields(node)
            field = None
        else:
            field = next(iter(node_fields))
        terms = sorted(_collect_terms(node))
        plain = [t for t in terms if FIELD_SEP not in t]
        cond = None
        if plain:
            cond = (F.col("field") == field) & (F.col("term").isin(plain))
        qualified: dict[str, list[str]] = {}
        for t in terms:
            if FIELD_SEP in t:
                f, _, raw = t.partition(FIELD_SEP)
                qualified.setdefault(f, []).append(raw)
        for f, ts in qualified.items():  # masked-span / cross-field terms
            c = (F.col("field") == f) & (F.col("term").isin(ts))
            cond = c if cond is None else (cond | c)
        if cond is None:
            return Q.TopDocs(total_hits=0, hits=[])
        rows = self.reader.postings().filter(cond)
        # bloom sidecar gate (seekExact analog): drop segments whose
        # bitsets clear every query term; all-clear means no posting
        # row can exist anywhere — answer without running a job. A hit
        # from this kernel always needs at least one positive postings
        # row, so "segment contains none of the terms" is always safe.
        pairs = [(field, t) for t in plain] + [
            (f, t) for f, ts in qualified.items() for t in ts
        ]
        maybe = self.reader.bloom().segments_maybe_containing(pairs)
        if maybe is not None:
            if not maybe:
                return Q.TopDocs(total_hits=0, hits=[])
            rows = rows.filter(F.col("segment_id").isin(sorted(maybe)))
        if self.reader.manifest.get("delete_batches"):
            # tombstones ride in as cogrouped per-segment rows (never a
            # driver-collected set); the kernel masks them out of the
            # postings BEFORE scoring so WAND's theta only sees live docs
            dels = self.reader.deleted_by_segment_df()
            per_seg = (
                rows.groupBy("segment_id")
                .cogroup(dels.groupBy("segment_id"))
                .applyInPandas(
                    _make_segment_cogroup_fn(
                        node, k, prune, search_after,
                        fmt=_reader_fmt(self.reader),
                    ),
                    schema=_OUT_SCHEMA,
                )
            )
        else:
            per_seg = rows.groupBy("segment_id").applyInPandas(
                _make_segment_fn(node, k, prune, search_after,
                                 fmt=_reader_fmt(self.reader)),
                schema=_OUT_SCHEMA,
            )
        # only segments x k rows reach the driver (TopDocs.merge stage)
        cand = per_seg.toPandas()
        if cand.empty:
            return Q.TopDocs(total_hits=0, hits=[])
        # seg_total repeats on every row of a segment: sum one per segment.
        # With prune=True it is a LOWER bound once pruning kicked in — the
        # TotalHits.GREATER_THAN_OR_EQUAL_TO analog
        # (TopScoreDocCollector totalHitsThreshold semantics).
        total = int(cand.groupby("segment_id")["seg_total"].first().sum())
        scores32 = cand["score"].to_numpy(np.float32)
        order = np.lexsort((cand["doc_id"].to_numpy(), -scores32))
        hits = [
            Q.TopDoc(int(cand["doc_id"].iloc[i]), float(scores32[i]))
            for i in order[:k]
        ]
        return Q.TopDocs(total_hits=total, hits=hits)

    def count(self, q: Q.Query) -> int:
        """``IndexSearcher.count(Query)``
        (core/search/IndexSearcher.java count: a TotalHitCountCollector
        pass that takes every Weight#count shortcut available,
        Weight.java:198). Shortcut ladder here:

        - MatchAll -> manifest arithmetic (zero jobs without
          tombstones; one tombstone-frame count otherwise);
        - TermQuery without tombstones -> term-dictionary doc_freq
          (the TermQuery.java:260 shortcut, no postings touched);
        - any set-algebra query (bool/multi-term/synonym) -> the
          UNSCORED relational match set counted distributively
          (index/deletes.py matching_ids — one count job, never the
          scoring kernel);
        - positional/scoring-only shapes -> the kernel with prune=False
          (exact seg_total, the collector fallback).
        """
        from lucene_spark.index.deletes import matching_ids

        q = Q.rewrite_fixpoint(q)
        m = self.reader.manifest
        subs = getattr(self.reader, "readers", None)
        if isinstance(q, Q.MatchAllQuery):
            return self._live_total()
        has_dels = (
            any(bool(r.manifest.get("delete_batches")) for r in subs)
            if subs is not None
            else bool(m.get("delete_batches"))
        )
        if isinstance(q, Q.TermQuery) and not has_dels:
            st = self.reader.term_stats(q.field, [q.term])
            return int(st[q.term].doc_freq) if q.term in st else 0
        try:
            # matching_ids is live-only on every branch — no further
            # tombstone join needed
            ids = matching_ids(self.reader, q)
        except TypeError:
            return int(self.search(q, k=1, prune=False).total_hits)
        return ids.count()

    def explain(self, q: Q.Query, doc_id: int) -> dict:
        """Score explanation for one document — the Explanation tree of
        IndexSearcher.explain (CheckHits contract: the explained value
        equals the collected score bit-for-bit; asserted in
        tests/test_explain.py).

        -> {match: bool, value: float, description: str, details: [...]}
        """
        q = Q.rewrite_fixpoint(q)
        if isinstance(q, Q.MatchAllQuery):
            return {
                "match": True,
                "value": float(np.float32(q.boost)),
                "description": "MatchAllDocsQuery",
                "details": [],
            }
        node = self._compile(q)
        if node is None:
            return {"match": False, "value": 0.0, "description": "no match", "details": []}
        terms = sorted(_collect_terms(node))
        field = _collect_field(node)
        if self.reader.is_deleted(doc_id):
            return {"match": False, "value": 0.0, "description": "deleted doc", "details": []}
        seg_row = (
            self.reader.doclens().filter(F.col("doc_id") == doc_id).head()
        )
        if seg_row is None:
            return {"match": False, "value": 0.0, "description": "unknown doc", "details": []}
        pdf = (
            self.reader.postings()
            .filter(
                (F.col("segment_id") == seg_row["segment_id"])
                & (F.col("field") == field)
                & (F.col("term").isin(terms))
            )
            .toPandas()
        )
        if pdf.empty:
            return {"match": False, "value": 0.0, "description": "no terms in segment", "details": []}
        ctx = _SegmentIndex(pdf, fmt=_reader_fmt(self.reader))
        return _explain_node(node, ctx, int(doc_id))

    def _live_total(self) -> int:
        """Live doc count from manifest arithmetic (Weight#count,
        Weight.java:198): zero count jobs without tombstones.
        Doc-stacking composites (MultiReader, which re-bases doc ids
        and carries ``bases``) sum every sub-manifest — the copied
        manifest only describes sub-reader 0; a ParallelReader's
        sub-readers hold the SAME documents, so its copied manifest is
        already the right accounting."""
        from lucene_spark.index.deletes import live_total

        dels = self.reader.deleted_df()
        stacked = (
            self.reader.readers
            if getattr(self.reader, "bases", None)
            else None
        )
        if stacked is not None:
            # per-manifest arithmetic via the same shared helper; the
            # composite's (rebased, unioned) tombstones subtract once
            total = sum(live_total(r.manifest, None) for r in stacked)
            if dels is not None:
                total -= dels.select("doc_id").distinct().count()
            return total
        return live_total(self.reader.manifest, dels)

    def _match_all(self, k: int, boost: float, after) -> Q.TopDocs:
        # Weight#count shortcut (Weight.java:198,
        # MatchAllDocsQuery.java): total hits ride the manifest's doc
        # accounting — num_docs_total minus merge-purged docs minus
        # live tombstones — so the no-deletions path runs ZERO count
        # jobs (only the k-row collect below). With tombstones present
        # the tombstone set must be deduplicated (the only frame
        # scanned — never the doclens), mirroring term_count's
        # with-deletions fallback (sqlpath.py term_count).
        total = self._live_total()
        # distinct: doclens hold one row per (doc, field)
        dl = self.reader.doclens().select("doc_id").distinct()
        dels = self.reader.deleted_df()
        if dels is not None:
            dl = dl.join(dels, "doc_id", "left_anti")
        if after is not None:
            # searchAfter on a constant-score scan: every hit ties on
            # score, so the cursor reduces to doc_id — resume STRICTLY
            # after it (total_hits still counts every match, the
            # TopDocs totalHits contract)
            dl = dl.filter(F.col("doc_id") > int(after[1]))
        rows = dl.orderBy("doc_id").limit(k).collect()
        return Q.TopDocs(
            total_hits=total,
            hits=[Q.TopDoc(r["doc_id"], float(np.float32(boost))) for r in rows],
        )


# --------------------------------------------------------------------------
# term collection helpers
# --------------------------------------------------------------------------


def _collect_terms(node: dict) -> set[str]:
    k = node["kind"]
    if k in ("term", "syn", "phrase", "multi_phrase", "near", "const_set",
             "intervals", "spans", "payload_score", "term_automaton"):
        return set(node["terms"])
    if k == "const_wrap":
        return _collect_terms(node["sub"])
    if k == "dismax":
        return set().union(*(_collect_terms(s) for s in node["subs"]))
    if k == "bool":
        out: set[str] = set()
        for key in ("must", "should", "must_not", "filter"):
            for s in node[key]:
                out |= _collect_terms(s)
        return out
    raise TypeError(k)


def _collect_fields(node: dict) -> set[str]:
    k = node["kind"]
    if k in ("term", "syn", "phrase", "multi_phrase", "near", "const_set",
             "intervals", "spans", "payload_score", "term_automaton"):
        return {node["field"]}
    if k == "const_wrap":
        return _collect_fields(node["sub"])
    if k == "dismax":
        return set().union(*(_collect_fields(s) for s in node["subs"]))
    if k == "bool":
        out: set[str] = set()
        for key in ("must", "should", "filter", "must_not"):
            for s in node[key]:
                out |= _collect_fields(s)
        return out
    raise TypeError(k)


def _collect_field(node: dict) -> str:
    fields = _collect_fields(node)
    if len(fields) != 1:
        raise NotImplementedError(
            "cross-field queries are not supported in the exact32 searcher "
            f"(saw fields {sorted(fields)}); use the sql64 per-field ops or "
            "sqlpath.combined_field_topk (BM25F)"
        )
    return next(iter(fields))


_QUALIFIABLE_LEAVES = (
    "term", "syn", "phrase", "multi_phrase", "near", "const_set",
)


def _qualify_node_fields(node: dict) -> dict:
    """Rewrite every term-bearing leaf's lookup keys to the
    field-qualified form (``field\\x01term``) the per-segment kernel
    already aliases for masked-span lookups (_SegmentIndex rows) — the
    mechanism that lets ONE kernel invocation score a boolean tree
    whose clauses read DIFFERENT fields (MultiFieldQueryParser
    execution: each clause keeps its own field's postings, norms and
    compile-time stats; only the row lookup key changes). Intervals /
    spans / payload leaves keep their own fixField machinery and are
    rejected here."""
    k = node["kind"]
    if k in _QUALIFIABLE_LEAVES:
        f = node["field"]
        q = lambda t: t if FIELD_SEP in t else f + FIELD_SEP + t  # noqa: E731
        out = {**node, "terms": [q(t) for t in node["terms"]]}
        if "slots" in node:
            out["slots"] = [[q(t) for t in slot] for slot in node["slots"]]
        return out
    if k in ("intervals", "spans", "payload_score", "term_automaton"):
        raise NotImplementedError(
            f"cross-field boolean over {k} leaves: wrap the leaf in its "
            "own single-field search, or use FieldMaskingSpanQuery"
        )
    if k == "const_wrap":
        return {**node, "sub": _qualify_node_fields(node["sub"])}
    if k == "dismax":
        return {**node, "subs": [_qualify_node_fields(s) for s in node["subs"]]}
    if k == "bool":
        return {
            **node,
            **{
                key: [_qualify_node_fields(s) for s in node[key]]
                for key in ("must", "should", "must_not", "filter")
            },
        }
    raise TypeError(k)


# --------------------------------------------------------------------------
# per-segment kernel (runs inside applyInPandas)
# --------------------------------------------------------------------------


def _reader_fmt(reader) -> str:
    """Postings-format name recorded in the manifest (SegmentInfos
    codec role); pre-format indexes default to for104."""
    return reader.manifest.get("postings_format") or "for104"


def _empty_topk() -> pd.DataFrame:
    return pd.DataFrame(
        {"segment_id": [], "doc_id": [], "score": [], "seg_total": []}
    ).astype({"segment_id": "str", "doc_id": "int64",
              "score": "float32", "seg_total": "int64"})


def _segment_topk(
    node: dict, k: int, prune: bool, after, pdf: pd.DataFrame,
    deleted: np.ndarray | None, fmt: str = "for104",
) -> pd.DataFrame:
    """Shared per-segment kernel body. `deleted` (sorted int64 or None)
    is masked out of the postings INSIDE _SegmentIndex, so every scorer
    — including WAND's theta — only ever sees live docs (liveDocs
    semantics; stats still count deletions until merge, the Lucene
    docFreq contract)."""
    seg = str(pdf["segment_id"].iat[0])
    ctx = _SegmentIndex(pdf, deleted=deleted, fmt=fmt)
    if prune == "maxscore":  # bulk-scorer strategy override
        node = {**node, "strategy": "maxscore"}
    docs, scores = _eval(node, ctx, k if prune else None)
    if after is not None:
        # searchAfter: keep (score < after) or (== and doc > afterDoc)
        # (IndexSearcher.java:576-591)
        a_score, a_doc = np.float32(after[0]), int(after[1])
        keep = (scores < a_score) | ((scores == a_score) & (docs > a_doc))
        docs, scores = docs[keep], scores[keep]
    total = len(docs)
    if total == 0:
        return _empty_topk()
    order = np.lexsort((docs, -scores))[:k]
    return pd.DataFrame(
        {
            "segment_id": seg,
            "doc_id": docs[order],
            "score": scores[order].astype(np.float32),
            "seg_total": np.int64(total),
        }
    )


def _make_segment_fn(node: dict, k: int, prune: bool, after, fmt: str = "for104"):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_topk(node, k, prune, after, pdf, None, fmt)

    return fn


def _make_segment_cogroup_fn(node: dict, k: int, prune: bool, after,
                             fmt: str = "for104"):
    """Cogrouped variant: (postings rows, tombstone rows) per segment.
    The tombstone side scales with per-segment churn, never the global
    delete count — no driver broadcast."""

    def fn(pdf: pd.DataFrame, dels: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return _empty_topk()  # segment has deletes but no query terms
        deleted = (
            np.sort(dels["doc_id"].to_numpy(np.int64)) if len(dels) else None
        )
        return _segment_topk(node, k, prune, after, pdf, deleted, fmt)

    return fn


class _SegmentIndex:
    """Postings rows of ONE segment, keyed by term.

    A term may span SEVERAL rows (salted hot-term merge, SURVEY.md §4.2:
    sub-postings per salt over disjoint doc ranges, concatenated in doc
    order at read) — all accessors transparently concatenate row parts
    ordered by their first docID."""

    def __init__(
        self,
        pdf: pd.DataFrame,
        deleted: np.ndarray | None = None,
        fmt: str = "for104",
    ):
        from lucene_spark.index.formats import get_postings_format

        self.fmt = get_postings_format(fmt)
        self.rows: dict[str, list[int]] = {}
        fields = pdf["field"].tolist() if "field" in pdf else None
        for i, t in enumerate(pdf["term"].tolist()):
            self.rows.setdefault(t, []).append(i)
            if fields is not None:
                # field-qualified alias for masked-span lookups; plain
                # keys stay correct whenever the pdf is single-field
                self.rows.setdefault(fields[i] + FIELD_SEP + t, []).append(i)
        self.pdf = pdf
        # order multi-row terms by first docID (block_last of a 1-block
        # part is its last doc — ordering by first block's last works for
        # disjoint ranges)
        for t, idxs in self.rows.items():
            if len(idxs) > 1:
                idxs.sort(key=lambda i: pdf["block_last_doc"].iloc[i][0])
        self._cache: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self.deleted: np.ndarray | None = None
        if deleted is not None and len(deleted):
            self.deleted = np.sort(np.asarray(deleted, dtype=np.int64))

    def has(self, term: str) -> bool:
        return term in self.rows

    def _live(self, docs: np.ndarray) -> np.ndarray | None:
        """Keep-mask dropping tombstoned docs; None = all live."""
        if self.deleted is None or len(docs) == 0:
            return None
        keep = ~np.isin(docs, self.deleted)
        return None if keep.all() else keep

    def _row_postings(self, r, candidates: np.ndarray | None):
        docs, freqs, norms = self._row_postings_raw(r, candidates)
        keep = self._live(docs)
        if keep is not None:
            docs, freqs, norms = docs[keep], freqs[keep], norms[keep]
        return docs, freqs, norms

    def _row_postings_raw(self, r, candidates: np.ndarray | None):
        blob = bytes(r["postings"])
        norms_all = np.frombuffer(bytes(r["norms"]), dtype=np.uint8).astype(np.int64)
        block_last = list(r["block_last_doc"])
        if candidates is not None and len(block_last) > 1:
            # block j covers (block_last[j-1], block_last[j]]
            lasts = np.asarray(block_last, dtype=np.int64)
            firsts = np.concatenate(([-1], lasts[:-1])) + 1
            # keep block if any candidate falls in [first, last]
            idx = np.searchsorted(candidates, firsts, side="left")
            mask = (idx < len(candidates)) & (
                candidates[np.minimum(idx, len(candidates) - 1)] <= lasts
            )
            docs, freqs = self.fmt.decode_selective(blob, block_last, mask)
            # norms are stored per posting in list order; selective decode
            # loses alignment — rebuild via searchsorted on full docid list
            # only when blocks were skipped:
            if mask.all():
                norms = norms_all
            else:
                full_docs, _ = self.fmt.decode(blob)
                pos = np.searchsorted(full_docs, docs)
                norms = norms_all[pos]
            return docs, freqs, norms
        docs, freqs = self.fmt.decode(blob)
        return docs, freqs, norms_all

    def postings(self, term: str, candidates: np.ndarray | None = None):
        """-> (doc_ids, freqs, norm_codes). With candidates given, decode
        only blocks whose docID range intersects them (skip-data)."""
        cacheable = candidates is None
        if cacheable and term in self._cache:
            return self._cache[term]
        if term not in self.rows:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z
        parts = [
            self._row_postings(self.pdf.iloc[i], candidates)
            for i in self.rows[term]
        ]
        if len(parts) == 1:
            out = parts[0]
        else:
            out = (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]),
            )
        if cacheable:
            self._cache[term] = out
        return out

    def positions(self, term: str) -> list[np.ndarray]:
        """Per-doc position arrays, aligned with postings() — i.e. with
        tombstoned docs' lists dropped by the same live mask. Views
        over the flat cache (no copies); only the sloppy-phrase kernel
        needs the per-doc form."""
        flat, starts, lens = self.flat_positions(term)
        ends = starts + lens
        return [flat[s:e] for s, e in zip(starts, ends)]

    def flat_positions(self, term: str):
        """-> (flat int64 positions, starts, lens) — every live doc's
        positions concatenated, aligned with postings(term)'s doc
        order. Fully vectorized decode (codec.decode_positions_flat:
        one varint pass + segmented cumsum); the live mask drops
        tombstoned docs' ranges with a flat-array gather. Cached per
        term; the basis of the phrase/NEAR/intervals kernels."""
        if not hasattr(self, "_flat_cache"):
            self._flat_cache = {}
        if term in self._flat_cache:
            return self._flat_cache[term]
        flats: list[np.ndarray] = []
        lens_parts: list[np.ndarray] = []
        for i in self.rows.get(term, ()):
            r = self.pdf.iloc[i]
            d, freqs = self.fmt.decode(bytes(r["postings"]))
            flat, lens = codec.decode_positions_flat(
                bytes(r["positions"]), freqs
            )
            keep = self._live(d)
            if keep is not None:
                idx = np.where(keep)[0]
                sel = lens[idx]
                starts = np.cumsum(lens) - lens
                total = int(sel.sum())
                rep = np.repeat(starts[idx], sel)
                within = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(sel) - sel, sel
                )
                flat = flat[rep + within]
                lens = sel
            flats.append(flat)
            lens_parts.append(lens)
        flat = (
            np.concatenate(flats) if flats else np.zeros(0, dtype=np.int64)
        )
        lens = (
            np.concatenate(lens_parts)
            if lens_parts
            else np.zeros(0, dtype=np.int64)
        )
        ends = np.cumsum(lens)
        out = (flat, ends - lens, lens)
        self._flat_cache[term] = out
        return out

    def flat_offsets(self, term: str):
        """-> (flat char starts, flat char ends, seg starts, lens) —
        stored occurrence offsets aligned with flat_positions(term)'s
        doc order and live mask. Requires a store_offsets index."""
        if not hasattr(self, "_off_cache"):
            self._off_cache = {}
        if term in self._off_cache:
            return self._off_cache[term]
        s_parts: list[np.ndarray] = []
        e_parts: list[np.ndarray] = []
        lens_parts: list[np.ndarray] = []
        for i in self.rows.get(term, ()):
            r = self.pdf.iloc[i]
            if r["offsets"] is None:
                raise ValueError("index was not built with store_offsets")
            d, freqs = self.fmt.decode(bytes(r["postings"]))
            st, en, lens = codec.decode_offsets_flat(bytes(r["offsets"]), freqs)
            keep = self._live(d)
            if keep is not None:
                idx = np.where(keep)[0]
                sel = lens[idx]
                starts = np.cumsum(lens) - lens
                total = int(sel.sum())
                rep = np.repeat(starts[idx], sel)
                within = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(sel) - sel, sel
                )
                st, en = st[rep + within], en[rep + within]
                lens = sel
            s_parts.append(st)
            e_parts.append(en)
            lens_parts.append(lens)
        z = np.zeros(0, dtype=np.int64)
        st = np.concatenate(s_parts) if s_parts else z
        en = np.concatenate(e_parts) if e_parts else z
        lens = np.concatenate(lens_parts) if lens_parts else z
        ends = np.cumsum(lens)
        out = (st, en, ends - lens, lens)
        self._off_cache[term] = out
        return out

    def flat_payloads(self, term: str):
        """-> (flat float32 payloads, seg starts, lens) — stored
        per-occurrence payloads aligned with flat_positions(term)'s doc
        order and live mask (PostingsFormat .pay role). Requires a
        store_payloads index."""
        if not hasattr(self, "_pay_cache"):
            self._pay_cache = {}
        if term in self._pay_cache:
            return self._pay_cache[term]
        v_parts: list[np.ndarray] = []
        lens_parts: list[np.ndarray] = []
        for i in self.rows.get(term, ()):
            r = self.pdf.iloc[i]
            if "payloads" not in r or r["payloads"] is None:
                raise ValueError("index was not built with store_payloads")
            d, freqs = self.fmt.decode(bytes(r["postings"]))
            vals = codec.decode_payloads_flat(bytes(r["payloads"]), freqs)
            vals = vals.view(np.float32)
            lens = freqs.astype(np.int64)
            keep = self._live(d)
            if keep is not None:
                idx = np.where(keep)[0]
                sel = lens[idx]
                starts = np.cumsum(lens) - lens
                total = int(sel.sum())
                rep = np.repeat(starts[idx], sel)
                within = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(sel) - sel, sel
                )
                vals = vals[rep + within]
                lens = sel
            v_parts.append(vals)
            lens_parts.append(lens)
        z = np.zeros(0, dtype=np.int64)
        vals = (
            np.concatenate(v_parts) if v_parts else z.astype(np.float32)
        )
        lens = np.concatenate(lens_parts) if lens_parts else z
        ends = np.cumsum(lens)
        out = (vals, ends - lens, lens)
        self._pay_cache[term] = out
        return out

    def impacts(self, term: str):
        """-> (block_last, [impact freq arrays], [impact norm arrays]);
        parts concatenate block-wise (ranges are disjoint and ordered)."""
        bl: list[np.ndarray] = []
        fs: list[np.ndarray] = []
        ns: list[np.ndarray] = []
        for i in self.rows[term]:
            r = self.pdf.iloc[i]
            bl.append(np.asarray(list(r["block_last_doc"]), dtype=np.int64))
            fs.extend(np.asarray(x, dtype=np.int64) for x in r["impact_freqs"])
            ns.extend(np.asarray(x, dtype=np.int64) for x in r["impact_norms"])
        return np.concatenate(bl), fs, ns


def _eval(node: dict, ctx: _SegmentIndex, k: int | None, candidates: np.ndarray | None = None):
    """-> (sorted doc_ids int64, scores float32). ``k`` enables top-level
    pruning for pure term disjunctions."""
    kind = node["kind"]
    if kind == "term":
        d, f, n = ctx.postings(node["terms"][0], candidates)
        return d, node["scorer"].score(f, n)
    if kind == "syn":
        # union, freqs summed per doc, single blended scorer
        ds, fs, ns = [], [], []
        for t in node["terms"]:
            d, f, n = ctx.postings(t, candidates)
            ds.append(d); fs.append(f); ns.append(n)
        dall = np.concatenate(ds)
        if len(dall) == 0:
            return dall, dall.astype(np.float32)
        fall = np.concatenate(fs)
        nall = np.concatenate(ns)
        uniq, inv = np.unique(dall, return_inverse=True)
        fsum = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(fsum, inv, fall)
        norms = np.zeros(len(uniq), dtype=np.int64)
        norms[inv] = nall  # same doc -> same norm
        return uniq, node["scorer"].score(fsum, norms)
    if kind == "phrase":
        return _eval_phrase(node, ctx)
    if kind == "multi_phrase":
        return _eval_multi_phrase(node, ctx)
    if kind == "near":
        return _eval_near(node, ctx)
    if kind == "intervals":
        return _eval_intervals(node, ctx)
    if kind == "spans":
        return _eval_spans(node, ctx)
    if kind == "payload_score":
        return _eval_payload_score(node, ctx)
    if kind == "term_automaton":
        return _eval_term_automaton(node, ctx)
    if kind == "const_set":
        ds = [ctx.postings(t, candidates)[0] for t in node["terms"]]
        dall = np.unique(np.concatenate(ds)) if ds else np.zeros(0, dtype=np.int64)
        return dall, np.full(len(dall), np.float32(node["weight"]), dtype=np.float32)
    if kind == "const_wrap":
        d, _ = _eval(node["sub"], ctx, None, candidates)
        return d, np.full(len(d), np.float32(node["weight"]), dtype=np.float32)
    if kind == "dismax":
        ds, ss = zip(*(_eval(s, ctx, None, candidates) for s in node["subs"]))
        dall = np.concatenate(ds)
        if len(dall) == 0:
            return dall, dall.astype(np.float32)
        uniq, inv = np.unique(dall, return_inverse=True)
        sall = np.concatenate(ss).astype(np.float64)
        smax = np.zeros(len(uniq)); ssum = np.zeros(len(uniq))
        np.maximum.at(smax, inv, sall)
        np.add.at(ssum, inv, sall)
        tie = node["tie"]
        out = (smax + tie * (ssum - smax)).astype(np.float32)
        return uniq, out
    if kind == "bool":
        return _eval_bool(node, ctx, k, candidates)
    raise TypeError(kind)


def _gather_pos_keys(ctx: _SegmentIndex, term: str, docs: np.ndarray, large: int) -> np.ndarray:
    """Positions of `term` restricted to the sorted candidate `docs`,
    encoded as sorted global keys ``doc_index * large + position``
    (doc_index = index into `docs`). Entirely vectorized: a flat-array
    range-gather via repeat/cumsum — no per-doc Python loop. Docs not
    containing the term contribute nothing."""
    tdocs, _, _ = ctx.postings(term)
    if len(tdocs) == 0 or len(docs) == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.searchsorted(tdocs, docs)
    ok = (idx < len(tdocs)) & (tdocs[np.minimum(idx, len(tdocs) - 1)] == docs)
    idx = idx[ok]
    doc_pos = np.where(ok)[0]
    flat, starts, lens = ctx.flat_positions(term)
    sel = lens[idx]
    total = int(sel.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    rep_starts = np.repeat(starts[idx], sel)
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(sel) - sel, sel)
    pos = flat[rep_starts + within]
    return np.repeat(doc_pos, sel) * large + pos


def _gather_pos_payloads(ctx: _SegmentIndex, term: str, docs: np.ndarray, large: int):
    """-> (sorted keys, float32 payloads) of `term` restricted to the
    sorted candidate `docs` — the payload carried by each occurrence
    key, aligned with _gather_pos_keys (same flat-gather indices; the
    payload table is stored occurrence-aligned with positions)."""
    tdocs, _, _ = ctx.postings(term)
    z = np.zeros(0, dtype=np.int64)
    if len(tdocs) == 0 or len(docs) == 0:
        return z, z.astype(np.float32)
    idx = np.searchsorted(tdocs, docs)
    ok = (idx < len(tdocs)) & (tdocs[np.minimum(idx, len(tdocs) - 1)] == docs)
    idx = idx[ok]
    doc_pos = np.where(ok)[0]
    flat, starts, lens = ctx.flat_positions(term)
    pvals, _pstarts, _plens = ctx.flat_payloads(term)
    sel = lens[idx]
    total = int(sel.sum())
    if total == 0:
        return z, z.astype(np.float32)
    rep_starts = np.repeat(starts[idx], sel)
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(sel) - sel, sel)
    gather = rep_starts + within
    return np.repeat(doc_pos, sel) * large + flat[gather], pvals[gather]


def _pos_key_base(ctx: _SegmentIndex, terms, span: int) -> int:
    """Key stride: > max position + span so offset-shifted keys stay
    inside their doc's block."""
    mx = 0
    for t in terms:
        flat, _, _ = ctx.flat_positions(t)
        if len(flat):
            mx = max(mx, int(flat.max()))
    return mx + span + 2


def _phrase_freqs(terms: list[str], ctx: _SegmentIndex, offsets=None):
    """-> (docs, phrase_freqs, norms): docs where the terms occur at
    consecutive positions (ExactPhraseMatcher semantics), freq = number
    of phrase occurrences. Vectorized: global position keys + np.isin
    adjacency — the whole segment's candidates advance in one numpy op
    per phrase slot. ``offsets`` (default 0..len-1) places term i at an
    explicit position offset — the gapped-phrase form NGramPhraseQuery
    rewrites to."""
    z = np.zeros(0, dtype=np.int64)
    if not all(ctx.has(t) for t in terms):
        return z, z, z
    if offsets is None:
        offsets = list(range(len(terms)))
    post = [ctx.postings(t) for t in terms]
    docs = post[0][0]
    for d, _, _ in post[1:]:
        docs = docs[np.isin(docs, d, assume_unique=True)]
    if len(docs) == 0:
        return z, z, z
    large = _pos_key_base(ctx, terms, int(offsets[-1]) + 1)
    cand = _gather_pos_keys(ctx, terms[0], docs, large)
    for ti in range(1, len(terms)):
        nxt = _gather_pos_keys(ctx, terms[ti], docs, large)
        cand = cand[np.isin(cand + int(offsets[ti]), nxt, assume_unique=True)]
        if len(cand) == 0:
            return z, z, z
    freqs = np.bincount(cand // large, minlength=len(docs)).astype(np.int64)
    keep = freqs > 0
    docs, freqs = docs[keep], freqs[keep]
    norms = post[0][2][np.searchsorted(post[0][0], docs)]
    return docs, freqs, norms


def _sloppy_phrase_freqs(terms: list[str], slop: int, ctx: _SegmentIndex):
    """Sloppy phrase matching — the classic SloppyPhraseMatcher greedy
    (CORE/search/SloppyPhraseMatcher.java:37-78 semantics for
    non-repeating terms): offset-adjusted positions per term feed a
    min-heap; each round the lagging term advances as far as possible
    without overtaking the next-smallest, a window with
    matchLength = end - start <= slop contributes
    sloppyFreq = 1/(1+matchLength) (accumulated in float32, the Java
    `float freq` contract).

    Default path is VECTORIZED over the doc axis: every candidate doc
    runs the identical greedy, but each round's pop/advance/score is one
    batched numpy op over all still-active docs (flat position keys +
    searchsorted, the same representation as the exact-phrase kernel).
    The per-doc float32 accumulation order is unchanged, so scores are
    bit-identical to the scalar greedy. Phrases with REPEATED terms keep
    the scalar per-doc heap (documented approximation of the repeats
    machinery — rare shape, bounded work).

    -> (docs, float32 freqs, norms)
    """
    z = np.zeros(0, dtype=np.int64)
    zf = np.zeros(0, dtype=np.float32)
    if not all(ctx.has(t) for t in terms):
        return z, zf, z
    post = [ctx.postings(t) for t in terms]
    docs = post[0][0]
    for d, _, _ in post[1:]:
        docs = docs[np.isin(docs, d, assume_unique=True)]
    if len(docs) == 0:
        return z, zf, z
    if len(set(terms)) == len(terms):
        freqs = _sloppy_freqs_vectorized(terms, slop, ctx, docs, post)
    else:
        freqs = _sloppy_freqs_scalar(terms, slop, ctx, docs, post)
    keep = freqs > 0
    docs, freqs = docs[keep], freqs[keep]
    norms = post[0][2][np.searchsorted(post[0][0], docs)]
    return docs, freqs, norms


def _sloppy_freqs_vectorized(
    terms: list[str], slop: int, ctx: _SegmentIndex,
    docs: np.ndarray, post,
) -> np.ndarray:
    """Batched greedy: state matrices over (doc, term); each round is a
    handful of numpy ops over the active docs. Rounds are the sequential
    axis (bounded by the busiest doc's position count); docs are the
    parallel axis."""
    k = len(terms)
    D = len(docs)
    # per-term flat arrays over the candidate docs, as GLOBAL sorted keys
    # doc_index*stride + adjusted_pos + k (the +k keeps pos-ti >= 0)
    stride = _pos_key_base(ctx, terms, 2 * k) + k
    flat_adj: list[np.ndarray] = []   # adjusted positions, doc-major
    flat_keys: list[np.ndarray] = []  # global keys (sorted)
    seg_start: list[np.ndarray] = []  # per-doc segment start, global idx
    seg_end: list[np.ndarray] = []
    for ti, t in enumerate(terms):
        tdocs = post[ti][0]
        idx = np.searchsorted(tdocs, docs)  # every candidate contains t
        flat, starts, lens = ctx.flat_positions(t)
        sel = lens[idx]
        total = int(sel.sum())
        rep_starts = np.repeat(starts[idx], sel)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(sel) - sel, sel
        )
        adj = flat[rep_starts + within] - ti
        dix = np.repeat(np.arange(D, dtype=np.int64), sel)
        flat_adj.append(adj)
        flat_keys.append(dix * stride + adj + k)
        st = np.cumsum(sel) - sel
        seg_start.append(st)
        seg_end.append(st + sel)
    gptr = np.stack([seg_start[t] for t in range(k)], axis=1)  # (D, k)
    cur = np.stack(
        [flat_adj[t][seg_start[t]] for t in range(k)], axis=1
    )  # (D, k) current adjusted positions
    end = cur.max(axis=1)
    freq = np.zeros(D, dtype=np.float32)
    one = np.float32(1.0)
    active = np.arange(D, dtype=np.int64)
    while len(active):
        ca = cur[active]
        ti_a = np.argmin(ca, axis=1)  # ties -> smallest term index,
        # matching heapq's (pos, ti) tuple order
        pos_a = ca[np.arange(len(active)), ti_a]
        if k == 1:
            nxt_a = pos_a
        else:
            nxt_a = np.partition(ca, 1, axis=1)[:, 1]
        start_a = np.empty(len(active), dtype=np.int64)
        done_a = np.zeros(len(active), dtype=bool)
        newpos_a = np.zeros(len(active), dtype=np.int64)
        jg_a = np.zeros(len(active), dtype=np.int64)
        for t in range(k):
            m = np.where(ti_a == t)[0]
            if len(m) == 0:
                continue
            d_m = active[m]
            # index after the last element <= nxt within doc's segment
            jg = np.searchsorted(
                flat_keys[t], d_m * stride + nxt_a[m] + k, side="right"
            )
            jg_a[m] = jg
            start_a[m] = flat_adj[t][jg - 1]  # jg-1 >= gptr (pos<=nxt)
            dn = jg >= seg_end[t][d_m]
            done_a[m] = dn
            nd = ~dn
            newpos_a[m[nd]] = flat_adj[t][jg[nd]]
        ml_a = end[active] - start_a
        hit = ml_a <= slop
        if hit.any():
            contrib = one / (1 + ml_a[hit]).astype(np.float32)
            freq[active[hit]] += contrib
        alive = ~done_a
        d_al = active[alive]
        cur[d_al, ti_a[alive]] = newpos_a[alive]
        gptr[d_al, ti_a[alive]] = jg_a[alive]
        end[d_al] = np.maximum(end[d_al], newpos_a[alive])
        active = d_al
    return freq


def _sloppy_freqs_scalar(
    terms: list[str], slop: int, ctx: _SegmentIndex,
    docs: np.ndarray, post,
) -> np.ndarray:
    """Per-doc heap greedy — kept for repeated-term phrases only."""
    import heapq

    pos_lists = [ctx.positions(t) for t in terms]
    idxs = [np.searchsorted(post[i][0], docs) for i in range(len(terms))]
    freqs = np.zeros(len(docs), dtype=np.float32)
    one = np.float32(1.0)
    for di in range(len(docs)):
        lists = [
            pos_lists[ti][idxs[ti][di]].astype(np.int64) - ti
            for ti in range(len(terms))
        ]
        ptrs = [0] * len(terms)
        heap = [(int(lists[ti][0]), ti) for ti in range(len(terms))]
        heapq.heapify(heap)
        end = max(p for p, _ in heap)
        freq = np.float32(0.0)
        done = False
        while not done:
            pos, ti = heapq.heappop(heap)
            start = pos
            nxt = heap[0][0] if heap else pos
            while True:
                ptrs[ti] += 1
                if ptrs[ti] >= len(lists[ti]):
                    done = True
                    break
                pos = int(lists[ti][ptrs[ti]])
                if pos <= nxt:
                    start = pos
                    continue
                break
            match_length = end - start
            if match_length <= slop:
                freq = np.float32(freq + one / np.float32(1 + match_length))
            if not done:
                end = max(end, pos)
                heapq.heappush(heap, (pos, ti))
        freqs[di] = freq
    return freqs


def _multi_phrase_freqs(slots, ctx: _SegmentIndex):
    """MultiPhraseQuery matching: per-slot union of term
    postings/positions, then exact-adjacency intersection
    (MultiPhraseQuery.java UnionPostings semantics).
    -> (docs, freqs, norms)."""
    z = np.zeros(0, dtype=np.int64)
    if not all(any(ctx.has(t) for t in slot) for slot in slots):
        return z, z, z
    # candidate docs: per slot, union of the slot's term docs; intersect
    slot_docs = []
    for slot in slots:
        ds = [ctx.postings(t)[0] for t in slot if ctx.has(t)]
        slot_docs.append(np.unique(np.concatenate(ds)) if ds else z)
    docs = slot_docs[0]
    for d in slot_docs[1:]:
        docs = docs[np.isin(docs, d, assume_unique=True)]
    if len(docs) == 0:
        return z, z, z
    # per-slot union of position keys over the slot's terms, then one
    # vectorized adjacency pass (UnionPostings semantics, no per-doc loop)
    all_terms = [t for slot in slots for t in slot if ctx.has(t)]
    large = _pos_key_base(ctx, all_terms, len(slots))
    slot_keys: list[np.ndarray] = []
    for slot in slots:
        parts = [
            _gather_pos_keys(ctx, t, docs, large) for t in slot if ctx.has(t)
        ]
        keys = (
            np.unique(np.concatenate(parts))
            if parts
            else np.zeros(0, dtype=np.int64)
        )
        slot_keys.append(keys)
    cand = slot_keys[0]
    for si in range(1, len(slots)):
        cand = cand[np.isin(cand + si, slot_keys[si], assume_unique=True)]
        if len(cand) == 0:
            return z, z, z
    freqs = np.bincount(cand // large, minlength=len(docs)).astype(np.int64)
    keep = freqs > 0
    docs, freqs = docs[keep], freqs[keep]
    if len(docs) == 0:
        return z, z, z
    # norms are per-doc (identical for every term of the doc), gathered
    # from whichever slot-0 term contains the doc
    norms = np.zeros(len(docs), dtype=np.int64)
    remaining = np.ones(len(docs), dtype=bool)
    for t in slots[0]:
        if not ctx.has(t) or not remaining.any():
            break
        tdocs, _, tnorms = ctx.postings(t)
        sel = np.searchsorted(tdocs, docs)
        ok = (
            remaining
            & (sel < len(tdocs))
            & (tdocs[np.minimum(sel, len(tdocs) - 1)] == docs)
        )
        norms[ok] = tnorms[sel[ok]]
        remaining &= ~ok
    return docs, freqs, norms


def _eval_multi_phrase(node: dict, ctx: _SegmentIndex):
    docs, freqs, norms = _multi_phrase_freqs(node["slots"], ctx)
    if len(docs) == 0:
        return docs, docs.astype(np.float32)
    return docs, node["scorer"].score(freqs, norms)


def _make_multi_phrase_freq_fn(slots, fmt: str = "for104"):
    """Per-segment (doc_id, freq, norm_code) extractor for the sql64
    multi-phrase path."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = _SegmentIndex(pdf, fmt=fmt)
        docs, freqs, norms = _multi_phrase_freqs(
            tuple(tuple(s) for s in slots), ctx
        )
        return pd.DataFrame(
            {"doc_id": docs.astype(np.int64), "freq": freqs.astype(np.int32),
             "norm_code": norms.astype(np.int32)}
        )

    return fn


def _make_near_fn(term_a: str, term_b: str, window: int, ordered: bool,
                  fmt: str = "for104"):
    """Per-segment (doc_id) extractor for the sql64 NEAR path."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = _SegmentIndex(pdf, fmt=fmt)
        node = {"terms": [term_a, term_b], "window": window,
                "ordered": ordered, "weight": 1.0}
        docs, _ = _eval_near(node, ctx)
        return pd.DataFrame({"doc_id": docs.astype(np.int64)})

    return fn


def _eval_near(node: dict, ctx: _SegmentIndex):
    """NEAR(a, b, window, ordered): constant-score proximity matching
    (Intervals.ordered/unordered with maxwidth, intervals module role)."""
    z = np.zeros(0, dtype=np.int64)
    zf = z.astype(np.float32)
    ta, tb = node["terms"]
    if not (ctx.has(ta) and ctx.has(tb)):
        return z, zf
    da, _, _ = ctx.postings(ta)
    db, _, _ = ctx.postings(tb)
    docs = da[np.isin(da, db, assume_unique=True)]
    if len(docs) == 0:
        return z, zf
    window = int(node["window"])
    ordered = node["ordered"]
    # vectorized over the whole segment: global position keys keep doc
    # alignment (stride > max_pos + window, so pa+window never crosses
    # into the next doc's key block)
    large = _pos_key_base(ctx, [ta, tb], window)
    ka = _gather_pos_keys(ctx, ta, docs, large)
    kb = _gather_pos_keys(ctx, tb, docs, large)

    def _hit_docs(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
        # exists dst - src in [1, window]; keys are sorted
        lo = np.searchsorted(dst, src + 1, side="left")
        hi = np.searchsorted(dst, src + window, side="right")
        return np.unique(src[hi > lo] // large)

    hit = _hit_docs(ka, kb)
    if not ordered:
        hit = np.union1d(hit, _hit_docs(kb, ka))
    if len(hit) == 0:
        return z, zf
    docs = docs[hit]
    return docs, np.full(len(docs), np.float32(node["weight"]), dtype=np.float32)


# --------------------------------------------------------------------------
# intervals (queries/intervals minimal-interval semantics, vectorized)
# --------------------------------------------------------------------------


def _minimalize_intervals(s: np.ndarray, e: np.ndarray):
    """Keep only minimal intervals (no other interval nested inside —
    IntervalIterator contract). Inputs sorted by start with ends
    non-decreasing; an interval is non-minimal iff the next one shares
    its end (then the next has a larger start inside it), so keep the
    LAST start per distinct end."""
    if len(s) == 0:
        return s, e
    keep = np.ones(len(s), dtype=bool)
    keep[:-1] = e[:-1] != e[1:]
    return s[keep], e[keep]


def _intervals_chain_ordered(subs, large: int):
    """Ordered combination: each child's interval starts strictly after
    the previous child interval's end (OrderedIntervalsSource). Child
    interval lists are minimal => starts and ends both increase, so the
    first child interval starting after X carries the minimal end —
    one searchsorted per child, whole segment at once."""
    s0, e0 = subs[0]
    if len(s0) == 0:
        return s0, e0
    cur_e = e0.copy()
    valid = np.ones(len(s0), dtype=bool)
    sentinel = np.int64(2**62)
    for cs, ce in subs[1:]:
        if len(cs) == 0:
            return s0[:0], e0[:0]
        probe = np.where(valid, cur_e, sentinel) + 1
        idx = np.searchsorted(cs, probe, side="left")
        ok = idx < len(cs)
        sel = np.minimum(idx, len(cs) - 1)
        ok &= (cs[sel] // large) == (s0 // large)  # stay in the doc
        valid &= ok
        cur_e = np.where(valid, ce[sel], cur_e)
    return s0[valid], cur_e[valid]


def _intervals_cover_unordered(subs, large: int):
    """Unordered combination (UnorderedIntervalsSource, overlaps
    allowed): candidate span start = some child-interval start (else it
    could shrink); span end = max over children of the end of their
    first interval starting >= the anchor."""
    anchors = np.unique(np.concatenate([s for s, _ in subs]))
    if len(anchors) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    e = anchors.copy()
    valid = np.ones(len(anchors), dtype=bool)
    for cs, ce in subs:
        if len(cs) == 0:
            return anchors[:0], anchors[:0]
        idx = np.searchsorted(cs, anchors, side="left")
        ok = idx < len(cs)
        sel = np.minimum(idx, len(cs) - 1)
        ok &= (cs[sel] // large) == (anchors // large)
        valid &= ok
        e = np.maximum(e, np.where(ok, ce[sel], e))
    return anchors[valid], e[valid]


def _intervals_candidates(src, ctx: _SegmentIndex) -> np.ndarray:
    """Docs that could possibly match `src` — structure-aware:
    intersection for ordered/unordered/contain combinators, count >= n
    for atLeast (MinimumShouldMatch semantics doesn't need every term)."""
    z = np.zeros(0, dtype=np.int64)
    if isinstance(src, Q.ITerm):
        return ctx.postings(src.term)[0] if ctx.has(src.term) else z
    if isinstance(src, (Q.IOrdered, Q.IUnordered)):
        out = None
        for c in src.sources:
            d = _intervals_candidates(c, ctx)
            out = d if out is None else out[np.isin(out, d, assume_unique=True)]
            if len(out) == 0:
                return z
        return out if out is not None else z
    if isinstance(src, Q.IAtLeast):
        ds = [_intervals_candidates(c, ctx) for c in src.sources]
        if src.n > len(ds):
            return z
        alld = np.concatenate(ds) if ds else z
        if len(alld) == 0:
            return z
        uniq, counts = np.unique(alld, return_counts=True)
        return uniq[counts >= src.n]
    if isinstance(src, (Q.IContainedBy, Q.IContaining)):
        a = _intervals_candidates(src.small, ctx)
        b = _intervals_candidates(src.big, ctx)
        return a[np.isin(a, b, assume_unique=True)]
    if isinstance(src, Q.IExtend):
        return _intervals_candidates(src.source, ctx)
    if isinstance(src, (Q.IBefore, Q.IAfter, Q.IOverlapping)):
        a = _intervals_candidates(src.source, ctx)
        b = _intervals_candidates(src.reference, ctx)
        return a[np.isin(a, b, assume_unique=True)]
    if isinstance(src, Q.INonOverlapping):
        # docs with no reference at all still match on source alone
        return _intervals_candidates(src.source, ctx)
    if isinstance(src, Q.INotContaining):
        return _intervals_candidates(src.big, ctx)
    if isinstance(src, Q.IPhrase):
        out = None
        for c in src.sources:
            d = _intervals_candidates(c, ctx)
            out = d if out is None else out[np.isin(out, d, assume_unique=True)]
            if len(out) == 0:
                return z
        return out if out is not None else z
    raise TypeError(type(src).__name__)


def _intervals_eval(src, ctx: _SegmentIndex, docs: np.ndarray, large: int):
    """-> (starts, ends) minimal-interval key arrays, sorted by start,
    restricted to the candidate docs."""
    if isinstance(src, Q.ITerm):
        if not ctx.has(src.term):
            z = np.zeros(0, dtype=np.int64)
            return z, z
        k = _gather_pos_keys(ctx, src.term, docs, large)
        return k, k
    if isinstance(src, Q.IAtLeast):
        subs = [_intervals_eval(c, ctx, docs, large) for c in src.sources]
        z = np.zeros(0, dtype=np.int64)
        if src.n > len(subs):
            return z, z
        starts_all = [s for s, _ in subs if len(s)]
        if not starts_all:
            return z, z
        anchors = np.unique(np.concatenate(starts_all))
        INF = np.int64(2**62)
        ends = np.full((len(subs), len(anchors)), INF, dtype=np.int64)
        for ci, (cs, ce) in enumerate(subs):
            if len(cs) == 0:
                continue
            idx = np.searchsorted(cs, anchors, side="left")
            ok = idx < len(cs)
            sel = np.minimum(idx, len(cs) - 1)
            ok &= (cs[sel] // large) == (anchors // large)
            ends[ci, ok] = ce[sel][ok]
        # span end = n-th smallest per-child minimal end at this anchor
        nth = np.partition(ends, src.n - 1, axis=0)[src.n - 1]
        valid = nth < INF
        s, e = anchors[valid], nth[valid]
        s, e = _minimalize_intervals(s, e)
        if src.max_width >= 0:
            keep = (e - s + 1) <= src.max_width
            s, e = s[keep], e[keep]
        return s, e
    if isinstance(src, (Q.IOrdered, Q.IUnordered)):
        subs = [_intervals_eval(c, ctx, docs, large) for c in src.sources]
        if isinstance(src, Q.IOrdered):
            s, e = _intervals_chain_ordered(subs, large)
        else:
            s, e = _intervals_cover_unordered(subs, large)
        s, e = _minimalize_intervals(s, e)
        width = e - s + 1
        if src.max_width >= 0:
            keep = width <= src.max_width
            s, e, width = s[keep], e[keep], width[keep]
        if src.max_gaps >= 0:
            if not all(isinstance(c, Q.ITerm) for c in src.sources):
                raise NotImplementedError(
                    "max_gaps is supported for term children only "
                    "(gaps = width - n_terms, Intervals.maxgaps)"
                )
            keep = (width - len(src.sources)) <= src.max_gaps
            s, e = s[keep], e[keep]
        return s, e
    if isinstance(src, Q.IContainedBy):
        ss, se = _intervals_eval(src.small, ctx, docs, large)
        bs, be = _intervals_eval(src.big, ctx, docs, large)
        if len(ss) == 0 or len(bs) == 0:
            return ss[:0], ss[:0]
        # big minimal => bs and be both increase, so the LAST big
        # interval with bs <= ss has the largest end among candidates
        idx = np.searchsorted(bs, ss, side="right") - 1
        ok = idx >= 0
        sel = np.maximum(idx, 0)
        ok &= (bs[sel] // large) == (ss // large)
        ok &= be[sel] >= se
        return ss[ok], se[ok]
    if isinstance(src, Q.IContaining):
        bs, be = _intervals_eval(src.big, ctx, docs, large)
        ss, se = _intervals_eval(src.small, ctx, docs, large)
        if len(ss) == 0 or len(bs) == 0:
            return bs[:0], bs[:0]
        # small minimal => the FIRST small interval with ss >= bs has
        # the smallest end
        idx = np.searchsorted(ss, bs, side="left")
        ok = idx < len(ss)
        sel = np.minimum(idx, len(ss) - 1)
        ok &= (ss[sel] // large) == (bs // large)
        ok &= se[sel] <= be
        return bs[ok], be[ok]
    if isinstance(src, Q.IExtend):
        s0, e0 = _intervals_eval(src.source, ctx, docs, large)
        if len(s0) == 0:
            return s0, e0
        # clamp the left extension at the doc boundary; NOT minimalized
        # (Intervals.extend keeps overlapping envelopes); starts and
        # ends both stay non-decreasing, which parents rely on
        pos = s0 % large
        s = s0 - np.minimum(pos, np.int64(src.before))
        e = e0 + np.int64(src.after)
        return s, e
    if isinstance(src, (Q.IBefore, Q.IAfter, Q.IOverlapping,
                        Q.INonOverlapping)):
        ss, se = _intervals_eval(src.source, ctx, docs, large)
        rs, re_ = _intervals_eval(src.reference, ctx, docs, large)
        if len(ss) == 0:
            return ss, se
        doc = ss // large
        if isinstance(src, Q.IBefore):
            if len(rs) == 0:
                return ss[:0], se[:0]
            # max reference start in the doc must exceed the source end
            hib = np.searchsorted(rs, (doc + 1) * large, side="left") - 1
            ok = hib >= 0
            sel = np.maximum(hib, 0)
            ok &= (rs[sel] // large) == doc
            ok &= rs[sel] > se
            return ss[ok], se[ok]
        if isinstance(src, Q.IAfter):
            if len(rs) == 0:
                return ss[:0], se[:0]
            # min reference end in the doc (ends non-decreasing =>
            # first interval of the doc) must precede the source start
            idx = np.searchsorted(rs, doc * large, side="left")
            ok = idx < len(rs)
            sel = np.minimum(idx, len(rs) - 1)
            ok &= (rs[sel] // large) == doc
            ok &= re_[sel] < ss
            return ss[ok], se[ok]
        # overlap test: among references with start <= source end, the
        # LAST one (max end, ends non-decreasing) decides
        if len(rs) == 0:
            overlap = np.zeros(len(ss), dtype=bool)
        else:
            idx = np.searchsorted(rs, se, side="right") - 1
            ok0 = idx >= 0
            sel = np.maximum(idx, 0)
            ok0 &= (rs[sel] // large) == doc
            overlap = ok0 & (re_[sel] >= ss)
        keep = overlap if isinstance(src, Q.IOverlapping) else ~overlap
        return ss[keep], se[keep]
    if isinstance(src, Q.INotContaining):
        bs, be = _intervals_eval(src.big, ctx, docs, large)
        ss, se = _intervals_eval(src.small, ctx, docs, large)
        if len(bs) == 0:
            return bs, be
        if len(ss) == 0:
            return bs, be
        idx = np.searchsorted(ss, bs, side="left")
        ok = idx < len(ss)
        sel = np.minimum(idx, len(ss) - 1)
        ok &= (ss[sel] // large) == (bs // large)
        contained = ok & (se[sel] <= be)
        return bs[~contained], be[~contained]
    if isinstance(src, Q.IPhrase):
        if not all(isinstance(c, Q.ITerm) for c in src.sources):
            raise NotImplementedError(
                "Intervals.phrase is supported for term children only"
            )
        subs = [_intervals_eval(c, ctx, docs, large) for c in src.sources]
        s, e = _intervals_chain_ordered(subs, large)
        s, e = _minimalize_intervals(s, e)
        keep = (e - s + 1) == len(src.sources)  # zero gaps
        return s[keep], e[keep]
    raise TypeError(f"unknown intervals source {type(src).__name__}")


def _intervals_span(src) -> int:
    """Upper bound on any width filter in the tree (for the key stride)."""
    mx = 1
    if isinstance(src, (Q.IOrdered, Q.IUnordered)):
        own = max(src.max_width, src.max_gaps + len(src.sources), 1)
        mx = max(own, *(_intervals_span(c) for c in src.sources))
    elif isinstance(src, Q.IAtLeast):
        mx = max(src.max_width, 1, *(_intervals_span(c) for c in src.sources))
    elif isinstance(src, Q.IContainedBy):
        mx = max(_intervals_span(src.small), _intervals_span(src.big))
    elif isinstance(src, Q.IContaining):
        mx = max(_intervals_span(src.small), _intervals_span(src.big))
    elif isinstance(src, Q.IExtend):
        mx = _intervals_span(src.source) + src.before + src.after
    elif isinstance(src, (Q.IBefore, Q.IAfter, Q.IOverlapping,
                          Q.INonOverlapping)):
        mx = max(_intervals_span(src.source), _intervals_span(src.reference))
    elif isinstance(src, Q.INotContaining):
        mx = max(_intervals_span(src.big), _intervals_span(src.small))
    elif isinstance(src, Q.IPhrase):
        mx = max(len(src.sources), *(_intervals_span(c) for c in src.sources))
    return mx


def _eval_intervals(node: dict, ctx: _SegmentIndex):
    """Matching docs of an IntervalQuery (constant score)."""
    z = np.zeros(0, dtype=np.int64)
    zf = z.astype(np.float32)
    terms = node["terms"]
    src = node["source"]
    docs = _intervals_candidates(src, ctx)
    if len(docs) == 0:
        return z, zf
    large = _pos_key_base(ctx, terms, _intervals_span(src) + len(terms))
    s, _e = _intervals_eval(src, ctx, docs, large)
    if len(s) == 0:
        return z, zf
    docs = docs[np.unique(s // large)]
    return docs, np.full(len(docs), np.float32(node["weight"]), dtype=np.float32)


def _make_intervals_fn(source, terms: list[str], fmt: str = "for104"):
    """Per-segment (doc_id) extractor for the sql64 intervals path."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = _SegmentIndex(pdf, fmt=fmt)
        node = {"terms": list(terms), "source": source, "weight": 1.0}
        docs, _ = _eval_intervals(node, ctx)
        return pd.DataFrame({"doc_id": docs.astype(np.int64)})

    return fn


# --------------------------------------------------------------------------
# spans (queries/spans): every match enumerated, sloppy-weighted freq
# --------------------------------------------------------------------------


# separator for field-qualified term keys ("field\x01term") — the
# FieldMaskingSpanQuery plumbing: masked subtrees evaluate against their
# real field's postings inside a single span tree. \x01 cannot occur in
# analyzed terms.
FIELD_SEP = "\x01"


def _map_interval_children(src, fn):
    """Rebuild an IntervalsSource with fn applied to every child source
    (fields are introspected, so every combinator shape is covered)."""
    import dataclasses

    kw = {}
    changed = False
    for f in dataclasses.fields(src):
        v = getattr(src, f.name)
        if isinstance(v, Q.IntervalsSource):
            nv = fn(v)
            kw[f.name] = nv
            changed |= nv is not v
        elif isinstance(v, tuple) and v and all(
            isinstance(x, Q.IntervalsSource) for x in v
        ):
            nv = tuple(fn(x) for x in v)
            kw[f.name] = nv
            changed |= nv != v
    return dataclasses.replace(src, **kw) if changed else src


def _expand_interval_multiterms(src, reader, field: str):
    """Desugar IMultiTerm leaves (MultiTermIntervalsSource) via the term
    dictionary: -> atLeast(1, ITerm expansions) == Intervals.or. An
    empty expansion becomes an impossible term, so the structure-aware
    absence handling applies (fatal inside ordered/unordered, tolerated
    by an enclosing atLeast). IFixField subtrees expand under THEIR
    field."""
    import dataclasses

    if isinstance(src, Q.IFixField):
        return dataclasses.replace(
            src,
            source=_expand_interval_multiterms(src.source, reader, src.field),
        )
    if isinstance(src, Q.IMultiTerm):
        mq = src.query
        if getattr(mq, "field", None) != field:
            mq = dataclasses.replace(mq, field=field)
        terms = sorted(reader.expand(mq))
        if len(terms) > src.max_expansions:
            raise Q.TooManyClauses(
                f"interval multi-term expanded to {len(terms)} > "
                f"{src.max_expansions} terms"
            )
        if not terms:
            return Q.ITerm("\x00-none-\x00")
        if len(terms) == 1:
            return Q.ITerm(terms[0])
        return Q.IAtLeast(tuple(Q.ITerm(t) for t in terms), n=1)
    return _map_interval_children(
        src, lambda c: _expand_interval_multiterms(c, reader, field)
    )


def _fix_interval_fields(src):
    """Drop IFixField nodes, qualifying their subtree's plain ITerm
    leaves with the fixed field (Intervals.fixField; same postings-key
    mechanism as FieldMaskingSpanQuery)."""
    if isinstance(src, Q.IFixField):
        return _qualify_interval_terms(
            _fix_interval_fields(src.source), src.field
        )
    return _map_interval_children(src, _fix_interval_fields)


def _qualify_interval_terms(src, field: str):
    import dataclasses

    if isinstance(src, Q.ITerm):
        if FIELD_SEP in src.term:
            return src  # inner fixField already bound it
        return dataclasses.replace(src, term=field + FIELD_SEP + src.term)
    return _map_interval_children(
        src, lambda c: _qualify_interval_terms(c, field)
    )


def _qualify_leaves(src, field: str):
    """Rewrite every PLAIN SpanTerm leaf to its field-qualified form
    (already-qualified leaves — from a masked subtree — are left
    alone). Used whenever a span tree mixes fields, so every postings
    lookup in the kernels is unambiguous."""
    import dataclasses

    if isinstance(src, Q.SpanTerm):
        if FIELD_SEP in src.term:
            return src
        return dataclasses.replace(src, term=field + FIELD_SEP + src.term)
    if isinstance(src, (Q.SpanNear, Q.SpanOr)):
        return dataclasses.replace(
            src, clauses=tuple(_qualify_leaves(c, field) for c in src.clauses)
        )
    if isinstance(src, Q.SpanNot):
        return dataclasses.replace(
            src,
            include=_qualify_leaves(src.include, field),
            exclude=_qualify_leaves(src.exclude, field),
        )
    if isinstance(src, (Q.SpanFirst, Q.SpanPositionRange)):
        return dataclasses.replace(src, match=_qualify_leaves(src.match, field))
    if isinstance(src, (Q.SpanContaining, Q.SpanWithin)):
        return dataclasses.replace(
            src,
            big=_qualify_leaves(src.big, field),
            little=_qualify_leaves(src.little, field),
        )
    if isinstance(src, Q.SpanPayloadCheck):
        return dataclasses.replace(src, match=_qualify_leaves(src.match, field))
    raise TypeError(type(src).__name__)


def _span_has_masking(src) -> bool:
    if isinstance(src, Q.SpanFieldMasking):
        return True
    if isinstance(src, (Q.SpanNear, Q.SpanOr)):
        return any(_span_has_masking(c) for c in src.clauses)
    if isinstance(src, Q.SpanNot):
        return _span_has_masking(src.include) or _span_has_masking(src.exclude)
    if isinstance(src, (Q.SpanFirst, Q.SpanPositionRange)):
        return _span_has_masking(src.match)
    if isinstance(src, (Q.SpanContaining, Q.SpanWithin)):
        return _span_has_masking(src.big) or _span_has_masking(src.little)
    if isinstance(src, Q.SpanPayloadCheck):
        return _span_has_masking(src.match)
    return False


def _field_term_stats(reader, default_field: str, terms) -> dict:
    """term_stats over a mixed plain / field-qualified term list, keyed
    by the INCOMING term strings (qualified terms resolve against their
    real field — FieldMaskingSpanQuery.java:63-65's 'term statistics of
    the real field')."""
    buckets: dict[str, list[tuple[str, str]]] = {}
    for t in terms:
        f, _, raw = (
            t.partition(FIELD_SEP) if FIELD_SEP in t else (default_field, "", t)
        )
        buckets.setdefault(f, []).append((t, raw))
    out: dict = {}
    for f, pairs in buckets.items():
        st = reader.term_stats(f, sorted({raw for _t, raw in pairs}))
        for t, raw in pairs:
            if raw in st:
                out[t] = st[raw]
    return out


def _expand_span_source(src, reader, field: str):
    """Replace SpanMulti nodes with SpanOr-of-SpanTerm over the term
    dictionary (SpanMultiTermQueryWrapper.java's SpanOrQuery rewrite /
    surround SpanNearClauseFactory.java). Runs once at compile time on
    the driver; the per-segment kernels only ever see concrete terms.
    A pattern matching nothing becomes an empty SpanOr (matches no
    spans, kills enclosing conjunctions, is neutral under SpanOr)."""
    import dataclasses

    if isinstance(src, Q.SpanMulti):
        iq = dataclasses.replace(src.query, field=field)
        terms = reader.expand(iq)
        return Q.SpanOr(tuple(Q.SpanTerm(t) for t in terms))
    if isinstance(src, (Q.SpanNear, Q.SpanOr)):
        clauses = tuple(
            _expand_span_source(c, reader, field) for c in src.clauses
        )
        return dataclasses.replace(src, clauses=clauses)
    if isinstance(src, Q.SpanNot):
        return dataclasses.replace(
            src,
            include=_expand_span_source(src.include, reader, field),
            exclude=_expand_span_source(src.exclude, reader, field),
        )
    if isinstance(src, (Q.SpanFirst, Q.SpanPositionRange)):
        return dataclasses.replace(
            src, match=_expand_span_source(src.match, reader, field)
        )
    if isinstance(src, (Q.SpanContaining, Q.SpanWithin)):
        return dataclasses.replace(
            src,
            big=_expand_span_source(src.big, reader, field),
            little=_expand_span_source(src.little, reader, field),
        )
    if isinstance(src, Q.SpanPayloadCheck):
        return dataclasses.replace(
            src, match=_expand_span_source(src.match, reader, field)
        )
    if isinstance(src, Q.SpanFieldMasking):
        # evaluate the masked subtree against its REAL field: expand
        # there, qualify its leaves, and drop the wrapper — the masking
        # is fully applied at compile time
        return _qualify_leaves(
            _expand_span_source(src.match, reader, src.real_field),
            src.real_field,
        )
    return src


def _spans_candidates(src, ctx: _SegmentIndex) -> np.ndarray:
    """Docs that could match `src` (structure-aware, like intervals)."""
    z = np.zeros(0, dtype=np.int64)
    if isinstance(src, Q.SpanTerm):
        return ctx.postings(src.term)[0] if ctx.has(src.term) else z
    if isinstance(src, Q.SpanNear):
        out = None
        for c in src.clauses:
            d = _spans_candidates(c, ctx)
            out = d if out is None else out[np.isin(out, d, assume_unique=True)]
            if len(out) == 0:
                return z
        return out if out is not None else z
    if isinstance(src, Q.SpanOr):
        ds = [_spans_candidates(c, ctx) for c in src.clauses]
        ds = [d for d in ds if len(d)]
        return np.unique(np.concatenate(ds)) if ds else z
    if isinstance(src, Q.SpanNot):
        return _spans_candidates(src.include, ctx)
    if isinstance(src, (Q.SpanFirst, Q.SpanPositionRange)):
        return _spans_candidates(src.match, ctx)
    if isinstance(src, (Q.SpanContaining, Q.SpanWithin)):
        a = _spans_candidates(src.big, ctx)
        b = _spans_candidates(src.little, ctx)
        return a[np.isin(a, b, assume_unique=True)]
    if isinstance(src, Q.SpanPayloadCheck):
        return _spans_candidates(src.match, ctx)
    raise TypeError(type(src).__name__)


def _spans_probe_pad(src) -> int:
    """Largest positional probe beyond a real term position the
    evaluation can make (SpanNot pre/post windows, +1 ordered-chain
    probes) — sizes the key stride."""
    if isinstance(src, Q.SpanTerm):
        return 1
    if isinstance(src, Q.SpanNear):
        return max(_spans_probe_pad(c) for c in src.clauses) + 1
    if isinstance(src, Q.SpanOr):
        return max(_spans_probe_pad(c) for c in src.clauses)
    if isinstance(src, Q.SpanNot):
        return max(_spans_probe_pad(src.include),
                   _spans_probe_pad(src.exclude)) + max(src.pre, src.post)
    if isinstance(src, (Q.SpanFirst, Q.SpanPositionRange)):
        return _spans_probe_pad(src.match)
    if isinstance(src, (Q.SpanContaining, Q.SpanWithin)):
        return max(_spans_probe_pad(src.big), _spans_probe_pad(src.little))
    if isinstance(src, Q.SpanPayloadCheck):
        return _spans_probe_pad(src.match)
    raise TypeError(type(src).__name__)


def _spans_chain_ordered(subs, large: int):
    """NearSpansOrdered: anchored at EVERY span of the first clause,
    each later clause contributes its first span (in (start, end)
    order) starting after the previous clause's end. width = summed
    in-between gaps (NearSpansOrdered.java matchWidth)."""
    s0, e0, _ = subs[0]
    z = np.zeros(0, dtype=np.int64)
    if len(s0) == 0:
        return z, z, z
    cur_e = e0.copy()
    gaps = np.zeros(len(s0), dtype=np.int64)
    valid = np.ones(len(s0), dtype=bool)
    sentinel = np.int64(2**62)
    for cs, ce, _cg in subs[1:]:
        if len(cs) == 0:
            return z, z, z
        probe = np.where(valid, cur_e, sentinel) + 1
        idx = np.searchsorted(cs, probe, side="left")
        ok = idx < len(cs)
        sel = np.minimum(idx, len(cs) - 1)
        ok &= (cs[sel] // large) == (s0 // large)
        valid &= ok
        gaps = np.where(valid, gaps + cs[sel] - cur_e - 1, gaps)
        cur_e = np.where(valid, ce[sel], cur_e)
    return s0[valid], cur_e[valid], gaps[valid]


def _spans_cover_unordered(subs, large: int):
    """NearSpansUnordered: the greedy cover anchored at every child-span
    start; width = covered width minus total child span length
    (NearSpansUnordered.java totalSpanLength) — may go negative when
    children overlap."""
    starts = [s for s, _, _ in subs if len(s)]
    z = np.zeros(0, dtype=np.int64)
    if len(starts) < len(subs):
        return z, z, z
    anchors = np.unique(np.concatenate(starts))
    e = anchors.copy()
    covered = np.zeros(len(anchors), dtype=np.int64)
    valid = np.ones(len(anchors), dtype=bool)
    for cs, ce, _cg in subs:
        idx = np.searchsorted(cs, anchors, side="left")
        ok = idx < len(cs)
        sel = np.minimum(idx, len(cs) - 1)
        ok &= (cs[sel] // large) == (anchors // large)
        valid &= ok
        e = np.maximum(e, np.where(ok, ce[sel], e))
        covered += np.where(ok, ce[sel] - cs[sel] + 1, 0)
    s, e, covered = anchors[valid], e[valid], covered[valid]
    return s, e, (e - s + 1) - covered


def _span_leaf_terms(src) -> list[str]:
    """Leaf terms of a payload-checkable span tree, in span order
    (SpanTerm or in-order SpanNear trees of them — the shapes with a
    well-defined per-match leaf-position sequence)."""
    if isinstance(src, Q.SpanTerm):
        return [src.term]
    if isinstance(src, Q.SpanNear) and src.in_order:
        return [t for c in src.clauses for t in _span_leaf_terms(c)]
    raise TypeError(
        f"payload span queries need SpanTerm or in-order SpanNear trees, "
        f"got {type(src).__name__}"
    )


def _spans_eval_leaves(src, ctx: _SegmentIndex, docs: np.ndarray, large: int):
    """Tracked variant of _spans_eval for payload queries ->
    (starts, ends, gaps, leaves): leaves is one int64 key array per
    leaf position (span order), each aligned with starts — the exact
    occurrence each leaf matched, so its stored payload can be looked
    up. Same matching semantics as _spans_eval's SpanTerm /
    in-order-SpanNear branches, with per-clause selections recorded."""
    z = np.zeros(0, dtype=np.int64)
    if isinstance(src, Q.SpanTerm):
        if not ctx.has(src.term):
            return z, z, z, [z]
        k = _gather_pos_keys(ctx, src.term, docs, large)
        return k, k, np.zeros(len(k), dtype=np.int64), [k]
    if isinstance(src, Q.SpanNear) and src.in_order:
        subs = [_spans_eval_leaves(c, ctx, docs, large) for c in src.clauses]
        n_leaves = sum(len(s[3]) for s in subs)
        s0, e0, _, leaves0 = subs[0]
        if len(s0) == 0 or any(len(cs) == 0 for cs, _, _, _ in subs[1:]):
            return z, z, z, [z] * n_leaves
        cur_e = e0.copy()
        gaps = np.zeros(len(s0), dtype=np.int64)
        valid = np.ones(len(s0), dtype=bool)
        sentinel = np.int64(2**62)
        sels: list[np.ndarray] = []
        for cs, ce, _cg, _cl in subs[1:]:
            probe = np.where(valid, cur_e, sentinel) + 1
            idx = np.searchsorted(cs, probe, side="left")
            ok = idx < len(cs)
            sel = np.minimum(idx, len(cs) - 1)
            ok &= (cs[sel] // large) == (s0 // large)
            valid &= ok
            gaps = np.where(valid, gaps + cs[sel] - cur_e - 1, gaps)
            cur_e = np.where(valid, ce[sel], cur_e)
            sels.append(sel)
        keep = valid & (gaps <= src.slop)
        leaves = [a[keep] for a in leaves0]
        for (_cs, _ce, _cg, cl), sel in zip(subs[1:], sels):
            leaves.extend(a[sel][keep] for a in cl)
        return s0[keep], cur_e[keep], gaps[keep], leaves
    raise TypeError(
        f"payload span queries need SpanTerm or in-order SpanNear trees, "
        f"got {type(src).__name__}"
    )


def _spans_eval(src, ctx: _SegmentIndex, docs: np.ndarray, large: int):
    """-> (starts, ends, widths): EVERY span of `src` in the candidate
    docs, sorted lexicographically by (start, end). Unlike
    `_intervals_eval` there is no minimalization — spans feed per-match
    sloppy weights, so all matches are kept (Spans.java contract)."""
    z = np.zeros(0, dtype=np.int64)
    if isinstance(src, Q.SpanTerm):
        if not ctx.has(src.term):
            return z, z, z
        k = _gather_pos_keys(ctx, src.term, docs, large)
        return k, k, np.zeros(len(k), dtype=np.int64)
    if isinstance(src, Q.SpanNear):
        subs = [_spans_eval(c, ctx, docs, large) for c in src.clauses]
        if src.in_order:
            s, e, g = _spans_chain_ordered(subs, large)
        else:
            s, e, g = _spans_cover_unordered(subs, large)
        keep = g <= src.slop
        return s[keep], e[keep], g[keep]
    if isinstance(src, Q.SpanOr):
        parts = [_spans_eval(c, ctx, docs, large) for c in src.clauses]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return z, z, z
        s = np.concatenate([p[0] for p in parts])
        e = np.concatenate([p[1] for p in parts])
        g = np.concatenate([p[2] for p in parts])
        order = np.lexsort((e, s))
        return s[order], e[order], g[order]
    if isinstance(src, Q.SpanNot):
        s, e, g = _spans_eval(src.include, ctx, docs, large)
        if len(s) == 0:
            return s, e, g
        xs, xe, _ = _spans_eval(src.exclude, ctx, docs, large)
        if len(xs) == 0:
            return s, e, g
        doc = s // large
        lo = np.maximum(s - np.int64(src.pre), doc * large)
        hi = np.minimum(e + np.int64(src.post), (doc + 1) * large - 1)
        # prefix max of exclude ends: keys are doc-monotone, so the
        # running max resets across docs naturally (prev-doc ends are
        # all < this doc's base key <= lo)
        pmax = np.maximum.accumulate(xe)
        idx = np.searchsorted(xs, hi, side="right") - 1
        ok = idx >= 0
        sel = np.maximum(idx, 0)
        overlap = ok & (pmax[sel] >= lo)
        keep = ~overlap
        return s[keep], e[keep], g[keep]
    if isinstance(src, Q.SpanFirst):
        s, e, g = _spans_eval(src.match, ctx, docs, large)
        keep = (e % large) < np.int64(src.end)
        return s[keep], e[keep], g[keep]
    if isinstance(src, Q.SpanPositionRange):
        s, e, g = _spans_eval(src.match, ctx, docs, large)
        keep = ((s % large) >= np.int64(src.start)) & (
            (e % large) < np.int64(src.end)
        )
        return s[keep], e[keep], g[keep]
    if isinstance(src, Q.SpanContaining):
        bs, be, bg = _spans_eval(src.big, ctx, docs, large)
        ls, le, _ = _spans_eval(src.little, ctx, docs, large)
        if len(bs) == 0 or len(ls) == 0:
            return z, z, z
        # suffix min of little ends: the min end among littles starting
        # >= bs; later-doc ends are larger, so the suffix min is doc-safe
        smin = np.minimum.accumulate(le[::-1])[::-1]
        idx = np.searchsorted(ls, bs, side="left")
        ok = idx < len(ls)
        sel = np.minimum(idx, len(ls) - 1)
        contained = ok & (smin[sel] <= be)
        return bs[contained], be[contained], bg[contained]
    if isinstance(src, Q.SpanWithin):
        ls, le, lg = _spans_eval(src.little, ctx, docs, large)
        bs, be, _ = _spans_eval(src.big, ctx, docs, large)
        if len(ls) == 0 or len(bs) == 0:
            return z, z, z
        # prefix max of big ends among bigs starting <= ls (doc-safe as
        # in SpanNot)
        pmax = np.maximum.accumulate(be)
        idx = np.searchsorted(bs, ls, side="right") - 1
        ok = idx >= 0
        sel = np.maximum(idx, 0)
        within = ok & (pmax[sel] >= le)
        return ls[within], le[within], lg[within]
    if isinstance(src, Q.SpanPayloadCheck):
        s, e, g, leaves = _spans_eval_leaves(src.match, ctx, docs, large)
        if len(s) == 0:
            return z, z, z
        lt = _span_leaf_terms(src.match)
        if len(src.payloads) != len(lt):
            return z, z, z  # payload list must cover every leaf position
        keep = np.ones(len(s), dtype=bool)
        for term, key_arr, exp in zip(lt, leaves, src.payloads):
            keys, vals = _gather_pos_payloads(ctx, term, docs, large)
            at = vals[np.searchsorted(keys, key_arr)]
            keep &= at == np.float32(exp)
        return s[keep], e[keep], g[keep]
    raise TypeError(type(src).__name__)


def _span_freqs(src, ctx: _SegmentIndex, field: str | None = None):
    """-> (docs, float32 sloppy freqs, norms). freq(doc) = sum over
    matches of 1/(1 + max(width, 0)) (SpanScorer.java:116-140
    accumulating SimScorer computeSlopFactor), accumulated in float64
    and rounded to float32 once.

    ``field`` (the enclosing SpanQuery's field) orders the norm lookup
    for mixed-field (masked) trees: the doc norm is taken from a term of
    the enclosing field when one matched the doc (SpanScorer reads
    getNormValues of the top field), falling back to a masked term's
    real-field norm otherwise (documented deviation: we read norms off
    postings rows, not a per-doc DV)."""
    z = np.zeros(0, dtype=np.int64)
    docs = _spans_candidates(src, ctx)
    if len(docs) == 0:
        return z, z.astype(np.float32), z
    terms = [t for t in dict.fromkeys(src.terms()) if ctx.has(t)]
    if field is not None and any(FIELD_SEP in t for t in terms):
        pref = field + FIELD_SEP
        terms.sort(key=lambda t: 0 if (FIELD_SEP not in t or
                                       t.startswith(pref)) else 1)
    large = _pos_key_base(ctx, terms, _spans_probe_pad(src) + 2)
    s, _e, g = _spans_eval(src, ctx, docs, large)
    if len(s) == 0:
        return z, z.astype(np.float32), z
    w = 1.0 / (1.0 + np.maximum(g, 0).astype(np.float64))
    di = s // large
    ud = np.unique(di)
    freq = np.zeros(len(ud), dtype=np.float64)
    np.add.at(freq, np.searchsorted(ud, di), w)
    mdocs = docs[ud]
    norms = np.zeros(len(mdocs), dtype=np.int64)
    found = np.zeros(len(mdocs), dtype=bool)
    for t in terms:
        pd_, _f, pn = ctx.postings(t)
        idx = np.searchsorted(pd_, mdocs)
        ok = (idx < len(pd_)) & (pd_[np.minimum(idx, len(pd_) - 1)] == mdocs)
        take = ok & ~found
        norms[take] = pn[idx[take]]
        found |= ok
    return mdocs, freq.astype(np.float32), norms


def _eval_spans(node: dict, ctx: _SegmentIndex):
    docs, freqs, norms = _span_freqs(node["source"], ctx, node["field"])
    if len(docs) == 0:
        return docs, docs.astype(np.float32)
    return docs, node["scorer"].score(freqs, norms)


def _ta_step(counts: np.ndarray, dest: np.ndarray) -> np.ndarray:
    """One deterministic automaton step over instance-count vectors:
    counts (n_docs, S) -> out where out[:, dest[s]] += counts[:, s].
    Dead transitions (dest[s] == -1) drop instances. S is tiny (the
    determinized automaton), so the per-state loop vectorizes across
    docs."""
    out = np.zeros_like(counts)
    for s in np.flatnonzero(dest >= 0):
        out[:, dest[s]] += counts[:, s]
    return out


def _eval_term_automaton(node: dict, ctx: _SegmentIndex):
    """Vectorized replay of TermAutomatonScorer.countMatches
    (TermAutomatonScorer.java:215-340): walk each doc's merged query-
    term positions in order, carrying a per-DFA-state INSTANCE COUNT
    vector per doc (PosState keeps a multiset, not a set). At each
    occurrence of term t at position p with gap g from the previous
    occurrence:

      S(prev+1) = step_t(S(prev)) + step_any(S(prev)) + fresh_t
      S(p)      = step_any^(g-1)( S(prev+1) )

    (the token at prev steps BOTH its term arc and the any arc —
    countMatches' while(lastPos < pos) any-advance starts from the
    pre-step state set). freq counts instances entering an accept state
    via a TERM step only (continuing or fresh start at state 0); any
    steps never count. Rounds are the per-doc occurrence ranks, so the
    whole segment advances in one numpy pass per rank — no per-doc
    Python loop."""
    auto = node["automaton"]
    dfa = auto.dfa()
    accept = auto.accept_mask()
    terms = list(auto.terms)
    present = [i for i, t in enumerate(terms) if ctx.has(t)]
    z = np.zeros(0, dtype=np.int64)
    if not present:
        return z, z.astype(np.float32)
    docs = np.unique(
        np.concatenate([ctx.postings(terms[i])[0] for i in present])
    )
    if len(docs) == 0:
        return z, z.astype(np.float32)
    pterms = [terms[i] for i in present]
    large = _pos_key_base(ctx, pterms, 2)
    keys_parts, sym_parts = [], []
    for i in present:
        kk = _gather_pos_keys(ctx, terms[i], docs, large)
        keys_parts.append(kk)
        sym_parts.append(np.full(len(kk), i, dtype=np.int64))
    keys = np.concatenate(keys_parts)
    syms = np.concatenate(sym_parts)
    order = np.argsort(keys, kind="stable")
    keys, syms = keys[order], syms[order]
    di = keys // large
    pos = keys % large
    ud, starts_, counts_ = np.unique(di, return_index=True, return_counts=True)
    n = len(ud)
    S = auto.n_states
    A = np.zeros((n, S), dtype=np.int64)   # S(prev): pre-step instance counts
    B = np.zeros((n, S), dtype=np.int64)   # S(prev+1) minus the deferred any step
    prev_pos = np.full(n, -1, dtype=np.int64)
    freq = np.zeros(n, dtype=np.int64)
    m_any = dfa[auto.any_id] if auto.any_id >= 0 else None
    for r in range(int(counts_.max())):
        live = counts_ > r
        rows = starts_[live] + r
        dsel = np.flatnonzero(live)
        t = syms[rows]
        p = pos[rows]
        started = prev_pos[dsel] >= 0
        cur = np.zeros((len(dsel), S), dtype=np.int64)
        if started.any():
            sub = np.flatnonzero(started)
            c = B[dsel[sub]].copy()
            g = p[sub] - prev_pos[dsel[sub]]
            if m_any is not None:
                c += _ta_step(A[dsel[sub]], m_any)
                gm = 1
                while True:
                    adv = np.flatnonzero((g - 1 >= gm) & (c.sum(axis=1) > 0))
                    if len(adv) == 0:
                        break
                    c[adv] = _ta_step(c[adv], m_any)
                    gm += 1
            else:
                c[g != 1] = 0
            cur[sub] = c
        # term step + fresh start, accept entries via term arcs count
        nxt = np.zeros_like(cur)
        acc_add = np.zeros(len(dsel), dtype=np.int64)
        for s in range(S):
            d = dfa[t, s]  # per-doc dest of state s on this doc's symbol
            ok = d >= 0
            if not ok.any():
                continue
            np.add.at(nxt, (np.flatnonzero(ok), d[ok]), cur[ok, s])
            acc_add += np.where(ok & accept[np.maximum(d, 0)], cur[:, s], 0)
        d0 = dfa[t, 0]  # fresh start at state 0 (countMatches *** (2))
        ok0 = d0 >= 0
        np.add.at(nxt, (np.flatnonzero(ok0), d0[ok0]), 1)
        acc_add += (ok0 & accept[np.maximum(d0, 0)]).astype(np.int64)
        freq[dsel] += acc_add
        A[dsel] = cur
        B[dsel] = nxt
        prev_pos[dsel] = p
    matched = freq > 0
    mdocs = docs[ud[matched]]
    mfreq = freq[matched]
    if len(mdocs) == 0:
        return z, z.astype(np.float32)
    norms = np.zeros(len(mdocs), dtype=np.int64)
    found = np.zeros(len(mdocs), dtype=bool)
    for tname in pterms:
        pd_, _f, pn = ctx.postings(tname)
        idx = np.searchsorted(pd_, mdocs)
        ok = (idx < len(pd_)) & (pd_[np.minimum(idx, len(pd_) - 1)] == mdocs)
        take = ok & ~found
        norms[take] = pn[idx[take]]
        found |= ok
    return mdocs, node["scorer"].score(mfreq, norms)


def _eval_payload_score(node: dict, ctx: _SegmentIndex):
    """PayloadScorer: enumerate matching spans, aggregate the stored
    payload at every leaf position via the PayloadFunction, score =
    aggregate × boost (× the span's sloppy-freq BM25 score when
    include_span_score — PayloadScoreQuery.java:61-66)."""
    src = node["source"]
    z = np.zeros(0, dtype=np.int64)
    docs = _spans_candidates(src, ctx)
    if len(docs) == 0:
        return z, z.astype(np.float32)
    terms = [t for t in dict.fromkeys(src.terms()) if ctx.has(t)]
    large = _pos_key_base(ctx, terms, _spans_probe_pad(src) + 2)
    s, _e, g, leaves = _spans_eval_leaves(src, ctx, docs, large)
    if len(s) == 0:
        return z, z.astype(np.float32)
    lt = _span_leaf_terms(src)
    di = s // large
    ud = np.unique(di)
    n = len(ud)
    slot = np.searchsorted(ud, di)
    func = node["func"]
    if func == "min":
        agg = np.full(n, np.inf)
    elif func == "max":
        agg = np.full(n, -np.inf)
    else:
        agg = np.zeros(n)
    cnt = np.zeros(n, dtype=np.int64)
    for term, key_arr in zip(lt, leaves):
        keys, vals = _gather_pos_payloads(ctx, term, docs, large)
        v = vals[np.searchsorted(keys, key_arr)].astype(np.float64)
        if func == "min":
            np.minimum.at(agg, slot, v)
        elif func == "max":
            np.maximum.at(agg, slot, v)
        else:
            np.add.at(agg, slot, v)
        np.add.at(cnt, slot, 1)
    if func == "avg":
        agg = agg / cnt
    mdocs = docs[ud]
    if node["scorer"] is None:
        return mdocs, (agg * node["weight"]).astype(np.float32)
    # sloppy-freq span score per doc (as _span_freqs), boost included
    w = 1.0 / (1.0 + np.maximum(g, 0).astype(np.float64))
    freq = np.zeros(n, dtype=np.float64)
    np.add.at(freq, slot, w)
    norms = np.zeros(n, dtype=np.int64)
    found = np.zeros(n, dtype=bool)
    for t in terms:
        pd_, _f, pn = ctx.postings(t)
        idx = np.searchsorted(pd_, mdocs)
        ok = (idx < len(pd_)) & (pd_[np.minimum(idx, len(pd_) - 1)] == mdocs)
        take = ok & ~found
        norms[take] = pn[idx[take]]
        found |= ok
    span_scores = node["scorer"].score(freq.astype(np.float32), norms)
    return mdocs, (agg * span_scores.astype(np.float64)).astype(np.float32)


def _make_spans_freq_fn(source, fmt: str = "for104"):
    """Per-segment (doc_id, float32 sloppy freq, norm_code) extractor
    for the sql64 spans path."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = _SegmentIndex(pdf, fmt=fmt)
        docs, freqs, norms = _span_freqs(source, ctx)
        return pd.DataFrame(
            {"doc_id": docs.astype(np.int64),
             "freq": freqs.astype(np.float32),
             "norm_code": norms.astype(np.int32)}
        )

    return fn


def _eval_phrase(node: dict, ctx: _SegmentIndex):
    slop = int(node.get("slop") or 0)
    if slop > 0:
        docs, freqs, norms = _sloppy_phrase_freqs(node["terms"], slop, ctx)
    else:
        docs, freqs, norms = _phrase_freqs(
            node["terms"], ctx, node.get("offsets")
        )
    if len(docs) == 0:
        return docs, docs.astype(np.float32)
    return docs, node["scorer"].score(freqs, norms)


def _make_phrase_freq_fn(terms: list[str], fmt: str = "for104"):
    """Per-segment (doc_id, phrase_freq, norm_code) extractor for the
    sql64 phrase path — positional intersection only, no scoring."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = _SegmentIndex(pdf, fmt=fmt)
        docs, freqs, norms = _phrase_freqs(list(terms), ctx)
        return pd.DataFrame(
            {"doc_id": docs.astype(np.int64), "freq": freqs.astype(np.int32),
             "norm_code": norms.astype(np.int32)}
        )

    return fn


def _make_sloppy_phrase_freq_fn(terms: list[str], slop: int,
                                fmt: str = "for104"):
    """Per-segment (doc_id, float32 sloppyFreq, norm_code) extractor for
    the sql64 sloppy-phrase path."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = _SegmentIndex(pdf, fmt=fmt)
        docs, freqs, norms = _sloppy_phrase_freqs(list(terms), slop, ctx)
        return pd.DataFrame(
            {"doc_id": docs.astype(np.int64),
             "freq": freqs.astype(np.float32),
             "norm_code": norms.astype(np.int32)}
        )

    return fn


def _sum_f32(parts: list[np.ndarray]) -> np.ndarray:
    """Sum float32 clause scores in float64, cast to float32 (the
    DisjunctionSumScorer/ConjunctionScorer double-accumulate contract)."""
    acc = np.zeros(len(parts[0]), dtype=np.float64)
    for p in parts:
        acc += p.astype(np.float64)
    return acc.astype(np.float32)


def _eval_bool(node: dict, ctx: _SegmentIndex, k: int | None, candidates):
    must, should = node["must"], node["should"]
    must_not, filt = node["must_not"], node["filter"]
    min_should = node["min_should"]

    # ---- matched set from MUST + FILTER (rarest-first conjunction) -------
    base_docs = None
    must_scores: list[tuple[np.ndarray, np.ndarray]] = []
    if must or filt:
        # evaluate must leaves cheapest-first where they are plain terms
        ordered = sorted(
            [("m", s) for s in must] + [("f", s) for s in filt],
            key=lambda kv: _est_cost(kv[1], ctx),
        )
        for tag, sub in ordered:
            d, s = _eval(sub, ctx, None, base_docs)
            if tag == "m":
                must_scores.append((d, s))
            if base_docs is None:
                base_docs = d
            else:
                base_docs = base_docs[np.isin(base_docs, d, assume_unique=True)]
            if len(base_docs) == 0:
                z = np.zeros(0, dtype=np.int64)
                return z, z.astype(np.float32)

    # ---- SHOULD clauses ---------------------------------------------------
    sh_results = [_eval(s, ctx, None, base_docs) for s in should]

    if base_docs is None:
        # pure disjunction: docs matching >= max(1, min_should) shoulds
        need = max(1, min_should)
        if (
            k is not None
            and need == 1
            and all(s["kind"] == "term" for s in should)
            and len(should) > 1
        ):
            if node.get("strategy") == "maxscore":
                return _maxscore_disjunction(node, ctx, k)
            return _wand_disjunction(node, ctx, k)
        dall = np.concatenate([d for d, _ in sh_results]) if sh_results else np.zeros(0, np.int64)
        if len(dall) == 0:
            return dall, dall.astype(np.float32)
        uniq, inv = np.unique(dall, return_inverse=True)
        cnt = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cnt, inv, 1)
        acc = np.zeros(len(uniq), dtype=np.float64)
        sall = np.concatenate([s for _, s in sh_results]).astype(np.float64)
        np.add.at(acc, inv, sall)
        keep = cnt >= need
        docs = uniq[keep]
        scores = acc[keep].astype(np.float32)
    else:
        docs = base_docs
        # min_should among shoulds also applies when musts exist
        if min_should > 0 and sh_results:
            cnt = np.zeros(len(docs), dtype=np.int64)
            for d, _ in sh_results:
                cnt += np.isin(docs, d, assume_unique=True)
            docs = docs[cnt >= min_should]
        parts = []
        for d, s in must_scores:
            pos = np.searchsorted(d, docs)
            parts.append(s[pos])
        for d, s in sh_results:
            mask = np.isin(docs, d, assume_unique=True)
            contrib = np.zeros(len(docs), dtype=np.float32)
            if mask.any():
                pos = np.searchsorted(d, docs[mask])
                contrib[mask] = s[pos]
            parts.append(contrib)
        scores = _sum_f32(parts) if parts else np.zeros(len(docs), dtype=np.float32)

    # ---- MUST_NOT ----------------------------------------------------------
    for sub in must_not:
        d, _ = _eval(sub, ctx, None, None)
        keep = ~np.isin(docs, d, assume_unique=True)
        docs, scores = docs[keep], scores[keep]
    return docs, scores


def _est_cost(node: dict, ctx: _SegmentIndex) -> int:
    if node["kind"] in ("term", "const_set", "syn", "phrase", "multi_phrase",
                        "near", "intervals", "spans", "payload_score", "term_automaton"):
        c = 0
        for t in node["terms"]:
            for i in ctx.rows.get(t, ()):
                c += int(ctx.pdf.iloc[i]["doc_freq"])
        return c
    return 1 << 60


def _wand_disjunction(node: dict, ctx: _SegmentIndex, k: int):
    """Batch block-max pruning for a pure term disjunction.

    Upper-bounds every doc's score by the sum of its terms' block-max
    bounds (from the stored impacts), exact-scores docs in descending
    bound order, and stops when the k-th exact score >= the best
    remaining bound. Never changes surviving scores — the WANDScorer
    safety property; equality with the unpruned path is asserted in
    tests (TestWANDScorer pattern).
    """
    should = node["should"]
    # phase 0: per-term docIDs + per-doc block bound (impacts only — no
    # exact scoring yet). freq/norm arrays kept for the survivors pass.
    term_data = []
    for s in should:
        t = s["terms"][0]
        d, f, n = ctx.postings(t)
        if len(d) == 0:
            continue
        block_last, imp_f, imp_n = ctx.impacts(t)
        block_bounds = np.array(
            [
                float(s["scorer"].score(bf, bn).max()) if len(bf) else 0.0
                for bf, bn in zip(imp_f, imp_n)
            ],
            dtype=np.float64,
        )
        blk = np.searchsorted(block_last, d, side="left")
        term_data.append((d, f, n, s, block_bounds[blk]))
    if not term_data:
        z = np.zeros(0, dtype=np.int64)
        return z, z.astype(np.float32)

    # per-doc upper bound = sum over matching terms of the doc's block bound
    dall = np.concatenate([td[0] for td in term_data])
    uniq, inv = np.unique(dall, return_inverse=True)
    ub = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(ub, inv, np.concatenate([td[4] for td in term_data]))

    # phase 1: theta = k-th exact score among the top-4k docs by bound
    seed = np.argsort(-ub, kind="stable")[: max(4 * k, 64)]
    seed_docs = np.sort(uniq[seed])
    seed_scores = _exact_scores_for(term_data, seed_docs)
    if len(seed_docs) >= k:
        theta = float(np.sort(seed_scores.astype(np.float32))[::-1][k - 1])
    else:
        theta = -np.inf

    # phase 2: survivors = docs whose bound could still be competitive
    # (>= theta keeps exact ties so the doc_id ASC tie-break stays exact)
    surv_mask = ub >= theta
    surv_docs = uniq[surv_mask]
    # reuse seed scores where already computed
    extra = surv_docs[~np.isin(surv_docs, seed_docs, assume_unique=True)]
    extra_scores = _exact_scores_for(term_data, extra)
    docs_out = np.concatenate([seed_docs, extra])
    scores_out = np.concatenate([seed_scores, extra_scores])
    srt = np.argsort(docs_out)
    return docs_out[srt], scores_out[srt].astype(np.float32)


def _maxscore_disjunction(node: dict, ctx: _SegmentIndex, k: int):
    """MAXSCORE bulk scoring for a pure term disjunction — the second
    pruning strategy beside block-max WAND (MaxScoreBulkScorer.java:
    partition scorers by global max score into essential / non-essential
    at theta; only essential lists generate candidates; non-essential
    scorers are consulted only for docs whose essential-exact score plus
    the non-essential max-score sum stays competitive).

    Same safety property as WAND: every surviving doc carries its exact
    score and every doc whose exact score could reach the top-k
    threshold survives — equality with the unpruned path is asserted in
    tests."""
    should = node["should"]
    term_data = []
    for s in should:
        t = s["terms"][0]
        d, f, n = ctx.postings(t)
        if len(d) == 0:
            continue
        block_last, imp_f, imp_n = ctx.impacts(t)
        block_bounds = np.array(
            [
                float(s["scorer"].score(bf, bn).max()) if len(bf) else 0.0
                for bf, bn in zip(imp_f, imp_n)
            ],
            dtype=np.float64,
        )
        blk = np.searchsorted(block_last, d, side="left")
        term_data.append((d, f, n, s, block_bounds[blk]))
    z = np.zeros(0, dtype=np.int64)
    if not term_data:
        return z, z.astype(np.float32)

    # theta seed — identical to WAND's phase 0/1 (per-doc summed block
    # bounds pick the seed; its k-th exact score is the threshold)
    dall = np.concatenate([td[0] for td in term_data])
    uniq, inv = np.unique(dall, return_inverse=True)
    ub = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(ub, inv, np.concatenate([td[4] for td in term_data]))
    seed = np.argsort(-ub, kind="stable")[: max(4 * k, 64)]
    seed_docs = np.sort(uniq[seed])
    seed_scores = _exact_scores_for(term_data, seed_docs)
    if len(seed_docs) < k:
        srt = np.argsort(seed_docs)
        return seed_docs[srt], seed_scores[srt].astype(np.float32)
    theta = float(np.sort(seed_scores.astype(np.float32))[::-1][k - 1])

    # partition: non-essential = longest ascending-max prefix whose
    # max-score sum stays strictly below theta
    gmax = np.array([td[4].max() for td in term_data], dtype=np.float64)
    order = np.argsort(gmax, kind="stable")
    csum = np.cumsum(gmax[order])
    n_non = int(np.searchsorted(csum, theta, side="left"))
    if n_non >= len(term_data):
        n_non = len(term_data) - 1  # at least one essential list
    non_essential = [term_data[i] for i in order[:n_non]]
    essential = [term_data[i] for i in order[n_non:]]
    ne_sum = float(csum[n_non - 1]) if n_non else 0.0

    # candidates come from essential lists only: a doc seen by none of
    # them is bounded by ne_sum < theta
    cand = np.unique(np.concatenate([td[0] for td in essential]))
    ess_scores = _exact_scores_for(essential, cand).astype(np.float64)
    # one float32 ulp of slack: the essential partial was rounded to
    # float32 once, which must never evict an exact-theta tie
    thresh = float(np.nextafter(np.float32(theta), np.float32(-np.inf)))
    cand = cand[ess_scores + ne_sum >= thresh]
    # survivors re-score over ALL terms in one pass: float64 accumulate,
    # one float32 cast — bit-identical to the unpruned / WAND paths
    return cand, _exact_scores_for(term_data, cand)


def _exact_scores_for(term_data, docs: np.ndarray) -> np.ndarray:
    """Exact float32-per-term scores (summed float64, cast) for the given
    sorted doc set only — the 'score only survivors' half of block-max."""
    if len(docs) == 0:
        return np.zeros(0, dtype=np.float32)
    acc = np.zeros(len(docs), dtype=np.float64)
    for d, f, n, s, _ in term_data:
        mask = np.isin(docs, d, assume_unique=True)
        if not mask.any():
            continue
        pos = np.searchsorted(d, docs[mask])
        acc[mask] += s["scorer"].score(f[pos], n[pos]).astype(np.float64)
    return acc.astype(np.float32)


# --------------------------------------------------------------------------
# explanation trees (IndexSearcher.explain / CheckHits)
# --------------------------------------------------------------------------


def _node_value(node: dict, ctx: _SegmentIndex, doc_id: int) -> float | None:
    """Exact score of `doc_id` under `node` via the real evaluator
    restricted to the one candidate — guarantees explain == score."""
    docs, scores = _eval(node, ctx, None, np.asarray([doc_id], dtype=np.int64))
    sel = np.where(docs == doc_id)[0]
    if len(sel) == 0:
        return None
    return float(scores[sel[0]])


def _explain_node(node: dict, ctx: _SegmentIndex, doc_id: int) -> dict:
    kind = node["kind"]
    value = _node_value(node, ctx, doc_id)
    if value is None:
        return {
            "match": False, "value": 0.0,
            "description": f"{kind}: no match on doc {doc_id}", "details": [],
        }
    details: list[dict] = []
    if kind == "term":
        t = node["terms"][0]
        docs, freqs, norms = ctx.postings(t)
        i = int(np.searchsorted(docs, doc_id))
        details = [
            {"match": True, "value": float(freqs[i]),
             "description": f"freq, occurrences of '{t}'", "details": []},
            {"match": True, "value": float(node["weight"]),
             "description": "weight = boost * idf (BM25Similarity)", "details": []},
        ]
        if node.get("cache") is not None:
            details.append(
                {"match": True, "value": float(node["cache"][int(norms[i])]),
                 "description": f"normInverse from norm code {int(norms[i])} "
                                "(1/(k1*((1-b)+b*dl/avgdl)))", "details": []}
            )
        desc = f"TermQuery({t}): score = weight - weight/(1 + freq*normInverse)"
    elif kind in ("syn", "phrase", "multi_phrase"):
        desc = f"{kind} over {node['terms']}"
    elif kind in ("const_set", "const_wrap", "near"):
        desc = f"{kind}: constant score"
    elif kind == "dismax":
        desc = f"DisjunctionMax(tie={node['tie']}): max + tie*(sum-max) of:"
        details = [
            e for s in node["subs"]
            if (e := _explain_node(s, ctx, doc_id))["match"]
        ]
    elif kind == "bool":
        desc = "BooleanQuery: sum of matching scoring clauses:"
        details = [
            e
            for s in list(node["must"]) + list(node["should"])
            if (e := _explain_node(s, ctx, doc_id))["match"]
        ]
    else:
        desc = kind
    return {"match": True, "value": value, "description": desc, "details": details}
