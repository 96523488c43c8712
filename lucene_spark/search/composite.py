"""Composite readers: MultiReader (side-by-side INDEXES over different
documents) and ParallelReader (side-by-side FIELDS over the same
documents).

Reference contracts:
- core/index/MultiReader.java + BaseCompositeReader.java — N
  sub-readers exposed as one, doc ids re-based by the cumulative
  maxDoc of the preceding readers (BaseCompositeReader.readerBase);
  an IndexSearcher over the composite computes term/collection
  statistics SUMMED across the leaves (IndexSearcher.termStatistics
  walks all leaves), so scores are identical to a single physical
  index holding the union — the property the tests assert exactly.
- core/index/ParallelCompositeReader.java + ParallelLeafReader.java —
  N indexes built over the SAME documents in the same order, each
  carrying different fields; the composite routes each field to the
  reader that owns it ("it is up to you to make sure all indexes are
  built and modified the same way" — ParallelLeafReader javadoc).

Spark-first shape: a composite reader is a LOGICAL view — unions (with
a doc-base offset column) or field-routed delegation over the
sub-readers' catalog DataFrames.  Nothing is copied; Catalyst sees one
plan with N parquet scans, and every downstream sqlpath operator works
unchanged through the duck-typed ``exploded_postings`` hook.  At 100
TB this is the zero-cost federation path: tenants/shards stay separate
physical indexes, queries see one corpus with corpus-wide statistics.

Supported surface: the sql64 scoring paths (everything built on
exploded_postings / term_stats_df / docs / doclens), which covers the
BM25 boolean family, similarities, classifiers, facets over the docs
registry, and rescoring.  The per-segment encoded-kernel paths
(exact32, highlight-from-index) read raw postings blobs whose doc ids
cannot be re-based without a decode — same restriction class as the
reference's composite readers (no index sort, no single-segment
features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search.bm25 import CollectionStats, TermStats


def _max_doc(reader) -> int:
    """maxDoc of a sub-reader (max doc_id + 1) — one tiny agg, cached
    on the reader."""
    if not hasattr(reader, "_composite_max_doc"):
        row = reader.docs().agg(F.max("doc_id").alias("m")).head()
        reader._composite_max_doc = int(row["m"]) + 1 if row["m"] is not None else 0
    return reader._composite_max_doc


class MultiReader:
    """N indexes over DIFFERENT documents presented as one, with
    corpus-wide statistics (MultiReader.java + the summed-stats
    IndexSearcher contract)."""

    def __init__(self, readers: list):
        if not readers:
            raise ValueError("MultiReader needs at least one sub-reader")
        self.readers = list(readers)
        self.spark = readers[0].spark
        self.manifest = dict(readers[0].manifest)
        bases = []
        acc = 0
        for r in self.readers:
            bases.append(acc)
            acc += _max_doc(r)
        self.bases = bases
        self.max_doc = acc

    # ---- statistics (summed across leaves) ----------------------------

    def collection_stats(self, field: str) -> CollectionStats:
        md = dc = st = sd = 0
        for r in self.readers:
            try:
                c = r.collection_stats(field)
            except KeyError:
                continue
            md += c.max_doc
            dc += c.doc_count
            st += c.sum_total_term_freq
            sd += c.sum_doc_freq
        if dc == 0:
            raise KeyError(field)
        return CollectionStats(
            max_doc=md, doc_count=dc,
            sum_total_term_freq=st, sum_doc_freq=sd,
        )

    def sum_doc_freq(self, field: str) -> int:
        return sum(r.sum_doc_freq(field) for r in self.readers)

    def term_stats_df(self) -> DataFrame:
        out = None
        for r in self.readers:
            t = r.term_stats_df().select(
                "field", "term", "doc_freq", "total_term_freq"
            )
            out = t if out is None else out.unionByName(t)
        return out.groupBy("field", "term").agg(
            F.sum("doc_freq").alias("doc_freq"),
            F.sum("total_term_freq").alias("total_term_freq"),
        )

    def term_stats(self, field: str, terms: list[str]) -> dict[str, TermStats]:
        merged: dict[str, TermStats] = {}
        for r in self.readers:
            for t, s in r.term_stats(field, terms).items():
                if t in merged:
                    merged[t] = TermStats(
                        doc_freq=merged[t].doc_freq + s.doc_freq,
                        total_term_freq=(
                            merged[t].total_term_freq + s.total_term_freq
                        ),
                    )
                else:
                    merged[t] = s
        return merged

    # ---- re-based catalogs --------------------------------------------

    def _rebased(self, frames: list[DataFrame]) -> DataFrame:
        out = None
        for base, df in zip(self.bases, frames):
            t = df.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(base)).cast("long")
            )
            out = t if out is None else out.unionByName(
                t, allowMissingColumns=True
            )
        return out

    def docs(self) -> DataFrame:
        return self._rebased([r.docs() for r in self.readers])

    def doclens(self) -> DataFrame:
        return self._rebased([r.doclens() for r in self.readers])

    def deleted_df(self) -> DataFrame | None:
        parts = []
        for base, r in zip(self.bases, self.readers):
            d = r.deleted_df()
            if d is not None:
                parts.append(
                    d.withColumn(
                        "doc_id",
                        (F.col("doc_id") + F.lit(base)).cast("long"),
                    )
                )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def exploded_postings(self, field: str, terms: list[str]) -> DataFrame:
        from lucene_spark.search import sqlpath as sp

        out = None
        for base, r in zip(self.bases, self.readers):
            ep = sp.exploded_postings(r, field, terms).withColumn(
                "doc_id", (F.col("doc_id") + F.lit(base)).cast("long")
            )
            out = ep if out is None else out.unionByName(ep)
        return out


class ParallelReader:
    """N indexes over the SAME documents (same count, same order), each
    owning different fields (ParallelCompositeReader.java /
    ParallelLeafReader.java): fields route to their owning reader, the
    docs registry is the column-wise join of the sub-registries."""

    def __init__(self, readers: list):
        if not readers:
            raise ValueError("ParallelReader needs at least one sub-reader")
        sizes = {_max_doc(r) for r in readers}
        if len(sizes) != 1:
            raise ValueError(
                f"parallel sub-readers must hold the same documents; "
                f"maxDocs differ: {sorted(sizes)}"
            )
        self.readers = list(readers)
        self.spark = readers[0].spark
        self.manifest = dict(readers[0].manifest)
        self.max_doc = sizes.pop()
        # field -> owning reader (first writer wins, the reference's
        # ParallelLeafReader fieldToReader map)
        self._field_owner: dict[str, object] = {}
        for r in self.readers:
            for f in r._field_stats:
                self._field_owner.setdefault(f, r)

    def _owner(self, field: str):
        r = self._field_owner.get(field)
        if r is None:
            raise KeyError(field)
        return r

    def collection_stats(self, field: str) -> CollectionStats:
        return self._owner(field).collection_stats(field)

    def sum_doc_freq(self, field: str) -> int:
        return self._owner(field).sum_doc_freq(field)

    def term_stats_df(self) -> DataFrame:
        out = None
        for r in self.readers:
            owned = sorted(
                f for f, o in self._field_owner.items() if o is r
            )
            t = r.term_stats_df().filter(F.col("field").isin(owned)).select(
                "field", "term", "doc_freq", "total_term_freq"
            )
            out = t if out is None else out.unionByName(t)
        return out

    def term_stats(self, field: str, terms: list[str]) -> dict[str, TermStats]:
        return self._owner(field).term_stats(field, terms)

    def docs(self) -> DataFrame:
        out = None
        for r in self.readers:
            d = r.docs()
            if out is None:
                out = d
            else:
                new_cols = [
                    c for c in d.columns
                    if c == "doc_id" or c not in out.columns
                ]
                out = out.join(d.select(*new_cols), "doc_id", "left")
        return out

    def doclens(self) -> DataFrame:
        out = None
        for r in self.readers:
            owned = sorted(
                f for f, o in self._field_owner.items() if o is r
            )
            t = r.doclens().filter(F.col("field").isin(owned))
            out = t if out is None else out.unionByName(t)
        return out

    def deleted_df(self) -> DataFrame | None:
        # the reference takes liveDocs from the FIRST reader
        # (ParallelLeafReader: "live docs of the first reader")
        return self.readers[0].deleted_df()

    def exploded_postings(self, field: str, terms: list[str]) -> DataFrame:
        from lucene_spark.search import sqlpath as sp

        return sp.exploded_postings(self._owner(field), field, terms)
