"""Term vectors — the TermVectorsFormat reader surface (SURVEY.md §2.1;
core/codecs/TermVectorsFormat.java:26, Lucene90CompressingTermVectorsFormat).

Lucene stores an optional per-document "miniature inverted index" —
for each doc: its terms, their frequencies and positions — consumed by
MoreLikeThis(docid), the UnifiedHighlighter and CheckIndex. This engine
does not persist a second row-oriented copy: the postings table already
holds every (term -> doc, freq, positions) fact, so a term vector is a
TRANSPOSE query over it. ``term_vectors`` computes exactly that:

- the manifest's segment doc-ranges (tiny, driver-side) map the
  requested doc ids to their owning segments, so only those segments'
  postings rows are scanned (parquet prunes on the segment_id filter);
- one ``mapInPandas`` pass decodes each (field, term) row, picks the
  requested docs out of the posting via ``searchsorted`` (the skip-data
  access pattern), and slices their position lists out of the flat
  decoded positions;
- tombstoned docs are dropped with an anti-join against the tombstone
  table (liveDocs semantics) — never a driver-side delete set.

At 10^12 docs this touches the postings rows of a handful of segments —
the same cost as a term lookup, not a corpus scan. Lucene pays a
dedicated .tvd/.tvx file to avoid re-reading postings; columnar storage
plus segment pruning makes the transpose cheap enough to skip the extra
sink entirely (the layout decision SURVEY.md §1.3 records for stored
fields applies to term vectors equally).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lucene_spark.index import codec


def term_vectors(
    reader,
    doc_ids: list[int],
    field: str | None = None,
) -> DataFrame:
    """-> (doc_id, field, term, freq, positions) — one row per
    (requested live doc, field, term), ordered (doc_id, field, term).
    ``freq`` and ``positions`` reproduce exactly what the analyzer put
    into the index (TermVectorsFormat contract: the vector mirrors the
    inverted index, not the raw text)."""
    targets = np.array(sorted({int(d) for d in doc_ids}), dtype=np.int64)
    seg_ids = sorted(
        sid
        for sid, lo, hi in reader._live_segment_ranges()
        if int(np.searchsorted(targets, lo, side="left"))
        < int(np.searchsorted(targets, hi, side="right"))
    )
    posts = reader.postings().filter(F.col("segment_id").isin(seg_ids))
    if field is not None:
        posts = posts.filter(F.col("field") == field)

    from lucene_spark.search.executor import _reader_fmt
    from lucene_spark.index.formats import get_postings_format

    fmt_name = _reader_fmt(reader)
    t_list = targets.tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fmt = get_postings_format(fmt_name)
        tg = np.asarray(t_list, dtype=np.int64)
        for pdf in batches:
            out_doc, out_field, out_term, out_freq, out_pos = (
                [], [], [], [], [],
            )
            for _, r in pdf.iterrows():
                docs, freqs = fmt.decode(bytes(r["postings"]))
                # requested docs present in this posting (searchsorted —
                # the skip-data pattern, no linear scan)
                idx = np.searchsorted(docs, tg)
                idx = idx[idx < len(docs)]
                hit = idx[np.isin(docs[idx], tg)]
                hit = np.unique(hit)
                if len(hit) == 0:
                    continue
                flat, lens = codec.decode_positions_flat(
                    bytes(r["positions"]), freqs
                )
                starts = np.cumsum(lens) - lens
                for i in hit.tolist():
                    s, n = int(starts[i]), int(lens[i])
                    out_doc.append(int(docs[i]))
                    out_field.append(r["field"])
                    out_term.append(r["term"])
                    out_freq.append(int(freqs[i]))
                    out_pos.append(flat[s : s + n].tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "field": pd.Series(out_field, dtype=object),
                    "term": pd.Series(out_term, dtype=object),
                    "freq": pd.Series(out_freq, dtype="int64"),
                    "positions": pd.Series(out_pos, dtype=object),
                }
            )

    out = posts.mapInPandas(
        run,
        schema="doc_id long, field string, term string, freq long, "
        "positions array<long>",
    )
    dels = reader.deleted_df()
    if dels is not None:
        out = out.join(dels, "doc_id", "left_anti")
    return out.orderBy("doc_id", "field", "term")
