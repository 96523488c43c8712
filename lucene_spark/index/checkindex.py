"""CheckIndex — the index invariant walker (SURVEY.md §5 pillar 3).

Mirrors the checks of lucene/core/src/java/org/apache/lucene/index/
CheckIndex.java:571,1108-1121,2665, re-expressed over the table layout:

per posting row (distributed, applyInPandas per segment):
  - terms strictly increasing within (segment, field) — the term-dict
    sort invariant (FreqProxTermsWriter sorts once at flush);
  - decoded docIDs strictly increasing; doc_freq == decoded length;
    total_term_freq == sum(freqs); freqs >= 1;
  - norms blob length == doc_freq;
  - block_last_doc matches decoded block boundaries; impacts equal the
    recomputed competitive skyline (block-max WAND correctness rests on
    this);
  - positions: per-doc count == freq, strictly increasing,
    all < 2^31.

per segment (doclens):
  - doc_ids unique and dense within [first_doc_id, last_doc_id];
  - doc_len_code == SmallFloat.intToByte4(doc_len);
  - sum(doc_len) over docs == sum(total_term_freq) over postings.

global:
  - term_stats / field_stats tables equal a recomputation from live
    postings/doclens (the IndexSearcher stats contract);
  - docs registry doc_ids unique, count == manifest num_docs_total.

``check_index`` returns a report dict {ok, violations: [...], counts};
it never mutates the index.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from functools import partial

from lucene_spark.index import manifest as mani


def check_segment_postings(pdf, fmt_name: str = "for104") -> list[str]:
    """Per-(segment) pandas kernel -> list of violation strings."""
    import numpy as np

    from lucene_spark.index import codec
    from lucene_spark.index.formats import get_postings_format

    fmt = get_postings_format(fmt_name)
    out: list[str] = []
    seg = pdf["segment_id"].iat[0] if len(pdf) else "?"
    # The term-dict sort invariant materializes as key-ordered access in
    # the table layout (parquet row order across files is not meaningful);
    # the checkable invariant is: per (field, term) the rows' doc ranges
    # are DISJOINT (several rows per term = salted hot-term merge parts,
    # SURVEY.md §4.2) and each row internally doc-sorted (checked below).
    spans: dict[tuple[str, str], list[tuple[int, int]]] = {}
    for row in pdf.itertuples():
        tag = f"{seg}/{row.field}/{row.term}"
        try:
            docs, freqs = fmt.decode(bytes(row.postings))
        except Exception as e:  # noqa: BLE001
            out.append(f"{tag}: postings decode failed: {e}")
            continue
        if len(docs):
            spans.setdefault((row.field, row.term), []).append(
                (int(docs[0]), int(docs[-1]))
            )
        if len(docs) != row.doc_freq:
            out.append(f"{tag}: doc_freq {row.doc_freq} != decoded {len(docs)}")
        if len(docs) > 1 and not (np.diff(docs) > 0).all():
            out.append(f"{tag}: docIDs not strictly increasing")
        if (freqs < 1).any():
            out.append(f"{tag}: freq < 1")
        if int(freqs.sum()) != row.total_term_freq:
            out.append(
                f"{tag}: total_term_freq {row.total_term_freq} != {int(freqs.sum())}"
            )
        norms = np.frombuffer(bytes(row.norms), dtype=np.uint8)
        if len(norms) != len(docs):
            out.append(f"{tag}: norms length {len(norms)} != doc_freq {len(docs)}")
            continue  # downstream impact checks need aligned norms
        # block metadata
        starts = list(range(0, len(docs), codec.BLOCK_SIZE))
        want_last = [int(docs[min(s + codec.BLOCK_SIZE, len(docs)) - 1]) for s in starts]
        if list(row.block_last_doc) != want_last:
            out.append(f"{tag}: block_last_doc mismatch")
        imp_f = [list(x) for x in row.impact_freqs]
        imp_n = [list(x) for x in row.impact_norms]
        for j, s in enumerate(starts):
            e = min(s + codec.BLOCK_SIZE, len(docs))
            sf, sn = codec.impacts_skyline(
                freqs[s:e], norms[s:e].astype(np.int64)
            )
            if j >= len(imp_f) or imp_f[j] != sf or imp_n[j] != sn:
                out.append(f"{tag}: impacts mismatch at block {j}")
                break
        if row.positions is not None:
            try:
                pos = codec.decode_positions(bytes(row.positions), freqs)
            except Exception as e:  # noqa: BLE001
                out.append(f"{tag}: positions decode failed: {e}")
                continue
            for p, f_ in zip(pos, freqs):
                if len(p) != f_:
                    out.append(f"{tag}: position count != freq")
                    break
                if len(p) > 1 and not (np.diff(p) > 0).all():
                    out.append(f"{tag}: positions not increasing")
                    break
                if len(p) and int(p[-1]) >= 1 << 31:
                    out.append(f"{tag}: position overflow")
                    break
        if "offsets" in pdf.columns and row.offsets is not None:
            # CheckIndex.java offset invariants (checkFields: startOffset
            # non-decreasing per doc, endOffset >= startOffset): one flat
            # decode must yield sum(freqs) occurrences, per-occurrence
            # start <= end, and starts non-decreasing within each doc
            try:
                ost, oen, _ = codec.decode_offsets_flat(
                    bytes(row.offsets), freqs
                )
            except Exception as e:  # noqa: BLE001
                out.append(f"{tag}: offsets decode failed: {e}")
                continue
            if len(ost) != int(freqs.sum()):
                out.append(f"{tag}: offset count != sum(freqs)")
            elif (oen < ost).any() or (ost < 0).any():
                out.append(f"{tag}: offset end < start (or negative)")
            else:
                gl = np.cumsum(freqs) - freqs
                d = np.diff(ost)
                # doc boundaries may reset; interior deltas must be >= 0
                boundary = np.zeros(len(ost), dtype=bool)
                boundary[gl[1:]] = True
                if (d < 0).any() and (d[~boundary[1:]] < 0).any():
                    out.append(f"{tag}: offsets not non-decreasing in doc")
        if "payloads" in pdf.columns and row.payloads is not None:
            try:
                pv = codec.decode_payloads_flat(bytes(row.payloads), freqs)
            except Exception as e:  # noqa: BLE001
                out.append(f"{tag}: payloads decode failed: {e}")
                continue
            if len(pv) != int(freqs.sum()):
                out.append(f"{tag}: payload count != sum(freqs)")
    for (field, term), rngs in spans.items():
        if len(rngs) < 2:
            continue
        rngs = sorted(rngs)
        for (_, e1), (s2, _) in zip(rngs, rngs[1:]):
            if s2 <= e1:
                out.append(f"{seg}/{field}/{term}: salted parts overlap")
                break
    return out


def check_segment_doclens(pdf) -> list[str]:
    import numpy as np

    from lucene_spark.util.smallfloat import int_to_byte4_vec

    out: list[str] = []
    seg = pdf["segment_id"].iat[0] if len(pdf) else "?"
    groups = (
        pdf.groupby("field") if "field" in pdf.columns else [("", pdf)]
    )
    for fld, grp in groups:
        ids = grp["doc_id"].to_numpy()
        if len(np.unique(ids)) != len(ids):
            out.append(f"{seg}/{fld}: duplicate doc_ids")
        # doc_ids are globally stable (never remapped — unlike Lucene,
        # which renumbers at merge); purged deletions leave holes, so the
        # invariant is uniqueness within a bounded range, not density
        ids_sorted = np.sort(ids)
        if len(ids) and ids_sorted[-1] - ids_sorted[0] + 1 < len(ids):
            out.append(f"{seg}/{fld}: doc_id range narrower than count")
        want = int_to_byte4_vec(grp["doc_len"].to_numpy().astype(np.int64))
        if not (want.astype(np.int64) == grp["doc_len_code"].to_numpy()).all():
            out.append(f"{seg}/{fld}: doc_len_code != intToByte4(doc_len)")
    return out


def _collect_violations(df, kernel) -> list[str]:
    import pandas as pd

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({"violation": kernel(pdf)})

    return [
        r["violation"]
        for r in df.groupBy("segment_id")
        .applyInPandas(run, schema="violation string")
        .collect()
    ]


def check_index(spark: SparkSession, index_dir: str) -> dict:
    """Walk the committed index; return {ok, violations, counts}."""
    from lucene_spark.search.executor import IndexReader

    reader = IndexReader(spark, index_dir)
    m = reader.manifest
    violations: list[str] = []

    postings = reader.postings()
    doclens = reader.doclens()
    violations += _collect_violations(
        postings,
        partial(check_segment_postings,
                fmt_name=m.get("postings_format") or "for104"),
    )
    violations += _collect_violations(doclens, check_segment_doclens)

    # per-(segment, field) cross-check: sum(doc_len) == sum(total_term_freq)
    dl_keyed = (
        doclens if "field" in doclens.columns
        else doclens.withColumn("field", F.lit(m["field"]))
    )
    a = dl_keyed.groupBy("segment_id", "field").agg(F.sum("doc_len").alias("s1"))
    b = postings.groupBy("segment_id", "field").agg(
        F.sum("total_term_freq").alias("s2")
    )
    for r in a.join(b, ["segment_id", "field"], "full").collect():
        if (r["s1"] or 0) != (r["s2"] or 0):
            violations.append(
                f"{r['segment_id']}/{r['field']}: sum(doc_len) {r['s1']} != sum(ttf) {r['s2']}"
            )

    # stats tables vs recomputation
    ts = reader.term_stats_df()
    re_ts = postings.groupBy("field", "term").agg(
        F.sum("doc_freq").alias("doc_freq"),
        F.sum("total_term_freq").alias("total_term_freq"),
    )
    if ts.exceptAll(re_ts).count() or re_ts.exceptAll(ts).count():
        violations.append("term_stats != recomputed from live postings")
    fs = {
        (r["field"]): (r["doc_count"], r["sum_total_term_freq"])
        for r in spark.read.parquet(f"{index_dir}/field_stats").collect()
    }
    for r in (
        dl_keyed.groupBy("field")
        .agg(F.count("*").alias("dc"), F.sum("doc_len").alias("sttf"))
        .collect()
    ):
        got = fs.get(r["field"])
        if got != (r["dc"], r["sttf"]):
            violations.append(
                f"field_stats[{r['field']}] {got} != recomputed {(r['dc'], r['sttf'])}"
            )

    # docs registry
    docs = reader.docs()
    n_docs = docs.count()
    n_distinct = docs.select("doc_id").distinct().count()
    if n_distinct != n_docs:
        violations.append("docs registry has duplicate doc_ids")
    if n_docs != m["num_docs_total"]:
        violations.append(
            f"docs registry count {n_docs} != manifest {m['num_docs_total']}"
        )
    live = mani.live_segment_ids(m)
    n_doclens = (
        dl_keyed.filter(F.col("field") == m["field"]).count()
    )
    expect_live = m["num_docs_total"] - int(m.get("purged_docs", 0))
    if n_doclens != expect_live:
        violations.append(
            f"live doclens count {n_doclens} != manifest total-purged {expect_live}"
        )

    # tombstones: every committed tombstone refers to a registry doc
    # and lies inside a LIVE segment's doc range (a tombstone outside
    # every live range means the merge purge dropped a segment without
    # rewriting it — the resurrection bug class)
    from lucene_spark.index.deletes import deleted_ids_df

    dels = deleted_ids_df(spark, index_dir, m)
    if dels is not None:
        orphan = dels.join(docs.select("doc_id"), "doc_id", "left_anti").count()
        if orphan:
            violations.append(f"{orphan} tombstones not in the docs registry")
        ranges = []
        for coll in (m.get("batches", []), m.get("merges", []) or []):
            for b in coll:
                for s in b["segments"]:
                    if live is None or s["segment_id"] in live:
                        ranges.append(
                            (int(s["first_doc_id"]), int(s["last_doc_id"]))
                        )
        in_range = None
        for lo, hi in ranges:
            c = (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
            in_range = c if in_range is None else (in_range | c)
        if in_range is not None:
            outside = dels.filter(~in_range).count()
            if outside:
                violations.append(
                    f"{outside} tombstones outside every live segment range"
                )

    # dv updates: batch doc_ids must exist; declared columns must exist
    for b in m.get("dv_update_batches", []):
        upd = spark.read.parquet(f"{index_dir}/dv_updates/batch={b['batch']}")
        missing_cols = [c for c in b["columns"] if c not in docs.columns]
        if missing_cols:
            violations.append(
                f"dv batch {b['batch']} updates unknown columns {missing_cols}"
            )
        orphan = upd.select("doc_id").join(
            docs.select("doc_id"), "doc_id", "left_anti"
        ).count()
        if orphan:
            violations.append(
                f"dv batch {b['batch']} has {orphan} doc_ids not in the registry"
            )

    # bloom sidecar (index/bloom.py): when a CURRENT-generation sidecar
    # exists, recompute every (segment, field) bitset from the live
    # term dictionary and require byte equality — catches truncated or
    # stale-but-restamped sidecars, and by construction proves the
    # no-false-negative invariant the query gate depends on. A
    # sidecar for another generation is fine (the gate ignores it).
    violations += _check_bloom(spark, index_dir, m, postings)

    return {
        "ok": not violations,
        "violations": violations,
        "counts": {
            "docs": int(n_docs),
            "posting_rows": int(postings.count()),
            "live_segments": None if live is None else len(live),
        },
    }


def _check_bloom(spark, index_dir, m, postings) -> list[str]:
    import json as _json
    import os as _os

    meta_path = _os.path.join(index_dir, "_bloom_meta.json")
    try:
        with open(meta_path) as f:
            meta = _json.load(f)
    except (FileNotFoundError, ValueError):
        return []
    if meta.get("generation") != m.get("generation"):
        return []  # stale by stamp: the reader gate already ignores it
    from lucene_spark.index import bloom as bl

    stored = (
        spark.read.parquet(_os.path.join(index_dir, bl._DIR))
        .groupBy("segment_id", "field")
        .agg(
            F.first("num_bits").alias("num_bits"),
            F.first("num_terms").alias("num_terms"),
            F.first("bits").alias("bits"),
        )
    )
    terms = postings.select("segment_id", "field", "term")

    def verify(pdf) -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        out = []
        joined = pdf.groupby(["segment_id", "field"])
        for (seg, field), grp in joined:
            row = grp.iloc[0]
            if pd.isna(row["num_bits"]):
                out.append(f"{seg}/{field}: bloom row missing")
                continue
            nbits = int(row["num_bits"])
            want = np.zeros(nbits >> 3, dtype=np.uint8)
            uniq = grp["term"].unique()
            for t in uniq:
                p = bl.term_position(field, t) & (nbits - 1)
                want[p >> 3] |= 1 << (p & 7)
            got = np.frombuffer(row["bits"], dtype=np.uint8)
            if int(row["num_terms"]) != len(uniq):
                out.append(
                    f"{seg}/{field}: bloom num_terms {row['num_terms']}"
                    f" != {len(uniq)} live terms"
                )
            elif not np.array_equal(got, want):
                out.append(f"{seg}/{field}: bloom bitset != recomputed")
        return pd.DataFrame({"v": out})

    joined = terms.join(stored, ["segment_id", "field"], "left")
    return [
        r["v"]
        for r in joined.groupBy("segment_id")
        .applyInPandas(verify, schema="v string")
        .collect()
    ]


def exorcise(spark: SparkSession, index_dir: str) -> dict:
    """CheckIndex -exorcise (CheckIndex.java main(): "-exorcise:
    actually write a new segments_N file, removing any problematic
    segments"): identify segments whose OWN data fails the per-segment
    invariants and commit a new manifest generation that drops them.
    Documents in dropped segments are LOST — the reference prints the
    same warning; this is the last-resort repair path.

    Mechanics: the per-segment postings/doclens kernels run tagged by
    segment; bad segments are removed from visibility via a merge
    entry with no outputs (live_segment_ids = batches + merge outputs
    - merge inputs), their doc counts move to purged_docs, tombstones
    inside their ranges are dropped, and the global stats tables are
    recomputed from the surviving postings — so a subsequent
    check_index comes back clean.

    -> {removed: [segment_id], docs_lost: int, generation: int}.
    """
    import pandas as pd

    from lucene_spark.index.deletes import deleted_ids_df
    from lucene_spark.search.executor import IndexReader

    reader = IndexReader(spark, index_dir)
    m = reader.manifest
    fmt = m.get("postings_format") or "for104"

    def tagged(kernel):
        def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
            v = kernel(pdf)
            return pd.DataFrame(
                {"segment_id": str(pdf["segment_id"].iat[0]), "v": v}
            )

        return run

    bad: set[str] = set()
    for df, kernel in (
        (reader.postings(), partial(check_segment_postings, fmt_name=fmt)),
        (reader.doclens(), check_segment_doclens),
    ):
        rows = (
            df.groupBy("segment_id")
            .applyInPandas(tagged(kernel), schema="segment_id string, v string")
            .select("segment_id")
            .distinct()
            .collect()
        )
        bad |= {r["segment_id"] for r in rows}
    # cross-check: sum(doc_len) == sum(total_term_freq) per segment/field
    dl = reader.doclens()
    dl_keyed = (
        dl if "field" in dl.columns else dl.withColumn("field", F.lit(m["field"]))
    )
    a = dl_keyed.groupBy("segment_id", "field").agg(F.sum("doc_len").alias("s1"))
    b = reader.postings().groupBy("segment_id", "field").agg(
        F.sum("total_term_freq").alias("s2")
    )
    for r in a.join(b, ["segment_id", "field"], "full").collect():
        if (r["s1"] or 0) != (r["s2"] or 0):
            bad.add(r["segment_id"])

    if not bad:
        return {"removed": [], "docs_lost": 0, "generation": m["generation"]}

    # doc ranges + counts of the dropped segments (live entries only)
    live = mani.live_segment_ids(m)
    dropped_ranges: list[tuple[int, int]] = []
    docs_lost = 0
    for coll in (m.get("batches", []), m.get("merges", []) or []):
        for bch in coll:
            for s in bch.get("segments", []):
                sid = s["segment_id"]
                if sid in bad and (live is None or sid in live):
                    dropped_ranges.append(
                        (int(s["first_doc_id"]), int(s["last_doc_id"]))
                    )
                    docs_lost += int(s["num_docs"])

    out = dict(m)
    out.pop("generation", None)
    out.pop("committed_at", None)
    next_b = 1 + max(
        [bch["batch"] for bch in m.get("batches", [])]
        + [mg["batch"] for mg in (m.get("merges") or [])]
    )
    out["merges"] = list(m.get("merges") or []) + [
        {"batch": next_b, "inputs": sorted(bad), "segments": [],
         "exorcised": True}
    ]
    out["purged_docs"] = int(m.get("purged_docs", 0)) + docs_lost

    # tombstones inside dropped ranges vanish with their docs
    dels = deleted_ids_df(spark, index_dir, m)
    if dels is not None and dropped_ranges:
        from lucene_spark.index.deletes import _next_delete_batch

        in_dropped = None
        for lo, hi in dropped_ranges:
            c = (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
            in_dropped = c if in_dropped is None else (in_dropped | c)
        remaining = dels.filter(~in_dropped)
        n_rem = remaining.count()
        nb = _next_delete_batch(m)
        if n_rem:
            remaining.write.mode("overwrite").parquet(
                f"{index_dir}/deletes/batch={nb}"
            )
            out["delete_batches"] = [{"batch": nb, "num_docs": int(n_rem)}]
        else:
            out["delete_batches"] = []
        out["num_deleted"] = int(n_rem)

    from lucene_spark.index.builder import _recompute_stats

    _recompute_stats(spark, index_dir, m["field"], mani.live_segment_ids(out))
    gen = mani.commit_manifest(index_dir, out)
    return {"removed": sorted(bad), "docs_lost": docs_lost, "generation": gen}
