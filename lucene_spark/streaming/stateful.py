"""Custom stateful streaming operators via applyInPandasWithState —
the "custom stateful operator" slot of the streaming surface
(SURVEY.md §2.9; Spark's GroupState is the state-store-backed analog
of a persistent seen-keys structure).

``streaming_dedup``: exact first-wins deduplication across
micro-batches. Each key's FIRST document is emitted once; every later
occurrence — in the same batch or any later batch — is suppressed by
per-key state. This is the streaming twin of pipeline/dedup.py's
exact_dedup (same canonical-winner rule: smallest doc_id), the shape a
continuous training-data ingest pipeline needs: the state store scales
horizontally with the key hash partitioning, one state row per
distinct key, no driver state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "dedup_key string, doc_id long"
_STATE_SCHEMA = "seen byte"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # key already emitted in an earlier batch: consume and suppress
        for _ in pdfs:
            pass
        return
    best = None
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
    if best is not None:
        state.update((1,))
        yield pd.DataFrame({"dedup_key": [key[0]], "doc_id": [best]})


def streaming_dedup(stream: DataFrame, key_col: str, id_col: str = "doc_id") -> DataFrame:
    """First-wins keyed dedup over a stream: one output row per distinct
    key, carrying the smallest id of the key's FIRST micro-batch
    (within-batch canonical winner = min id, the exact_dedup rule).
    -> (dedup_key, doc_id), append mode."""
    from pyspark.sql import functions as F

    keyed = stream.select(
        F.col(key_col).alias("dedup_key"), F.col(id_col).cast("long").alias("doc_id")
    )
    return keyed.groupBy("dedup_key").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
