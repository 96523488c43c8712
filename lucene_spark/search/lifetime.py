"""SearcherLifetimeManager — keep past commit points addressable.

Reference: ``core/search/SearcherLifetimeManager.java``. The paging
problem it solves: a user pages through results with searchAfter; if a
commit lands between page 1 and page 2 and the follow-up query runs on
the new reader, hits shift and the user sees duplicates/holes. The
manager lets the application ``record`` the searcher that served page
1 (getting a token to embed in the page cursor), ``acquire`` the SAME
point-in-time searcher for page 2, and ``prune`` old searchers by age
(PruneByAge) once cursors expire.

Spark mapping: a "searcher" is an :class:`IndexReader` pinned to a
manifest generation. ``record`` pins the reader's generation with a
lifecycle snapshot (SnapshotDeletionPolicy) so ``gc_index`` cannot
delete the files it references — the reference's IndexReader.incRef
against IndexFileDeleter; ``release``/``prune`` drop the snapshot.
The token IS the generation (the reference uses the reader version —
same monotonic commit counter). All bookkeeping is driver-side and
O(#recorded commit points); the readers themselves stay lazy
DataFrame catalogs.

Divergence (documented at IndexReader): pinned readers replay that
commit's doc VISIBILITY exactly (manifest-scoped batches + live
segments); corpus-level BM25 stats are unversioned and follow the
newest build.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from lucene_spark.index import lifecycle, manifest as mani
from lucene_spark.search.executor import IndexReader

__all__ = ["SearcherLifetimeManager"]


@dataclass
class _Tracked:
    generation: int
    recorded_at: float = field(default_factory=time.time)


class SearcherLifetimeManager:
    """record/acquire/release/prune over generation-pinned readers.

    ``clock`` is injectable for deterministic prune tests."""

    def __init__(self, spark: SparkSession, index_dir: str, clock=time.time):
        self.spark = spark
        self.index_dir = index_dir
        self._clock = clock
        self._tracked: dict[int, _Tracked] = {}
        self._closed = False

    def record(self, reader: IndexReader | None = None) -> int:
        """Track the reader's commit point (record(IndexSearcher) ->
        token, SearcherLifetimeManager.java:118-142). Opens the latest
        commit when no reader is given. Re-recording the same
        generation is idempotent (the reference returns the same token
        for the same searcher version). Pins the generation against GC.
        """
        self._ensure_open()
        if reader is None:
            reader = IndexReader(self.spark, self.index_dir)
        gen = int(reader.manifest["generation"])
        if gen not in self._tracked:
            # pin: bump the snapshot refcount for THIS generation (the
            # lifecycle API's snapshot() pins only the latest commit;
            # recording an older reader needs a direct refcount bump)
            snaps = lifecycle._read_snapshots(self.index_dir)
            snaps[gen] = snaps.get(gen, 0) + 1
            lifecycle._write_snapshots(self.index_dir, snaps)
            self._tracked[gen] = _Tracked(gen, self._clock())
        return gen

    def acquire(self, token: int) -> IndexReader | None:
        """-> the point-in-time reader for ``token``, or None if it was
        pruned/never recorded (acquire, :150-171) — callers must then
        re-run the query on a fresh reader.

        The reader is constructed FRESH against the pinned generation's
        manifest (cheap: one JSON read + the field-stats collect). Doc
        visibility replays the recorded commit exactly; stats frames
        are re-opened so later commits' rewrites of the unversioned
        term/field stats never leave the pinned reader holding stale
        file listings."""
        self._ensure_open()
        t = self._tracked.get(int(token))
        if t is None:
            return None
        return IndexReader(self.spark, self.index_dir,
                           generation=t.generation)

    def release(self, token: int) -> None:
        """Drop one tracked commit point and its GC pin (release +
        the record's close, :176-203)."""
        self._ensure_open()
        t = self._tracked.pop(int(token), None)
        if t is None:
            raise KeyError(f"token {token} is not recorded")
        lifecycle.release_snapshot(self.index_dir, int(token))

    def prune(self, max_age_sec: float) -> list[int]:
        """PruneByAge (:220-247): release every tracked commit point
        older than ``max_age_sec`` — EXCEPT the newest recorded one,
        which the reference always keeps (PruneByAge.java keeps the
        current searcher regardless of age). Returns pruned tokens."""
        self._ensure_open()
        if not self._tracked:
            return []
        newest = max(self._tracked)
        now = self._clock()
        doomed = [
            g for g, t in self._tracked.items()
            if g != newest and now - t.recorded_at > max_age_sec
        ]
        for g in doomed:
            self.release(g)
        return doomed

    def tokens(self) -> list[int]:
        """Recorded generations, oldest first."""
        return sorted(self._tracked)

    def close(self) -> None:
        """Release everything still tracked (close(), :249-259)."""
        if self._closed:
            return
        for g in list(self._tracked):
            self.release(g)
        self._closed = True

    def _ensure_open(self) -> None:
        if self._closed:
            raise RuntimeError("SearcherLifetimeManager is closed")

    # -- convenience ------------------------------------------------------

    def latest_generation(self) -> int:
        return mani.latest_generation(self.index_dir)
