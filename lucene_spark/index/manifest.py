"""Segment manifest — the segments_N analog, with two-phase commit.

Mirrors SegmentInfos (lucene/core/src/java/org/apache/lucene/index/
SegmentInfos.java:55-64,133-134): "the active segments are stored in
segments_N; the one with the largest generation wins", and
IndexWriter's prepareCommit/commit split (IndexWriter.java:3594,4075):
phase 1 writes a pending file and fsyncs, phase 2 atomically renames it
to its final generation name. Readers only ever see the largest fully
committed generation, so a crash mid-commit is invisible.

Stored as JSON next to the parquet tables (at real scale this would be
the Iceberg snapshot/metadata JSON; the semantics are identical).
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Any

_GEN_RE = re.compile(r"^manifest-(\d+)\.json$")


def latest_generation(index_dir: str) -> int:
    """Largest committed generation, or -1 if none."""
    gens = [
        int(m.group(1))
        for f in os.listdir(index_dir)
        if (m := _GEN_RE.match(f))
    ] if os.path.isdir(index_dir) else []
    return max(gens, default=-1)


def read_manifest(index_dir: str, generation: int | None = None) -> dict[str, Any]:
    gen = latest_generation(index_dir) if generation is None else generation
    if gen < 0:
        raise FileNotFoundError(f"no committed manifest in {index_dir}")
    with open(os.path.join(index_dir, f"manifest-{gen}.json")) as f:
        return json.load(f)


def set_commit_user_data(index_dir: str, data: dict[str, str]) -> int:
    """IndexWriter.setLiveCommitData + SegmentInfos#getUserData
    (core/index/IndexWriter.java:3589-3616, SegmentInfos.java userData):
    opaque string->string metadata carried ON a commit point —
    consumers store replication checkpoints or ingest sequence numbers
    and read them back from the commit they open. As in the reference,
    the data becomes durable only with a commit: this commits a new
    generation whose sole change is the user data. Later commits
    (merges, deletes) CARRY the map forward untouched — dict(m) keeps
    unknown manifest keys. Returns the new generation."""
    m = read_manifest(index_dir)
    m["user_data"] = {str(k): str(v) for k, v in data.items()}
    return commit_manifest(index_dir, m)


def get_commit_user_data(
    index_dir: str, generation: int | None = None
) -> dict[str, str]:
    """IndexReader.getIndexCommit().getUserData() — per-generation, so
    a snapshot/paging reader pinned to an older commit sees THAT
    commit's map."""
    return dict(read_manifest(index_dir, generation).get("user_data") or {})


def live_segment_ids(manifest: dict[str, Any]) -> set[str] | None:
    """Segments a reader may see: every segment from `batches` plus
    every merge output, minus every merge input. Returns None when no
    merge ever ran (= everything is live; readers skip the filter).

    This is the IndexFileDeleter model (CORE/index/IndexFileDeleter.java):
    replaced segment files stay on disk until GC; the manifest alone
    decides visibility."""
    merges = manifest.get("merges") or []
    if not merges:
        return None
    live = {
        s["segment_id"] for b in manifest.get("batches", []) for s in b["segments"]
    }
    for m in merges:
        live |= {s["segment_id"] for s in m["segments"]}
        live -= set(m["inputs"])
    return live


def commit_manifest(index_dir: str, manifest: dict[str, Any]) -> int:
    """Two-phase commit: write pending, fsync, rename to manifest-<gen>."""
    os.makedirs(index_dir, exist_ok=True)
    gen = latest_generation(index_dir) + 1
    manifest = dict(manifest)
    manifest["generation"] = gen
    manifest["committed_at"] = time.time()
    pending = os.path.join(index_dir, f"_pending-manifest-{gen}.json")
    final = os.path.join(index_dir, f"manifest-{gen}.json")
    with open(pending, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(pending, final)  # atomic publish (IndexWriter.commit analog)
    return gen


# ---------------------------------------------------------------------------
# TwoPhaseCommit surface (core/index/TwoPhaseCommit.java +
# TwoPhaseCommitTool.java): the prepare/commit/rollback split exposed
# per index, and the multi-resource coordinator.
# ---------------------------------------------------------------------------


class PrepareCommitFailError(IOError):
    """TwoPhaseCommitTool.PrepareCommitFailException."""


class CommitFailError(IOError):
    """TwoPhaseCommitTool.CommitFailException."""


class ManifestTwoPhaseCommit:
    """One index's manifest as a TwoPhaseCommit object:
    prepare_commit writes+fsyncs the pending file, commit atomically
    renames it (the split inside commit_manifest, exposed), rollback
    deletes the pending file — the IndexWriter
    prepareCommit/commit/rollback contract."""

    def __init__(self, index_dir: str, manifest: dict[str, Any]):
        self.index_dir = index_dir
        self.manifest = dict(manifest)
        self._gen: int | None = None
        self._pending: str | None = None

    def prepare_commit(self) -> int:
        if self._pending is not None:
            raise ValueError("prepareCommit was already called")
        os.makedirs(self.index_dir, exist_ok=True)
        gen = latest_generation(self.index_dir) + 1
        m = dict(self.manifest)
        m["generation"] = gen
        m["committed_at"] = time.time()
        pending = os.path.join(
            self.index_dir, f"_pending-manifest-{gen}.json"
        )
        with open(pending, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        self._gen, self._pending = gen, pending
        return gen

    def commit(self) -> int:
        if self._pending is None:
            raise ValueError("commit without prepareCommit")
        final = os.path.join(
            self.index_dir, f"manifest-{self._gen}.json"
        )
        os.rename(self._pending, final)
        self._pending = None
        return self._gen

    def rollback(self) -> None:
        if self._pending is not None and os.path.exists(self._pending):
            os.remove(self._pending)
        self._pending = None


def execute_two_phase(objects: list) -> None:
    """TwoPhaseCommitTool.execute (TwoPhaseCommitTool.java:58-93):
    prepare ALL objects first; any prepare failure rolls back every
    object (rollback exceptions swallowed) and raises
    PrepareCommitFailError.  Then commit all; any commit failure rolls
    back every object and raises CommitFailError.  None entries are
    skipped, as in the reference."""

    def _rollback_all():
        for o in objects:
            if o is not None:
                try:
                    o.rollback()
                except Exception:
                    pass

    for o in objects:
        try:
            if o is not None:
                o.prepare_commit()
        except Exception as ex:
            _rollback_all()
            raise PrepareCommitFailError(
                f"prepareCommit() failed on {o!r}"
            ) from ex
    for o in objects:
        try:
            if o is not None:
                o.commit()
        except Exception as ex:
            _rollback_all()
            raise CommitFailError(f"commit() failed on {o!r}") from ex
