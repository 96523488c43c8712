"""NRT segment replication — the ``replicator/nrt`` node protocol.

Reference: ``replicator/src/java/org/apache/lucene/replicator/nrt/``
— ``PrimaryNode.java`` (flushes and publishes a ``CopyState``: the
point-in-time file set + metadata of a searchable version),
``ReplicaNode.java`` (copies the missing files, then switches its
searcher to the new version — never searching a half-copied state),
``CopyState.java`` / ``FileMetaData.java`` (the wire unit: file names,
sizes, version), and ``PreCopyMergedSegmentWarmer.java`` (merged
segment files are copied to replicas BEFORE the merge is committed, so
the version flip that references them is instant).

Mapping onto the manifest/parquet layout (one generation == one
searchable version, exactly the segments_N role):

- ``PrimaryNode.copy_state()`` lists the latest generation's
  referenced files with sizes — a metadata-only operation.
- ``ReplicaNode.sync(copy_state)`` copies files it lacks and publishes
  the generation's manifest LAST (lifecycle.replicate's ordering), so
  the replica directory is a readable commit at every instant; its
  searcher version only moves forward when the manifest lands.
- ``ReplicaNode.precopy(copy_state)`` is the warmer: fetch the files
  WITHOUT publishing. A later ``sync`` for a generation referencing
  them finds every byte already local and flips instantly.

Crash behavior matches the reference's contract: a replica that dies
mid-copy restarts searching its previous version (the old manifest is
untouched); a re-sync resumes — already-copied files are skipped by
size check.

100-TB shape: file copies are object-store transfers; the node
protocol itself is O(files) metadata. Search never blocks on
replication (readers pin the generation they opened).
"""

from __future__ import annotations

import os
from typing import Any

from lucene_spark.index import lifecycle, manifest as mani

__all__ = ["CopyState", "PrimaryNode", "ReplicaNode"]


class CopyState:
    """CopyState.java: an immutable point-in-time description of one
    searchable version — generation + {relative file: size}."""

    def __init__(self, src_dir: str, generation: int,
                 files: dict[str, int]):
        self.src_dir = src_dir
        self.generation = generation
        self.files = files

    def __repr__(self) -> str:  # pragma: no cover
        return f"CopyState(gen={self.generation}, files={len(self.files)})"


class PrimaryNode:
    """PrimaryNode.java over an index directory: whoever writes (build
    / NRT appends / merges) advances generations; the primary exposes
    the newest one as a CopyState."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir

    def current_generation(self) -> int:
        return mani.latest_generation(self.index_dir)

    def copy_state(self, generation: int | None = None) -> CopyState:
        gen = (
            self.current_generation() if generation is None else generation
        )
        m = mani.read_manifest(self.index_dir, gen)
        refs = lifecycle.referenced_batches(m)
        files: dict[str, int] = {}
        for table, batches in refs.items():
            for b in sorted(batches):
                broot = os.path.join(self.index_dir, table, f"batch={b}")
                if os.path.isdir(broot):
                    for rel in lifecycle._iter_files(broot):
                        p = os.path.join(table, f"batch={b}", rel)
                        files[p] = os.path.getsize(
                            os.path.join(self.index_dir, p)
                        )
        for table in ("term_stats", "field_stats"):
            troot = os.path.join(self.index_dir, table)
            if os.path.isdir(troot):
                for rel in lifecycle._iter_files(troot):
                    p = os.path.join(table, rel)
                    files[p] = os.path.getsize(
                        os.path.join(self.index_dir, p)
                    )
        return CopyState(self.index_dir, gen, files)


class ReplicaNode:
    """ReplicaNode.java over a replica directory: version-monotonic,
    readable at every instant."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        os.makedirs(index_dir, exist_ok=True)

    def searcher_version(self) -> int:
        """The generation a searcher opened now would read (-1 before
        the first sync completes)."""
        return mani.latest_generation(self.index_dir)

    def _fetch(self, state: CopyState) -> dict[str, int]:
        import shutil

        copied = skipped = 0
        for rel, size in sorted(state.files.items()):
            dst = os.path.join(self.index_dir, rel)
            if os.path.exists(dst) and os.path.getsize(dst) == size:
                skipped += 1
                continue
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            tmp = f"{dst}.tmp.{os.getpid()}"
            shutil.copyfile(os.path.join(state.src_dir, rel), tmp)
            os.replace(tmp, dst)
            copied += 1
        return {"files_copied": copied, "files_skipped": skipped}

    def precopy(self, state: CopyState) -> dict[str, int]:
        """PreCopyMergedSegmentWarmer: pull the files of a future
        version without publishing anything — the searcher version does
        not move."""
        return self._fetch(state)

    def sync(self, state: CopyState) -> dict[str, Any]:
        """Copy what is missing, then publish the manifest LAST: the
        instant it lands the replica serves the new version; before
        that it keeps serving the old one. The SOURCE generation number
        is kept — replica versions are primary versions (ReplicaNode's
        version-alignment contract)."""
        import json

        out = self._fetch(state)
        m = mani.read_manifest(state.src_dir, state.generation)
        mpath = os.path.join(
            self.index_dir, f"manifest-{state.generation}.json"
        )
        if not os.path.exists(mpath):
            tmp = f"{mpath}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(m, f, indent=1, sort_keys=True)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, mpath)
        out["generation"] = state.generation
        return out
