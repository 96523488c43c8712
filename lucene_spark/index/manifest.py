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
