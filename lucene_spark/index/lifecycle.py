"""Commit-point lifecycle: snapshots, file GC, and replication.

Three reference roles over the manifest/parquet index layout:

- **SnapshotDeletionPolicy** (core/.../index/SnapshotDeletionPolicy.java:
  snapshot()/release() ref-count commit points so they survive deletion
  policy GC): `snapshot` pins the latest committed generation in a
  ref-counted ``snapshots.json``; `release_snapshot` unpins.
- **IndexFileDeleter / KeepOnlyLastCommitDeletionPolicy**
  (core/.../index/IndexFileDeleter.java — files are only deleted once no
  retained commit references them): `gc_index` removes batch partition
  directories and manifest generations referenced by neither the latest
  commit nor any snapshot.
- **Replicator** (lucene/replicator/.../IndexReplicationHandler.java —
  copy the revision's files first, publish its segments_N last, so a
  replica is always a readable commit): `replicate` incrementally syncs
  one committed generation into a destination directory.

Everything here is driver-side metadata bookkeeping over the manifest —
the per-batch parquet directories are the unit of retention, exactly as
segment files are Lucene's unit. At real scale these are object-store
prefixes and the copy loop becomes a distributed copy job; the
manifest-diff logic is unchanged.

Caller coordination matches the reference: `gc_index` must not run
concurrently with a writer (IndexWriter owns IndexFileDeleter under its
lock); readers opened on an already-read manifest keep working because
they only reference live batches.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from lucene_spark.index import manifest as mani

# tables partitioned by batch=N whose retention follows segment liveness
_SEGMENT_TABLES = ("postings", "doclens")
# the docs registry is never rewritten by merges (merged segments reuse
# the original doc rows), so every build/addIndexes batch stays live
_REGISTRY_TABLE = "docs"

_SNAPSHOTS = "snapshots.json"


def _read_snapshots(index_dir: str) -> dict[int, int]:
    p = os.path.join(index_dir, _SNAPSHOTS)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {int(k): int(v) for k, v in json.load(f).items()}


def _write_snapshots(index_dir: str, snaps: dict[int, int]) -> None:
    p = os.path.join(index_dir, _SNAPSHOTS)
    tmp = f"{p}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({str(k): v for k, v in snaps.items()}, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def snapshot(index_dir: str) -> int:
    """Pin the latest committed generation (SnapshotDeletionPolicy
    .snapshot()). Returns the pinned generation; ref-counted, so two
    snapshots of the same commit need two releases."""
    gen = mani.latest_generation(index_dir)
    if gen < 0:
        raise FileNotFoundError(f"no committed manifest in {index_dir}")
    snaps = _read_snapshots(index_dir)
    snaps[gen] = snaps.get(gen, 0) + 1
    _write_snapshots(index_dir, snaps)
    return gen


def release_snapshot(index_dir: str, generation: int) -> None:
    """Unpin one reference to `generation` (SnapshotDeletionPolicy
    .release())."""
    snaps = _read_snapshots(index_dir)
    if snaps.get(generation, 0) <= 0:
        raise KeyError(f"generation {generation} is not snapshotted")
    snaps[generation] -= 1
    if snaps[generation] == 0:
        del snaps[generation]
    _write_snapshots(index_dir, snaps)


def snapshots(index_dir: str) -> dict[int, int]:
    """Currently pinned generations -> refcount (getSnapshots())."""
    return _read_snapshots(index_dir)


def referenced_batches(m: dict[str, Any]) -> dict[str, set[int]]:
    """Per-table batch numbers one committed manifest references.

    postings/doclens: batches whose segments are still live (merge
    inputs fall out once replaced). docs: every build/addIndexes batch.
    deletes / dv_updates: exactly the batches the manifest lists.
    """
    live = mani.live_segment_ids(m)
    seg_live: set[int] = set()
    for b in m.get("batches", []):
        segs = {s["segment_id"] for s in b["segments"]}
        if live is None or (segs & live):
            seg_live.add(int(b["batch"]))
    for mg in m.get("merges", []):
        segs = {s["segment_id"] for s in mg["segments"]}
        if live is None or (segs & live):
            seg_live.add(int(mg["batch"]))
    out = {t: set(seg_live) for t in _SEGMENT_TABLES}
    out[_REGISTRY_TABLE] = {int(b["batch"]) for b in m.get("batches", [])}
    out["deletes"] = {int(d["batch"]) for d in m.get("delete_batches", [])}
    out["dv_updates"] = {
        int(d["batch"]) for d in m.get("dv_update_batches", [])
    }
    return out


def _on_disk_batches(index_dir: str, table: str) -> set[int]:
    d = os.path.join(index_dir, table)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("batch="):
            try:
                out.add(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return out


def gc_index(
    index_dir: str, policy: str = "keep_last", keep_n: int = 1
) -> dict[str, Any]:
    """Delete batch directories and manifest files referenced by
    neither the retained commits nor any snapshotted generation
    (IndexFileDeleter under a pluggable IndexDeletionPolicy).
    Policies, mirroring core/index/:

    - ``keep_last``   — KeepOnlyLastCommitDeletionPolicy.java (the
      IndexWriterConfig default): only the latest commit survives;
    - ``keep_last_n`` — KeepLastNCommitsDeletionPolicy.java: the
      newest ``keep_n`` generations survive;
    - ``none``        — NoDeletionPolicy.java: every commit survives
      (the GC is a no-op beyond reporting).

    Snapshots always pin their generations on top of the policy —
    and because _read_snapshots/_write_snapshots keep the pin set in
    a FILE next to the manifests, the snapshot policy here is the
    PERSISTENT form (PersistentSnapshotDeletionPolicy.java: snapshots
    survive process restarts).

    Returns {"removed_dirs": [...], "removed_manifests": [...],
    "kept_gens": [...]}."""
    latest = mani.latest_generation(index_dir)
    if latest < 0:
        raise FileNotFoundError(f"no committed manifest in {index_dir}")
    all_gens = sorted(
        int(m.group(1))
        for f in os.listdir(index_dir)
        if (m := mani._GEN_RE.match(f))
    )
    if policy == "keep_last":
        retained = {latest}
    elif policy == "keep_last_n":
        if keep_n < 1:
            raise ValueError("keep_n must be >= 1")
        retained = set(all_gens[-keep_n:]) | {latest}
    elif policy == "none":
        retained = set(all_gens)
    else:
        raise ValueError(f"unknown deletion policy {policy!r}")
    keep_gens = sorted(retained | set(_read_snapshots(index_dir)))
    keep: dict[str, set[int]] = {}
    for gen in keep_gens:
        for table, batches in referenced_batches(
            mani.read_manifest(index_dir, gen)
        ).items():
            keep.setdefault(table, set()).update(batches)

    removed_dirs: list[str] = []
    for table in (*_SEGMENT_TABLES, _REGISTRY_TABLE, "deletes", "dv_updates"):
        for b in sorted(_on_disk_batches(index_dir, table) - keep.get(table, set())):
            path = os.path.join(index_dir, table, f"batch={b}")
            shutil.rmtree(path)
            removed_dirs.append(f"{table}/batch={b}")

    removed_manifests: list[int] = []
    for f in os.listdir(index_dir):
        m = mani._GEN_RE.match(f)
        if m and int(m.group(1)) not in keep_gens:
            os.remove(os.path.join(index_dir, f))
            removed_manifests.append(int(m.group(1)))
    return {
        "removed_dirs": removed_dirs,
        "removed_manifests": sorted(removed_manifests),
        "kept_gens": keep_gens,
    }


def _iter_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            full = os.path.join(dirpath, fn)
            out.append(os.path.relpath(full, root))
    return sorted(out)


def replicate(
    src_dir: str, dst_dir: str, generation: int | None = None
) -> dict[str, Any]:
    """Incrementally sync one committed generation of `src_dir` into
    `dst_dir` (replicator module: copy the revision's data files first,
    publish its manifest LAST, so the replica directory is a readable
    commit at every instant). A file already present with the same size
    is skipped — repeated calls only move new batches. Returns
    {"generation": g, "files_copied": n, "files_skipped": n}.

    The unpartitioned stats tables are copied as they currently stand in
    `src_dir`; replicating the LATEST generation (the normal replicator
    flow) they are exactly that revision's stats. For an older pinned
    generation they may be newer — stats are derivable from doclens, so
    a replica needing bit-exact old stats recomputes them (the same
    _recompute_stats pass the merge path runs).
    """
    gen = mani.latest_generation(src_dir) if generation is None else generation
    m = mani.read_manifest(src_dir, gen)
    refs = referenced_batches(m)

    wanted: list[str] = []
    for table, batches in refs.items():
        for b in sorted(batches):
            broot = os.path.join(src_dir, table, f"batch={b}")
            if os.path.isdir(broot):
                wanted += [
                    os.path.join(table, f"batch={b}", rel)
                    for rel in _iter_files(broot)
                ]
    # Unpartitioned stats tables ride along with every revision. They are
    # rewritten in place (new part-file names) by merges, so they must be
    # MIRRORED: a destination part file the source no longer has would
    # otherwise accumulate and double-count every statistic.
    removed = 0
    for table in ("term_stats", "field_stats"):
        troot = os.path.join(src_dir, table)
        if not os.path.isdir(troot):
            continue
        src_files = set(_iter_files(troot))
        wanted += [os.path.join(table, rel) for rel in sorted(src_files)]
        droot = os.path.join(dst_dir, table)
        if os.path.isdir(droot):
            for rel in _iter_files(droot):
                if rel not in src_files:
                    os.remove(os.path.join(droot, rel))
                    removed += 1

    copied = skipped = 0
    for rel in wanted:
        src = os.path.join(src_dir, rel)
        dst = os.path.join(dst_dir, rel)
        if os.path.exists(dst) and os.path.getsize(dst) == os.path.getsize(src):
            skipped += 1
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = f"{dst}.tmp.{os.getpid()}"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)
        copied += 1

    # publish last: the manifest only becomes visible once its files are in
    mpath = os.path.join(dst_dir, f"manifest-{gen}.json")
    if not os.path.exists(mpath):
        tmp = f"{mpath}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, mpath)
        copied += 1
    else:
        skipped += 1
    return {
        "generation": gen,
        "files_copied": copied,
        "files_skipped": skipped,
        "files_removed": removed,
    }
