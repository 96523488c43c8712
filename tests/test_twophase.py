"""TwoPhaseCommit / TwoPhaseCommitTool (core/index/TwoPhaseCommit.java,
TwoPhaseCommitTool.java): multi-resource atomic commits over manifest
indexes — no Spark needed, pure manifest bookkeeping."""

import os

import pytest

from lucene_spark.index import manifest as mani
from lucene_spark.index.manifest import (
    CommitFailError,
    ManifestTwoPhaseCommit,
    PrepareCommitFailError,
    execute_two_phase,
)


def _mk(tmp_path, name):
    d = str(tmp_path / name)
    os.makedirs(d)
    return d


def test_two_indexes_commit_atomically(tmp_path):
    a, b = _mk(tmp_path, "a"), _mk(tmp_path, "b")
    execute_two_phase([
        ManifestTwoPhaseCommit(a, {"num_docs_total": 1, "batches": []}),
        ManifestTwoPhaseCommit(b, {"num_docs_total": 2, "batches": []}),
    ])
    assert mani.latest_generation(a) == 0
    assert mani.latest_generation(b) == 0
    assert mani.read_manifest(b)["num_docs_total"] == 2
    # no pending leftovers
    assert not [f for f in os.listdir(a) if f.startswith("_pending")]


class _FailingPrepare(ManifestTwoPhaseCommit):
    def prepare_commit(self):
        raise RuntimeError("disk full")


class _FailingCommit(ManifestTwoPhaseCommit):
    def commit(self):
        raise RuntimeError("rename failed")


def test_prepare_failure_rolls_back_everything(tmp_path):
    a, b = _mk(tmp_path, "a"), _mk(tmp_path, "b")
    ok = ManifestTwoPhaseCommit(a, {"batches": []})
    bad = _FailingPrepare(b, {"batches": []})
    with pytest.raises(PrepareCommitFailError, match="prepareCommit"):
        execute_two_phase([ok, bad])
    # nothing committed, nothing pending (TwoPhaseCommitTool rollback)
    assert mani.latest_generation(a) == -1
    assert mani.latest_generation(b) == -1
    assert not [f for f in os.listdir(a) if f.startswith("_pending")]


def test_commit_failure_raises_commit_fail(tmp_path):
    a, b = _mk(tmp_path, "a"), _mk(tmp_path, "b")
    bad = _FailingCommit(a, {"batches": []})
    ok = ManifestTwoPhaseCommit(b, {"batches": []})
    with pytest.raises(CommitFailError, match="commit"):
        execute_two_phase([bad, ok])
    # the failing object never published; the other rolled back its
    # pending file (reference: rollback(objects) on commit failure)
    assert mani.latest_generation(a) == -1
    assert not [f for f in os.listdir(b) if f.startswith("_pending")]


def test_none_entries_skipped(tmp_path):
    a = _mk(tmp_path, "a")
    execute_two_phase([None, ManifestTwoPhaseCommit(a, {"batches": []})])
    assert mani.latest_generation(a) == 0


def test_double_prepare_raises(tmp_path):
    a = _mk(tmp_path, "a")
    t = ManifestTwoPhaseCommit(a, {"batches": []})
    t.prepare_commit()
    with pytest.raises(ValueError, match="already called"):
        t.prepare_commit()
    t.rollback()
    with pytest.raises(ValueError, match="without prepareCommit"):
        t.commit()


def test_sequential_generations(tmp_path):
    a = _mk(tmp_path, "a")
    for i in range(3):
        execute_two_phase([
            ManifestTwoPhaseCommit(a, {"batches": [], "i": i})
        ])
    assert mani.latest_generation(a) == 2
    assert mani.read_manifest(a)["i"] == 2
