"""End-to-end spark-submit test: the real `spark-submit --py-files`
launch path (north-rule run mode) builds, merges, searches, and checks
an index from a clean subprocess."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


def _submit(pyfiles, *args):
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", pyfiles,
        os.path.join(REPO, "submit.py"),
        *args,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stdout[-2000:]
    return json.loads(lines[-1])


@pytest.fixture(scope="module")
def pyfiles():
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from lucene_spark.session import make_pyfiles_zip as z; print(z())" % REPO],
        capture_output=True, text=True, check=True,
    )
    return out.stdout.strip().splitlines()[-1]


def test_spark_submit_build_search_check(pyfiles, corpus, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(src)
    pq.write_table(pa.Table.from_pandas(corpus), f"{src}/part0.parquet")

    rep = _submit(
        pyfiles, "build", "--source", src, "--index", idx,
        "--docs-per-segment", "100", "--num-batches", "2",
    )
    assert rep["num_docs"] == len(corpus)

    rep = _submit(pyfiles, "merge", "--index", idx, "--force", "1")
    assert rep["rounds"] >= 1

    rep = _submit(pyfiles, "search", "--index", idx, "--query", "def AND return")
    assert rep["hits"] and rep["total_hits"] > 0

    rep = _submit(pyfiles, "check", "--index", idx)
    assert rep["ok"], rep["violations"][:5]


def test_spark_submit_inspect_split_upgrade(pyfiles, corpus, tmp_path):
    """The misc/luke/backward-codecs tool subcommands through the real
    spark-submit launch path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    os.makedirs(src)
    pq.write_table(pa.Table.from_pandas(corpus), f"{src}/part0.parquet")
    _submit(pyfiles, "build", "--source", src, "--index", idx,
            "--docs-per-segment", "200")

    rep = _submit(pyfiles, "inspect", "--index", idx,
                  "--field", "content", "--top", "5")
    assert rep["overview"]["num_docs"] == len(corpus)
    assert len(rep["high_freq_terms"]) == 5
    assert rep["segments"]

    rep = _submit(pyfiles, "upgrade", "--index", idx, "--format", "varint")
    assert rep["generation"] >= 1
    rep = _submit(pyfiles, "check", "--index", idx)
    assert rep["ok"]

    rep = _submit(
        pyfiles, "split", "--index", idx,
        "--out-pass", str(tmp_path / "p"), "--out-fail", str(tmp_path / "f"),
        "--predicate", "doc_id % 2 = 0",
    )
    assert rep["pass_docs"] + rep["fail_docs"] == len(corpus)
    assert rep["pass_docs"] > 0 and rep["fail_docs"] > 0


def test_spark_submit_replicate(pyfiles, corpus, tmp_path):
    """The replicator/nrt sync subcommand through real spark-submit:
    replica converges to the primary's newest generation and the synced
    directory passes CheckIndex."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    idx = str(tmp_path / "primary")
    rep_dir = str(tmp_path / "replica")
    os.makedirs(src)
    pq.write_table(pa.Table.from_pandas(corpus), f"{src}/part0.parquet")
    _submit(pyfiles, "build", "--source", src, "--index", idx,
            "--docs-per-segment", "200")

    rep = _submit(pyfiles, "replicate", "--primary", idx,
                  "--replica", rep_dir)
    assert rep["generation"] >= 0 and rep["files_copied"] > 0
    # second sync is incremental: nothing to move
    rep2 = _submit(pyfiles, "replicate", "--primary", idx,
                   "--replica", rep_dir)
    assert rep2["files_copied"] == 0
    chk = _submit(pyfiles, "check", "--index", rep_dir)
    assert chk["ok"]


def test_spark_submit_pipeline_subcommands(pyfiles, tmp_path):
    """dedup / quality / ann through real spark-submit — the curation
    pipeline's production entrypoints (north rule: spark-submit
    --py-files)."""
    src = "/root/testdata/sf0.001/documents.parquet"
    emb = "/root/testdata/sf0.001/embeddings.parquet"

    d = _submit(pyfiles, "dedup", "--source", src,
                "--out", str(tmp_path / "dd"), "--method", "exact")
    assert d["rows"] > 0

    q = _submit(pyfiles, "quality", "--source", src,
                "--out", str(tmp_path / "q"))
    assert q["rows"] == 500

    a = _submit(pyfiles, "ann", "--source", emb, "--method", "routed",
                "--k", "5")
    assert len(a["hits"]) == 5
    sims = [h[1] for h in a["hits"]]
    assert sims == sorted(sims, reverse=True)
