"""IDVersion postings (sandbox/codecs/idversion/): versioned primary
keys, seekExact strict-greater semantics, duplicate/bounds guards, and
the terms-index-style manifest file prune."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import idversion as idv


@pytest.fixture(scope="module")
def sidecar(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idv") / "idx")
    df = spark.createDataFrame(
        [(f"id{i:04d}", i % 100) for i in range(1000)],
        "pk string, ver long",
    )
    idv.build_idversion_sidecar(df, "pk", "ver", path, num_files=4)
    return path


def test_duplicate_id_raises(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3)], "pk string, ver long")
    with pytest.raises(ValueError, match="more than once"):
        idv.build_idversion_sidecar(df, "pk", "ver", str(tmp_path / "x"))


def test_version_bounds_raise(spark, tmp_path):
    df = spark.createDataFrame([("a", -1)], "pk string, ver long")
    with pytest.raises(ValueError, match="version must be"):
        idv.build_idversion_sidecar(df, "pk", "ver", str(tmp_path / "y"))
    df2 = spark.createDataFrame(
        [("a", idv.MAX_VERSION + 1)], "pk string, ver long")
    with pytest.raises(ValueError, match="version must be"):
        idv.build_idversion_sidecar(df2, "pk", "ver", str(tmp_path / "z"))


def test_seek_exact_strictly_greater(spark, sidecar):
    # id0042 has version 42: > 41 yes, > 42 NO (equal answers false)
    assert idv.seek_exact(spark, sidecar, ["id0042"], 41).count() == 1
    assert idv.seek_exact(spark, sidecar, ["id0042"], 42).count() == 0
    # absent id never answers
    assert idv.seek_exact(spark, sidecar, ["nope"], -1).count() == 0


def test_seek_exact_manifest_prune(spark, sidecar):
    # a probe outside every file's id range reads nothing: the pruned
    # reader is an empty frame built WITHOUT scanning data files
    d = idv._read_pruned(spark, sidecar, ["zzzz9999"])
    assert d.count() == 0
    # a real probe keeps only the file(s) covering its range
    manifest = spark.read.parquet(f"{sidecar}/manifest").collect()
    d2 = idv._read_pruned(spark, sidecar, ["id0001"])
    n_files = d2.select(F.input_file_name()).distinct().count()
    assert n_files < len(manifest)


def test_admit_batch(spark, sidecar):
    batch = spark.createDataFrame(
        [("id0010", 11), ("id0011", 11), ("id0012", 12), ("new01", 0)],
        "pk string, ver long",
    )
    out = idv.admit_batch(spark, sidecar, batch, "pk", "ver").toPandas()
    got = dict(zip(out.id, out.admitted))
    # current: id0010 -> 10, id0011 -> 11, id0012 -> 12
    assert got == {
        "id0010": True,   # 11 > 10
        "id0011": False,  # 11 == 11 loses (strict)
        "id0012": False,  # 12 == 12 loses
        "new01": True,    # absent admits
    }
