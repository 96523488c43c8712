import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from lucene_spark import get_spark

    s = get_spark("lucene_spark_tests", cores=4)
    yield s


@pytest.fixture(scope="session")
def corpus():
    from lucene_spark.fixtures import generate_source_files

    return generate_source_files(400, seed=42)


@pytest.fixture(scope="session")
def built_index(spark, corpus, tmp_path_factory):
    """Build the test index once per session; reused by query tests."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    idx = str(tmp_path_factory.mktemp("index") / "idx")
    src = spark.createDataFrame(corpus)
    cfg = IndexConfig(docs_per_segment=100, num_batches=2)
    build_index(spark, src, idx, cfg)
    return IndexReader(spark, idx)


@pytest.fixture(scope="session")
def oracle_index(corpus):
    """Oracle over the same corpus with the same doc_id order:
    sort by (repo, path, commit)."""
    import numpy as np

    from lucene_spark.analysis import StandardAnalyzer
    from lucene_spark.oracle import OracleIndex

    srt = corpus.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    return OracleIndex(
        np.arange(len(srt), dtype=np.int64),
        srt["content"].tolist(),
        StandardAnalyzer(),
    )
