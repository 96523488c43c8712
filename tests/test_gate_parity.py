"""Mirror of the driver's correctness gate: run every gate query through
the Spark engine AND its DuckDB oracle SQL on the same parquet, compare
row sets (order-insensitive, column-name-sorted) — catching any drift
before the driver does."""

import duckdb
import pandas as pd
import pytest

from lucene_spark.gate import gate_oracle_sql, gate_queries

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


NAMES = sorted(gate_queries())


@pytest.mark.parametrize("name", NAMES)
def test_gate_query_matches_duckdb(name, spark, ddb):
    fn = gate_queries()[name]
    sql = gate_oracle_sql().get(name)
    if sql is None:
        # non-SQL-expressible op: the driver runs a rows-only check
        out = fn(spark, SF_DIR).toPandas()
        assert len(out) > 0
        return
    got = normalize(fn(spark, SF_DIR).toPandas())
    want = normalize(ddb.execute(sql).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), (
            f"{name} col {c}:\n{got}\nvs\n{want}"
        )
