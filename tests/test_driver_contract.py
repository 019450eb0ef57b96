"""Driver-contract robustness: the driver runs queries() with ITS OWN
SparkSession (different shuffle settings, none of our session defaults
pre-applied). Simulate with a newSession() carrying driver-ish runtime
confs, execute every registered query at sf0.001, and check the
column names against the DuckDB oracle's output schema (the driver's
compare sorts columns by name — a name mismatch is an automatic fail
even with correct values)."""

import duckdb
import pytest

from mdataframe_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def foreign_spark(spark):
    """A session the engine did not configure: default-ish confs."""
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "200")
    s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    return s


@pytest.fixture(scope="module")
def oracle_columns():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    cols = {}
    for name, sql in ORACLES.items():
        res = con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
        cols[name] = sorted(d[0] for d in res.description)
    return cols


def test_oracle_keys_subset():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_on_foreign_session(foreign_spark, oracle_columns, name):
    df = QUERIES[name](foreign_spark, SF_DIR)
    assert df.count() >= 0
    if name in oracle_columns:
        assert sorted(df.columns) == oracle_columns[name], name
