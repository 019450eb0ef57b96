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


def test_coverage_doc_names_exist():
    """Every query-key-shaped token cited in COVERAGE.md exists in the
    registries — the guard against the round-3 doc-rot finding (stale
    names in the audit trail)."""
    import re
    from pathlib import Path

    from mdataframe_spark.queries import EXTRA_QUERIES, QUERIES

    known = set(QUERIES) | set(EXTRA_QUERIES)
    text = Path(__file__).resolve().parent.parent.joinpath("COVERAGE.md").read_text()
    pat = re.compile(
        r"\b(?:q1|f[0-9]+|a2?|j1?|j|w[0-9]|o|u|g|c[0-9]+|e|st|sq|layout|"
        r"txt|dd|ds|sim|mm|n|stat|ml|sk)_[a-z0-9_]+\b"
    )
    cited = set(pat.findall(text))
    # tokens that are legitimately not query keys (operator/function
    # names with a matching prefix)
    not_queries = {
        "n_chars", "n_chars_calc", "n_tokens", "n_docs", "n_keep",
        "n_fail", "n_hot", "n_members", "n_dups", "n_neardup_lower",
        "o_sort", "st_events", "e_events",
    }
    stale = {c for c in cited - known - not_queries if not c.startswith(("n_fail_",))}
    assert not stale, f"COVERAGE.md cites unknown query names: {sorted(stale)}"
