"""JSONL roundtrip + bucketed-table co-located join.

The bucketed test is a PLAN assertion, not just a result assertion:
two tables bucketed identically on the join key must join with NO
Exchange operator in the physical plan — the property that makes
bucketing worth its write-time shuffle at 100 TB.
"""

import shutil
import tempfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from mdataframe_spark.session import get_spark

    s = get_spark("test_sources_bucketed", shuffle_partitions=4)
    yield s


def test_jsonl_roundtrip_and_schema_projection(spark):
    from mdataframe_spark.sources.readers import read_jsonl
    from mdataframe_spark.sources.writers import write_jsonl

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, 'quote " and \n newline', "de")],
        ["doc_id", "text", "lang"],
    )
    tmp = tempfile.mkdtemp()
    try:
        path = str(Path(tmp) / "docs.jsonl")
        write_jsonl(df, path)
        back = read_jsonl(spark, path)
        got = {r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()}
        assert got == {
            1: ("hello world", "en"),
            2: ('quote " and \n newline', "de"),
        }
        # explicit schema: no inference pass, column projection honored
        back2 = read_jsonl(spark, path, schema="doc_id LONG, lang STRING")
        assert sorted(back2.columns) == ["doc_id", "lang"]
        assert back2.count() == 2
        # partitioned layout prunes at scan time
        ppath = str(Path(tmp) / "by_lang")
        write_jsonl(df, ppath, partition_by="lang")
        pruned = read_jsonl(spark, ppath).filter(F.col("lang") == "en")
        assert [r["doc_id"] for r in pruned.collect()] == [1]
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(lang" in plan
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_is_exchange_free(spark):
    from mdataframe_spark.sources.writers import write_bucketed_table

    warehouse = tempfile.mkdtemp()
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{warehouse}'")
    facts = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    dims = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    try:
        write_bucketed_table(facts, "bktest.facts", "k", n_buckets=8, sort_cols="k")
        write_bucketed_table(dims, "bktest.dims", "k", n_buckets=8, sort_cols="k")
        f = spark.table("bktest.facts")
        d = spark.table("bktest.dims")
        # force a sort-merge join so the test exercises the bucketed
        # scan path (a broadcast join would trivially avoid exchanges)
        joined = f.hint("merge").join(d, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 100
        # identical result to the plain (shuffling) join
        plain = facts.join(dims, "k")
        assert sorted(map(tuple, joined.select("k", "v", "name").collect())) == sorted(
            map(tuple, plain.select("k", "v", "name").collect())
        )
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")
        shutil.rmtree(warehouse, ignore_errors=True)
