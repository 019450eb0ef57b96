"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship query at sf0.001; queries() exposes one
callable per implemented operator from SURVEY.md §2 (plus training-data
extensions); oracle_sql() gives the DuckDB-equivalent SQL for each
(omitted for the genuinely non-SQL-expressible ops, which the driver
records as rows-only checks).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mdataframe_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
