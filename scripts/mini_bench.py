"""Subset bench with bench.py's exact methodology (dev tool).

Times the named queries at sf0.1 with the same discipline as bench.py
(warmup at sf0.001, warmup at target SF, min of 2 timed passes, forced
driver GC between shapes) so per-change before/after numbers are
comparable to the full bench without its ~18-minute wall cost.

Usage: python scripts/mini_bench.py <query> [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mdataframe_spark.cache import release_caches
from mdataframe_spark.queries import EXTRA_QUERIES, QUERIES
from mdataframe_spark.session import get_spark

ALL = {**QUERIES, **EXTRA_QUERIES}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def gc(spark):
    try:
        spark._jvm.System.gc()
    except Exception:  # noqa: BLE001
        pass


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mini_bench")
    for name in names:
        noop(ALL[name](spark, "/root/testdata/sf0.001"))
        release_caches()
    for name in names:
        noop(ALL[name](spark, sf_dir))
        release_caches()
        gc(spark)
    timings = {}
    for name in names:
        best = None
        for _ in range(2):
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"mini_bench:{name}")
            noop(ALL[name](spark, sf_dir))
            dt = round(time.time() - t0, 2)
            best = dt if best is None else min(best, dt)
            release_caches()
        gc(spark)
        timings[name] = best
    print(json.dumps({"queries": timings, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
