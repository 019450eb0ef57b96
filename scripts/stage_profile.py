"""Stage-level profile of one or more declared queries (dev tool).

Runs each named query warm (one untimed pass, then a timed pass),
then dumps every Spark stage of the timed pass from the local UI REST
API: duration, task count, input/shuffle bytes. This is the guide-§1
"which stage is slow" view without a browser.

Usage: python scripts/stage_profile.py <query> [query ...]
"""
from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mdataframe_spark.cache import release_caches
from mdataframe_spark.queries import EXTRA_QUERIES, QUERIES
from mdataframe_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
ALL = {**QUERIES, **EXTRA_QUERIES}


def api(path):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("stage_profile", extra_conf={"spark.ui.enabled": "true"})
    app_id = spark.sparkContext.applicationId
    for name in sys.argv[1:]:
        # warm pass (+ forced driver GC, mirroring bench.py's between-
        # query discipline — without it ContextCleaner backlog inflates
        # late-session queries 2-3x and the profile measures heap
        # pressure, not the plan)
        noop(ALL[name](spark, SF_DIR))
        release_caches()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        jobs_before = {j["jobId"] for j in api(f"applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        noop(ALL[name](spark, SF_DIR))
        wall = time.perf_counter() - t0
        release_caches()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        jobs = [
            j
            for j in api(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs, "
              f"{len(stage_ids)} stages ===")
        rows = []
        for sid in stage_ids:
            try:
                infos = api(f"applications/{app_id}/stages/{sid}")
            except Exception:
                continue
            import datetime

            def ts(x):
                return datetime.datetime.strptime(
                    x[:19], "%Y-%m-%dT%H:%M:%S"
                ).timestamp() + float(x[20:23] or 0) / 1000.0

            for s in infos:
                if s["status"] == "SKIPPED":
                    continue
                try:
                    wallst = ts(s["completionTime"]) - ts(s["submissionTime"])
                except Exception:
                    wallst = -1
                rows.append(
                    (
                        wallst,
                        (s.get("executorRunTime") or 0) / 1000.0,
                        (s.get("jvmGcTime") or 0) / 1000.0,
                        (s.get("executorDeserializeTime") or 0) / 1000.0,
                        sid,
                        s["numCompleteTasks"],
                        s.get("inputBytes", 0),
                        s.get("shuffleReadBytes", 0),
                        s.get("shuffleWriteBytes", 0),
                        (s.get("name") or "")[:55],
                    )
                )
        rows.sort(reverse=True)
        print(f"{'wall':>6} {'cpu':>7} {'gc':>6} {'deser':>6} {'stage':>5} "
              f"{'tasks':>5} {'input':>9} {'shufR':>9} {'shufW':>9}  name")
        for w, dur, gc, de, sid, nt, ib, sr, sw, nm in rows[:14]:
            print(f"{w:6.2f} {dur:7.2f} {gc:6.2f} {de:6.2f} {sid:5d} "
                  f"{nt:5d} {ib:9d} {sr:9d} {sw:9d}  {nm}")


if __name__ == "__main__":
    main()
