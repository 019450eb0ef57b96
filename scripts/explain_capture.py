"""Capture .explain("formatted") for named queries into plans/r13/.

Usage: python scripts/explain_capture.py <suffix> [query ...]
  suffix: "before" or "after" — the file becomes plans/r13/<query>_<suffix>.txt
  with no query names, captures the full bench HEADLINE list.

Plans are captured at sf0.1 (the bench SF) so join-strategy and AQE
decisions match what the bench actually measures; the capture runs
explain only (no action), so persisted intermediates inside builders
are registered but never materialized — release_caches() between
queries keeps the session clean anyway.
"""
from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mdataframe_spark.cache import release_caches
from mdataframe_spark.queries import EXTRA_QUERIES, QUERIES
from mdataframe_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
OUT_DIR = Path(__file__).resolve().parent.parent / "plans" / "r14"

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain_capture")
    for name in names:
        try:
            df = ALL_QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (OUT_DIR / f"{name}_{suffix}.txt").write_text(buf.getvalue())
            print(f"{name}: ok ({len(buf.getvalue())} chars)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")
        finally:
            release_caches()


if __name__ == "__main__":
    main()
