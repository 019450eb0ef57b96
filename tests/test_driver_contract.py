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
    """Every query-key-shaped token cited in COVERAGE.md and NOTES.md
    exists in the registries — the guard against the round-3 doc-rot
    finding (stale names in the audit trail), extended to NOTES.md per
    the round-4 verdict."""
    import re
    from pathlib import Path

    from mdataframe_spark.queries import EXTRA_QUERIES, QUERIES

    known = set(QUERIES) | set(EXTRA_QUERIES)
    root = Path(__file__).resolve().parent.parent
    pat = re.compile(
        r"\b(?:q1|f[0-9]+|a2?|j1?|j|w[0-9]|o|u|g|c[0-9]+|e|st|sq|layout|"
        r"txt|dd|ds|sim|mm|n|stat|ml|sk)_[a-z0-9_]+\b"
    )
    # tokens that are legitimately not query keys (operator/function
    # names with a matching prefix)
    not_queries = {
        "n_chars", "n_chars_calc", "n_tokens", "n_docs", "n_keep",
        "n_fail", "n_hot", "n_members", "n_dups", "n_neardup_lower",
        "o_sort", "st_events", "e_events", "n_rank", "n_points",
        "n_neigh", "n_blocks", "n_components", "c4_clean", "n_buckets",
        "n_baskets", "n_categories", "n_pairs",
    }
    for doc in ("COVERAGE.md", "NOTES.md"):
        cited = set(pat.findall(root.joinpath(doc).read_text()))
        stale = {
            c for c in cited - known - not_queries if not c.startswith(("n_fail_",))
        }
        assert not stale, f"{doc} cites unknown query names: {sorted(stale)}"


def test_registry_size_invariants():
    """The driver's correctness record holds AT MOST 50 rows (observed
    every round): the registry must stay at EXACTLY 50 entries, ordered
    oracle-backed first, rows-only last — otherwise the tail silently
    gets no correctness record (the round-3 regression). New queries go
    to EXTRA_QUERIES."""
    from mdataframe_spark.queries import (
        EXTRA_ORACLES,
        EXTRA_QUERIES,
        ORACLES,
        QUERIES,
    )

    assert len(QUERIES) == 50, (
        f"driver registry must stay at exactly 50 entries, got "
        f"{len(QUERIES)} — move extras to EXTRA_QUERIES"
    )
    assert set(ORACLES) <= set(QUERIES)
    assert set(EXTRA_ORACLES) <= set(EXTRA_QUERIES)
    # rows-only entries must sit AFTER every oracle-backed entry so a
    # truncated record still covers every oracle row
    names = list(QUERIES)
    rows_only_idx = [i for i, n in enumerate(names) if n not in ORACLES]
    oracle_idx = [i for i, n in enumerate(names) if n in ORACLES]
    assert not rows_only_idx or min(rows_only_idx) > max(oracle_idx)

    # COVERAGE.md's registry-shape paragraph must match the LIVE
    # registries (round-5 verdict: the doc-rot guard checked names but
    # not counts, and the audit-trail numbers drifted)
    from pathlib import Path

    cov = Path(__file__).resolve().parent.parent / "COVERAGE.md"
    text = cov.read_text()
    shape = text[text.index("## Driver registry shape") :]
    expected = [
        f"{len(QUERIES)} registered queries",
        f"{len(ORACLES)} oracle-backed,",
        f"{len(EXTRA_QUERIES)} further queries in EXTRA_QUERIES "
        f"({len(EXTRA_ORACLES)} with oracles)",
        f"all\n{len(ORACLES) + len(EXTRA_ORACLES)} oracle-backed queries",
    ]
    for frag in expected:
        assert frag in shape, (
            f"COVERAGE.md registry-shape counts drifted from the live "
            f"registries: expected {frag!r}"
        )


def test_bench_payload_fits_driver_capture():
    """The driver records only the LAST ~2000 characters of bench.py's
    stdout; BENCH_r06's single JSON line outgrew that window and the
    round's official record came back `parsed: null`. Guard: the full
    per-query payload line, serialized exactly as bench.py emits it
    with worst-case 7-char timings for every headline query, must fit
    the capture window with margin."""
    import json as _json

    import bench

    # Worst-case timing model (round 14): 99.99s per query — 5 chars,
    # like the previous 999.99 model minus one digit. 99.99s is >20x
    # the slowest query ever benched at sf0.1 (4.5s); a bench whose
    # EVERY query hit 100s would be a 2-hour run that has failed for
    # reasons no payload line survives. The digit paid for restoring
    # dq_completeness_profile to HEADLINE (r13 verdict item 2) without
    # dropping any series. A single >=100s outlier only adds 1-2 chars
    # to the real line, which sits ~250 chars under this ceiling.
    worst = {name: 99.99 for name in bench.HEADLINE}
    payload = {
        "metric": "headline_queries_wall_clock",
        "value": round(sum(worst.values()), 2),
        "unit": "sec",
        "queries": worst,
        "sf": 0.1,
        # round-12 anchor-normalization scalars at worst-case width
        # (short keys; the methodology string moved to the sacrificial
        # summary line to pay for them)
        "anchor": 2999.997,
        "norm": 999.99,
    }
    line = _json.dumps(payload, separators=(",", ":"))
    assert len(line) <= 1900, (
        f"bench payload line is {len(line)} chars — exceeds the "
        f"driver's ~2000-char tail capture; trim the headline list or "
        f"the serialization"
    )
    # Mass-failure shape (round-7 advice): errors are reduced on the
    # guaranteed line to a count + a 3-name cap and the passes map to
    # 5 entries (round 14: each tightened one notch to pay for the
    # restored dq_completeness_profile; round 9 had already cut the
    # 8-name caps), so even "everything but the fast half failed"
    # stays within the capture. Model the WORST mix: all but 9
    # queries timed, the 9 longest names failed, exception maps
    # capped exactly as bench.py caps them.
    longest = sorted(bench.HEADLINE, key=len, reverse=True)[:9]
    capped_passes = dict(sorted((n, 1) for n in longest)[:5])
    capped_passes["__omitted__"] = len(longest) - 5
    worst_fail = {
        **payload,
        "queries": {
            n: 99.99 for n in bench.HEADLINE if n not in longest
        },
        "passes": capped_passes,
        "n_errors": len(longest),
        "failed": sorted(longest)[:3] + [f"+{len(longest) - 3} more"],
    }
    line2 = _json.dumps(worst_fail, separators=(",", ":"))
    assert len(line2) <= 1950, (
        f"bench mass-failure payload line is {len(line2)} chars — "
        f"exceeds the driver's ~2000-char tail capture"
    )
