"""Property-based tests for the round-8 warehouse algebra: cdc_apply
replays last-writer-wins exactly (vs an independent dict replay) and
scd2_compact is idempotent and version-coverage-preserving — the
invariants a warehouse user relies on without reading the plan."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mdataframe_spark.operators.scd import cdc_apply, scd2_compact

_HC = [HealthCheck.function_scoped_fixture]


# a change log: per key, a sequence of (op, value) changes; seq is the
# position (unique per key by construction — the operator's contract)
logs = st.dictionaries(
    st.integers(min_value=0, max_value=5),
    st.lists(
        st.tuples(
            st.sampled_from(["upsert", "delete"]),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=12, deadline=None, suppress_health_check=_HC)
@given(log=logs)
def test_cdc_apply_is_last_writer_wins(spark, log):
    rows = [
        (k, seq, op, val)
        for k, changes in log.items()
        for seq, (op, val) in enumerate(changes)
    ]
    df = spark.createDataFrame(rows, "k int, seq int, op string, val int")
    got = {
        r["k"]: (r["seq"], r["val"])
        for r in cdc_apply(df, ["k"], ["seq"]).collect()
    }
    # independent replay: the final change decides everything
    expected = {}
    for k, changes in log.items():
        op, val = changes[-1]
        if op != "delete":
            expected[k] = (len(changes) - 1, val)
    assert got == expected


# per-key contiguous version chains: attrs drawn from a 2-letter
# alphabet, validity [i, i+1) with the last version open
chains = st.dictionaries(
    st.integers(min_value=0, max_value=3),
    st.lists(st.sampled_from(["A", "B"]), min_size=1, max_size=7),
    min_size=1,
    max_size=4,
)


def _chain_rows(chain):
    rows = []
    for k, attrs in chain.items():
        for i, a in enumerate(attrs):
            vt = i + 2 if i + 1 < len(attrs) else None
            rows.append((k, a, i + 1, vt))
    return rows


@settings(max_examples=12, deadline=None, suppress_health_check=_HC)
@given(chain=chains)
def test_scd2_compact_matches_reference_and_is_idempotent(spark, chain):
    df = spark.createDataFrame(
        _chain_rows(chain), "k int, attr string, valid_from int, valid_to int"
    )
    out = scd2_compact(df, "k", ["attr"])
    got = sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    )
    # independent reference: merge adjacent equal-attr runs
    expected = []
    for k, attrs in chain.items():
        start = 0
        for i in range(1, len(attrs) + 1):
            if i == len(attrs) or attrs[i] != attrs[start]:
                vt = i + 1 if i < len(attrs) else None
                expected.append((k, attrs[start], start + 1, vt))
                start = i
    assert got == sorted(expected)
    # idempotence: compacting the compacted history changes nothing
    again = sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"])
        for r in scd2_compact(out, "k", ["attr"]).collect()
    )
    assert again == got
    # coverage preservation: every original version instant stays
    # covered by exactly one compacted row of the same attribute
    for k, attrs in chain.items():
        for i, a in enumerate(attrs):
            covering = [
                row
                for row in got
                if row[0] == k
                and row[2] <= i + 1
                and (row[3] is None or row[3] > i + 1)
            ]
            assert len(covering) == 1 and covering[0][1] == a
