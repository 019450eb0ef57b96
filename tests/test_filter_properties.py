"""Property-based filter-algebra tests (SURVEY §5.2 item 4) using
hypothesis: the compiled Column predicates must satisfy boolean
algebra — De Morgan duality between quantifiers, and/or combinator
semantics, k-of-n monotonicity — on arbitrary numeric frames."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mdataframe_spark import Filter

COLS = ["a", "b", "c"]


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    vals = draw(
        st.lists(
            st.tuples(*[st.integers(min_value=-5, max_value=5) for _ in COLS]),
            min_size=n, max_size=n,
        )
    )
    return [(f"r{i}", *row) for i, row in enumerate(vals)]


def survivors(spark, rows, flt):
    df = spark.createDataFrame(rows, ["__row_id", *COLS])
    return {r["__row_id"] for r in flt(df).collect()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=frames(), t=st.integers(min_value=-4, max_value=4))
def test_all_is_conjunction_of_singles(spark, rows, t):
    all_of = survivors(spark, rows, Filter([(COLS, "a>", t)]))
    singles = [survivors(spark, rows, Filter([(c, ">", t)])) for c in COLS]
    assert all_of == set.intersection(*singles)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=frames(), t=st.integers(min_value=-4, max_value=4))
def test_one_of_is_disjunction_of_singles(spark, rows, t):
    one_of = survivors(spark, rows, Filter([(COLS, "1>", t)]))
    singles = [survivors(spark, rows, Filter([(c, ">", t)])) for c in COLS]
    assert one_of == set.union(*singles)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=frames(), t=st.integers(min_value=-4, max_value=4),
       k=st.integers(min_value=1, max_value=3))
def test_k_of_n_monotone_in_k(spark, rows, t, k):
    at_k = survivors(spark, rows, Filter([(COLS, f"{k}>", t)]))
    if k < 3:
        at_k1 = survivors(spark, rows, Filter([(COLS, f"{k + 1}>", t)]))
        assert at_k1 <= at_k


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=frames(), t1=st.integers(min_value=-4, max_value=4),
       t2=st.integers(min_value=-4, max_value=4))
def test_combinators_match_set_algebra(spark, rows, t1, t2):
    f1, f2 = Filter([("a", ">", t1)]), Filter([("b", "<", t2)])
    s1, s2 = survivors(spark, rows, f1), survivors(spark, rows, f2)
    assert survivors(spark, rows, f1 & f2) == (s1 & s2)
    assert survivors(spark, rows, f1 | f2) == (s1 | s2)


# ---------------------------------------------------------------------------
# chunk_documents invariants (round 6): window algebra on arbitrary
# token counts and (chunk_tokens, overlap) shapes
# ---------------------------------------------------------------------------
@st.composite
def chunk_cases(draw):
    chunk_tokens = draw(st.integers(min_value=2, max_value=12))
    overlap = draw(st.integers(min_value=0, max_value=chunk_tokens - 1))
    n_tokens = draw(st.integers(min_value=1, max_value=60))
    return chunk_tokens, overlap, n_tokens


@given(chunk_cases())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunk_documents_covers_every_token_once_per_window(spark, case):
    from mdataframe_spark.operators.text import chunk_documents

    chunk_tokens, overlap, n_tokens = case
    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id int, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap).collect(),
        key=lambda r: r["chunk_id"],
    )
    step = chunk_tokens - overlap
    # 1. every token appears in at least one chunk (full coverage)
    covered = set()
    for r in rows:
        s = r["start_token"]
        covered.update(range(s, s + r["n_chunk_tokens"]))
        # chunk text round-trips exactly to the token slice
        assert r["chunk_text"].split(" ") == toks[s - 1 : s - 1 + r["n_chunk_tokens"]]
    assert covered == set(range(1, n_tokens + 1))
    # 2. starts advance by exactly step; chunk_ids are the start index
    for r in rows:
        assert r["start_token"] == 1 + r["chunk_id"] * step
    # 3. no chunk is a strict suffix of its predecessor (dedup guarantee)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["start_token"] + cur["n_chunk_tokens"] > (
            prev["start_token"] + prev["n_chunk_tokens"]
        )


@given(st.lists(st.tuples(st.integers(0, 30), st.sampled_from(["x", "y", "z"])),
                min_size=0, max_size=25, unique_by=lambda t: t[0]),
       st.lists(st.tuples(st.integers(0, 30), st.sampled_from(["x", "y", "z"])),
                min_size=0, max_size=25, unique_by=lambda t: t[0]))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_corpus_diff_is_a_partition_of_the_id_union(spark, old_rows, new_rows):
    from mdataframe_spark.operators.datasets import corpus_diff

    schema = "doc_id int, text string"
    old = spark.createDataFrame(old_rows, schema) if old_rows else \
        spark.createDataFrame([], schema)
    new = spark.createDataFrame(new_rows, schema) if new_rows else \
        spark.createDataFrame([], schema)
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    o = dict(old_rows)
    n = dict(new_rows)
    # exactly one status per id in the union, matching set algebra
    assert set(got) == set(o) | set(n)
    for i, status in got.items():
        if i not in o:
            assert status == "added"
        elif i not in n:
            assert status == "removed"
        elif o[i] == n[i]:
            assert status == "unchanged"
        else:
            assert status == "changed"
