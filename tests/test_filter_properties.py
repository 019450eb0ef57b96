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
