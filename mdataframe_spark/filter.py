"""Declarative filter DSL compiled to Catalyst Column expressions.

Same term language as the reference (reference: filter.py:8-162):

    Filter([
        ("log", "|>", 1),                      # |value| > 1
        ("fdr", "<", 0.05),                    # comparison
        ("type", "in", ["protein_coding"]),    # membership
        (["c1", "c2", "c3"], "2>=", 5),        # k-of-n quantifier
        (["c1", "c2"], "a>", 0),               # all-of quantifier
    ])

Terms are ANDed; ``f1 & f2`` / ``f1 | f2`` build combined filters
(reference: filter.py:134-162 does this with row-index set
intersection/union — here it is a boolean expression tree).

Where the reference evaluates each term eagerly into a pandas row-index
and intersects the indexes, this engine compiles the whole tree into ONE
Column predicate, so Catalyst pushes it into the Parquet scan: zero
shuffle, and at 100 TB only matching row groups are read. The k-of-n
quantifier compiles to a sum of casted booleans (no UDF, stays inside
whole-stage codegen).
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Any, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .transformer import Transformer

_OPERATOR_PATTERN = re.compile(r"^(?P<at_least>[\d,a]?)(?P<operator>[<>=]+)$")

# comparator name -> Column builder (single column, scalar argument)
_COMPARATORS = {
    "|>": lambda c, v: F.abs(F.col(c)) > F.lit(v),
    ">": lambda c, v: F.col(c) > F.lit(v),
    "<": lambda c, v: F.col(c) < F.lit(v),
    ">=": lambda c, v: F.col(c) >= F.lit(v),
    "<=": lambda c, v: F.col(c) <= F.lit(v),
    "in": lambda c, v: F.col(c).isin(list(v)),
    "notin": lambda c, v: ~F.col(c).isin(list(v)),
}


class Filter(Transformer):
    """Compile a list of filter terms into a single Spark predicate."""

    def __init__(self, filter_args: List[Tuple[Any, str, Any]]):
        super().__init__("Filter", filter_args)
        self.filter_args = filter_args
        # validate eagerly so bad operators fail at construction, like the
        # reference (filter.py:36-42 raises on unknown operators)
        for term in filter_args:
            self._interpret(term)

    @staticmethod
    def _interpret(term: Sequence[Any]):
        """Normalize one term to (columns, operator, argument, at_least)."""
        columns = [term[0]] if isinstance(term[0], str) else list(term[0])
        operator = term[1]
        argument = term[2]
        if operator in _COMPARATORS:
            at_least = str(term[3]) if len(term) > 3 else "1"
        else:
            m = _OPERATOR_PATTERN.match(operator)
            if m is None or m.group("operator") not in _COMPARATORS:
                raise ValueError(f"The operator '{operator}' is not valid.")
            operator = m.group("operator")
            at_least = m.group("at_least") or "1"
        if at_least != "a" and not at_least.isdigit():
            raise ValueError("Don't know how to aggregate.")
        return columns, operator, argument, at_least

    @classmethod
    def _term_expr(cls, term: Sequence[Any]) -> Column:
        columns, operator, argument, at_least = cls._interpret(term)
        comparator = _COMPARATORS[operator]
        per_column = [comparator(c, argument) for c in columns]
        if at_least == "a":
            return reduce(lambda a, b: a & b, per_column)
        k = int(at_least)
        if len(per_column) == 1 and k <= 1:
            return per_column[0]
        # k-of-n: null comparisons count as not-satisfied (pandas parity:
        # NaN comparisons are False)
        counted = reduce(
            lambda a, b: a + b,
            [F.coalesce(p.cast("int"), F.lit(0)) for p in per_column],
        )
        return counted >= F.lit(k)

    def expr(self) -> Column:
        """The whole filter as one Column predicate (terms ANDed)."""
        exprs = [self._term_expr(t) for t in self.filter_args]
        if not exprs:
            return F.lit(True)
        return reduce(lambda a, b: a & b, exprs)

    def __call__(self, df: DataFrame, *args, **kwargs) -> DataFrame:
        if not isinstance(df, DataFrame):
            raise ValueError(
                f"Transformer calls need a DataFrame as first parameter, was {type(df)}."
            )
        return df.filter(self.expr())

    def __and__(self, other: "Filter") -> "CombinedFilter":
        return CombinedFilter(self, other, "intersection")

    def __or__(self, other: "Filter") -> "CombinedFilter":
        return CombinedFilter(self, other, "union")


class CombinedFilter(Filter):
    """Boolean combination of two filters (reference: filter.py:141-162).

    The reference combines materialized row-index sets; here the combine
    stays symbolic (`&` / `|` over predicates) so pushdown still applies.
    """

    _COMBINE = {"intersection": "__and__", "union": "__or__"}

    def __init__(self, filter1: Filter, filter2: Filter, combine_operation: str = "union"):
        Transformer.__init__(self, "CombinedFilter", combine_operation)
        if combine_operation not in self._COMBINE:
            raise ValueError(
                f"Combine operation {combine_operation} not supported."
            )
        self.filter1 = filter1
        self.filter2 = filter2
        self.combine_operation = combine_operation

    def expr(self) -> Column:
        e1, e2 = self.filter1.expr(), self.filter2.expr()
        if self.combine_operation == "intersection":
            return e1 & e2
        return e1 | e2

    def __call__(self, df: DataFrame, *args, **kwargs) -> DataFrame:
        if not isinstance(df, DataFrame):
            raise ValueError(
                f"Transformer calls need a DataFrame as first parameter, was {type(df)}."
            )
        return df.filter(self.expr())
