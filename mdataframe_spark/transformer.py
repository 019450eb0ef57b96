"""Transformer protocol: named, parameter-hashed, suffix-applying steps.

Reproduces the reference's transformer contract (reference:
transformations.py:16-60): every transformer has a ``name``, a SHA-256
identity hash derived from its stringified constructor parameters
(equal params => equal hash, independent of the name), an optional
output-column ``suffix``, and is a callable ``DataFrame -> DataFrame``.

Here the DataFrames are Spark DataFrames and ``__call__`` appends to the
Catalyst logical plan — nothing executes until an action. The hash is
the key for the content-addressed checkpoint store (plans/checkpoint.py),
standing in for the reference's pypipegraph2 ParameterInvariants
(reference: mdataframe.py:222-230, 497-528).
"""

from __future__ import annotations

import hashlib
from typing import Optional

from pyspark.sql import DataFrame


class Transformer:
    """Base class for all engine transform steps.

    Subclasses implement ``_transform(df) -> df`` (preferred) or override
    ``__call__``. Column renaming with the transformer suffix is applied
    centrally by ``_apply_suffix`` on the columns the subclass reports as
    outputs (mirrors reference _post_call, transformations.py:52-57).
    """

    def __init__(self, name: str, *args, **kwargs):
        self.name = name
        self._parameter_as_string = ",".join(str(x) for x in args)
        if kwargs:
            self._parameter_as_string += "," + ",".join(
                f"({k}={v})" for k, v in kwargs.items()
            )
        self.suffix: Optional[str] = None

    @property
    def hash(self) -> str:
        m = hashlib.sha256()
        m.update(self._parameter_as_string.encode("UTF-8"))
        return m.hexdigest()

    def __call__(self, df: DataFrame, *args, **kwargs) -> DataFrame:
        if not isinstance(df, DataFrame):
            raise ValueError(
                f"Transformer calls need a DataFrame as first parameter, was {type(df)}."
            )
        return self._transform(df, *args, **kwargs)

    def _transform(self, df: DataFrame, *args, **kwargs) -> DataFrame:
        raise NotImplementedError(
            "Override _transform (or __call__) in the subclass."
        )

    def _apply_suffix(self, df: DataFrame, output_columns: list[str]) -> DataFrame:
        """Rename ``output_columns`` to ``col + suffix`` if a suffix is set."""
        if not self.suffix:
            return df
        mapping = {c: f"{c}{self.suffix}" for c in output_columns}
        return df.withColumnsRenamed(mapping)

    def __repr__(self) -> str:  # pragma: no cover
        return f"{type(self).__name__}(name={self.name!r}, hash={self.hash[:12]})"
