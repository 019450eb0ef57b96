"""mdataframe_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference library MarcoMernberger/mdataframe (a pandas/rpy2 convenience
wrapper for count-matrix analytics), re-expressed Spark-first:

- transformer chaining with the reference's name/param-hash/suffix contract
  (reference: transformations.py:16-60)
- a declarative filter DSL compiled to Catalyst Column expressions
  (reference: filter.py:8-162)
- native (R-free) normalization + differential statistics
  (reference: transformations.py:63-218, differential.py:51-740)
- clustering / dimensionality reduction on Spark ML
  (reference: clustering.py, projection.py, strategies.py)
- sources/sinks (TSV/Excel/Parquet) and a content-addressed checkpoint
  store standing in for the reference's pypipegraph2 cache
  (reference: mdataframe.py:160-317, 925-1248)
- plus large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) designed for 100 TB scale.

Everything here is built on the public Apache Spark DataFrame/SQL API;
no code is copied from the reference.
"""

from .transformer import Transformer
from .filter import Filter, CombinedFilter
from .frame import MFrame
from .session import get_spark

__all__ = [
    "Transformer",
    "Filter",
    "CombinedFilter",
    "MFrame",
    "get_spark",
]

__version__ = "0.1.0"
