"""Content-addressed Parquet checkpoint store (SURVEY.md §1.5, §2.12).

Stands in for the reference's pypipegraph2 incremental-recompute layer
(reference: mdataframe.py:189-193, 222-230, 311-317): every pipeline
step has a deterministic key = SHA-256(parent key + transformer name +
parameter hash); re-running an unchanged chain hits the Parquet cache
instead of recomputing, including across Spark sessions. Parameter and
"function" invariants map onto the transformer param hash (the
reference hashes stringified constructor args the same way,
transformations.py:25-42).

Usage:

    store = CheckpointStore("/tmp/cache")
    key = store.step_key(parent_key, transformer)
    df = store.get_or_compute(spark, key, lambda: tmm(df_in))
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from ..transformer import Transformer


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @staticmethod
    def step_key(parent_key: Optional[str], transformer: Transformer) -> str:
        """Deterministic step identity: parent ⊕ name ⊕ param hash.

        Keys longer than 250 chars are impossible by construction (we
        always hash), which also covers the reference's long-name
        hashing rule (mdataframe.py:190-191)."""
        m = hashlib.sha256()
        m.update((parent_key or "").encode())
        m.update(transformer.name.encode())
        m.update(transformer.hash.encode())
        return m.hexdigest()

    @staticmethod
    def source_key(description: str) -> str:
        """Key for a pipeline source (path + format + options)."""
        return hashlib.sha256(description.encode()).hexdigest()

    def path(self, key: str) -> str:
        return os.path.join(self.root, key[:2], key)

    def exists(self, key: str) -> bool:
        return os.path.exists(os.path.join(self.path(key), "_SUCCESS"))

    def read(self, spark: SparkSession, key: str) -> DataFrame:
        return spark.read.parquet(self.path(key))

    def write(self, df: DataFrame, key: str) -> None:
        df.write.mode("overwrite").parquet(self.path(key))

    def get_or_compute(
        self, spark: SparkSession, key: str, compute: Callable[[], DataFrame]
    ) -> DataFrame:
        """Cache hit ⇒ read parquet (skips the whole upstream plan);
        miss ⇒ compute, persist, read back (so downstream plans hang
        off the materialized relation, not the recomputation)."""
        if not self.exists(key):
            self.write(compute(), key)
        return self.read(spark, key)

    def invalidate(self, key: str) -> None:
        import shutil

        shutil.rmtree(self.path(key), ignore_errors=True)
