"""Skew-handling utilities.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers cover the remaining case — aggregation over a
hot key — with the classic two-phase salted aggregate:

    groupBy(key, salt) partial -> groupBy(key) final

The salt spreads one hot key's rows over ``n_salts`` reducers in phase
one; phase two combines ``n_salts`` partial rows per key, which is
trivially small. Correct for any commutative-associative aggregate
given its (partial, final) decomposition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, n_salts: int = 32, salt_col: str = "_salt") -> DataFrame:
    """Attach a uniform salt column (deterministic per row via a hash of
    all columns would be stable but slow; monotonically varying salt is
    enough — only the DISTRIBUTION matters, not the assignment)."""
    return df.withColumn(salt_col, (F.monotonically_increasing_id() % n_salts).cast("int"))


def salted_count_sum(
    df: DataFrame, key: str | Column, value: str | Column, n_salts: int = 32
) -> DataFrame:
    """Two-phase skew-safe count+sum per key: returns (key, n, total)."""
    s = salted(df, n_salts)
    partial = s.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_n"), F.sum(value).alias("_t")
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"), F.sum("_t").alias("total")
    )
