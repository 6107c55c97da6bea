"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the engine's query registry: every implemented operator
from SURVEY.md §2 (plus the LLM-pipeline extensions) is a named
QuerySpec pairing a Spark callable with a DuckDB oracle SQL string.
See http_datafusion_spark/plans/registry.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from http_datafusion_spark.plans.registry import all_queries  # noqa: E402

_FLAGSHIP = "q1_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = all_queries()[_FLAGSHIP]
    return spec.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query. Every registered query —
    including the streaming, stateful, and multimodal ones — carries an
    oracle; there are zero rows-only entries."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
