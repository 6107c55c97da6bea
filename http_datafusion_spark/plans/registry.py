"""Query registry — the operator-inventory correctness corpus.

Every implemented operator from SURVEY.md §2 gets a named QuerySpec:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string
that DuckDB runs on the same parquet tables. The driver compares the
two (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- temporal outputs are rendered as strings (Spark timestamps are
  session-TZ, DuckDB's are naive — strings sidestep the gap);
- floating aggregates are rounded so partial-aggregation order
  differences between engines can't flip the hash;
- every LIMIT/top-k query carries a total order (unique tiebreak).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a Spark query + its DuckDB oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry."""
    import http_datafusion_spark.operators.asof  # noqa: F401
    import http_datafusion_spark.operators.components  # noqa: F401
    import http_datafusion_spark.operators.dedup  # noqa: F401
    import http_datafusion_spark.operators.multimodal  # noqa: F401
    import http_datafusion_spark.operators.range_join  # noqa: F401
    import http_datafusion_spark.operators.similarity  # noqa: F401
    import http_datafusion_spark.operators.text  # noqa: F401
    import http_datafusion_spark.operators.timeseries  # noqa: F401
    import http_datafusion_spark.plans.aggregates  # noqa: F401
    import http_datafusion_spark.plans.events  # noqa: F401
    import http_datafusion_spark.plans.extra  # noqa: F401
    import http_datafusion_spark.plans.relational  # noqa: F401
    import http_datafusion_spark.plans.scalar_funcs  # noqa: F401
    import http_datafusion_spark.plans.subqueries  # noqa: F401
    import http_datafusion_spark.plans.tpch_more  # noqa: F401
    import http_datafusion_spark.plans.windows  # noqa: F401
    import http_datafusion_spark.streaming.queries  # noqa: F401

    return dict(REGISTRY)
